"""Golden-output parity with the reference's committed expected outputs —
the full inline-data suite.

Each test replicates one of the reference's hand-built test programs
(`/root/reference/test/src/*.c`) step for step and checks the numbers it
prints against the committed golden file in `test/out/` — the same files
all of the reference's SIMD kernels are validated against (runtest.py runs
every program under 8 attribute combinations against one golden).

The reference ships 14 test programs whose input data is fully inline
(no downloaded fixture).  Status of each:

  golden-diffed in tests/test_golden.py:
    00010_NMDU_lkcalc  00020_NMDR_lkcalc
  golden-diffed here:
    00011_NMAU_lkcalc   5-taxon unrooted protein (Dayhoff), Γ4
    00012_NMOU_lkcalc   5-taxon unrooted 7-state odd alphabet, Γ4
    00021_NMAR_lkcalc   5-taxon rooted protein
    00022_NMOR_lkcalc   5-taxon rooted odd alphabet (+ illegal-alpha probe)
    00030_NMDU_gamma    Γ mean vs median discretization, DNA
    00032_NMOU_gamma    Γ modes × categories × alphas grid, odd alphabet
    alpha-cats          9 alphas × 5 category counts × 2 modes, DNA
    hky                 10 ti/tv ratios via GTR parameterization
    derivatives         d/dd grid: 3 alphas × 4 p-inv × 3 cat-counts ×
                        9 branch lengths, inner and tip edges
    derivatives-oddstates  same grid on a 5-state alphabet
    pmatrix             3 alphabets × 9 param combos × 5 branches × 4
                        extreme rate cats, every P entry at 9 decimals
                        (+ the negative-entry regression check)
  no committed golden upstream (oracle-covered instead):
    protein-models      all 19 empirical AA matrices — exercised against
                        the compiled oracle in tests/test_models.py

The remaining reference programs (asc-bias, scaling, partial-traversal,
rooted*, 00110/00120 fasta, …) read fixture alignments downloaded at test
time (absent offline); their semantics are covered by the compiled-oracle
parity tests.
"""

import os
import re

import numpy as np
import pytest

GOLDEN_DIR = os.environ.get("LIBPLL_GOLDEN_DIR", "/root/reference/test/out")

if not os.path.isdir(GOLDEN_DIR):
    pytest.skip("golden outputs unavailable", allow_module_level=True)

import libpll_tpu as pll
from libpll_tpu.models import aa_tables
from libpll_tpu.io import maps
from libpll_tpu.models.gamma import compute_gamma_cats
from libpll_tpu.utils.constants import GAMMA_RATES_MEAN, GAMMA_RATES_MEDIAN

LOGL_ATOL = 1.5e-6     # golden logL printed to 6 decimals
PERSITE_ATOL = 1.5e-7  # golden per-site lnl printed to 7 decimals


def _golden(name):
    with open(os.path.join(GOLDEN_DIR, name)) as fh:
        return fh.read()


def _grab_all(pattern, text):
    out = re.findall(pattern, text)
    assert out, f"pattern {pattern!r} not found in golden file"
    return out


def _odd_map(codes: dict, gap: int) -> np.ndarray:
    """Reference-style 256-entry charmap: letters (both cases) to state
    bitmasks; '-', '*', '?' map to the table's gap state (taken verbatim
    from the reference maps: 0x3F for the 7-state map — bit 6 unused! —
    and 0x1F for odd5_map)."""
    m = np.zeros(256, dtype=np.uint32)
    for ch, v in codes.items():
        m[ord(ch.upper())] = v
        m[ord(ch.lower())] = v
    for ch in "-*?":
        m[ord(ch)] = gap
    return m


# odd 7-state map of test/src/00012_NMOU_lkcalc.c ('E' is ambiguous C|D)
ODD7_MAP = _odd_map({"A": 0x01, "B": 0x02, "C": 0x04, "D": 0x08,
                     "E": 0x0C, "F": 0x10, "G": 0x20}, 0x3F)
# odd 5-state map of test/src/common.c:8 (odd5_map)
ODD5_MAP = _odd_map({"A": 0x01, "B": 0x02, "C": 0x04, "D": 0x08,
                     "E": 0x0C}, 0x1F)

OPS_UNROOTED = [
    pll.Operation(5, -1, 0, 1, -1, 1, 1, -1),
    pll.Operation(6, -1, 5, 0, -1, 2, 1, -1),
    pll.Operation(7, -1, 3, 1, -1, 4, 1, -1),
]
OP_TIP_INNER = pll.Operation(7, -1, 6, 0, -1, 3, 1, -1)

AA_SEQS = ["PIGLRVTLRRDRMWI", "IQGMDITIVT-----", "--AFALLQKIGMPFE",
           "MDISIVT------TA", "GLSEQTVFHEIDQDK"]
ODD7_SEQS = ["AAB-CCD-EFAA", "ACC-FBA-ABGG", "A-C-GAG-GCCF",
             "ADCFCAA-A-CG", "ABC-BCA-A-BG"]
ODD7_FREQS = [0.12, 0.14, 0.13, 0.11, 0.15, 0.13, 0.12]
ODD7_SUBST = [0.5, 2.0, 3.0, 4.0, 5.0, 1.1, 1.2, 1.3, 1.4, 1.5, 2.1,
              2.2, 2.3, 2.4, 2.5, 3.1, 3.2, 3.3, 3.4, 3.5, 1.0]
DNA20_SEQS = ["WAACTCGCTA--ATTCTAAT", "CACCATGCTA--ATTGTCTT",
              "AG-C-TGCAG--CTTCTACT", "CGTCTTGCAA--AT-C-AAG",
              "CGACTTGCCA--AT-T-AAG"]
ODD5_SEQS = ["DAACBCECBA--ABBCBAAB", "CACCABECBA--ABBEBCBB",
             "AE-C-BECAE--CBBCBACB", "CEBCBBECAA--AB-C-AAE",
             "CEACBBECCA--AB-B-AAE"]


def _persite_blocks(golden):
    """All 'persite logL:' rows as float lists."""
    rows = _grab_all(r"persite logL:\s+((?:-?\d+\.\d+\s+)+)", golden)
    return [[float(x) for x in row.split()] for row in rows]


def _unrooted_program(states, sites, seqs, charmap, freqs, subst,
                      branch_lengths, alpha=0.5, cats=4):
    part = pll.Partition(5, 4, states, sites, 1, 7, cats, 0, scaling="none")
    part.set_frequencies(0, freqs)
    part.set_subst_params(0, subst)
    part.set_category_rates(compute_gamma_cats(alpha, cats))
    for i, s in enumerate(seqs):
        part.set_tip_states(i, charmap, s[:sites])
    part.update_prob_matrices([0] * cats, [0, 1, 2, 3], branch_lengths)
    part.update_partials(OPS_UNROOTED)
    return part


def _check_lkcalc_unrooted(golden, part, cats=4):
    """inner-inner edge (6,7,m0), then tip-inner (7,4,m1) after re-rooting —
    the evaluation sequence shared by 0001x."""
    logl, persite = part.compute_edge_loglikelihood(
        6, -1, 7, -1, 0, [0] * cats, persite=True)
    want = float(_grab_all(r"inner-inner logL: (-?\d+\.\d+)", golden)[0])
    np.testing.assert_allclose(logl, want, atol=LOGL_ATOL)
    blocks = _persite_blocks(golden)
    np.testing.assert_allclose(persite, blocks[0], atol=PERSITE_ATOL)

    part.update_partials([OP_TIP_INNER])
    logl2, persite2 = part.compute_edge_loglikelihood(
        7, -1, 4, -1, 1, [0] * cats, persite=True)
    want2 = float(_grab_all(r"tip-inner logL:\s+(-?\d+\.\d+)", golden)[0])
    np.testing.assert_allclose(logl2, want2, atol=LOGL_ATOL)
    np.testing.assert_allclose(persite2, blocks[1], atol=PERSITE_ATOL)


def test_00011_nmau_lkcalc_protein():
    """5-taxon unrooted protein, Dayhoff + Γ4 (test/src/00011)."""
    golden = _golden("00011_NMAU_lkcalc.out")
    part = _unrooted_program(20, 15, AA_SEQS, maps.pll_map_aa,
                             aa_tables.AA_FREQS_DAYHOFF,
                             aa_tables.AA_RATES_DAYHOFF, [0.1, 0.2, 1, 1])
    _check_lkcalc_unrooted(golden, part)


def test_00012_nmou_lkcalc_odd_states():
    """5-taxon unrooted 7-state odd alphabet (test/src/00012) — exercises
    non-power-of-two state counts end to end."""
    golden = _golden("00012_NMOU_lkcalc.out")
    part = _unrooted_program(7, 12, ODD7_SEQS, ODD7_MAP, ODD7_FREQS,
                             ODD7_SUBST, [0.1, 0.2, 1, 1])
    _check_lkcalc_unrooted(golden, part)


def _rooted_program(states, sites, seqs, charmap, freqs, subst):
    part = pll.Partition(5, 4, states, sites, 1, 8, 4, 0, scaling="none")
    part.set_frequencies(0, freqs)
    part.set_subst_params(0, subst)
    part.set_category_rates(compute_gamma_cats(0.5, 4))
    for i, s in enumerate(seqs):
        part.set_tip_states(i, charmap, s[:sites])
    part.update_prob_matrices([0] * 4, [0, 1, 2, 3], [0.5, 0.5, 0.3, 0.2])
    part.update_partials(OPS_UNROOTED
                         + [pll.Operation(8, -1, 7, 2, -1, 6, 3, -1)])
    return part


def _check_lkcalc_rooted(golden, part):
    logl, persite = part.compute_root_loglikelihood(8, -1, [0] * 4,
                                                    persite=True)
    want = float(_grab_all(r"inner-inner logL: (-?\d+\.\d+)", golden)[0])
    np.testing.assert_allclose(logl, want, atol=LOGL_ATOL)
    blocks = _persite_blocks(golden)
    np.testing.assert_allclose(persite, blocks[0], atol=PERSITE_ATOL)

    # re-root through the tip branch: 7 <- (6, tip 3), 8 <- (7, tip 4)
    part.update_partials([OP_TIP_INNER,
                          pll.Operation(8, -1, 7, 2, -1, 4, 3, -1)])
    logl2, persite2 = part.compute_root_loglikelihood(8, -1, [0] * 4,
                                                      persite=True)
    want2 = float(_grab_all(r"tip-inner logL:\s+(-?\d+\.\d+)", golden)[0])
    np.testing.assert_allclose(logl2, want2, atol=LOGL_ATOL)
    np.testing.assert_allclose(persite2, blocks[1], atol=PERSITE_ATOL)


def test_00021_nmar_lkcalc_rooted_protein():
    """5-taxon rooted protein (test/src/00021)."""
    golden = _golden("00021_NMAR_lkcalc.out")
    part = _rooted_program(20, 12, AA_SEQS, maps.pll_map_aa,
                           aa_tables.AA_FREQS_DAYHOFF,
                           aa_tables.AA_RATES_DAYHOFF)
    _check_lkcalc_rooted(golden, part)


def test_00022_nmor_lkcalc_rooted_odd():
    """5-taxon rooted odd alphabet (test/src/00022), including the
    illegal-alpha error probe."""
    golden = _golden("00022_NMOR_lkcalc.out")
    part = _rooted_program(7, 12, ODD7_SEQS, ODD7_MAP, ODD7_FREQS,
                           ODD7_SUBST)
    _check_lkcalc_rooted(golden, part)

    from libpll_tpu.errors import PllError
    with pytest.raises(PllError):
        compute_gamma_cats(0.0, 4)


def test_00030_gamma_mean_vs_median():
    """Γ rate discretization, mean vs median mode (test/src/00030): rates to
    6 decimals and both edge logLs per mode."""
    golden = _golden("00030_NMDU_gamma.out")
    titv = 2.5
    part = pll.Partition(5, 4, 4, 12, 1, 7, 4, 0, scaling="none")
    part.set_frequencies(0, [0.3, 0.4, 0.1, 0.2])
    part.set_subst_params(0, [1, titv, 1, 1, titv, 1])
    for i, s in enumerate(["WAC-CTA-ATCT", "CCC-TTA-ATGT", "A-C-TAG-CTCT",
                           "CTCTTAA-A-CG", "CAC-TCA-A-TG"]):
        part.set_tip_states(i, maps.pll_map_nt, s)

    blocks = _persite_blocks(golden)
    for bi, (tag, mode) in enumerate([("MEAN", GAMMA_RATES_MEAN),
                                      ("MEDIAN", GAMMA_RATES_MEDIAN)]):
        rates = compute_gamma_cats(0.5, 4, mode)
        want_rates = [float(x) for x in _grab_all(
            rf"\[{tag}\] Discrete GAMMA rates: ((?:-?\d+\.\d+ )+)",
            golden)[0].split()]
        np.testing.assert_allclose(rates, want_rates, atol=5.1e-7)

        part.set_category_rates(rates)
        part.update_prob_matrices([0] * 4, [0, 1, 2, 3], [0.1, 0.2, 1, 1])
        part.update_partials(OPS_UNROOTED)
        logl, persite = part.compute_edge_loglikelihood(
            6, -1, 7, -1, 0, [0] * 4, persite=True)
        want = float(_grab_all(
            rf"\[{tag}\] inner-inner logL: (-?\d+\.\d+)", golden)[0])
        np.testing.assert_allclose(logl, want, atol=LOGL_ATOL)
        np.testing.assert_allclose(persite, blocks[2 * bi], atol=PERSITE_ATOL)

        part.update_partials([OP_TIP_INNER])
        logl2, persite2 = part.compute_edge_loglikelihood(
            7, -1, 4, -1, 1, [0] * 4, persite=True)
        want2 = float(_grab_all(
            rf"\[{tag}\] tip-inner logL:\s+(-?\d+\.\d+)", golden)[0])
        np.testing.assert_allclose(logl2, want2, atol=LOGL_ATOL)
        np.testing.assert_allclose(persite2, blocks[2 * bi + 1],
                                   atol=PERSITE_ATOL)


def _summary_grid(golden):
    """Parse 'ti/tv:alpha(ncats) = a( c), mode = M ... logL: x' lines."""
    rows = _grab_all(
        r"ti/tv:alpha\(ncats\) =\s*(-?\d+\.\d+)\(\s*(\d+)\), "
        r"mode =\s*(MEAN|MEDIAN)(?:\(\d\))?\s+logL:\s+(-?\d+\.\d+)", golden)
    return [(float(a), int(c), m, float(l)) for (a, c, m, l) in rows]


def test_00032_gamma_grid_odd_states():
    """Γ modes × categories × alphas on the 7-state alphabet
    (test/src/00032): 18 summary logLs."""
    golden = _golden("00032_NMOU_gamma.out")
    grid = _summary_grid(golden)
    assert len(grid) == 18
    seqs = ["BAACDCGCDA--AEECFAAD", "CACCABGCBA--BDDGFCDA",
            "AG-C-CGCAG--CGFCFACC", "CGDCBDGCAA--AB-C-AAG",
            "CGACFFGCCA--AF-D-AAG"]
    for alpha, cats, modename, want in grid:
        mode = GAMMA_RATES_MEAN if modename == "MEAN" else GAMMA_RATES_MEDIAN
        part = pll.Partition(5, 4, 7, 20, 1, 7, cats, 0, scaling="none")
        part.set_frequencies(0, ODD7_FREQS)
        part.set_subst_params(0, ODD7_SUBST)
        part.set_category_rates(compute_gamma_cats(alpha, cats, mode))
        for i, s in enumerate(seqs):
            part.set_tip_states(i, ODD7_MAP, s)
        part.update_prob_matrices([0] * cats, [0, 1, 2, 3],
                                  [0.1, 0.2, 1, 1])
        part.update_partials(OPS_UNROOTED)
        logl = part.compute_edge_loglikelihood(6, -1, 7, -1, 0, [0] * cats)
        np.testing.assert_allclose(
            logl, want, atol=LOGL_ATOL,
            err_msg=f"alpha={alpha} cats={cats} mode={modename}")


def test_alpha_cats_grid():
    """9 alphas × 5 category counts × 2 modes, DNA (test/src/alpha-cats):
    90 summary logLs."""
    golden = _golden("alpha-cats.out")
    grid = _summary_grid(golden)
    assert len(grid) == 90
    titv = 2.5
    parts = {}
    for alpha, cats, modename, want in grid:
        mode = GAMMA_RATES_MEAN if modename == "MEAN" else GAMMA_RATES_MEDIAN
        if cats not in parts:
            part = pll.Partition(5, 4, 4, 20, 1, 7, cats, 0, scaling="none")
            part.set_frequencies(0, [0.3, 0.4, 0.1, 0.2])
            part.set_subst_params(0, [1, titv, 1, 1, titv, 1])
            for i, s in enumerate(DNA20_SEQS):
                part.set_tip_states(i, maps.pll_map_nt, s)
            parts[cats] = part
        part = parts[cats]
        part.set_category_rates(compute_gamma_cats(alpha, cats, mode))
        part.update_prob_matrices([0] * cats, [0, 1, 2, 3],
                                  [0.1, 0.2, 1, 1])
        part.update_partials(OPS_UNROOTED)
        logl = part.compute_edge_loglikelihood(6, -1, 7, -1, 0, [0] * cats)
        np.testing.assert_allclose(
            logl, want, atol=LOGL_ATOL,
            err_msg=f"alpha={alpha} cats={cats} mode={modename}")


def test_hky_titv_grid():
    """10 ti/tv ratios as GTR parameterizations (test/src/hky.c); logL
    printed to 4 decimals."""
    golden = _golden("hky.out")
    rows = _grab_all(r"ti/tv:\s+(-?\d+\.\d+)\s+logL:\s+(-?\d+\.\d+)", golden)
    assert len(rows) == 10
    part = pll.Partition(5, 4, 4, 20, 1, 7, 4, 0, scaling="none")
    part.set_frequencies(0, [0.3, 0.4, 0.1, 0.2])
    part.set_category_rates(compute_gamma_cats(1.0, 4))
    for i, s in enumerate(DNA20_SEQS):
        part.set_tip_states(i, maps.pll_map_nt, s)
    for titv_s, want_s in rows:
        titv, want = float(titv_s), float(want_s)
        part.set_subst_params(0, [1, titv, 1, 1, titv, 1])
        part.update_prob_matrices([0] * 4, [0, 1, 2, 3], [0.1, 0.2, 1, 1])
        part.update_partials(OPS_UNROOTED)
        logl = part.compute_edge_loglikelihood(6, -1, 7, -1, 0, [0] * 4)
        np.testing.assert_allclose(logl, want, atol=1.5e-4,
                                   err_msg=f"titv={titv}")


# ---------------------------------------------------------------------------
# derivatives / derivatives-oddstates: the full 3×4×3×9 grid on both an
# inner-inner and a tip-inner edge (reference test/src/derivatives.c)
# ---------------------------------------------------------------------------
_DERIV_SECTION = re.compile(
    r" TEST alpha\(ncats\) =\s*(-?\d+\.\d+)\(\s*(\d+)\) ; pinv = "
    r"(-?\d+\.\d+)")
_DERIV_LINE = re.compile(
    r"Branch(\(Tip\))?\s+(-?\d+\.\d+) : (-?\d+\.\d+)\s+(-?[\d.]+e[+-]\d+)"
    r"\s+(-?[\d.]+e[+-]\d+)")

# printed to 4 significant digits; values at huge branch lengths are pure
# cancellation noise, hence the absolute floor
DERIV_RTOL = 2e-3
DERIV_ATOL = 1e-10


def _run_derivatives_program(golden_name, states, seqs, charmap, freqs,
                             subst):
    golden = _golden(golden_name)
    sections = _DERIV_SECTION.findall(golden)
    assert len(sections) == 36
    # per-section derivative rows, in order
    lines = _DERIV_LINE.findall(golden)
    assert len(lines) == 36 * 18
    rows = iter(lines)

    branch_lengths = [0.1, 0.2, 0.3, 0.4]
    part = None
    last_cats = None
    for alpha_s, cats_s, pinv_s in sections:
        alpha, cats, pinv = float(alpha_s), int(cats_s), float(pinv_s)
        if cats != last_cats:
            part = pll.Partition(5, 4, states, 20, 1, 7, cats, 0,
                                 scaling="none")
            part.set_frequencies(0, freqs)
            part.set_subst_params(0, subst)
            for i, s in enumerate(seqs):
                part.set_tip_states(i, charmap, s)
            last_cats = cats
        part.set_category_rates(compute_gamma_cats(alpha, cats))
        part.update_invariant_sites_proportion(0, pinv)
        part.update_prob_matrices([0] * cats, [0, 1, 2, 3], branch_lengths)
        part.update_partials(OPS_UNROOTED)

        for tip_phase in (False, True):
            if tip_phase:
                # move to the tip branch: 7 <- (6 via m0, tip 3 via m0)
                part.update_partials([pll.Operation(7, -1, 6, 0, -1,
                                                    3, 0, -1)])
                pidx, (a, b) = 1, (4, 7)
            else:
                pidx, (a, b) = 0, (6, 7)
            st = part.update_sumtable(a, b, -1, -1, [0] * cats)
            for t in [0.1, 0.2, 0.5, 0.9, 1.5, 5.0, 10.0, 50.0, 90.0]:
                d1, d2 = part.compute_likelihood_derivatives(
                    -1, -1, t, [0] * cats, st)
                part.update_prob_matrices([0] * cats, [pidx], [t])
                f = part.compute_edge_loglikelihood(a, -1, b, -1, pidx,
                                                    [0] * cats)
                tip_tag, t_w, f_w, d1_w, d2_w = next(rows)
                assert bool(tip_tag) == tip_phase and float(t_w) == t
                ctx = (f"alpha={alpha} cats={cats} pinv={pinv} t={t} "
                       f"tip={tip_phase}")
                np.testing.assert_allclose(f, float(f_w), atol=LOGL_ATOL,
                                           err_msg="logL " + ctx)
                np.testing.assert_allclose(d1, float(d1_w), rtol=DERIV_RTOL,
                                           atol=DERIV_ATOL,
                                           err_msg="d1 " + ctx)
                np.testing.assert_allclose(d2, float(d2_w), rtol=DERIV_RTOL,
                                           atol=DERIV_ATOL,
                                           err_msg="d2 " + ctx)
            # restore the original branch matrix (reference does the same)
            part.update_prob_matrices([0] * cats, [pidx],
                                      [branch_lengths[pidx]])


def _pmatrix_freq_sets(n):
    """The 3 base-frequency sets of test/src/pmatrix.c:109-139
    (equal / skewed / extreme)."""
    equal = [1.0 / n] * n
    skew = 1.0 / (3.0 * n)
    skewed = []
    for k in range(n):
        v = 1.0 / n
        if k % 2 == 0:
            v += skew
        elif k != n - 1:
            v -= skew
        skewed.append(v)
    minfreq = 1e-3
    maxfreq = (1.0 - 0.5 * n * minfreq) / (0.5 * n)
    extreme = [minfreq if k % 2 == 0 else maxfreq for k in range(n)]
    return [equal, skewed, extreme]


def _pmatrix_rate_sets(nr):
    """The 3 substitution-rate sets of test/src/pmatrix.c:141-168."""
    equal = [1.0] * nr
    skewed = []
    for k in range(nr):
        v = 1.0
        if k % 2 == 0:
            v *= 5.0
        elif k != nr - 1:
            v /= 5.0
        skewed.append(v)
    extreme = [1e-3 if k % 2 == 0 else 1e3 for k in range(nr - 1)] + [1.0]
    return [equal, skewed, extreme]


def test_pmatrix_golden():
    """test/src/pmatrix.c against its committed golden (test/out/
    pmatrix.out): 3 alphabets × 3 frequency sets × 3 subst-param sets ×
    5 branch lengths (1e-6 … 100) × 4 extreme category rates (1e-31 …
    100), every P-matrix entry at 9-decimal print precision — plus the
    reference's negative-entry regression check (check_matrix,
    pmatrix.c:47-56; the expm1+identity construction of
    core_pmatrix.c:182-237 must keep P ≥ 0 as Qt → 0)."""
    golden = _golden("pmatrix.out")
    blocks = re.split(r"P-matrix: \d+, brlen = \d+\.\d+\n", golden)[1:]
    assert len(blocks) == 135  # 3 alphabets x 9 param combos x 5 branches

    cat_rates = [1e-31, 1e-6, 1.0, 100.0]
    branch_lengths = [1e-6, 1e-2, 0.2, 1.0, 100.0]
    bi = 0
    for states in (4, 20, 5):  # DNA, PROT, ODD — program order
        nr = states * (states - 1) // 2
        part = pll.Partition(4, 0, states, 5, 1, 5, 4, 0, scaling="none")
        part.set_category_rates(cat_rates)
        for freqs in _pmatrix_freq_sets(states):
            for subst in _pmatrix_rate_sets(nr):
                part.set_frequencies(0, freqs)
                part.set_subst_params(0, subst)
                part.update_prob_matrices([0] * 4, [0, 1, 2, 3, 4],
                                          branch_lengths)
                pm = np.asarray(part.pmatrix)  # [5, C, S, S]
                assert np.isfinite(pm).all()
                assert (pm >= 0).all(), "negative P-matrix entry"
                for b in range(5):
                    # matrix entries are the only signed floats printed
                    vals = [float(x) for x in
                            re.findall(r"[+-]\d+\.\d+", blocks[bi])]
                    want = np.array(vals).reshape(4, states, states)
                    ctx = f"states={states} block={bi} brlen={branch_lengths[b]}"
                    np.testing.assert_allclose(pm[b], want, atol=1e-9,
                                               err_msg=ctx)
                    bi += 1


def test_derivatives_grid_dna():
    """test/src/derivatives.c: logL + (d1, d2) across the full parameter
    grid at print precision (648 derivative evaluations)."""
    _run_derivatives_program(
        "derivatives.out", 4, DNA20_SEQS, maps.pll_map_nt,
        [0.3, 0.4, 0.1, 0.2], [1, 2.5, 1, 1, 2.5, 1])


def test_derivatives_grid_odd_states():
    """test/src/derivatives-oddstates.c: same grid, 5-state alphabet."""
    _run_derivatives_program(
        "derivatives-oddstates.out", 5, ODD5_SEQS, ODD5_MAP,
        [0.3, 0.25, 0.1, 0.2, 0.15],
        [1.452176, 0.937951, 0.462880, 0.617729, 1.745312, 0.937951,
         0.462880, 0.617729, 1.745312, 1.000000])
