"""Auxiliary-subsystem tests: SVG export, debug printers, checkpoint/resume
(reference: utree_svg.c, output.c; SURVEY §5.4 for the snapshot design)."""

import io
import os

import numpy as np
import pytest

import libpll_tpu as pll
from libpll_tpu.engine.checkpoint import (load_checkpoint, restore_partition,
                                          save_checkpoint)
from libpll_tpu.tree import utree as ut
from libpll_tpu.tree.svg import SvgAttrib, export_svg, export_svg_file
from libpll_tpu.utils.output import show_clv, show_pmatrix

NEWICK = "((A:0.1,B:0.2):0.3,(C:0.4,D:0.5):0.6,E:0.7);"
SEQS = {"A": "ACGTACGTAC", "B": "ACGTACGTTC", "C": "ACGAACGTAC",
        "D": "CCGTACGTAC", "E": "ACGTACGGAC"}


def _setup_partition():
    tree = ut.parse_newick_string(NEWICK)
    trav = ut.traverse(tree.root)
    ops, blens, midx = ut.create_operations(trav)
    part = pll.Partition(5, 3, 4, 10, 1, 7, 4, 3)
    order = {n.label: n.clv_index for n in trav if n.label}
    for lab in sorted(SEQS):
        part.set_tip_states(order[lab], pll.maps.pll_map_nt, SEQS[lab])
    part.set_frequencies(0, [0.3, 0.25, 0.25, 0.2])
    part.set_subst_params(0, [1, 2, 1, 1, 2, 1])
    part.set_category_rates(pll.compute_gamma_cats(0.8, 4))
    part.update_prob_matrices([0] * 4, midx, blens)
    part.update_partials(ops)
    return tree, part, (ops, blens, midx)


def test_svg_export_structure():
    tree = ut.parse_newick_string(NEWICK)
    svg = export_svg(tree)
    assert svg.startswith("<svg xmlns=")
    assert svg.rstrip().endswith("</svg>")
    # one label per tip + one legend label
    assert svg.count("<text") == tree.tip_count + 1
    # legend off drops one text and one line
    svg2 = export_svg(tree, attr=SvgAttrib(legend_show=False))
    assert svg2.count("<text") == tree.tip_count


def test_svg_export_file(tmp_path):
    tree = ut.parse_newick_string(NEWICK)
    path = os.fspath(tmp_path / "tree.svg")
    export_svg_file(tree, path)
    with open(path) as fh:
        assert fh.read() == export_svg(tree)


def test_show_pmatrix_format():
    _, part, _ = _setup_partition()
    buf = io.StringIO()
    show_pmatrix(part, 0, 4, out=buf)
    text = buf.getvalue()
    # rate_cats blocks of states rows, each with states entries
    blocks = [b for b in text.split("\n\n") if b.strip()]
    assert len(blocks) == part.rate_cats
    row = blocks[0].splitlines()[0]
    assert row.count(".") == part.states
    assert row.lstrip().startswith(("+", "-"))


def test_show_clv_format_and_unscaling():
    _, part, _ = _setup_partition()
    buf = io.StringIO()
    root = 7  # an inner CLV
    show_clv(part, root, 2, 4, out=buf)
    text = buf.getvalue()
    assert text.startswith("[ {(") and text.rstrip().endswith("]")
    assert text.count("{") == part.sites
    # values are plain probabilities in [0, 1] after unscaling
    first = float(text.split("(")[1].split(",")[0])
    assert 0.0 <= first <= 1.0


def test_checkpoint_roundtrip(tmp_path):
    tree, part, (ops, blens, midx) = _setup_partition()
    root = tree.root
    logl = part.compute_edge_loglikelihood(
        root.clv_index, root.scaler_index, root.back.clv_index,
        root.back.scaler_index, root.pmatrix_index, [0] * 4)

    path = os.fspath(tmp_path / "snap.npz")
    save_checkpoint(path, ut.export_newick(root), part,
                    rng_state=np.arange(4), extra={"note": "test"})
    header, arrays = load_checkpoint(path)
    assert header["extra"]["note"] == "test"
    assert np.array_equal(arrays["rng_state"], np.arange(4))

    # rebuild: same newick -> same schedule -> same logL
    tree2 = ut.parse_newick_string(header["newick"])
    trav2 = ut.traverse(tree2.root)
    ops2, blens2, midx2 = ut.create_operations(trav2)
    part2 = restore_partition(header, arrays)
    order = {n.label: n.clv_index for n in trav2 if n.label}
    for lab in sorted(SEQS):
        part2.set_tip_states(order[lab], pll.maps.pll_map_nt, SEQS[lab])
    part2.update_prob_matrices([0] * 4, midx2, blens2)
    part2.update_partials(ops2)
    r2 = tree2.root
    logl2 = part2.compute_edge_loglikelihood(
        r2.clv_index, r2.scaler_index, r2.back.clv_index,
        r2.back.scaler_index, r2.pmatrix_index, [0] * 4)
    assert abs(logl - logl2) < 1e-9


def test_checkpoint_version_guard(tmp_path):
    import json
    path = os.fspath(tmp_path / "bad.npz")
    hdr = np.frombuffer(json.dumps({"version": 999}).encode(), dtype=np.uint8)
    np.savez(path, header=hdr)
    with pytest.raises(ValueError, match="version"):
        load_checkpoint(path)


def test_fasta_streaming_interface(tmp_path):
    """Streaming getnext/rewind/getfilesize/getfilepos/close semantics
    (reference pll_fasta_* family, src/pll.h:666-681)."""
    from libpll_tpu.errors import FileError
    from libpll_tpu.io.fasta import FastaReader

    p = tmp_path / "s.fas"
    p.write_bytes(b">s1\nACGT\nACGT\n\n>s2\nTTTT\n")
    r = FastaReader(str(p))
    assert r.getfilepos() == 0
    assert r.getfilesize() == 24
    rec = r.getnext()
    assert (rec.header, rec.sequence, rec.seqno) == ("s1", "ACGTACGT", 0)
    assert 0 < r.getfilepos() <= r.getfilesize()
    rec2 = r.getnext()
    assert (rec2.header, rec2.sequence, rec2.seqno) == ("s2", "TTTT", 1)
    assert r.getnext() is None
    assert r.getfilepos() == r.getfilesize()
    r.rewind()
    assert r.getnext().header == "s1"
    assert [x.header for x in r] == ["s1", "s2"]
    r.close()
    import pytest as _pytest
    with _pytest.raises(FileError):
        r.getnext()


def test_rtree_show_ascii():
    from libpll_tpu.tree import rtree as rt

    t = rt.parse_newick_string(
        "((A:0.1,B:0.2):0.3,(C:0.1,(D:0.2,E:0.1):0.2):0.4)root;")
    text = rt.show_ascii(t.root)
    for lab in "ABCDE":
        assert lab + ":" in text
    assert text.splitlines()[0] == "root"


def test_staged_tip_flush_interleaving():
    """Tip rows stage host-side and flush in one scatter at the next clv
    read; interleaved set/read/set/read must behave exactly like the old
    per-tip immediate scatter."""
    import numpy as np
    import libpll_tpu as pll
    from libpll_tpu.io import maps

    part = pll.Partition(4, 2, 4, 8, 1, 5, 2, 2)
    part.set_tip_states(0, maps.pll_map_nt, "ACGTACGT")
    clv1 = np.asarray(part.clv)  # flushes tip 0
    assert clv1[0, 0, 0, 0] == 1.0 and clv1[0, 0, 1, 0] == 0.0
    assert clv1[1].sum() == 0  # tip 1 untouched

    part.set_tip_states(1, maps.pll_map_nt, "TTTTTTTT")
    part.set_tip_states(0, maps.pll_map_nt, "CCCCCCCC")  # overwrite tip 0
    clv2 = np.asarray(part.clv)
    assert clv2[0, 0, 1, 0] == 1.0 and clv2[0, 0, 0, 0] == 0.0
    assert clv2[1, 1, 3, 7] == 1.0
    # ambiguity code: N decodes to all-ones
    part.set_tip_states(2, maps.pll_map_nt, "NNNNNNNN")
    assert np.asarray(part.clv)[2].min() == 1.0
