#!/usr/bin/env python3
"""Measure the reference's AVX2 single-core CLV-update throughput — the
`vs_baseline` denominator of bench.py — at the SAME site count as the
flagship TPU config (BASELINE.md round-1 used 50k sites; the verdict asked
for an aligned denominator).

Builds an AVX2-enabled shared lib from /root/reference/src (SIMD files get
their arch flags, mirroring src/Makefile.am), creates a 64-taxon caterpillar
ops schedule over `sites` random DNA sites with Γ4 and per-site scaling
(float64 — the reference has no other precision), and times
pll_update_partials over the 62-op schedule.

With ``states=20`` the same harness measures the protein denominator: the
reference's dedicated 20-state AVX2 kernels
(`src/core_partials_avx2.c:pll_core_update_partial_ii_20x20_avx2`, decls
`pll.h:1239-1264`) under the LG model (`pll_aa_rates_lg`/`pll_aa_freqs_lg`).

Usage: python scripts/bench_reference.py [sites] [reps] [states] [tips]
"""

import ctypes as ct
import glob
import os
import subprocess
import sys
import time

import numpy as np

SITES = int(sys.argv[1]) if len(sys.argv) > 1 else 262144
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 5
STATES = int(sys.argv[3]) if len(sys.argv) > 3 else 4
TIPS = int(sys.argv[4]) if len(sys.argv) > 4 else 64
CATS = 4
REF = "/root/reference/src"
BUILD = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".refbuild")
LIB = os.path.join(BUILD, "libpll_avx2.so")

PLL_ATTRIB_ARCH_AVX2 = 1 << 3  # pll.h PLL_ATTRIB_ARCH_AVX2
SCALE_BUFFER_NONE = ct.c_uint(-1).value  # PLL_SCALE_BUFFER_NONE


def build():
    if os.path.exists(LIB):
        return
    os.makedirs(BUILD, exist_ok=True)
    objs = []
    shim = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "oracle_support.c")
    for src in sorted(glob.glob(os.path.join(REF, "*.c"))) + [shim]:
        base = os.path.basename(src)
        flags = ["-O3", "-fPIC", "-D_GNU_SOURCE", "-DHAVE_SSE3",
                 "-DHAVE_AVX", "-DHAVE_AVX2", "-DHAVE_X86INTRIN_H"]
        if "_avx2" in base:
            flags += ["-mavx2", "-mfma"]
        elif "_avx" in base:
            flags += ["-mavx"]
        elif "_sse" in base:
            flags += ["-msse3"]
        obj = os.path.join(BUILD, base.replace(".c", ".o"))
        subprocess.run(["gcc", "-c", src, "-o", obj, "-I", REF] + flags,
                       check=True, capture_output=True)
        objs.append(obj)
    subprocess.run(["gcc", "-shared", "-o", LIB] + objs + ["-lm"],
                   check=True, capture_output=True)


def main():
    build()
    lib = ct.CDLL(LIB)
    lib.pll_partition_create.restype = ct.c_void_p
    lib.pll_partition_create.argtypes = [ct.c_uint] * 8 + [ct.c_uint]
    lib.pll_set_tip_states.argtypes = [ct.c_void_p, ct.c_uint,
                                       ct.POINTER(ct.c_uint), ct.c_char_p]
    lib.pll_set_frequencies.argtypes = [ct.c_void_p, ct.c_uint,
                                        ct.POINTER(ct.c_double)]
    lib.pll_set_subst_params.argtypes = [ct.c_void_p, ct.c_uint,
                                         ct.POINTER(ct.c_double)]
    lib.pll_set_category_rates.argtypes = [ct.c_void_p,
                                           ct.POINTER(ct.c_double)]
    lib.pll_compute_gamma_cats.argtypes = [ct.c_double, ct.c_uint,
                                           ct.POINTER(ct.c_double), ct.c_int]
    lib.pll_update_prob_matrices.argtypes = [
        ct.c_void_p, ct.POINTER(ct.c_uint), ct.POINTER(ct.c_uint),
        ct.POINTER(ct.c_double), ct.c_uint]
    lib.pll_update_partials.argtypes = [ct.c_void_p, ct.c_void_p, ct.c_uint]
    lib.pll_compute_edge_loglikelihood.restype = ct.c_double
    lib.pll_compute_edge_loglikelihood.argtypes = [
        ct.c_void_p, ct.c_uint, ct.c_uint, ct.c_uint, ct.c_uint, ct.c_uint,
        ct.POINTER(ct.c_uint), ct.POINTER(ct.c_double)]
    charmap = (ct.c_uint * 256).in_dll(
        lib, "pll_map_nt" if STATES == 4 else "pll_map_aa")

    part = lib.pll_partition_create(TIPS, TIPS - 2, STATES, SITES, 1,
                                    2 * TIPS - 3, CATS, TIPS - 2,
                                    PLL_ATTRIB_ARCH_AVX2)
    assert part, "partition create failed (AVX2 unsupported?)"

    rng = np.random.default_rng(0)
    letters = b"ACGT" if STATES == 4 else b"ARNDCQEGHILKMFPSTWYV"
    alpha = np.frombuffer(letters, np.uint8)
    for i in range(TIPS):
        seq = alpha[rng.integers(0, STATES, SITES)].tobytes()
        assert lib.pll_set_tip_states(part, i, charmap, seq)

    if STATES == 4:
        freqs = (ct.c_double * 4)(0.3, 0.25, 0.25, 0.2)
        subst = (ct.c_double * 6)(1.2, 2.4, 0.9, 1.1, 3.0, 1.0)
    else:  # LG (the reference's own published tables)
        freqs = (ct.c_double * 20).in_dll(lib, "pll_aa_freqs_lg")
        subst = (ct.c_double * 190).in_dll(lib, "pll_aa_rates_lg")
    lib.pll_set_frequencies(part, 0, freqs)
    lib.pll_set_subst_params(part, 0, subst)
    rates = (ct.c_double * CATS)()
    lib.pll_compute_gamma_cats(1.0, CATS, rates, 0)
    lib.pll_set_category_rates(part, rates)

    n_br = 2 * TIPS - 3
    midx = (ct.c_uint * n_br)(*range(n_br))
    blens = (ct.c_double * n_br)(*rng.uniform(0.05, 0.5, n_br))
    pidx = (ct.c_uint * CATS)(*([0] * CATS))
    lib.pll_update_prob_matrices(part, pidx, midx, blens, n_br)

    # caterpillar ops: inner k combines (tip k+1 or prev inner) like the
    # flagship topology shape; ops struct = 8 uints (pll_operation_t)
    class Op(ct.Structure):
        _fields_ = [(n, ct.c_uint) for n in
                    ("parent", "pscal", "c1", "m1", "s1", "c2", "m2", "s2")]

    ops = (Op * (TIPS - 2))()
    prev = 0
    for k in range(TIPS - 2):
        parent = TIPS + k
        ops[k] = Op(parent, k, prev, prev, SCALE_BUFFER_NONE if prev < TIPS
                    else k - 1, k + 1, k + 1, SCALE_BUFFER_NONE)
        prev = parent

    lib.pll_update_partials(part, ops, TIPS - 2)  # warm caches
    t0 = time.perf_counter()
    for _ in range(REPS):
        lib.pll_update_partials(part, ops, TIPS - 2)
    dt = (time.perf_counter() - t0) / REPS
    updates = (TIPS - 2) * CATS * SITES
    print(f"reference AVX2 1-core: {TIPS} taxa x {SITES} sites x {CATS} "
          f"cats x {STATES} states, per-site scaling")
    print(f"  update_partials: {dt * 1e3:.1f} ms  "
          f"({updates / dt / 1e6:.1f}e6 CLV site-rate updates/s)")

    logl = lib.pll_compute_edge_loglikelihood(
        part, TIPS + TIPS - 3, TIPS - 3, TIPS - 1, SCALE_BUFFER_NONE,
        TIPS - 1, pidx, None)
    t0 = time.perf_counter()
    for _ in range(REPS):
        lib.pll_update_partials(part, ops, TIPS - 2)
        logl = lib.pll_compute_edge_loglikelihood(
            part, TIPS + TIPS - 3, TIPS - 3, TIPS - 1, SCALE_BUFFER_NONE,
            TIPS - 1, pidx, None)
    dt_full = (time.perf_counter() - t0) / REPS
    print(f"  full-tree eval (partials+edge logL): {dt_full * 1e3:.1f} ms  "
          f"logL={logl:.4f}")


if __name__ == "__main__":
    main()
