"""ctypes oracle: the reference C core compiled as a shared library.

Used only by tests to verify numerical parity on arbitrary inputs. The
library is built once (plain C99, no SIMD — the generic kernels are the
arch-independent reference the SIMD kernels are themselves validated against)
into the gitignored ``.refbuild/`` directory from the read-only sources in
``/root/reference``. Tests must skip when the oracle cannot be built.
"""

from __future__ import annotations

import ctypes as ct
import glob
import os
import subprocess

import numpy as np

REFERENCE_SRC = os.environ.get("LIBPLL_REFERENCE_SRC", "/root/reference/src")
BUILD_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".refbuild")
LIB_PATH = os.path.join(BUILD_DIR, "libpll_ref.so")

_lib = None


def available() -> bool:
    try:
        return get_lib() is not None
    except Exception:
        return False


def get_lib() -> ct.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(LIB_PATH):
        _build()
    _lib = ct.CDLL(LIB_PATH)
    _declare(_lib)
    return _lib


def _build() -> None:
    if not os.path.isdir(REFERENCE_SRC):
        raise RuntimeError(f"reference sources not found at {REFERENCE_SRC}")
    os.makedirs(BUILD_DIR, exist_ok=True)
    sources = [
        s
        for s in sorted(glob.glob(os.path.join(REFERENCE_SRC, "*.c")))
        if "_sse" not in s and "_avx" not in s
    ]
    sources.append(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "oracle_support.c"))
    cmd = (
        ["gcc", "-O2", "-g", "-fPIC", "-shared", "-D_GNU_SOURCE", "-o", LIB_PATH]
        + sources
        + ["-I", REFERENCE_SRC, "-lm"]
    )
    subprocess.run(cmd, check=True, capture_output=True)


def _declare(lib: ct.CDLL) -> None:
    u = ct.c_uint
    d = ct.c_double
    i = ct.c_int
    up = ct.POINTER(ct.c_uint)
    dp = ct.POINTER(ct.c_double)
    ip = ct.POINTER(ct.c_int)
    dpp = ct.POINTER(dp)
    vp = ct.c_void_p
    cp = ct.c_char_p

    lib.pll_partition_create.restype = vp
    lib.pll_partition_create.argtypes = [u, u, u, u, u, u, u, u, u]
    lib.pll_partition_destroy.argtypes = [vp]
    lib.pll_set_tip_states.restype = i
    lib.pll_set_tip_states.argtypes = [vp, u, up, cp]
    lib.pll_set_tip_clv.restype = i
    lib.pll_set_tip_clv.argtypes = [vp, u, dp, i]
    lib.pll_set_frequencies.argtypes = [vp, u, dp]
    lib.pll_set_subst_params.argtypes = [vp, u, dp]
    lib.pll_set_category_rates.argtypes = [vp, dp]
    lib.pll_set_category_weights.argtypes = [vp, dp]
    lib.pll_set_pattern_weights.argtypes = [vp, up]
    lib.pll_set_asc_bias_type.restype = i
    lib.pll_set_asc_bias_type.argtypes = [vp, i]
    lib.pll_set_asc_state_weights.argtypes = [vp, up]
    lib.pll_update_invariant_sites.restype = i
    lib.pll_update_invariant_sites.argtypes = [vp]
    lib.pll_update_invariant_sites_proportion.restype = i
    lib.pll_update_invariant_sites_proportion.argtypes = [vp, u, d]
    lib.pll_update_eigen.restype = i
    lib.pll_update_eigen.argtypes = [vp, u]
    lib.pll_update_prob_matrices.restype = i
    lib.pll_update_prob_matrices.argtypes = [vp, up, up, dp, u]
    lib.pll_update_partials.argtypes = [vp, vp, u]
    lib.pll_compute_root_loglikelihood.restype = d
    lib.pll_compute_root_loglikelihood.argtypes = [vp, u, i, up, dp]
    lib.pll_compute_edge_loglikelihood.restype = d
    lib.pll_compute_edge_loglikelihood.argtypes = [vp, u, i, u, i, u, up, dp]
    lib.pll_update_sumtable.restype = i
    lib.pll_update_sumtable.argtypes = [vp, u, u, i, i, up, dp]
    lib.pll_compute_likelihood_derivatives.restype = i
    lib.pll_compute_likelihood_derivatives.argtypes = [vp, i, i, d, up, dp, dp, dp]
    lib.pll_compute_gamma_cats.restype = i
    lib.pll_compute_gamma_cats.argtypes = [d, u, dp, i]
    lib.pll_compress_site_patterns.restype = up
    lib.pll_compress_site_patterns.argtypes = [ct.POINTER(cp), up, i, ip]
    lib.pll_random_r.restype = i
    lib.pll_initstate_r.restype = i
    lib.pll_srandom_r.restype = i


# pll_operation_t (reference pll.h:249-259)
class Operation(ct.Structure):
    _fields_ = [
        ("parent_clv_index", ct.c_uint),
        ("parent_scaler_index", ct.c_int),
        ("child1_clv_index", ct.c_uint),
        ("child1_matrix_index", ct.c_uint),
        ("child1_scaler_index", ct.c_int),
        ("child2_clv_index", ct.c_uint),
        ("child2_matrix_index", ct.c_uint),
        ("child2_scaler_index", ct.c_int),
    ]


# struct pll_random_data (reference pll.h:456-466)
class RandomData(ct.Structure):
    _fields_ = [
        ("fptr", ct.c_void_p),
        ("rptr", ct.c_void_p),
        ("state", ct.c_void_p),
        ("rand_type", ct.c_int),
        ("rand_deg", ct.c_int),
        ("rand_sep", ct.c_int),
        ("end_ptr", ct.c_void_p),
    ]


def map_table(name: str) -> np.ndarray:
    """Read one of the exported 256-entry character maps (e.g. 'pll_map_nt')."""
    lib = get_lib()
    arr = (ct.c_uint * 256).in_dll(lib, name)
    return np.array(arr, dtype=np.uint32)


def aa_table(name: str, count: int) -> np.ndarray:
    """Read an exported empirical AA model table (rates: 190, freqs: 20)."""
    lib = get_lib()
    arr = (ct.c_double * count).in_dll(lib, name)
    return np.array(arr, dtype=np.float64)


def as_double_p(a: np.ndarray):
    return a.ctypes.data_as(ct.POINTER(ct.c_double))


def as_uint_p(a: np.ndarray):
    return a.ctypes.data_as(ct.POINTER(ct.c_uint))


def as_int_p(a: np.ndarray):
    return a.ctypes.data_as(ct.POINTER(ct.c_int))


class RefPartition:
    """Thin convenience wrapper over the oracle's pll_partition_t."""

    # mirror of the struct layout in pll.h:202-244 (verified by tests that
    # read back known fields, e.g. states/sites round-trip).
    class _C(ct.Structure):
        _fields_ = [
            ("tips", ct.c_uint),
            ("clv_buffers", ct.c_uint),
            ("states", ct.c_uint),
            ("sites", ct.c_uint),
            ("pattern_weight_sum", ct.c_uint),
            ("rate_matrices", ct.c_uint),
            ("prob_matrices", ct.c_uint),
            ("rate_cats", ct.c_uint),
            ("scale_buffers", ct.c_uint),
            ("attributes", ct.c_uint),
            ("alignment", ct.c_size_t),
            ("states_padded", ct.c_uint),
            ("clv", ct.POINTER(ct.POINTER(ct.c_double))),
            ("pmatrix", ct.POINTER(ct.POINTER(ct.c_double))),
            ("rates", ct.POINTER(ct.c_double)),
            ("rate_weights", ct.POINTER(ct.c_double)),
            ("subst_params", ct.POINTER(ct.POINTER(ct.c_double))),
            ("scale_buffer", ct.POINTER(ct.POINTER(ct.c_uint))),
            ("frequencies", ct.POINTER(ct.POINTER(ct.c_double))),
            ("prop_invar", ct.POINTER(ct.c_double)),
            ("invariant", ct.POINTER(ct.c_int)),
            ("pattern_weights", ct.POINTER(ct.c_uint)),
            ("eigen_decomp_valid", ct.POINTER(ct.c_int)),
            ("eigenvecs", ct.POINTER(ct.POINTER(ct.c_double))),
            ("inv_eigenvecs", ct.POINTER(ct.POINTER(ct.c_double))),
            ("eigenvals", ct.POINTER(ct.POINTER(ct.c_double))),
            ("maxstates", ct.c_uint),
            ("tipchars", ct.POINTER(ct.POINTER(ct.c_ubyte))),
            ("charmap", ct.POINTER(ct.c_ubyte)),
            ("ttlookup", ct.POINTER(ct.c_double)),
            ("tipmap", ct.POINTER(ct.c_uint)),
            ("asc_bias_alloc", ct.c_int),
        ]

    @property
    def sites_alloc(self) -> int:
        return self.c.sites + (self.c.states if self.c.asc_bias_alloc else 0)

    def __init__(self, tips, clv_buffers, states, sites, rate_matrices,
                 prob_matrices, rate_cats, scale_buffers, attributes=0):
        self.lib = get_lib()
        self.ptr = self.lib.pll_partition_create(
            tips, clv_buffers, states, sites, rate_matrices, prob_matrices,
            rate_cats, scale_buffers, attributes)
        if not self.ptr:
            raise RuntimeError("pll_partition_create failed")
        self.c = ct.cast(self.ptr, ct.POINTER(self._C)).contents

    def __del__(self):
        try:
            if self.ptr:
                self.lib.pll_partition_destroy(self.ptr)
        except Exception:
            pass

    # --- setters -------------------------------------------------------
    def set_tip_states(self, idx, charmap: np.ndarray, seq: str):
        cm = np.ascontiguousarray(charmap, dtype=np.uint32)
        rc = self.lib.pll_set_tip_states(self.ptr, idx, as_uint_p(cm), seq.encode())
        assert rc == 1, "pll_set_tip_states failed"

    def set_frequencies(self, idx, freqs):
        f = np.ascontiguousarray(freqs, dtype=np.float64)
        self.lib.pll_set_frequencies(self.ptr, idx, as_double_p(f))

    def set_subst_params(self, idx, params):
        p = np.ascontiguousarray(params, dtype=np.float64)
        self.lib.pll_set_subst_params(self.ptr, idx, as_double_p(p))

    def set_category_rates(self, rates):
        r = np.ascontiguousarray(rates, dtype=np.float64)
        self.lib.pll_set_category_rates(self.ptr, as_double_p(r))

    def set_category_weights(self, w):
        w = np.ascontiguousarray(w, dtype=np.float64)
        self.lib.pll_set_category_weights(self.ptr, as_double_p(w))

    def set_pattern_weights(self, w):
        w = np.ascontiguousarray(w, dtype=np.uint32)
        self.lib.pll_set_pattern_weights(self.ptr, as_uint_p(w))

    def set_invariant_proportion(self, idx, pinv):
        rc = self.lib.pll_update_invariant_sites_proportion(self.ptr, idx, pinv)
        assert rc == 1

    def update_invariant_sites(self):
        rc = self.lib.pll_update_invariant_sites(self.ptr)
        assert rc == 1

    def set_asc_bias_type(self, t):
        rc = self.lib.pll_set_asc_bias_type(self.ptr, t)
        assert rc == 1

    def set_asc_state_weights(self, w):
        w = np.ascontiguousarray(w, dtype=np.uint32)
        self.lib.pll_set_asc_state_weights(self.ptr, as_uint_p(w))

    # --- compute -------------------------------------------------------
    def update_prob_matrices(self, params_indices, matrix_indices, branch_lengths):
        pi = np.ascontiguousarray(params_indices, dtype=np.uint32)
        mi = np.ascontiguousarray(matrix_indices, dtype=np.uint32)
        bl = np.ascontiguousarray(branch_lengths, dtype=np.float64)
        rc = self.lib.pll_update_prob_matrices(
            self.ptr, as_uint_p(pi), as_uint_p(mi), as_double_p(bl), len(bl))
        assert rc == 1

    def update_partials(self, ops):
        arr = (Operation * len(ops))()
        for k, op in enumerate(ops):
            (arr[k].parent_clv_index, arr[k].parent_scaler_index,
             arr[k].child1_clv_index, arr[k].child1_matrix_index,
             arr[k].child1_scaler_index, arr[k].child2_clv_index,
             arr[k].child2_matrix_index, arr[k].child2_scaler_index) = op
        self.lib.pll_update_partials(self.ptr, arr, len(ops))

    def root_loglikelihood(self, clv_index, scaler_index, freqs_indices,
                           persite=False):
        fi = np.ascontiguousarray(freqs_indices, dtype=np.uint32)
        ps = np.zeros(self.c.sites, dtype=np.float64) if persite else None
        logl = self.lib.pll_compute_root_loglikelihood(
            self.ptr, clv_index, scaler_index, as_uint_p(fi),
            as_double_p(ps) if persite else None)
        return (logl, ps) if persite else logl

    def edge_loglikelihood(self, parent_clv, parent_scaler, child_clv,
                           child_scaler, matrix_index, freqs_indices,
                           persite=False):
        fi = np.ascontiguousarray(freqs_indices, dtype=np.uint32)
        ps = np.zeros(self.c.sites, dtype=np.float64) if persite else None
        logl = self.lib.pll_compute_edge_loglikelihood(
            self.ptr, parent_clv, parent_scaler, child_clv, child_scaler,
            matrix_index, as_uint_p(fi), as_double_p(ps) if persite else None)
        return (logl, ps) if persite else logl

    def sumtable(self, parent_clv, child_clv, parent_scaler, child_scaler,
                 params_indices):
        pi = np.ascontiguousarray(params_indices, dtype=np.uint32)
        n = (self.sites_alloc) * self.c.rate_cats * self.c.states_padded
        out = np.zeros(n, dtype=np.float64)
        rc = self.lib.pll_update_sumtable(
            self.ptr, parent_clv, child_clv, parent_scaler, child_scaler,
            as_uint_p(pi), as_double_p(out))
        assert rc == 1
        return out

    def likelihood_derivatives(self, parent_scaler, child_scaler, branch_length,
                               params_indices, sumtable):
        pi = np.ascontiguousarray(params_indices, dtype=np.uint32)
        d1 = ct.c_double()
        d2 = ct.c_double()
        rc = self.lib.pll_compute_likelihood_derivatives(
            self.ptr, parent_scaler, child_scaler, branch_length,
            as_uint_p(pi), as_double_p(sumtable), ct.byref(d1), ct.byref(d2))
        assert rc == 1
        return d1.value, d2.value

    # --- state readback --------------------------------------------------
    def get_clv(self, idx) -> np.ndarray:
        n = self.sites_alloc * self.c.rate_cats * self.c.states_padded
        buf = np.ctypeslib.as_array(self.c.clv[idx], shape=(n,))
        return buf.reshape(self.sites_alloc, self.c.rate_cats,
                           self.c.states_padded).copy()

    def get_pmatrix(self, idx) -> np.ndarray:
        n = self.c.rate_cats * self.c.states * self.c.states_padded
        buf = np.ctypeslib.as_array(self.c.pmatrix[idx], shape=(n,))
        return buf.reshape(self.c.rate_cats, self.c.states,
                           self.c.states_padded).copy()

    def get_scaler(self, idx) -> np.ndarray:
        size = self.sites_alloc
        # per-rate scalers: sites_alloc * rate_cats
        if self.c.attributes & (1 << 9):  # PLL_ATTRIB_RATE_SCALERS
            size = self.sites_alloc * self.c.rate_cats
        buf = np.ctypeslib.as_array(self.c.scale_buffer[idx], shape=(size,))
        return buf.astype(np.int64).copy()

    def get_eigen(self, idx):
        s, sp = self.c.states, self.c.states_padded
        ev = np.ctypeslib.as_array(self.c.eigenvals[idx], shape=(sp,)).copy()[:s]
        V = np.ctypeslib.as_array(self.c.eigenvecs[idx], shape=(sp * sp,)).copy()
        iV = np.ctypeslib.as_array(self.c.inv_eigenvecs[idx], shape=(sp * sp,)).copy()
        return ev, V.reshape(sp, sp)[:s, :s], iV.reshape(sp, sp)[:s, :s]

    def get_invariant(self) -> np.ndarray:
        if not self.c.invariant:
            return None
        return np.ctypeslib.as_array(self.c.invariant,
                                     shape=(self.sites_alloc,)).copy()
