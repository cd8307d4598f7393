"""Numeric constants shared across the engine.

Matches the scaling/tolerance regime of the reference implementation
(libpll `src/pll.h:89-99`): conditional-likelihood entries are rescaled by
2**256 whenever an entire site (or site×rate) block drops below 2**-256, and
the accumulated exponent counters are folded back at log-likelihood time.
"""

from __future__ import annotations

# 2**256, exactly representable in binary floating point.
SCALE_FACTOR = float(2**256)
SCALE_THRESHOLD = 1.0 / SCALE_FACTOR

# sqrt variants (2**128), used by pattern-tip kernels in the reference.
SCALE_FACTOR_SQRT = float(2**128)
SCALE_THRESHOLD_SQRT = 1.0 / SCALE_FACTOR_SQRT

# Maximum per-rate scaler difference folded back multiplicatively when
# per-rate scalers are enabled (reference: PLL_SCALE_RATE_MAXDIFF).
SCALE_RATE_MAXDIFF = 4

# Generic epsilon used e.g. to decide whether prop_invar is "zero"
# (reference: PLL_MISC_EPSILON).
MISC_EPSILON = 1e-8

# Minimum admissible Gamma shape parameter (reference: gamma.c ALPHA_MIN).
ALPHA_MIN = 0.02

# Gamma rate discretization modes (reference: PLL_GAMMA_RATES_*).
GAMMA_RATES_MEAN = 0
GAMMA_RATES_MEDIAN = 1

# Scaler sentinel: "this node has no scale buffer".
SCALE_BUFFER_NONE = -1

# Scaling modes for partial updates.
SCALE_NONE = 0
SCALE_PER_SITE = 1
SCALE_PER_RATE = 2


def scale_shift_bits(dtype) -> int:
    """Exponent shift of one scaling event for the working dtype.

    float64 uses the reference's 2**256 (pll.h:89); float32 has only 8
    exponent bits, so the fast path rescales by 2**32 — the counter
    semantics are identical, only the unit differs, and the fold-back uses
    the matching log factor.  2**32 (not 2**64) keeps ~2**94 of headroom
    between the scaling trigger and denormal death, which deep trees need:
    per-site scaling only fires when *every* state×rate entry of a site is
    below the threshold, so the within-site spread (slow Γ rates decay much
    slower than fast ones) eats the gap (the same pressure that motivates
    the reference's per-rate scalers for >10k-taxon trees, ChangeLog.md).
    """
    import numpy as np

    return 256 if np.dtype(dtype).itemsize == 8 else 32
