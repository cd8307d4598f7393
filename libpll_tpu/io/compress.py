"""Site-pattern compression.

Capability parity with `pll_compress_site_patterns` (libpll
`src/compress.c:138-286`): duplicate alignment columns are collapsed into
unique patterns with multiplicities; the log-likelihood then weights each
pattern by its count. The reference sorts columns with a radix quicksort and
rewrites sequences in place; here the same result comes from a numpy
lexicographic unique. Pattern *order* is first-occurrence order (the
reference's order differs, but order only permutes per-site outputs — total
log-likelihoods are identical; tests compare against the oracle's weights as
multisets).
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from ..errors import EinvalError


def compress_site_patterns(sequences: List[str], charmap: np.ndarray,
                           ) -> Tuple[List[str], np.ndarray]:
    """Collapse duplicate columns.

    Args:
      sequences: equal-length strings (the alignment rows).
      charmap: 256-entry validity/state map; columns containing an illegal
        character (map value 0) raise.

    Returns:
      (compressed_sequences, pattern_weights int64 [n_patterns])
    """
    if not sequences:
        raise EinvalError("no sequences to compress")
    n = len(sequences[0])
    if any(len(s) != n for s in sequences):
        raise EinvalError("sequences must be equal length")

    mat = np.frombuffer("".join(sequences).encode("latin-1"),
                        dtype=np.uint8).reshape(len(sequences), n)

    # native C++ fast path (libpll_tpu.native.host.cpp); same result set and
    # first-occurrence order as the numpy fallback below
    from .. import native
    if native.available():
        try:
            kept_mat, weights = native.compress_patterns(mat, charmap)
        except ValueError as e:
            raise EinvalError(str(e)) from e
        out = [bytes(kept_mat[t]).decode("latin-1")
               for t in range(kept_mat.shape[0])]
        return out, weights.astype(np.int64)

    if np.any(np.asarray(charmap)[mat] == 0):
        raise EinvalError("illegal character in sequences")

    cols = mat.T.copy()  # [sites, taxa]
    _, first_idx, counts = np.unique(cols, axis=0, return_index=True,
                                     return_counts=True)
    # reorder unique patterns by first occurrence to keep output stable
    order = np.argsort(first_idx, kind="stable")
    weights = counts[order]
    kept = cols[np.sort(first_idx)]  # [n_patterns, taxa] in occurrence order

    out = ["".join(chr(c) for c in kept[:, t])
           for t in range(mat.shape[0])]
    return out, weights.astype(np.int64)
