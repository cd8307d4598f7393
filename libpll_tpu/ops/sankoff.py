"""Weighted (Sankoff) parsimony: per-site per-state minimum-cost dynamic
programming with an arbitrary score matrix.

Capability parity with libpll `src/parsimony.c:190-380`:

    S_parent[n] = min_k (S_c1[k] + cost[k,n]) + min_k (S_c2[k] + cost[k,n])

a min-plus "matmul" over states, vmapped over sites (layout [B, S, L] with
sites on the lane axis); the tree score is Σ_sites min_state, and ancestral
states are reconstructed pre-order with the reference's parent-tiebreak rule
(keep the parent's state unless this node's minimum is strictly better than
``parent_value - 1``).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def sankoff_update(sbuffer, score_matrix, parent, child1, child2):
    """One batched level of Sankoff DP steps.

    sbuffer: [B, S, L]; score_matrix: [S, S] (cost[k, n]).
    parent/child1/child2: int32 [w] score-buffer indices.
    """
    c1 = sbuffer[child1]  # [w, S, L]
    c2 = sbuffer[child2]
    # min over k of (child[k] + cost[k, n]) -> [w, n, L]
    m1 = jnp.min(c1[:, :, None, :] + score_matrix[None, :, :, None], axis=1)
    m2 = jnp.min(c2[:, :, None, :] + score_matrix[None, :, :, None], axis=1)
    return sbuffer.at[parent].set(m1 + m2)


@jax.jit
def sankoff_score(sbuffer, index):
    """Σ_sites min_state S[index] (reference pll_parsimony_score,
    parsimony.c:283-304 — unweighted by design)."""
    return jnp.sum(jnp.min(sbuffer[index], axis=0))


def sankoff_reconstruct(sbuffer_np: np.ndarray, recops, states: int,
                        charmap: np.ndarray) -> dict:
    """Pre-order ancestral state reconstruction
    (reference pll_parsimony_reconstruct, parsimony.c:306-380).

    recops: list of (node_score_index, parent_score_index); the first row's
    parent index is ignored (subtree root). Returns {score_index: bytes}.
    """
    # reverse map: state index -> representative character; the reference
    # keeps the LAST single-bit character in map order (parsimony.c:317-323)
    revmap = {}
    for ch in range(256):
        m = int(charmap[ch])
        if m and (m & (m - 1)) == 0:
            revmap[m.bit_length() - 1] = ch

    out = {}
    node, _ = recops[0]
    minidx = np.argmin(sbuffer_np[node], axis=0)  # [L]
    out[node] = np.array([revmap[int(k)] for k in minidx], dtype=np.uint8)

    state_of_char = {v: k for k, v in revmap.items()}
    for node, parent in recops[1:]:
        s = sbuffer_np[node]  # [S, L]
        minidx = np.argmin(s, axis=0)
        minval = s[minidx, np.arange(s.shape[1])]
        parent_chars = out[parent]
        parent_states = np.array([state_of_char.get(int(c), 0)
                                  for c in parent_chars])
        parent_val = sbuffer_np[parent][parent_states,
                                        np.arange(s.shape[1])]
        keep_parent = minval + 1 > parent_val
        chars = np.array([revmap[int(k)] for k in minidx], dtype=np.uint8)
        out[node] = np.where(keep_parent, parent_chars, chars)
    return out
