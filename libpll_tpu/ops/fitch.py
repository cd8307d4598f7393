"""Bit-packed unweighted (Fitch) parsimony kernels.

Capability parity with libpll `src/fast_parsimony.c`:

  * parsimony-informative sites (≥2 states appearing ≥2×) are detected on
    the host; uninformative sites contribute ``singleton_states × weight``
    to a constant cost (`check_informative`, fast_parsimony.c:126-190);
  * informative sites are replicated by pattern weight and bit-packed into
    per-state uint32 vectors, pad bits set to 1 (`fill_parsimony_vectors`,
    fast_parsimony.c:192-360);
  * the Fitch step per 32-site word (`fast_parsimony.c:477-513`):
        union_j = OR_j (c1_j & c2_j)
        parent_j = (c1_j & c2_j) | (~union_j & (c1_j | c2_j))
        cost += popcount(~union_j)
  * edge score: popcount of the complement of OR_j(n1_j & n2_j) plus both
    accumulated node costs plus the constant cost.

On TPU the per-state uint32 words map directly onto VPU lanes —
``jax.lax.population_count`` + bitwise ops, vmapped over the operations of a
dependency level.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

BITS = 32


def set_informative(tip_masks: np.ndarray, states: int,
                    pattern_weights: np.ndarray):
    """Identify parsimony-informative sites.

    tip_masks: uint32 [tips, sites] state bitmasks.
    Returns (informative bool [sites], const_cost int).
    """
    tips, sites = tip_masks.shape
    informative = np.zeros(sites, dtype=bool)
    const_cost = 0
    for j in range(sites):
        counts = {}
        for i in range(tips):
            c = int(tip_masks[i, j])
            counts[c] = counts.get(c, 0) + 1
        multi = sum(1 for v in counts.values() if v > 1)
        single = sum(1 for v in counts.values() if v == 1)
        if multi > 1:
            informative[j] = True
        else:
            const_cost += single * int(pattern_weights[j])
    return informative, const_cost


def pack_vectors(tip_masks: np.ndarray, states: int,
                 informative: np.ndarray, pattern_weights: np.ndarray,
                 n_inner: int, pad_words: int = 8) -> np.ndarray:
    """Bit-pack informative sites (×weight) into uint32 state vectors.

    Returns uint32 [tips + n_inner, states, words]; tip rows filled, inner
    rows zero. Pad bits/words are all-ones (they never contribute cost).
    """
    tips, sites = tip_masks.shape
    bitcount = int(pattern_weights[informative].sum())
    words = (bitcount + BITS - 1) // BITS
    words = ((words + pad_words - 1) // pad_words) * pad_words
    words = max(words, pad_words)

    out = np.zeros((tips + n_inner, states, words), dtype=np.uint32)

    # site index replicated by weight, bit position assignment
    rep_sites = np.repeat(np.nonzero(informative)[0],
                          pattern_weights[informative].astype(int))
    bitpos = np.arange(rep_sites.size)
    word_idx = bitpos // BITS
    bit_in_word = (bitpos % BITS).astype(np.uint32)

    for i in range(tips):
        masks = tip_masks[i, rep_sites]  # [bits]
        for k in range(states):
            hasbit = ((masks >> k) & 1).astype(bool)
            np.add.at(out[i, k], word_idx[hasbit],
                      (np.uint32(1) << bit_in_word[hasbit]))
    # pad bits within the last used word + all padding words -> ones
    used = rep_sites.size
    if used % BITS:
        last = used // BITS
        padmask = np.uint32(0xFFFFFFFF) << np.uint32(used % BITS)
        out[:tips, :, last] |= padmask
        full_from = last + 1
    else:
        full_from = used // BITS
    out[:tips, :, full_from:] = 0xFFFFFFFF
    return out


@jax.jit
def fitch_update(vectors, costs, parent, child1, child2):
    """One batched Fitch step for a level of independent operations.

    vectors: uint32 [N, S, W]; costs: uint32 [N].
    parent/child1/child2: int32 [w] score indices.
    Returns updated (vectors, costs).
    """
    a = vectors[child1]  # [w, S, W]
    b = vectors[child2]
    land = a & b
    # OR-reduce over the (small, static) state axis
    union = land[:, 0]
    for k in range(1, land.shape[1]):
        union = union | land[:, k]
    newvec = land | (~union[:, None, :] & (a | b))
    inc = jnp.sum(jax.lax.population_count(~union), axis=1)  # [w]
    newcost = costs[child1] + costs[child2] + inc.astype(costs.dtype)
    vectors = vectors.at[parent].set(newvec)
    costs = costs.at[parent].set(newcost)
    return vectors, costs


@partial(jax.jit, donate_argnums=(0, 1))
def fitch_run_waves(vectors, costs, tables):
    """Execute dependency-ordered waves of Fitch updates in ONE compiled
    call: ``tables`` int32 [n_waves, width, 3] rows of (parent, child1,
    child2), padded by repeating ops/waves (recomputing a Fitch op is
    idempotent — parent vector and cost are pure functions of the
    children).  This is the schedule-as-data executor stepwise addition
    uses so each insertion costs one device call instead of one per
    dependency level (reference partial traversal: stepwise.c:241-323)."""
    def wave(carry, tab):
        vectors, costs = carry
        vectors, costs = fitch_update(vectors, costs, tab[:, 0],
                                      tab[:, 1], tab[:, 2])
        return (vectors, costs), None

    (vectors, costs), _ = jax.lax.scan(wave, (vectors, costs), tables)
    return vectors, costs


@jax.jit
def fitch_edge_score(vectors, costs, node1, node2):
    """Parsimony score of joining node1--node2 (without const_cost)."""
    a = vectors[node1]  # [S, W]
    b = vectors[node2]
    land = a & b
    union = land[0]
    for k in range(1, land.shape[0]):
        union = union | land[k]
    score = jnp.sum(jax.lax.population_count(~union), axis=-1)
    return score.astype(costs.dtype) + costs[node1] + costs[node2]


@jax.jit
def fitch_edge_scores_batch(vectors, costs, nodes1, nodes2):
    """Vectorized edge scores for many candidate edges at once — the
    batched-candidate upgrade over the reference's sequential edge loop
    (SURVEY §3.4)."""
    a = vectors[nodes1]  # [w, S, W]
    b = vectors[nodes2]
    land = a & b
    union = land[:, 0]
    for k in range(1, land.shape[1]):
        union = union | land[:, k]
    score = jnp.sum(jax.lax.population_count(~union), axis=1)
    return score.astype(costs.dtype) + costs[nodes1] + costs[nodes2]


@jax.jit
def fitch_insert_scores(vectors, costs, tipvec, u_idx, v_idx):
    """Scores of inserting a new tip on each candidate edge, batched.

    For edge (u, v) with directional subtree vectors V[u], V[v] and internal
    mutation counts C[u], C[v], splicing tip T onto the edge creates inner
    node X = fitch(V[u], T); the spliced tree's score is

        C[u] + C[v] + mut(V[u], T) + mut(X, V[v])

    (Fitch's count is rooting-invariant, so combining (V[u], T) first is
    exact.) This scores ALL candidate edges in one batched kernel — the
    reference instead re-runs a partial traversal per edge
    (stepwise.c:241-323).

    vectors: uint32 [D, S, W] directional vectors; costs: uint32 [D].
    tipvec: uint32 [S, W]. u_idx/v_idx: int32 [E].
    """
    a = vectors[u_idx]  # [E, S, W]
    b = vectors[v_idx]
    t = tipvec[None]  # [1, S, W]

    land1 = a & t
    union1 = land1[:, 0]
    for k in range(1, land1.shape[1]):
        union1 = union1 | land1[:, k]
    x = land1 | (~union1[:, None, :] & (a | t))
    mut1 = jnp.sum(jax.lax.population_count(~union1), axis=1)

    land2 = x & b
    union2 = land2[:, 0]
    for k in range(1, land2.shape[1]):
        union2 = union2 | land2[:, k]
    mut2 = jnp.sum(jax.lax.population_count(~union2), axis=1)

    return (costs[u_idx] + costs[v_idx]
            + mut1.astype(costs.dtype) + mut2.astype(costs.dtype))
