"""Randomized stepwise-addition parsimony tree construction.

Capability parity with `pll_fastparsimony_stepwise` (libpll
`src/stepwise.c:337-546`): taxa are shuffled with the bit-exact re-entrant
RNG (seed 0 = no shuffle), a 3-taxon star is grown by greedily inserting each
next taxon at the edge minimizing the Fitch parsimony score, and the final
score includes the uninformative-site constant cost.

TPU-first redesign of the inner loop: instead of the reference's sequential
re-scoring of every candidate edge via partial traversals (O(n) traversals
per insertion), each insertion computes *directional* Fitch vectors for every
edge direction in O(n) batched level kernels and then scores ALL candidate
edges in a single device call (`fitch_insert_scores`). Supports multiple
partitions by summing their per-edge score vectors before the argmin
(reference stepwise.c:288-297).

Tie-breaking matches the reference exactly: candidate edges are enumerated
in the same order the reference maintains its edge list (the three star
edges, then the two edges created by each insertion appended at the end,
stepwise.c:491-520) and the first minimum wins — so the same seed produces
the same topology and score.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..ops import fitch
from ..tree.utree import UNode, UTree, reset_template_indices, wraptree
from ..utils.rng import shuffled_order
from .parsimony import FastParsimony


def _make_star(labels, tips) -> UNode:
    """3-taxon star; returns the center's first ring node. Tip nodes carry
    their original taxon index in ``.data`` (the packed-vector row)."""
    t = []
    for i in tips:
        node = UNode(labels[i], 0.0)
        node.data = i
        t.append(node)
    r = [UNode(None, 0.0) for _ in range(3)]
    r[0].next, r[1].next, r[2].next = r[1], r[2], r[0]
    for ri, ti in zip(r, t):
        ri.back, ti.back = ti, ri
    return r[0]


def _waves(pending, ready, n_dirs):
    """Order dependent direction-computations into batched waves."""
    ready = set(ready)
    remaining = list(pending)
    waves = []
    while remaining:
        wave = [op for op in remaining if op[1] in ready and op[2] in ready]
        if not wave:
            raise RuntimeError("cyclic direction dependencies (corrupt tree)")
        waves.append(wave)
        for op in wave:
            ready.add(op[0])
        remaining = [op for op in remaining if op not in wave]
    return waves


class StepwiseBuilder:
    """Grows a tree by stepwise addition over one or more FastParsimony
    partitions (all must share the same taxon set)."""

    def __init__(self, partitions: Sequence[FastParsimony],
                 labels: Sequence[str]):
        self.partitions = list(partitions)
        self.labels = list(labels)
        self.tips = partitions[0].tips
        for p in partitions:
            if p.tips != self.tips:
                raise ValueError("partitions disagree on taxon count")

    def build(self, seed: int) -> Tuple[UTree, int]:
        order = shuffled_order(self.tips, seed)
        center = _make_star(self.labels, order[:3])
        # candidate edges in the reference's enumeration order: the three
        # star edges first, then the two edges created by each insertion
        # appended at the end (stepwise.c:491-520); first minimum wins —
        # this makes tie-breaking (and hence the resulting topology)
        # identical to the reference.
        edge_list = [center, center.next, center.next.next]

        for next_tip in order[3:]:
            edges = [(u, u.back) for u in edge_list]
            dirs = [x for u, v in edges for x in (u, v)]
            index_of = {id(u): k for k, u in enumerate(dirs)}
            n_dirs = len(dirs)

            # topological schedule: direction u is an inner-direction whose
            # inputs are the other two ring members' backs
            pending = []
            for k, u in enumerate(dirs):
                v = u  # direction record is about the subtree at u's side
                if u.next is None:
                    continue
                pending.append((k, index_of[id(u.next.back)],
                                index_of[id(u.next.next.back)]))

            total_scores = None
            tip_rows = [k for k, u in enumerate(dirs) if u.next is None]
            tip_ids = [dirs[k].data for k in tip_rows]
            for part in self.partitions:
                vecs = jnp.zeros((n_dirs,) + part.vectors.shape[1:],
                                 dtype=jnp.uint32)
                costs = jnp.zeros((n_dirs,), dtype=jnp.uint32)
                # tips: copy packed tip vectors into their direction slots
                vecs = vecs.at[jnp.asarray(tip_rows)].set(
                    part.vectors[jnp.asarray(tip_ids)])

                # resolve dependencies in waves of batched kernels
                levels = _waves(pending, set(tip_rows), n_dirs)
                for lv in levels:
                    p = jnp.asarray([o[0] for o in lv], dtype=jnp.int32)
                    c1 = jnp.asarray([o[1] for o in lv], dtype=jnp.int32)
                    c2 = jnp.asarray([o[2] for o in lv], dtype=jnp.int32)
                    vecs, costs = fitch.fitch_update(vecs, costs, p, c1, c2)

                u_idx = jnp.asarray([index_of[id(u)] for u, v in edges],
                                    dtype=jnp.int32)
                v_idx = jnp.asarray([index_of[id(v)] for u, v in edges],
                                    dtype=jnp.int32)
                tipvec = part.vectors[next_tip]
                s = fitch.fitch_insert_scores(vecs, costs, tipvec,
                                              u_idx, v_idx)
                total_scores = s if total_scores is None else total_scores + s

            best = int(np.argmin(np.asarray(total_scores)))
            u, v = edges[best]
            new_inner = self._splice(u, v, next_tip)
            # two new candidate edges appended, matching the reference
            edge_list.append(new_inner.next)  # faces the old far endpoint
            edge_list.append(new_inner.next.next)  # faces the new tip

        # finalize: score the full tree via the partitions' own buffers
        tree = self._wrap(center)
        score = self._final_score(tree)
        return tree, score

    def _splice(self, u: UNode, v: UNode, tip_index: int) -> UNode:
        """Split edge (u, v) with a new inner ring; wiring mirrors
        utree_edgesplit + utree_link (stepwise.c:215-240, 281-283):
        ring[0] faces u, ring[1] faces v (the far endpoint), ring[2] faces
        the new tip. Returns ring[0]."""
        tip = UNode(self.labels[tip_index], 0.0)
        tip.data = tip_index
        r = [UNode(None, 0.0) for _ in range(3)]
        r[0].next, r[1].next, r[2].next = r[1], r[2], r[0]
        r[0].back, u.back = u, r[0]
        r[1].back, v.back = v, r[1]
        r[2].back, tip.back = tip, r[2]
        return r[0]

    def _wrap(self, center: UNode) -> UTree:
        root = center if center.next is not None else center.back
        reset_template_indices(root, self.tips)
        return wraptree(root)

    def _final_score(self, tree: UTree) -> int:
        from ..tree import utree as ut

        trav = ut.traverse(tree.root)

        # score indices: tips use their ORIGINAL taxon index (their packed
        # vector row, kept in .data); inner nodes their canonical clv index
        def sidx(n: UNode) -> int:
            return n.data if n.is_tip else n.clv_index

        ops = [(n.clv_index, sidx(n.next.back), sidx(n.next.next.back))
               for n in trav if not n.is_tip]
        total = 0
        root = tree.root
        for part in self.partitions:
            part.update_vectors(ops)
            total += part.edge_score(sidx(root), sidx(root.back))
        return total


def fastparsimony_stepwise(partitions: Sequence[FastParsimony],
                           labels: Sequence[str], seed: int,
                           ) -> Tuple[UTree, int]:
    """reference pll_fastparsimony_stepwise (stepwise.c:337-546)."""
    builder = StepwiseBuilder(partitions, labels)
    return builder.build(seed)
