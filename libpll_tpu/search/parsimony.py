"""Parsimony engines: bit-packed Fitch and weighted Sankoff wrappers.

Capability parity with libpll's two parsimony engines
(`pll_fastparsimony_*`, fast_parsimony.c; `pll_parsimony_*`, parsimony.c),
holding device-resident state vectors/score buffers and executing
operation schedules with the kernels in :mod:`libpll_tpu.ops.fitch` and
:mod:`libpll_tpu.ops.sankoff`.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..errors import ParamError, TipDataError
from ..io.maps import encode_sequence
from ..ops import fitch, sankoff


class FastParsimony:
    """Bit-packed unweighted Fitch parsimony (reference pll_fastparsimony_*).

    Score indices follow the reference convention: tips 0..tips-1, inner
    nodes tips..2·tips-2 (``inner_nodes = tips - 1``, fast_parsimony.c:530).
    """

    def __init__(self, tip_masks: np.ndarray, states: int,
                 pattern_weights=None):
        tips, sites = tip_masks.shape
        if pattern_weights is None:
            pattern_weights = np.ones(sites, dtype=np.int64)
        self.tips = tips
        self.states = states
        self.sites = sites
        self.inner_nodes = tips - 1
        self.informative, self.const_cost = fitch.set_informative(
            tip_masks, states, pattern_weights)
        self.informative_count = int(self.informative.sum())
        packed = fitch.pack_vectors(tip_masks, states, self.informative,
                                    np.asarray(pattern_weights),
                                    self.inner_nodes)
        self.vectors = jnp.asarray(packed)
        self.costs = jnp.zeros(tips + self.inner_nodes, dtype=jnp.uint32)

    @classmethod
    def from_partition(cls, partition):
        """reference pll_fastparsimony_init (fast_parsimony.c:516-548)."""
        return cls(partition._tip_masks, partition.states,
                   partition.pattern_weights[:partition.sites])

    @classmethod
    def from_sequences(cls, sequences: Sequence[str], charmap: np.ndarray,
                       states: int, pattern_weights=None):
        masks = np.stack([encode_sequence(s, charmap) for s in sequences])
        return cls(masks, states, pattern_weights)

    def update_vectors(self, buildops: Sequence[Tuple[int, int, int]]) -> None:
        """Execute (parent, child1, child2) Fitch steps; ops grouped into
        dependency levels and executed as batched kernels."""
        levels = _group_levels(buildops)
        for lv in levels:
            p = jnp.asarray([o[0] for o in lv], dtype=jnp.int32)
            c1 = jnp.asarray([o[1] for o in lv], dtype=jnp.int32)
            c2 = jnp.asarray([o[2] for o in lv], dtype=jnp.int32)
            self.vectors, self.costs = fitch.fitch_update(
                self.vectors, self.costs, p, c1, c2)

    def edge_score(self, node1: int, node2: int) -> int:
        return int(fitch.fitch_edge_score(self.vectors, self.costs,
                                          node1, node2)) + self.const_cost

    def edge_scores_batch(self, nodes1, nodes2) -> np.ndarray:
        s = fitch.fitch_edge_scores_batch(
            self.vectors, self.costs,
            jnp.asarray(nodes1, dtype=jnp.int32),
            jnp.asarray(nodes2, dtype=jnp.int32))
        return np.asarray(s) + self.const_cost

    def root_score(self, root_index: int) -> int:
        return int(self.costs[root_index]) + self.const_cost


def _group_levels(buildops):
    """Group (parent, child1, child2) ops into dependency levels."""
    level_of = {}
    levels: List[list] = []
    for op in buildops:
        p, c1, c2 = op[0], op[1], op[2]
        lvl = max(level_of.get(c1, -1), level_of.get(c2, -1)) + 1
        while len(levels) <= lvl:
            levels.append([])
        levels[lvl].append((p, c1, c2))
        level_of[p] = lvl
    return levels


class Parsimony:
    """Weighted Sankoff parsimony (reference pll_parsimony_create/build/
    score/reconstruct, parsimony.c)."""

    def __init__(self, tips: int, states: int, sites: int,
                 score_matrix: np.ndarray, score_buffers: int,
                 ancestral_buffers: int):
        sm = np.asarray(score_matrix, dtype=np.float64)
        if sm.shape != (states, states):
            raise ParamError("score matrix must be [states, states]")
        self.tips = tips
        self.states = states
        self.sites = sites
        self.score_matrix = jnp.asarray(sm)
        self.inf = float(sm.max()) + 1.0
        n = tips + score_buffers
        self._sbuffer = jnp.zeros((n, states, sites))
        # tip cost rows staged host-side, flushed in one scatter on first
        # read (a per-tip .at[i].set copies the whole buffer: O(n²) setup)
        self._staged: dict = {}
        self.ancestral: dict = {}

    @property
    def sbuffer(self) -> jnp.ndarray:
        if self._staged:
            staged, self._staged = self._staged, {}
            idx = np.fromiter(staged.keys(), np.int64, len(staged))
            tiles = jnp.asarray(np.stack([staged[i] for i in idx]))
            self._sbuffer = self._sbuffer.at[jnp.asarray(idx)].set(tiles)
        return self._sbuffer

    @sbuffer.setter
    def sbuffer(self, value) -> None:
        self._sbuffer = value

    def set_sequence(self, tip_index: int, charmap: np.ndarray,
                     sequence: str) -> None:
        """reference pll_set_parsimony_sequence (parsimony.c:24-67)."""
        if len(sequence) != self.sites:
            raise TipDataError("sequence length mismatch")
        masks = encode_sequence(sequence, charmap)
        bits = (masks[:, None] >> np.arange(self.states)[None, :]) & 1
        cost = np.where(bits.astype(bool), 0.0, self.inf).T  # [S, L]
        self._staged[tip_index] = cost

    def build(self, buildops) -> float:
        """Post-order DP sweep; returns the score at the last op's parent."""
        levels = _group_levels(buildops)
        for lv in levels:
            p = jnp.asarray([o[0] for o in lv], dtype=jnp.int32)
            c1 = jnp.asarray([o[1] for o in lv], dtype=jnp.int32)
            c2 = jnp.asarray([o[2] for o in lv], dtype=jnp.int32)
            self.sbuffer = sankoff.sankoff_update(
                self.sbuffer, self.score_matrix, p, c1, c2)
        return self.score(buildops[-1][0])

    def score(self, index: int) -> float:
        return float(sankoff.sankoff_score(self.sbuffer, index))

    def reconstruct(self, charmap: np.ndarray, recops) -> dict:
        """recops: [(node_score_index, parent_score_index)] pre-order.
        Returns {score_index: ancestral sequence string}."""
        res = sankoff.sankoff_reconstruct(np.asarray(self.sbuffer), recops,
                                          self.states, charmap)
        self.ancestral = {k: bytes(v).decode("latin-1")
                          for k, v in res.items()}
        return self.ancestral
