"""Dirty-subtree (partial-traversal) re-evaluation: per-direction CLV
validity tracking.

This is the rebuild's CLV-reuse engine for tree search, the counterpart of
the reference's ``clv_valid``-per-direction trick (a flag hung off each
``pll_unode_t``'s ``data`` pointer): the CLV buffer of an inner ring holds
the partial likelihood oriented as exactly *one* of the ring's three
directed nodes, and a post-order evaluation may skip every subtree whose
root direction is still valid (reference
`examples/partial-traversal/partial.c:61-104`, `src/stepwise.c:118`).

Mechanics here:

  * every :class:`~libpll_tpu.tree.utree.UNode` carries a ``clv_valid``
    flag; at most one member of a ring is ever valid (the direction the
    buffer currently represents);
  * the move primitives (:mod:`libpll_tpu.tree.moves`) invalidate exactly
    the directed nodes whose immediate child links changed — the upward
    propagation to the evaluation root happens automatically inside
    :func:`partial_traverse`'s post-order recursion (a parent is
    recomputed iff it is itself stale *or any child was recomputed*);
  * :func:`partial_traverse` returns the minimal post-order op subset and
    flips ownership flags, so repeated calls with no intervening changes
    return an empty schedule.

The host walk is O(n) per call (cheap); what it saves is *device* work —
the returned subset is what `update_partials` executes.
"""

from __future__ import annotations

from typing import List

from ..errors import TreeError
from .utree import UNode, UTree


def invalidate(node: UNode) -> None:
    """Mark one directed CLV stale."""
    node.clv_valid = False


def invalidate_edge(u: UNode) -> None:
    """Invalidate every directed CLV whose subtree looks *through* the edge
    ``u``—``u.back`` (call after changing that edge's branch length /
    P-matrix): the other two directions of each endpoint's ring.
    """
    for end in (u, u.back):
        if end is not None and end.next is not None:
            for m in end.ring():
                if m is not end:
                    m.clv_valid = False


def invalidate_all(tree: UTree) -> None:
    for n in tree.nodes:
        for m in ([n] if n.is_tip else n.ring()):
            m.clv_valid = False


def mark_valid(trav_buffer: List[UNode]) -> None:
    """After executing a full (or partial) schedule, record which direction
    of each computed ring owns the buffer."""
    for node in trav_buffer:
        if node.is_tip:
            continue
        for m in node.ring():
            m.clv_valid = m is node


def partial_traverse(root: UNode) -> List[UNode]:
    """Minimal post-order recompute set for an evaluation at ``root``.

    Returns the inner directed nodes whose CLVs must be recomputed, in
    dependency (post-) order, and marks them as the new buffer owners.
    Equivalent to `pll_utree_traverse` with the reference's
    ``cb_partial_traversal`` callback (`src/stepwise.c:103-123`), except
    staleness propagates upward here instead of being pre-marked along the
    whole path by the caller.
    """
    if root.is_tip:
        raise TreeError("traversal root must be an inner node")
    out: List[UNode] = []

    def rec(u: UNode) -> bool:
        if u.is_tip:
            return False
        d1 = rec(u.next.back)
        d2 = rec(u.next.next.back)
        if d1 or d2 or not u.clv_valid:
            out.append(u)
            for m in u.ring():
                m.clv_valid = m is u
            return True
        return False

    rec(root.back)
    rec(root)
    return out


def peek_partial(root: UNode) -> List[UNode]:
    """Like :func:`partial_traverse` but read-only: computes the minimal
    recompute set without flipping ownership flags.  Used for *candidate*
    evaluation in tree search, where the move will be rolled back and the
    base buffers stay untouched."""
    if root.is_tip:
        raise TreeError("traversal root must be an inner node")
    out: List[UNode] = []

    def rec(u: UNode) -> bool:
        if u.is_tip:
            return False
        d1 = rec(u.next.back)
        d2 = rec(u.next.next.back)
        if d1 or d2 or not u.clv_valid:
            out.append(u)
            return True
        return False

    rec(root.back)
    rec(root)
    return out


def snapshot_flags(nodes: List[UNode]):
    """Record (directed node, clv_valid) for the rings of ``nodes`` so a
    candidate move + rollback can restore validity exactly."""
    seen = []
    for n in nodes:
        if n is None:
            continue
        for m in ([n] if n.is_tip else n.ring()):
            seen.append((m, m.clv_valid))
    return seen


def restore_flags(snapshot) -> None:
    for node, flag in snapshot:
        node.clv_valid = flag


def create_partial_operations(nodes: List[UNode]):
    """Operations for a :func:`partial_traverse` subset (the op-emitting
    half of `pll_utree_create_operations`, utree.c:284-329; branch/pmatrix
    refresh lists come from the move that caused the invalidation)."""
    from ..engine.partition import Operation

    return [Operation(
        parent_clv_index=n.clv_index,
        parent_scaler_index=n.scaler_index,
        child1_clv_index=n.next.back.clv_index,
        child1_matrix_index=n.next.back.pmatrix_index,
        child1_scaler_index=n.next.back.scaler_index,
        child2_clv_index=n.next.next.back.clv_index,
        child2_matrix_index=n.next.next.back.pmatrix_index,
        child2_scaler_index=n.next.next.back.scaler_index,
    ) for n in nodes if not n.is_tip]
