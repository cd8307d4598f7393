"""Tree layer: newick parsing, index conventions, traversal, operations."""

import numpy as np
import pytest

from libpll_tpu.tree import utree as ut

NEWICK = "((A:0.1,B:0.2)n1:0.3,(C:0.4,D:0.5)n2:0.6,E:0.7)root;"


def test_parse_indices():
    tree = ut.parse_newick_string(NEWICK)
    assert tree.tip_count == 5
    assert tree.inner_count == 3
    assert tree.edge_count == 7
    labels = [n.label for n in tree.nodes[:5]]
    assert labels == ["A", "B", "C", "D", "E"]
    for i, n in enumerate(tree.nodes[:5]):
        assert n.clv_index == i == n.node_index == n.pmatrix_index
        assert n.scaler_index == -1
    # inner nodes: clv tips.., scaler 0..
    for k, n in enumerate(tree.nodes[5:]):
        assert n.clv_index == 5 + k
        assert n.scaler_index == k
    assert ut.check_integrity(tree)


def test_parse_branch_lengths_mirrored():
    tree = ut.parse_newick_string(NEWICK)
    for n in tree.nodes:
        if n.back is not None:
            assert n.length == n.back.length
        if not n.is_tip:
            for r in n.ring():
                assert r.back.back is r


def test_traverse_postorder_and_operations():
    tree = ut.parse_newick_string(NEWICK)
    trav = ut.traverse(tree.root, ut.TRAVERSE_POSTORDER)
    # full traversal visits all 2n-2 nodes
    assert len(trav) == 2 * tree.tip_count - 2
    assert trav[-1] is tree.root
    ops, branches, pmat_idx = ut.create_operations(trav)
    assert len(ops) == tree.inner_count
    assert len(branches) == tree.edge_count
    assert sorted(pmat_idx) == sorted(set(pmat_idx))  # no duplicate matrices
    # parents appear after their children
    seen = set(range(tree.tip_count))
    for op in ops:
        assert op.child1_clv_index in seen
        assert op.child2_clv_index in seen
        seen.add(op.parent_clv_index)


def test_partial_traversal_pruning():
    tree = ut.parse_newick_string(NEWICK)
    # prune everything: only the root-adjacent structure is visited
    trav = ut.traverse(tree.root, ut.TRAVERSE_POSTORDER,
                       cb=lambda n: n.is_tip or n is tree.root)
    assert trav[-1] is tree.root


def test_newick_roundtrip():
    tree = ut.parse_newick_string(NEWICK)
    text = ut.export_newick(tree.root)
    tree2 = ut.parse_newick_string(text)
    assert tree2.tip_count == tree.tip_count
    assert [n.label for n in tree2.nodes[:5]] == \
        [n.label for n in tree.nodes[:5]]
    for a, b in zip(tree.nodes, tree2.nodes):
        assert a.length == pytest.approx(b.length, abs=1e-6)


def test_clone_independent():
    tree = ut.parse_newick_string(NEWICK)
    copy = ut.clone(tree)
    assert ut.check_integrity(copy)
    assert ut.export_newick(copy.root) == ut.export_newick(tree.root)
    copy.nodes[0].length = 99.0
    assert tree.nodes[0].length != 99.0


def test_show_ascii_contains_tips():
    tree = ut.parse_newick_string(NEWICK)
    art = ut.show_ascii(tree.root)
    for lab in "ABCDE":
        assert lab in art


def test_syntax_errors():
    from libpll_tpu.errors import NewickError
    for bad in ["(A,B;", "(A:0.1,B:0.2);", "", "(A,B,C", "(A,B,C)x:1"]:
        with pytest.raises(NewickError):
            ut.parse_newick_string(bad)
