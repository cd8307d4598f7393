"""Parsimony parity: Fitch bit-packed and Sankoff weighted engines."""

import ctypes as ct

import numpy as np
import pytest

import oracle

if not oracle.available():
    pytest.skip("reference oracle unavailable", allow_module_level=True)

import libpll_tpu as pll
from libpll_tpu.io import maps
from libpll_tpu.search.parsimony import FastParsimony, Parsimony
from libpll_tpu.tree import rtree, utree

RNG = np.random.default_rng(31)


class PllParsBuildop(ct.Structure):
    _fields_ = [("parent_score_index", ct.c_uint),
                ("child1_score_index", ct.c_uint),
                ("child2_score_index", ct.c_uint)]


def _oracle_fastpars(seqs, states=4, weights=None):
    """Build the oracle's pll_parsimony_t via pll_fastparsimony_init."""
    lib = oracle.get_lib()
    lib.pll_fastparsimony_init.restype = ct.c_void_p
    lib.pll_fastparsimony_init.argtypes = [ct.c_void_p]
    lib.pll_fastparsimony_update_vectors.argtypes = [ct.c_void_p,
                                                     ct.c_void_p, ct.c_uint]
    lib.pll_fastparsimony_edge_score.restype = ct.c_uint
    lib.pll_fastparsimony_edge_score.argtypes = [ct.c_void_p, ct.c_uint,
                                                 ct.c_uint]
    lib.pll_fastparsimony_root_score.restype = ct.c_uint
    lib.pll_fastparsimony_root_score.argtypes = [ct.c_void_p, ct.c_uint]

    tips = len(seqs)
    sites = len(seqs[0])
    part = oracle.RefPartition(tips, tips - 2, states, sites, 1, 1, 1, 0)
    charmap = (oracle.map_table("pll_map_nt") if states == 4
               else oracle.map_table("pll_map_aa"))
    for i, s in enumerate(seqs):
        part.set_tip_states(i, charmap, s)
    if weights is not None:
        part.set_pattern_weights(weights)
    pars = lib.pll_fastparsimony_init(part.ptr)
    assert pars
    return lib, part, pars


@pytest.mark.parametrize("states,alphabet", [(4, "ACGT-RY"),
                                             (20, "ARNDCQEGHILKMFPSTWYV")])
@pytest.mark.parametrize("weighted", [False, True])
def test_fitch_parity(states, alphabet, weighted):
    tips, sites = 8, 50
    seqs = ["".join(RNG.choice(list(alphabet), sites)) for _ in range(tips)]
    weights = (RNG.integers(1, 4, sites).astype(np.uint32) if weighted
               else None)
    lib, part, pars = _oracle_fastpars(seqs, states, weights)

    charmap = maps.pll_map_nt if states == 4 else maps.pll_map_aa
    mine = FastParsimony.from_sequences(
        seqs, charmap, states,
        weights if weights is not None else None)

    # caterpillar build ops: inner score indices tips..2*tips-2
    ops = []
    avail = list(range(tips))
    nxt = tips
    while len(avail) > 1:
        a = avail.pop(0)
        b = avail.pop(0)
        ops.append((nxt, a, b))
        avail.append(nxt)
        nxt += 1

    arr = (PllParsBuildop * len(ops))()
    for k, (p, c1, c2) in enumerate(ops):
        arr[k].parent_score_index = p
        arr[k].child1_score_index = c1
        arr[k].child2_score_index = c2
    lib.pll_fastparsimony_update_vectors(pars, arr, len(ops))
    mine.update_vectors(ops)

    root = ops[-1][0]
    assert mine.root_score(root) == lib.pll_fastparsimony_root_score(pars,
                                                                     root)
    # edge scores between various node pairs
    for n1, n2 in [(root, 0), (root, tips), (tips, tips + 1), (0, 1)]:
        want = lib.pll_fastparsimony_edge_score(pars, n1, n2)
        assert mine.edge_score(n1, n2) == want, (n1, n2)
    # batched scores agree with singles
    n1s = [root, root, tips, 0]
    n2s = [0, tips, tips + 1, 1]
    batch = mine.edge_scores_batch(n1s, n2s)
    for k in range(4):
        assert batch[k] == mine.edge_score(n1s[k], n2s[k])


def test_sankoff_parity():
    """Weighted parsimony vs oracle with a random integer score matrix."""
    lib = oracle.get_lib()
    lib.pll_parsimony_create.restype = ct.c_void_p
    lib.pll_parsimony_create.argtypes = [ct.c_uint, ct.c_uint, ct.c_uint,
                                         ct.POINTER(ct.c_double), ct.c_uint,
                                         ct.c_uint]
    lib.pll_set_parsimony_sequence.restype = ct.c_int
    lib.pll_set_parsimony_sequence.argtypes = [ct.c_void_p, ct.c_uint,
                                               oracle.ct.POINTER(ct.c_uint),
                                               ct.c_char_p]
    lib.pll_parsimony_build.restype = ct.c_double
    lib.pll_parsimony_build.argtypes = [ct.c_void_p, ct.c_void_p, ct.c_uint]
    lib.pll_parsimony_score.restype = ct.c_double
    lib.pll_parsimony_score.argtypes = [ct.c_void_p, ct.c_uint]

    tips, sites, states = 6, 40, 4
    seqs = ["".join(RNG.choice(list("ACGT-RWS"), sites)) for _ in range(tips)]
    sm = RNG.integers(1, 5, (states, states)).astype(np.float64)
    sm = (sm + sm.T) / 2
    np.fill_diagonal(sm, 0)

    pars = lib.pll_parsimony_create(tips, states, sites,
                                    oracle.as_double_p(sm.ravel().copy()),
                                    tips - 1, tips - 1)
    assert pars
    nt = np.ascontiguousarray(oracle.map_table("pll_map_nt"))
    for i, s in enumerate(seqs):
        assert lib.pll_set_parsimony_sequence(
            pars, i, oracle.as_uint_p(nt), s.encode()) == 1

    mine = Parsimony(tips, states, sites, sm, tips - 1, tips - 1)
    for i, s in enumerate(seqs):
        mine.set_sequence(i, maps.pll_map_nt, s)

    ops = []
    avail = list(range(tips))
    nxt = tips
    while len(avail) > 1:
        a = avail.pop(0)
        b = avail.pop(0)
        ops.append((nxt, a, b))
        avail.append(nxt)
        nxt += 1

    arr = (PllParsBuildop * len(ops))()
    for k, (p, c1, c2) in enumerate(ops):
        arr[k].parent_score_index = p
        arr[k].child1_score_index = c1
        arr[k].child2_score_index = c2
    want = lib.pll_parsimony_build(pars, arr, len(ops))
    got = mine.build(ops)
    assert got == want
    for idx in range(tips, tips + len(ops)):
        assert mine.score(idx) == lib.pll_parsimony_score(pars, idx)


def test_fitch_on_tree_traversal():
    """Fitch score via the tree layer's buildops on a parsed topology."""
    newick = "((A:1,B:1)x:1,((C:1,D:1)y:1,E:1)z:1,F:1)r;"
    tree = utree.parse_newick_string(newick)
    seqs = {lab: "".join(RNG.choice(list("ACGT"), 60))
            for lab in "ABCDEF"}
    ordered = [seqs[n.label] for n in tree.nodes[:6]]
    mine = FastParsimony.from_sequences(ordered, maps.pll_map_nt, 4)
    trav = utree.traverse(tree.root)
    ops = utree.create_pars_buildops(trav)
    mine.update_vectors(ops)
    root = tree.root
    score = mine.edge_score(root.clv_index, root.back.clv_index)
    assert score >= mine.const_cost
    # compare to oracle with identical ops
    lib, part, pars = _oracle_fastpars(ordered, 4)
    arr = (PllParsBuildop * len(ops))()
    for k, (p, c1, c2) in enumerate(ops):
        arr[k].parent_score_index = p
        arr[k].child1_score_index = c1
        arr[k].child2_score_index = c2
    lib.pll_fastparsimony_update_vectors(pars, arr, len(ops))
    want = lib.pll_fastparsimony_edge_score(pars, root.clv_index,
                                            root.back.clv_index)
    assert score == want
