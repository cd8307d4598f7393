"""Stepwise-addition parsimony tree construction vs the oracle."""

import ctypes as ct

import numpy as np
import pytest

import oracle

if not oracle.available():
    pytest.skip("reference oracle unavailable", allow_module_level=True)

from libpll_tpu.io import maps
from libpll_tpu.search.parsimony import FastParsimony
from libpll_tpu.search.stepwise import fastparsimony_stepwise
from libpll_tpu.tree import utree as ut

RNG = np.random.default_rng(17)


def _oracle_stepwise(seqs, labels, seed, states=4):
    lib = oracle.get_lib()
    lib.pll_fastparsimony_init.restype = ct.c_void_p
    lib.pll_fastparsimony_init.argtypes = [ct.c_void_p]
    lib.pll_fastparsimony_stepwise.restype = ct.c_void_p
    lib.pll_fastparsimony_stepwise.argtypes = [
        ct.POINTER(ct.c_void_p), ct.POINTER(ct.c_char_p),
        ct.POINTER(ct.c_uint), ct.c_uint, ct.c_uint]

    tips = len(seqs)
    sites = len(seqs[0])
    part = oracle.RefPartition(tips, tips - 2, states, sites, 1, 1, 1, 0)
    charmap = oracle.map_table("pll_map_nt")
    for i, s in enumerate(seqs):
        part.set_tip_states(i, charmap, s)
    pars = lib.pll_fastparsimony_init(part.ptr)
    assert pars

    parslist = (ct.c_void_p * 1)(pars)
    clabels = (ct.c_char_p * tips)(*[l.encode() for l in labels])
    score = ct.c_uint()
    tree = lib.pll_fastparsimony_stepwise(parslist, clabels,
                                          ct.byref(score), 1, seed)
    assert tree
    return int(score.value)


@pytest.mark.parametrize("seed", [1, 42, 12345])
@pytest.mark.parametrize("tips,sites", [(8, 60), (16, 120)])
def test_stepwise_score_matches_reference(seed, tips, sites):
    seqs = ["".join(RNG.choice(list("ACGT"), sites)) for _ in range(tips)]
    labels = [f"t{i}" for i in range(tips)]

    want = _oracle_stepwise(seqs, labels, seed)

    part = FastParsimony.from_sequences(seqs, maps.pll_map_nt, 4)
    tree, score = fastparsimony_stepwise([part], labels, seed)
    assert ut.check_integrity(tree)
    assert tree.tip_count == tips
    assert sorted(n.label for n in tree.nodes[:tips]) == sorted(labels)
    assert score == want, f"score {score} != reference {want} (seed {seed})"


@pytest.mark.parametrize("seed", [1, 42, 12345])
@pytest.mark.parametrize("tips,sites", [(8, 60), (16, 120)])
def test_stepwise_device_engine_matches_reference(seed, tips, sites):
    """The fully device-resident build (one compiled program for the whole
    greedy insertion loop) must be seed- and tie-break-exact with the
    reference, like the host engine."""
    seqs = ["".join(RNG.choice(list("ACGT"), sites)) for _ in range(tips)]
    labels = [f"t{i}" for i in range(tips)]

    want = _oracle_stepwise(seqs, labels, seed)

    part = FastParsimony.from_sequences(seqs, maps.pll_map_nt, 4)
    tree, score = fastparsimony_stepwise([part], labels, seed,
                                         engine="device")
    assert ut.check_integrity(tree)
    assert score == want, f"score {score} != reference {want} (seed {seed})"


def test_stepwise_device_topology_matches_host_engine():
    """Same seed -> identical topology (not just score) across engines."""
    tips, sites = 14, 90
    seqs = ["".join(RNG.choice(list("ACGT"), sites)) for _ in range(tips)]
    labels = [f"t{i}" for i in range(tips)]
    part = FastParsimony.from_sequences(seqs, maps.pll_map_nt, 4)
    for seed in (0, 7, 99):
        th, sh = fastparsimony_stepwise([part], labels, seed, engine="host")
        td, sd = fastparsimony_stepwise([part], labels, seed,
                                        engine="device")
        assert sh == sd
        assert ut.export_newick(th.root) == ut.export_newick(td.root)


def test_stepwise_device_multiple_partitions():
    """Per-edge scores of several partitions sum before the argmin
    (reference stepwise.c:288-297) on the device engine too."""
    tips, sites = 10, 80
    seqs1 = ["".join(RNG.choice(list("ACGT"), sites)) for _ in range(tips)]
    seqs2 = ["".join(RNG.choice(list("ACGT"), sites)) for _ in range(tips)]
    labels = [f"t{i}" for i in range(tips)]
    p1 = FastParsimony.from_sequences(seqs1, maps.pll_map_nt, 4)
    p2 = FastParsimony.from_sequences(seqs2, maps.pll_map_nt, 4)
    th, sh = fastparsimony_stepwise([p1, p2], labels, 5, engine="host")
    td, sd = fastparsimony_stepwise([p1, p2], labels, 5, engine="device")
    assert sh == sd
    assert ut.export_newick(th.root) == ut.export_newick(td.root)


def test_stepwise_seed_zero_no_shuffle():
    tips, sites = 7, 40
    seqs = ["".join(RNG.choice(list("ACGT"), sites)) for _ in range(tips)]
    labels = [f"x{i}" for i in range(tips)]
    want = _oracle_stepwise(seqs, labels, 0)
    part = FastParsimony.from_sequences(seqs, maps.pll_map_nt, 4)
    tree, score = fastparsimony_stepwise([part], labels, 0)
    assert score == want


def test_stepwise_sharded_words_bit_identical():
    """Word-axis-sharded device build (the giant-alignment configuration:
    one integer psum per insertion) must reproduce the single-device
    engine bit-for-bit — same topology, same score."""
    import jax
    from jax.sharding import Mesh

    n_dev = len(jax.devices())
    if n_dev < 2:
        pytest.skip("needs a multi-device (virtual) mesh")
    rng = np.random.default_rng(5)
    tips, sites = 16, 600
    seqs = ["".join(rng.choice(list("ACGT"), sites)) for _ in range(tips)]
    labels = [f"t{i}" for i in range(tips)]
    part = FastParsimony.from_sequences(seqs, maps.pll_map_nt, 4)

    t1, s1 = fastparsimony_stepwise([part], labels, 42, engine="device")
    mesh = Mesh(np.asarray(jax.devices()[:n_dev]), ("words",))
    t2, s2 = fastparsimony_stepwise([part], labels, 42, mesh=mesh)
    assert s1 == s2
    assert ut.export_newick(t1.root) == ut.export_newick(t2.root)
