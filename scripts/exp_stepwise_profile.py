#!/usr/bin/env python3
"""Profiling experiment for the device-resident stepwise build at scale.

Times ONE compiled segment of the insertion loop at `tips` x `sites` under
structural variants, to locate where the 2048-taxon device build's time
goes (round-3: 456-513 s vs the reference's 130 s):

  full         the production program (scoring + argmin + splice + BFS)
  noscore      BFS only: argmin replaced by a fixed edge choice
  nobfs        scoring + splice only (vectors go stale -> scores wrong;
               timing-only variant)
  chunk=K      BFS consume-chunk size (production: 128)

Usage: python scripts/exp_stepwise_profile.py [tips] [sites] [lo] [hi]
"""

import sys
import time
from functools import partial

tips = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
sites = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
lo_i = int(sys.argv[3]) if len(sys.argv) > 3 else 1024
hi_i = int(sys.argv[4]) if len(sys.argv) > 4 else 1280

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from libpll_tpu.io import maps
from libpll_tpu.ops import fitch
from libpll_tpu.ops.fitch import (_chunk_fitch, _insert_scores,
                                  _ring_co_tables)
from libpll_tpu.search.parsimony import FastParsimony
from libpll_tpu.search.stepwise import shuffled_order

print("platform:", jax.devices()[0].platform, flush=True)


def make_intbfs(n_tips):
    """Insert loop with integer-only wave propagation (no vector work):
    returns (back, edges, wave_count, stale_count) — the wave-count
    statistics and the floor cost of the wave machinery itself."""
    co1_np, co2_np = _ring_co_tables(n_tips)
    CO1, CO2 = jnp.asarray(co1_np), jnp.asarray(co2_np)
    D = n_tips + 3 * (n_tips - 2)

    def insert(i, carry):
        back, edge_rows, nwaves, nstale = carry
        ne = 2 * i - 3
        base = n_tips + 3 * (i - 2)
        tip = order_g[i]
        e_star = (i * 7919) % jnp.maximum(ne, 1)
        u = edge_rows[e_star]
        v = back[u]
        r0, r1, r2 = base, base + 1, base + 2
        back = (back.at[u].set(r0).at[r0].set(u)
                    .at[v].set(r1).at[r1].set(v)
                    .at[tip].set(r2).at[r2].set(tip))
        edge_rows = edge_rows.at[ne].set(r1).at[ne + 1].set(r2)

        mask = jnp.zeros(D, jnp.bool_).at[r0].set(True).at[r1].set(
            True).at[r2].set(True)

        def cond(s):
            return jnp.any(s[0])

        def body(s):
            wave, nw, ns = s
            valid = wave & (back >= n_tips)
            t1 = jnp.where(valid, CO1[back], D)
            t2 = jnp.where(valid, CO2[back], D)
            nxt = jnp.zeros_like(wave)
            nxt = nxt.at[t1].set(True, mode="drop")
            nxt = nxt.at[t2].set(True, mode="drop")
            return nxt, nw + 1, ns + jnp.sum(wave).astype(ns.dtype)

        _, nwaves, nstale = jax.lax.while_loop(
            cond, body, (mask, nwaves, nstale))
        return back, edge_rows, nwaves, nstale

    @jax.jit
    def run(back, edge_rows, lo, hi):
        return jax.lax.fori_loop(
            lo, hi, insert,
            (back, edge_rows, jnp.int32(0), jnp.int32(0)))

    return run


def make_range(n_tips, *, do_score=True, do_bfs=True, chunk_f=128,
               dense_waves=False):
    co1_np, co2_np = _ring_co_tables(n_tips)
    CO1, CO2 = jnp.asarray(co1_np), jnp.asarray(co2_np)
    D = n_tips + 3 * (n_tips - 2)
    E = 2 * n_tips - 3
    e_arange = jnp.arange(E, dtype=jnp.int32)
    F = chunk_f

    def run_bfs(vecs, costs, mask, back):
        c1_all = back[CO1]
        c2_all = back[CO2]

        def wave_cond(s):
            return jnp.any(s[2])

        def wave_body(s):
            vecs, costs, wave = s
            valid = wave & (back >= n_tips)
            t1 = jnp.where(valid, CO1[back], D)
            t2 = jnp.where(valid, CO2[back], D)
            nxt = jnp.zeros_like(wave)
            nxt = nxt.at[t1].set(True, mode="drop")
            nxt = nxt.at[t2].set(True, mode="drop")

            if dense_waves:
                a = vecs[c1_all]
                b = vecs[c2_all]
                land = a & b
                union = land[:, 0]
                for k in range(1, land.shape[1]):
                    union = union | land[:, k]
                newvec = land | (~union[:, None, :] & (a | b))
                inc = jnp.sum(jax.lax.population_count(~union), axis=-1)
                newc = costs[c1_all] + costs[c2_all] + inc.astype(
                    costs.dtype)
                w3 = wave[:, None, None]
                vecs = jnp.where(w3, newvec, vecs)
                costs = jnp.where(wave, newc, costs)
                return vecs, costs, nxt

            def chunk_cond(t):
                return jnp.any(t[2])

            def chunk_body(t):
                vecs, costs, rem = t
                (idx,) = jnp.nonzero(rem, size=F, fill_value=D)
                rem = rem.at[idx].set(False, mode="drop")
                safe = jnp.where(idx < D, idx, 0)
                c1 = c1_all[safe]
                c2 = c2_all[safe]
                vecs, costs = _chunk_fitch(vecs, costs, idx, c1, c2)
                return vecs, costs, rem

            vecs, costs, _ = jax.lax.while_loop(
                chunk_cond, chunk_body, (vecs, costs, wave))
            return vecs, costs, nxt

        vecs, costs, _ = jax.lax.while_loop(
            wave_cond, wave_body, (vecs, costs, mask))
        return vecs, costs

    def insert(i, carry):
        vecs, costs, back, edge_rows = carry
        ne = 2 * i - 3
        base = n_tips + 3 * (i - 2)
        tip = order_g[i]

        if do_score:
            u_idx = edge_rows
            v_idx = back[edge_rows]
            scores = _insert_scores(vecs, costs, vecs[tip], u_idx, v_idx)
            scores = jnp.where(e_arange < ne, scores,
                               jnp.uint32(0xFFFFFFFF))
            e_star = jnp.argmin(scores)
        else:
            e_star = (i * 7919) % jnp.maximum(ne, 1)

        u = edge_rows[e_star]
        v = back[u]
        r0, r1, r2 = base, base + 1, base + 2
        back = (back.at[u].set(r0).at[r0].set(u)
                    .at[v].set(r1).at[r1].set(v)
                    .at[tip].set(r2).at[r2].set(tip))
        edge_rows = edge_rows.at[ne].set(r1).at[ne + 1].set(r2)

        if do_bfs:
            mask = jnp.zeros(D, jnp.bool_).at[r0].set(True).at[r1].set(
                True).at[r2].set(True)
            vecs, costs = run_bfs(vecs, costs, mask, back)
        return vecs, costs, back, edge_rows

    @partial(jax.jit, static_argnums=())
    def run(vecs, costs, back, edge_rows, lo, hi):
        return jax.lax.fori_loop(lo, hi, insert,
                                 (vecs, costs, back, edge_rows))

    return run


# ---- setup identical to build_device ------------------------------------
rng = np.random.default_rng(7)
seqs = ["".join(rng.choice(list("ACGT"), sites)) for _ in range(tips)]
part = FastParsimony.from_sequences(seqs, maps.pll_map_nt, states=4)
order = shuffled_order(tips, 42)
order_g = jnp.asarray(order, jnp.int32)
D = tips + 3 * (tips - 2)
E = 2 * tips - 3
back0 = np.full(D, -1, np.int32)
for k in range(3):
    back0[tips + k] = order[k]
    back0[order[k]] = tips + k
edge_rows0 = np.array([tips, tips + 1, tips + 2] + [0] * (E - 3), np.int32)
vecs0 = jnp.zeros((D,) + part.vectors.shape[1:], jnp.uint32
                  ).at[:tips].set(np.asarray(part.vectors[:tips]))
costs0 = jnp.zeros((D,), jnp.uint32)
print(f"{tips} x {sites}: D={D} E={E} vec words={part.vectors.shape}",
      flush=True)

# advance the production program to `lo_i` so the tree has real size
# (segmented dispatches: ~1000 insertions in one dispatch trip the remote
# worker's watchdog)
t0 = time.perf_counter()
carry = ((vecs0,), (costs0,), jnp.asarray(back0), jnp.asarray(edge_rows0))
lo = 3
while lo < lo_i:
    hi = min(lo_i, lo + 256)
    carry = fitch._stepwise_insert_range(
        tips, *carry, order_g, jnp.int32(lo), jnp.int32(hi))
    int(carry[1][0][0])
    lo = hi
print(f"advance to {lo_i}: {time.perf_counter()-t0:.1f}s (incl. compile)",
      flush=True)
vecs_a, costs_a = carry[0][0], carry[1][0]
back_a, edges_a = carry[2], carry[3]

# integer-only wave machinery: wave counts + its floor cost
runi = make_intbfs(tips)
t0 = time.perf_counter()
outi = runi(back_a, edges_a, jnp.int32(lo_i), jnp.int32(hi_i))
int(outi[2])
t_cold = time.perf_counter() - t0
t0 = time.perf_counter()
outi = runi(back_a, edges_a, jnp.int32(lo_i), jnp.int32(hi_i))
nw, ns = int(outi[2]), int(outi[3])
t_warm = time.perf_counter() - t0
n_ins = hi_i - lo_i
print(f"int-BFS only  : {t_warm:.2f}s warm "
      f"({t_warm/n_ins*1e3:.1f} ms/insertion; cold {t_cold:.1f}s); "
      f"waves/insertion={nw/n_ins:.1f} stale rows/insertion={ns/n_ins:.0f}",
      flush=True)

VARIANTS = [
    ("dense-waves", dict(dense_waves=True)),
    ("full F=128", dict()),
]
for name, kw in VARIANTS:
    try:
        run = make_range(tips, **kw)
        t0 = time.perf_counter()
        out = run(vecs_a, costs_a, back_a, edges_a, jnp.int32(lo_i),
                  jnp.int32(hi_i))
        int(out[1][0])
        t_cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = run(vecs_a, costs_a, back_a, edges_a, jnp.int32(lo_i),
                  jnp.int32(hi_i))
        int(out[1][0])
        t_warm = time.perf_counter() - t0
        per = t_warm / (hi_i - lo_i) * 1e3
        print(f"{name:14s}: {t_warm:.2f}s warm ({per:.1f} ms/insertion; "
              f"cold {t_cold:.1f}s)", flush=True)
    except Exception as e:
        print(f"{name:14s}: FAILED {type(e).__name__}: {str(e)[:140]}",
              flush=True)
