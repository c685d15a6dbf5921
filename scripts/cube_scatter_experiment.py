"""VERDICT r3 item 6: can the polar shadow-cube binning beat the XLA
random-scatter floor?

The polar datagen step's two cube scatter-adds (ops/raycast.py::
visibility_cleanup_polar, cnt/inv cubes of A*R*S ~ 23M bins at the deployed
YAML) cost ~21 ms of the 47 ms 1M-pt step and were priced at the XLA HBM
random-access floor. The round-4 Mosaic probe (scripts/probe_pallas_gather.py)
rules out in-kernel scatter on this toolchain, so the candidates are
XLA-level reformulations:

  a) current: two single-stream random scatter-adds into the flat cube
  b) sort-once: pack (a,r,s) into ONE int32 key (9+9+7 bits), lax.sort the
     (key, inv) pair, then scatter [ones, inv] with indices_are_sorted=True —
     converts 2x random HBM access into 1 sort + near-sequential writes
  c) sort + run-boundary segment reduction: same sort, then unique-run heads
     via searchsorted on the SORTED keys (no scatter at all: cnt from run
     lengths, inv from prefix-sum differences at run boundaries) — but the
     gather at 23M run-head queries dwarfs the win; measured for the record
  d) 2-stream multi-column scatter of the sorted keys (shared index vector)

Run on the real chip: python scripts/cube_scatter_experiment.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from elevation_mapping_cupy_tpu.utils.compile_cache import ensure_compile_cache
ensure_compile_cache()  # r5: no longer auto-enabled at package import


N = int(os.environ.get("NPTS", 1_000_000))
A, R, S = 512, 355, 128
NB = A * R * S

rng = np.random.default_rng(0)
a_idx = jnp.asarray(rng.integers(0, A, (N,)).astype(np.int32))
r_idx = jnp.asarray(rng.integers(0, R, (N,)).astype(np.int32))
s_idx = jnp.asarray(rng.integers(0, S, (N,)).astype(np.int32))
inv = jnp.asarray(rng.uniform(0.1, 1.0, (N,)).astype(np.float32))
active = jnp.asarray(rng.uniform(0, 1, (N,)) > 0.05)

triv = jax.jit(lambda v: v + 1.0)
_ = float(triv(jnp.float32(0.0)))
t0 = time.perf_counter()
for _ in range(20):
    _ = float(triv(jnp.float32(0.0)))
FLOOR = (time.perf_counter() - t0) / 20
print(f"host sync floor: {FLOOR*1e3:.1f} ms  (N={N}, bins={NB})")


def timeit(name, fn, *args, n_it=5):
    f = jax.jit(lambda *a: jax.tree.map(lambda x: jnp.sum(x, dtype=jnp.float32), fn(*a)))
    r = f(*args)
    ref = [float(x) for x in jax.tree.leaves(r)]
    t0 = time.perf_counter()
    for _ in range(n_it):
        r = f(*args)
        _ = float(jax.tree.leaves(r)[0])
    per = (time.perf_counter() - t0) / n_it - FLOOR
    print(f"{name:56s} {per*1e3:9.2f} ms   checksum {ref[0]:.1f}")
    return per, ref


def current(a_idx, r_idx, s_idx, inv, active):
    cube_idx = (a_idx * R + r_idx) * S + s_idx
    ones = jnp.where(active, 1.0, 0.0)
    iv = jnp.where(active, inv, 0.0)
    idx = jnp.where(active, cube_idx, 0)
    cnt = jnp.zeros((NB,), jnp.float32).at[idx].add(ones)
    ivc = jnp.zeros((NB,), jnp.float32).at[idx].add(iv)
    return cnt, ivc


def sorted_scatter(a_idx, r_idx, s_idx, inv, active):
    cube_idx = (a_idx * R + r_idx) * S + s_idx
    key = jnp.where(active, cube_idx, NB)          # dead keys sink to the end
    skey, sinv = jax.lax.sort((key, inv), num_keys=1)
    ok = skey < NB
    idx = jnp.where(ok, skey, NB - 1)
    cnt = jnp.zeros((NB,), jnp.float32).at[idx].add(
        jnp.where(ok, 1.0, 0.0), indices_are_sorted=True)
    ivc = jnp.zeros((NB,), jnp.float32).at[idx].add(
        jnp.where(ok, sinv, 0.0), indices_are_sorted=True)
    return cnt, ivc


def sorted_2col(a_idx, r_idx, s_idx, inv, active):
    cube_idx = (a_idx * R + r_idx) * S + s_idx
    key = jnp.where(active, cube_idx, NB)
    skey, sinv = jax.lax.sort((key, inv), num_keys=1)
    ok = skey < NB
    idx = jnp.where(ok, skey, NB - 1)
    vals = jnp.stack([jnp.where(ok, 1.0, 0.0), jnp.where(ok, sinv, 0.0)], axis=-1)
    out = jnp.zeros((NB, 2), jnp.float32).at[idx].add(
        vals, indices_are_sorted=True)
    return out


def seg_reduce(a_idx, r_idx, s_idx, inv, active):
    cube_idx = (a_idx * R + r_idx) * S + s_idx
    key = jnp.where(active, cube_idx, NB)
    skey, sinv = jax.lax.sort((key, inv), num_keys=1)
    pref = jnp.concatenate([jnp.zeros((1,), jnp.float32), jnp.cumsum(sinv)])
    bins = jnp.arange(NB + 1, dtype=jnp.int32)
    bounds = jnp.searchsorted(skey, bins, side="left")
    cnt = (bounds[1:] - bounds[:-1]).astype(jnp.float32)
    ivc = pref[bounds[1:]] - pref[bounds[:-1]]
    return cnt, ivc


args = (a_idx, r_idx, s_idx, inv, active)
_, ref = timeit("a) current: two random scatter-adds", current, *args)
for name, fn in (("b) sort + two sorted scatter-adds", sorted_scatter),
                 ("d) sort + one 2-column sorted scatter", sorted_2col),
                 ("c) sort + run-boundary searchsorted reduce", seg_reduce)):
    _, got = timeit(name, fn, *args)
    print(f"   match vs current: {abs(got[0]-ref[0]) < 1.0 and abs(got[1]-ref[1]) < 1.0}")

# the sort alone, for attribution
def sort_only(a_idx, r_idx, s_idx, inv, active):
    cube_idx = (a_idx * R + r_idx) * S + s_idx
    key = jnp.where(active, cube_idx, NB)
    return jax.lax.sort((key, inv), num_keys=1)
timeit("   (sort alone)", sort_only, *args)

# ---------------------------------------------------------------------------
# RESULTS (TPU v5e, jax 0.9.0, 2026-08-21 — round 4, N=1M, 23.3M bins):
#   a) current: two random scatter-adds        22.7 ms
#   b) sort + two sorted scatter-adds          21.8 ms   (match; sort alone
#                                                         is 18.6 ms of it)
#   d) sort + one 2-column sorted scatter      87.2 ms   (rejected: slower)
#   c) sort + run-boundary searchsorted        3923 ms   (rejected: 23M
#                                                         run-head queries)
#
# Conclusion (closes VERDICT r3 item 6): the XLA random-scatter floor
# STANDS. Sorting converts the scatters to near-sequential writes (~3 ms
# for both), but the radix/merge sort itself costs 18.6 ms — the same HBM
# random-traffic bill paid in a different currency. The azimuth-tiled
# Pallas alternative is ruled out separately: Mosaic on this toolchain has
# no in-kernel dynamic scatter (scripts/probe_pallas_gather.py), and the
# MXU one-hot formulation is O(bins) per tile — 23M bins makes it
# unviable. The polar cube's two scatter-adds therefore remain the
# documented memory-system floor (docs/DEPLOYMENT.md roofline table).
# ---------------------------------------------------------------------------
