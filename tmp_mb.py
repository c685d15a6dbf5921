"""Micro-bench: flat-march chunk-body primitive variants on the real chip."""
import time, functools
import jax, jax.numpy as jnp
import numpy as np

F = 1 << 22          # 4M samples per chunk
N = 1 << 20          # 1M rays
NN = 204 * 204       # map cells

key = jax.random.PRNGKey(0)
# realistic: ~99 live samples per ray on average, sorted non-decreasing owner
k = np.clip(np.random.default_rng(0).poisson(99, N), 1, 353).astype(np.int32)
starts = np.concatenate([[0], np.cumsum(k)[:-1]]).astype(np.int32)
owner_full = np.repeat(np.arange(N, dtype=np.int32), k)
owner = jnp.asarray(owner_full[:F])                     # sorted gather idx
raytbl = jax.random.normal(key, (8, N), jnp.float32)
pack = jax.random.normal(key, (7, NN), jnp.float32)
nidx = jax.random.randint(key, (F,), 0, NN, jnp.int32)  # random cell ids
nz = jax.random.normal(key, (F,))
mask = jax.random.uniform(key, (F,)) < 0.05
starts_j = jnp.asarray(starts)

def timeit(name, fn, *args, n=10):
    fn_j = jax.jit(fn)
    r = fn_j(*args); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn_j(*args)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{name:55s} {dt:8.2f} ms")
    return r

# 1. baseline packed column gather (current impl)
timeit("raytbl[:, owner] (8,F) gather", lambda t, o: t[:, o], raytbl, owner)

# 2. sorted-gather hint
def g_sorted(t, o):
    return t.at[:, o].get(indices_are_sorted=True, unique_indices=False)
timeit("raytbl[:, owner] sorted hint", g_sorted, raytbl, owner)

# 2b. transpose layout (N, 8) row gather with sorted hint
tbl_t = raytbl.T.copy()
def g_rows(t, o):
    return t.at[o].get(indices_are_sorted=True, unique_indices=False)
timeit("raytbl.T[owner] (F,8) row gather sorted", g_rows, tbl_t, owner)

# 3. delta + int32 cumsum reconstruction (bitwise exact)
MAXR = 1 << 16
def delta_cumsum(t, st, lo):
    base = jnp.searchsorted(st, lo, side="right").astype(jnp.int32) - 1
    sl = jax.lax.dynamic_slice(st, (base,), (MAXR,))          # starts slice
    rows = jax.lax.dynamic_slice(t, (0, base), (8, MAXR))     # contiguous!
    bits = jax.lax.bitcast_convert_type(rows, jnp.int32)
    d = bits - jnp.pad(bits[:, :-1], ((0, 0), (1, 0)))        # delta per ray
    pos = sl - lo
    ok = (pos > 0) & (pos < F)
    posc = jnp.where(ok, pos, F)
    buf = jnp.zeros((8, F + 1), jnp.int32)
    buf = buf.at[:, posc].add(jnp.where(ok, d, 0),
                              indices_are_sorted=True, unique_indices=False)
    buf = buf.at[:, 0].add(bits[:, 0])
    out = jnp.cumsum(buf[:, :F], axis=1)
    return jax.lax.bitcast_convert_type(out, jnp.float32)
r3 = timeit("delta + 8x int32 cumsum reconstruction", delta_cumsum,
            raytbl, starts_j, jnp.int32(0))
r1 = raytbl[:, owner]
print("  bit-exact vs gather:", bool(jnp.all(
    jax.lax.bitcast_convert_type(r3, jnp.int32)
    == jax.lax.bitcast_convert_type(r1, jnp.int32))))

# 4. pack gather at 4M (small table)
timeit("pack[:, nidx] (7,F) gather small table", lambda t, o: t[:, o], pack, nidx)

# 5. current owner recovery (scatter + cumsum over full chunk)
def owner_rec(st, lo):
    base = jnp.searchsorted(st, lo, side="left").astype(jnp.int32)
    pos = st - lo
    in_chunk = (pos >= 0) & (pos < F)
    ind = jnp.zeros((F,), jnp.int32).at[jnp.where(in_chunk, pos, 0)].add(
        jnp.where(in_chunk, 1, 0))
    return jnp.clip(base + jnp.cumsum(ind) - 1, 0, N - 1)
timeit("owner recovery scatter(N)+cumsum (current)", owner_rec, starts_j, jnp.int32(0))

# 5b. owner recovery via sliced scatter (MAXR) + cumsum
def owner_rec2(st, lo):
    base = jnp.searchsorted(st, lo, side="right").astype(jnp.int32) - 1
    sl = jax.lax.dynamic_slice(st, (base,), (MAXR,))
    pos = sl - lo
    ok = (pos > 0) & (pos < F)
    posc = jnp.where(ok, pos, F)
    ind = jnp.zeros((F + 1,), jnp.int32).at[posc].add(
        jnp.where(ok, 1, 0), indices_are_sorted=True)
    return jnp.clip(base + jnp.cumsum(ind[:F]), 0, N - 1)
r5 = timeit("owner recovery sliced scatter+cumsum", owner_rec2, starts_j, jnp.int32(0))
print("  owner match:", bool(jnp.all(r5 == owner)))

# 6. sort-based per-cell min (current)
def sort_min(ni, z, m):
    key2 = jnp.where(m, z, jnp.inf)
    skey, snz = jax.lax.sort((ni, key2), num_keys=2)
    cells = jnp.arange(NN, dtype=ni.dtype)
    p = jnp.searchsorted(skey, cells, side="left")
    pc = jnp.minimum(p, F - 1)
    return jnp.where(skey[pc] == cells, snz[pc], jnp.inf)
timeit("sort-based per-cell min (current)", sort_min, nidx, nz, mask)

# 6b. scatter-min with hints
def scat_min(ni, z, m):
    return jnp.full((NN,), jnp.inf).at[jnp.where(m, ni, NN - 1)].min(
        jnp.where(m, z, jnp.inf))
timeit("XLA scatter-min", scat_min, nidx, nz, mask)

# 7. int32 cumsum alone at (8, F)
timeit("8x int32 cumsum (8,F)", lambda b: jnp.cumsum(b, axis=1),
       jnp.zeros((8, F), jnp.int32))
