"""Variant measurements: delta-cumsum reconstruction + sort-min alternatives."""
import time
import numpy as np
import jax, jax.numpy as jnp

F = 1 << 22
N = 1 << 20
n = 204
NN = n * n
n_steps = 353
step = jnp.float32(0.0283)
MAXR = 1 << 17

rng = np.random.default_rng(0)
k = np.clip(rng.poisson(99, N), 1, 353).astype(np.int64)
offs = np.cumsum(k)
starts_np = (offs - k).astype(np.int32)
starts = jnp.asarray(starts_np)
raytbl = jax.random.normal(jax.random.PRNGKey(0), (8, N), jnp.float32)
total = int(offs[-1])

def timeit(name, fn, *args, n_it=10):
    f = jax.jit(fn)
    r = f(*args); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n_it):
        r = f(*args)
    jax.block_until_ready(r)
    print(f"{name:52s} {(time.perf_counter()-t0)/n_it*1e3:8.2f} ms")
    return r

t = jnp.asarray([0.0, 0.0, 0.5], jnp.float32)
half_n = jnp.float32(0.5 * n)
res = 0.04

def _cell(cx, cy):
    ix = jnp.clip(jnp.trunc(cx / res + half_n).astype(jnp.int32), 0, n - 1)
    iy = jnp.clip(jnp.trunc(cy / res + half_n).astype(jnp.int32), 0, n - 1)
    return n * ix + iy, ix, iy

# --- A. current: owner recovery + row8 gather + math ---
def cur(lo):
    ids = lo + jnp.arange(F, dtype=jnp.int32)
    live = ids < total
    base = jnp.searchsorted(starts, lo, side="left").astype(jnp.int32)
    pos = starts - lo
    in_chunk = (pos >= 0) & (pos < F)
    ind = jnp.zeros((F,), jnp.int32).at[jnp.where(in_chunk, pos, 0)].add(
        jnp.where(in_chunk, 1, 0))
    ray = jnp.clip(base + jnp.cumsum(ind) - 1, 0, N - 1)
    row8 = raytbl[:, ray]
    return row8, live

def math_part(row8, ids, live):
    rdx, rdy, rdz = row8[0], row8[1], row8[2]
    pex, pey, pez = row8[3], row8[4], row8[5]
    _MOD = 1 << 20
    ids_mod = (ids % _MOD).astype(jnp.float32)
    m_f = ids_mod - row8[7]
    m_f = jnp.where(m_f < 0, m_f + _MOD, m_f)
    m = jnp.clip(m_f.astype(jnp.int32), 0, n_steps - 1)
    s_cur = (m + 1).astype(jnp.float32) * step
    sx = t[0] + rdx * s_cur
    sy = t[1] + rdy * s_cur
    nz = t[2] + rdz * s_cur
    nidx, ix, iy = _cell(sx, sy)
    pn = jnp.concatenate([nidx[:1], nidx[:-1]])
    fresh = (m == 0) | (nidx != pn)
    inside = (ix > 0) & (ix < n - 1) & (iy > 0) & (iy < n - 1)
    d = ((pex - sx) ** 2 + (pey - sy) ** 2) + (pez - nz) ** 2
    active = live & fresh & inside & (d >= 0.1)
    return nidx, nz, active

def cur_full(lo):
    ids = lo + jnp.arange(F, dtype=jnp.int32)
    row8, live = cur(lo)
    return math_part(row8, ids, live)
rA = timeit("A: owner+gather+math (current)", cur_full, jnp.int32(0), n_it=5)

# --- B. delta-cumsum reconstruction + math ---
def delta_full(lo):
    ids = lo + jnp.arange(F, dtype=jnp.int32)
    live = ids < total
    base = jnp.searchsorted(starts, lo, side="right").astype(jnp.int32) - 1
    base = jnp.maximum(base, 0)
    sl = jax.lax.dynamic_slice(starts, (base,), (MAXR,))
    rows = jax.lax.dynamic_slice(raytbl, (0, base), (8, MAXR))
    bits = jax.lax.bitcast_convert_type(rows, jnp.int32)
    d8 = bits - jnp.concatenate([bits[:, :1] * 0, bits[:, :-1]], axis=1)
    d8 = d8.at[:, 0].set(bits[:, 0])  # first sliced ray: absolute value
    pos = sl - lo
    ok = (pos > 0) & (pos < F)
    # position 0 takes the base ray's absolute bits; others take deltas
    posc = jnp.where(ok, pos, F)
    buf = jnp.zeros((8, F + 1), jnp.int32)
    buf = buf.at[:, posc].add(jnp.where(ok, d8, 0),
                              indices_are_sorted=True, unique_indices=False)
    buf = buf.at[:, 0].add(bits[:, 0])
    row8 = jax.lax.bitcast_convert_type(jnp.cumsum(buf[:, :F], axis=1),
                                        jnp.float32)
    return math_part(row8, ids, live)
rB = timeit("B: delta-cumsum reconstruction + math", delta_full, jnp.int32(0), n_it=5)
print("   match:", all(bool(jnp.all(a == b)) for a, b in zip(rA, rB)))

# --- sort-min variants ---
nidx = jax.random.randint(jax.random.PRNGKey(2), (F,), 0, NN, jnp.int32)
nz = jax.random.normal(jax.random.PRNGKey(3), (F,))
mask = jax.random.uniform(jax.random.PRNGKey(4), (F,)) < 0.05

def sortmin2(ni, z, msk):
    key2 = jnp.where(msk, z, jnp.inf)
    skey, snz = jax.lax.sort((ni, key2), num_keys=2)
    cells = jnp.arange(NN, dtype=ni.dtype)
    p = jnp.searchsorted(skey, cells, side="left")
    pc = jnp.minimum(p, F - 1)
    return jnp.where(skey[pc] == cells, snz[pc], jnp.inf)
m2 = timeit("sort-min num_keys=2 (current)", sortmin2, nidx, nz, mask, n_it=5)

def sortmin1(ni, z, msk):
    key2 = jnp.where(msk, z, jnp.inf)
    skey, snz = jax.lax.sort((ni, key2), num_keys=1)
    # segmented min over runs: log2(F) shifted-min passes with boundary guard
    val = snz
    sh = 1
    while sh < F:
        other = jnp.concatenate([val[sh:], jnp.full((sh,), jnp.inf)])
        okey = jnp.concatenate([skey[sh:], jnp.full((sh,), -1, skey.dtype)])
        val = jnp.where(okey == skey, jnp.minimum(val, other), val)
        sh <<= 1
    cells = jnp.arange(NN, dtype=ni.dtype)
    p = jnp.searchsorted(skey, cells, side="left")
    pc = jnp.minimum(p, F - 1)
    return jnp.where(skey[pc] == cells, val[pc], jnp.inf)
# NOTE: log-passes = 22 full-array min passes — probably slow; measure anyway
m1 = timeit("sort nk=1 + 22 shifted-min passes", sortmin1, nidx, nz, mask, n_it=3)
print("   match:", bool(jnp.all(m1 == m2)))

# monotone uint32 of f32, then single-array sort of composite int64? x64 off.
# variant: sort ONLY (u32key) where key = (nidx<<? ) impossible. skip.

# variant: segment_min after nk=1 sort
def sortmin_seg(ni, z, msk):
    key2 = jnp.where(msk, z, jnp.inf)
    skey, snz = jax.lax.sort((ni, key2), num_keys=1)
    return jax.ops.segment_min(snz, skey, num_segments=NN,
                               indices_are_sorted=True)
m3 = timeit("sort nk=1 + segment_min(sorted)", sortmin_seg, nidx, nz, mask, n_it=5)
print("   match:", bool(jnp.all(jnp.where(jnp.isfinite(m2), m3 == m2, True))))
