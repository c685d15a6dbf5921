"""Ablate the _exact_flat chunk body piece by piece on the chip."""
import time
import numpy as np
import jax, jax.numpy as jnp
from elevation_mapping_cupy_tpu.ops import scatter

F = 1 << 22
N = 1 << 20
n = 204
NN = n * n
n_steps = 353
step = jnp.float32(0.0283)

rng = np.random.default_rng(0)
k = np.clip(rng.poisson(99, N), 1, 353).astype(np.int64)
offs = np.cumsum(k)
starts_np = (offs - k).astype(np.int32)
starts = jnp.asarray(starts_np)
raytbl = jax.random.normal(jax.random.PRNGKey(0), (8, N), jnp.float32)
pack = jax.random.normal(jax.random.PRNGKey(1), (7, NN), jnp.float32)
t = jnp.asarray([0.0, 0.0, 0.5], jnp.float32)
total = int(offs[-1])
print("total live:", total, "chunks:", -(-total // F))

def timeit(name, fn, *args, n_it=10):
    f = jax.jit(fn)
    r = f(*args); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n_it):
        r = f(*args)
    jax.block_until_ready(r)
    print(f"{name:48s} {(time.perf_counter()-t0)/n_it*1e3:8.2f} ms")

half_n = jnp.float32(0.5 * n)
res = 0.04

def _cell(cx, cy):
    ix = jnp.clip(jnp.trunc(cx / res + half_n).astype(jnp.int32), 0, n - 1)
    iy = jnp.clip(jnp.trunc(cy / res + half_n).astype(jnp.int32), 0, n - 1)
    return n * ix + iy, ix, iy

def body(lo):
    ids = lo + jnp.arange(F, dtype=jnp.int32)
    live = ids < total
    base = jnp.searchsorted(starts, lo, side="left").astype(jnp.int32)
    pos = starts - lo
    in_chunk = (pos >= 0) & (pos < F)
    ind = jnp.zeros((F,), jnp.int32).at[jnp.where(in_chunk, pos, 0)].add(
        jnp.where(in_chunk, 1, 0))
    ray = jnp.clip(base + jnp.cumsum(ind) - 1, 0, N - 1)
    row8 = raytbl[:, ray]
    rdx, rdy, rdz = row8[0], row8[1], row8[2]
    pex, pey, pez = row8[3], row8[4], row8[5]
    dec_amount = row8[6]
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
    s_p0 = m[:1].astype(jnp.float32) * step
    p0idx, _, _ = _cell(t[0] + rdx[:1] * s_p0, t[1] + rdy[:1] * s_p0)
    pn = jnp.concatenate([p0idx, nidx[:-1]])
    fresh = (m == 0) | (nidx != pn)
    inside = (ix > 0) & (ix < n - 1) & (iy > 0) & (iy < n - 1)
    d = ((pex - sx) ** 2 + (pey - sy) ** 2) + (pez - nz) ** 2
    active = live & fresh & inside & (d >= 0.1)
    row = pack[:, nidx]
    ub_cond = nz < row[2]
    write_ub_a = active & (row[3] == 1.0) & ub_cond
    penet = row[0] > nz + 0.01 - row[1]
    product = rdx * row[4] + rdy * row[5] + rdz * row[6]
    hit = active & (row[3] == 2.0) & penet & (jnp.abs(product) >= 0.5)
    adds = scatter.scatter_add_streams_2d(
        n, n, nidx,
        [jnp.where(hit, dec_amount, 0.0), jnp.ones_like(dec_amount)],
        hit, exact=(False, True)).reshape(2, -1)
    write_ub = write_ub_a | (hit & ub_cond)
    key2 = jnp.where(write_ub, nz, jnp.inf)
    skey, snz = jax.lax.sort((nidx, key2), num_keys=2)
    cells = jnp.arange(NN, dtype=nidx.dtype)
    p = jnp.searchsorted(skey, cells, side="left")
    pc = jnp.minimum(p, F - 1)
    cellmin = jnp.where(skey[pc] == cells, snz[pc], jnp.inf)
    return adds, cellmin

timeit("FULL chunk body", body, jnp.int32(0), n_it=5)

# ablations: stop at various stages
def upto_owner(lo):
    base = jnp.searchsorted(starts, lo, side="left").astype(jnp.int32)
    pos = starts - lo
    in_chunk = (pos >= 0) & (pos < F)
    ind = jnp.zeros((F,), jnp.int32).at[jnp.where(in_chunk, pos, 0)].add(
        jnp.where(in_chunk, 1, 0))
    return jnp.clip(base + jnp.cumsum(ind) - 1, 0, N - 1)
timeit("owner recovery only", upto_owner, jnp.int32(0))

def upto_masks(lo):
    ids = lo + jnp.arange(F, dtype=jnp.int32)
    live = ids < total
    ray = upto_owner(lo)
    row8 = raytbl[:, ray]
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
    return nidx, nz, active, row8[6]
timeit("owner + row8 gather + per-sample math", upto_masks, jnp.int32(0))

def upto_pack(lo):
    nidx, nz, active, dec_amount = upto_masks(lo)
    row = pack[:, nidx]
    hit = active & (row[3] == 2.0) & (row[0] > nz + 0.01 - row[1])
    return hit
timeit("... + pack gather + tests", upto_pack, jnp.int32(0))

def upto_scatter(lo):
    nidx, nz, active, dec_amount = upto_masks(lo)
    row = pack[:, nidx]
    hit = active & (row[3] == 2.0) & (row[0] > nz + 0.01 - row[1])
    adds = scatter.scatter_add_streams_2d(
        n, n, nidx,
        [jnp.where(hit, dec_amount, 0.0), jnp.ones_like(dec_amount)],
        hit, exact=(False, True)).reshape(2, -1)
    return adds
timeit("... + MXU scatter", upto_scatter, jnp.int32(0))
