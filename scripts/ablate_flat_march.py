"""Stage-by-stage ablation of the _exact_flat chunk body at the deployed
operating point (1M uniform cloud, 353 ray steps) — round-4 evidence for
which stage to attack for the <=1s exact-raycast target.

Also measures candidate replacements:
  * two-level block cumsum vs jnp.cumsum for the (8, F) reconstruction
  * nk=1 sort + sorted segment_min vs the 2-key sort for the ub min
  * compact-then-sort ub min (writer-sparse path)
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


from elevation_mapping_cupy_tpu import core, init_state
from elevation_mapping_cupy_tpu.config import load_config
from elevation_mapping_cupy_tpu.nn.traversability import default_weights
from elevation_mapping_cupy_tpu.ops import raycast as rc
from elevation_mapping_cupy_tpu.ops import pointcloud as pcops
from elevation_mapping_cupy_tpu.ops import scatter
from elevation_mapping_cupy_tpu.ops.geometry import associate_points

n_pts = int(os.environ.get("NPTS", 1_000_000))
cfg = load_config(os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "configs", "core_param.yaml")).replace(
    raycast_mode="exact", max_points=n_pts)
print("n_ray_steps:", cfg.n_ray_steps, "chunk:", cfg.raycast_flat_chunk)

w = default_weights()
rng = np.random.default_rng(0)
pts = rng.uniform(-4, 4, (n_pts, 3)).astype(np.float32)
pts[:, 2] = rng.uniform(-0.2, 0.5, n_pts).astype(np.float32)
points = jnp.asarray(pts)
mask = jnp.ones((n_pts,), bool)
R = jnp.eye(3)
t = jnp.asarray([0.0, 0.0, 0.5], jnp.float32)
zero = jnp.float32(0.0)
state = init_state(cfg)
state = core.update_pointcloud(state, points, mask, R, t, zero, zero, w, cfg)
_ = float(jnp.sum(state.layers[2]))

# converged-ish inputs for the march
t_c = t - state.center
assoc = associate_points(points, mask, R, t_c, cfg)
counts = pcops.error_counting(state.layers, assoc, cfg)
layers, _ = pcops.point_fusion(state.layers, assoc, counts.point_cnt, cfg)
normal = state.normal
inlier = counts.inlier_cnt

triv = jax.jit(lambda v: v + 1.0)
_ = float(triv(jnp.float32(0.0)))
t0 = time.perf_counter()
for _ in range(10):
    _ = float(triv(jnp.float32(0.0)))
FLOOR = (time.perf_counter() - t0) / 10
print(f"host sync floor: {FLOOR*1e3:.1f} ms")


def timeit(name, fn, *args, n_it=5):
    f = jax.jit(lambda *a: jax.tree.map(
        lambda x: jnp.sum(x.astype(jnp.float32)), fn(*a)))
    r = f(*args)
    _ = [float(x) for x in jax.tree.leaves(r)]
    t0 = time.perf_counter()
    for _ in range(n_it):
        r = f(*args)
        _ = [float(x) for x in jax.tree.leaves(r)][:1]
    per = (time.perf_counter() - t0) / n_it - FLOOR
    print(f"{name:58s} {per*1e3:9.2f} ms")
    return per


# ---- whole march ----
timeit("_exact_flat full", lambda: rc._exact_flat(
    layers, normal, assoc, inlier, t_c, cfg), n_it=3)

# ---- replicate the setup (outside chunk loop) ----
dt_ = layers.dtype
n = cfg.cell_n
n_steps = cfg.n_ray_steps
step = jnp.asarray(cfg.ray_step, dt_)
p = assoc.world
vvec = p - t_c
norm_ = jnp.linalg.norm(vvec, axis=-1)
rdir = jnp.where(norm_[:, None] > 0, vvec / jnp.maximum(norm_, 1e-30)[:, None], 0.0)
ray_length = jnp.minimum(norm_, cfg.max_ray_length)
steps_v = (jnp.arange(1, n_steps + 1, dtype=dt_)) * step
k1 = jnp.searchsorted(steps_v, ray_length, side="left")
k2 = jnp.searchsorted(steps_v, norm_ - jnp.sqrt(jnp.asarray(0.1, dt_)) + step,
                      side="right")
k = jnp.where(assoc.valid, jnp.minimum(k1, k2), 0).astype(jnp.int32)
offsets = jnp.cumsum(k)
starts = offsets - k
total = int(offsets[-1])
print("live samples:", total, f"({total/n_pts:.1f}/ray)")

pack = rc._exact_precompute(layers, normal, inlier, cfg)
dec_amount_ray = cfg.cleanup_step / (ray_length / cfg.max_ray_length)
tbl_bits = jnp.concatenate(
    [jax.lax.bitcast_convert_type(
        jnp.stack([rdir[:, 0], rdir[:, 1], rdir[:, 2],
                   p[:, 0], p[:, 1], p[:, 2], dec_amount_ray], axis=0),
        jnp.int32),
     starts[None].astype(jnp.int32)], axis=0)

F = int(cfg.raycast_flat_chunk)
slice_rays = min(rc._FLAT_SLICE_RAYS, n_pts, F)
n_chunks = (total + F - 1) // F
print(f"chunks: {n_chunks} x {F}")

lo0 = jnp.int32(0)


def recon(lo):
    base_r = jnp.maximum(
        jnp.searchsorted(starts, lo, side="right").astype(jnp.int32) - 1, 0)
    sl = jax.lax.dynamic_slice(
        tbl_bits, (0, jnp.minimum(base_r, n_pts - slice_rays)), (8, slice_rays))
    d8 = sl - jnp.concatenate([sl[:, :1], sl[:, :-1]], axis=1)
    pos = sl[7] - lo
    ok = (pos > 0) & (pos < F)
    posc = jnp.clip(pos, 0, F)
    buf = jnp.zeros((8, F + 1), jnp.int32)
    buf = buf.at[:, posc].add(jnp.where(ok, d8, 0), indices_are_sorted=True)
    base_col = jax.lax.dynamic_slice(tbl_bits, (0, base_r), (8, 1))
    buf = buf.at[:, 0].add(base_col[:, 0])
    return jnp.cumsum(buf[:, :F], axis=1)


bits8 = jax.jit(recon)(lo0)
bits8 = jax.block_until_ready(bits8)
timeit("recon: delta + 8x cumsum (current)", recon, lo0)


def recon_2level(lo):
    base_r = jnp.maximum(
        jnp.searchsorted(starts, lo, side="right").astype(jnp.int32) - 1, 0)
    sl = jax.lax.dynamic_slice(
        tbl_bits, (0, jnp.minimum(base_r, n_pts - slice_rays)), (8, slice_rays))
    d8 = sl - jnp.concatenate([sl[:, :1], sl[:, :-1]], axis=1)
    pos = sl[7] - lo
    ok = (pos > 0) & (pos < F)
    posc = jnp.clip(pos, 0, F)
    buf = jnp.zeros((8, F + 1), jnp.int32)
    buf = buf.at[:, posc].add(jnp.where(ok, d8, 0), indices_are_sorted=True)
    base_col = jax.lax.dynamic_slice(tbl_bits, (0, base_r), (8, 1))
    buf = buf.at[:, 0].add(base_col[:, 0])
    # two-level prefix: blocks of 512
    Bk = 512
    x = buf[:, :F].reshape(8, F // Bk, Bk)
    within = jnp.cumsum(x, axis=2)
    carry = jnp.cumsum(within[:, :, -1], axis=1)
    carry = jnp.concatenate([jnp.zeros((8, 1), jnp.int32), carry[:, :-1]], axis=1)
    return (within + carry[:, :, None]).reshape(8, F)


r2l = jax.jit(recon_2level)(lo0)
print("  2level == cumsum:", bool(jnp.all(r2l == bits8)))
timeit("recon: delta + two-level block cumsum", recon_2level, lo0)

# ---- math part (given bits8) ----
half_n = jnp.asarray(0.5 * n, dt_)


def _cell(cx, cy):
    ix = jnp.clip(jnp.trunc(cx / cfg.resolution + half_n).astype(jnp.int32), 0, n - 1)
    iy = jnp.clip(jnp.trunc(cy / cfg.resolution + half_n).astype(jnp.int32), 0, n - 1)
    return n * ix + iy, ix, iy


def math_part(bits8, lo):
    ids = lo + jnp.arange(F, dtype=jnp.int32)
    live = ids < total
    row7 = jax.lax.bitcast_convert_type(bits8[:7], dt_)
    rdx, rdy, rdz = row7[0], row7[1], row7[2]
    pex, pey, pez = row7[3], row7[4], row7[5]
    m = jnp.clip(ids - bits8[7], 0, n_steps - 1)
    s_cur = (m + 1).astype(dt_) * step
    sx = t_c[0] + rdx * s_cur
    sy = t_c[1] + rdy * s_cur
    nz = t_c[2] + rdz * s_cur
    nidx, ix, iy = _cell(sx, sy)
    s_p0 = m[:1].astype(dt_) * step
    p0idx, _, _ = _cell(t_c[0] + rdx[:1] * s_p0, t_c[1] + rdy[:1] * s_p0)
    pn = jnp.concatenate([p0idx, nidx[:-1]])
    fresh = (m == 0) | (nidx != pn)
    inside = (ix > 0) & (ix < n - 1) & (iy > 0) & (iy < n - 1)
    d = ((pex - sx) ** 2 + (pey - sy) ** 2) + (pez - nz) ** 2
    active = live & fresh & inside & (d >= 0.1)
    return nidx, nz, active, rdx, rdy, rdz, row7[6]


outs = jax.jit(math_part)(bits8, lo0)
outs = jax.block_until_ready(outs)
timeit("math: ids->cells/masks (given bits8)", math_part, bits8, lo0)

nidx, nz, active, rdx, rdy, rdz, dec_amt = outs


def gather_and_tests(nidx, nz, active, rdx, rdy, rdz):
    row = pack[:, nidx]
    ub_cond = nz < row[2]
    write_ub_a = active & (row[3] == 1.0) & ub_cond
    penet = row[0] > nz + 0.01 - row[1]
    product = rdx * row[4] + rdy * row[5] + rdz * row[6]
    not_vertical = jnp.abs(product) >= cfg.cleanup_cos_thresh
    hit = active & (row[3] == 2.0) & penet & not_vertical
    return hit, write_ub_a | (hit & (nz < row[2]))


hit, write_ub = jax.block_until_ready(jax.jit(gather_and_tests)(
    nidx, nz, active, rdx, rdy, rdz))
timeit("gather pack + per-sample tests", gather_and_tests,
       nidx, nz, active, rdx, rdy, rdz)
print("  hit frac:", float(jnp.mean(hit.astype(jnp.float32))),
      " write_ub frac:", float(jnp.mean(write_ub.astype(jnp.float32))))


def mxu_scatter(nidx, hit, dec_amt):
    return scatter.scatter_add_streams_2d(
        n, n, nidx,
        [jnp.where(hit, dec_amt, 0.0).astype(dt_), jnp.ones_like(dec_amt)],
        hit, exact=(False, True))


timeit("MXU 2-stream scatter", mxu_scatter, nidx, hit, dec_amt)


def sortmin_cur(nidx, nz, write_ub):
    key2 = jnp.where(write_ub, nz, jnp.inf)
    skey, snz = jax.lax.sort((nidx, key2), num_keys=2)
    cells = jnp.arange(n * n, dtype=nidx.dtype)
    pos = jnp.searchsorted(skey, cells, side="left")
    posc = jnp.minimum(pos, F - 1)
    return jnp.where(skey[posc] == cells, snz[posc], jnp.inf)


ub_cur = jax.block_until_ready(jax.jit(sortmin_cur)(nidx, nz, write_ub))
timeit("ubmin: 2-key sort + run head (current)", sortmin_cur, nidx, nz, write_ub)


def sortmin_nk1_seg(nidx, nz, write_ub):
    key2 = jnp.where(write_ub, nz, jnp.inf)
    skey, snz = jax.lax.sort((nidx, key2), num_keys=1)
    return jax.ops.segment_min(snz, skey, num_segments=n * n,
                               indices_are_sorted=True)


ub1 = jax.block_until_ready(jax.jit(sortmin_nk1_seg)(nidx, nz, write_ub))
eq = bool(jnp.all(jnp.where(jnp.isfinite(ub_cur), ub1 == ub_cur, ~jnp.isfinite(ub1))))
print("  nk1+segmin == current:", eq)
timeit("ubmin: nk=1 sort + sorted segment_min", sortmin_nk1_seg,
       nidx, nz, write_ub)


def sortmin_compact(nidx, nz, write_ub):
    # compact writers to the front (monotone positions -> sorted scatter),
    # then sort only W slots (static cap F//4), fallback not modeled here
    Wcap = F // 4
    posw = jnp.cumsum(write_ub.astype(jnp.int32)) - 1
    posc = jnp.where(write_ub, jnp.minimum(posw, Wcap - 1), Wcap)
    cn = jnp.full((Wcap + 1,), n * n, jnp.int32).at[posc].set(
        jnp.where(write_ub, nidx, n * n), indices_are_sorted=True)
    cz = jnp.full((Wcap + 1,), jnp.inf, dt_).at[posc].set(
        jnp.where(write_ub, nz, jnp.inf), indices_are_sorted=True)
    skey, snz = jax.lax.sort((cn[:Wcap], cz[:Wcap]), num_keys=2)
    cells = jnp.arange(n * n, dtype=nidx.dtype)
    pos = jnp.searchsorted(skey, cells, side="left")
    pc = jnp.minimum(pos, Wcap - 1)
    return jnp.where(skey[pc] == cells, snz[pc], jnp.inf)


ub2 = jax.block_until_ready(jax.jit(sortmin_compact)(nidx, nz, write_ub))
print("  compact == current:", bool(jnp.all(
    jnp.where(jnp.isfinite(ub_cur), ub2 == ub_cur, ~jnp.isfinite(ub2)))))
timeit("ubmin: compact writers + sort F/4", sortmin_compact, nidx, nz, write_ub)

# 2-part dec scatter cost
def mxu_scatter_2part(nidx, hit, dec_amt):
    return scatter.scatter_add_streams_2d(
        n, n, nidx,
        [jnp.where(hit, dec_amt, 0.0).astype(dt_), jnp.ones_like(dec_amt)],
        hit, exact=(True, True))   # dec treated bf16-exact (1 part) lower bound
timeit("MXU scatter lower bound (both exact parts)", mxu_scatter_2part,
       nidx, hit, dec_amt)
