"""Ray-cast visibility cleanup — divergence-free fixed-step march.

Re-derivation of the sequential per-thread ray loop in the reference
add_points_kernel (custom_kernels.py:198-259) as a batched march: a
``lax.scan`` over a *static* number of steps (max_ray_length / (res/sqrt 2)),
where each step gathers map values for all rays at once and scatters
validity-decrements / variance-adds / upper-bound candidates into cell space.

Race resolutions R1 (snapshot reads) and R3 (min-height upper-bound write)
per tests/golden/reference_numpy.py.
"""

from __future__ import annotations

import os
from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import MapConfig
from . import scatter
from .geometry import PointAssociation, cell_indices, flat_cell_index, is_inside

__all__ = [
    "visibility_cleanup",
    "visibility_cleanup_exact",
    "visibility_cleanup_polar",
    "resolve_raycast_mode",
    "AdaptiveExactRouter",
]


# Routing constants measured on TPU v5e (see the `auto` rationale in
# visibility_cleanup and the flat-vs-scan rationale in
# visibility_cleanup_exact). Like pallas_scatter's VMEM table, they are env-
# overridable so a different chip generation can retune WITHOUT code edits:
#   ELEV_TPU_RAYCAST_AUTO_MAX_STEPS   — `auto` picks exact only when the
#                                       march is at most this many steps
#   ELEV_TPU_RAYCAST_AUTO_WORK_RATIO  — ...and march work x ratio < cube work
#   ELEV_TPU_RAYCAST_FLAT_MIN_SAMPLES — exact impl `auto` picks the flat
#                                       march once n_steps*max_points reaches
#                                       this (expansion overhead amortized)
def _env_int(name: str, default: int) -> int:
    v = os.environ.get(name)
    return int(v) if v else default


def _env_float(name: str, default: float) -> float:
    v = os.environ.get(name)
    return float(v) if v else default


_AUTO_MAX_STEPS = _env_int("ELEV_TPU_RAYCAST_AUTO_MAX_STEPS", 12)
_AUTO_WORK_RATIO = _env_int("ELEV_TPU_RAYCAST_AUTO_WORK_RATIO", 8)
_FLAT_MIN_SAMPLES = _env_int("ELEV_TPU_RAYCAST_FLAT_MIN_SAMPLES", 1 << 20)
# Ray-table slice width for the flat march's delta+cumsum reconstruction
# (see _exact_flat): the fast path covers chunks spanning at most this many
# rays (typical chunks span chunk/mean_live ≈ 2-5% of it); wider chunks fall
# back to the owner-gather path via lax.cond, so any value is correct.
_FLAT_SLICE_RAYS = _env_int("ELEV_TPU_RAYCAST_FLAT_SLICE_RAYS", 1 << 17)
# Gated march knobs (_exact_gated): samples per gate segment, cells per gate
# block (both 8 — see the coverage proof in _exact_gated), and the ratio of
# coarse-chunk segments to fine-launch segments (higher = finer adaptivity,
# more fixed launch overhead when many segments survive).
_GATE_SEG = _env_int("ELEV_TPU_RAYCAST_GATE_SEG", 8)
_GATE_BLOCK = _env_int("ELEV_TPU_RAYCAST_GATE_BLOCK", 8)
_GATE_FINE_DIV = _env_int("ELEV_TPU_RAYCAST_GATE_FINE_DIV", 16)
_GATE_MIN_FINE = _env_int("ELEV_TPU_RAYCAST_GATE_MIN_FINE", 1024)
# Coarse-pass sizing: segments per coarse chunk (each covers C x that many
# samples — big chunks amortize per-round overhead; 4M segments ≈ 32M
# samples ≈ 3 rounds at the deployed 1M-pt cloud) and the ray-table slice
# cap for the coarse delta+cumsum reconstruction (coarse chunks span ~C x
# more rays than sample chunks, so the slice is correspondingly wider).
_GATE_COARSE_CHUNK = _env_int("ELEV_TPU_RAYCAST_GATE_COARSE_CHUNK", 1 << 22)
_GATE_SLICE_RAYS = _env_int("ELEV_TPU_RAYCAST_GATE_SLICE_RAYS", 1 << 20)
# Adaptive gated/flat routing (AdaptiveExactRouter): once the previous
# update's segment survivor fraction reaches this, the gate culls too little
# to pay for the coarse pass (measured on v5e: gated ~= flat * survivors +
# ~15% coarse overhead, so breakeven sits near 0.85) and the next update is
# routed to the ungated flat march; a gated probe every _GATE_PROBE_PERIOD
# updates re-measures so the router converges back when the map rejuvenates.
_GATE_SURV_ROUTE = _env_float("ELEV_TPU_RAYCAST_GATE_SURV_ROUTE", 0.8)
_GATE_PROBE_PERIOD = _env_int("ELEV_TPU_RAYCAST_GATE_PROBE_PERIOD", 8)


def resolve_raycast_mode(cfg: MapConfig) -> str:
    """Static resolution of cfg.raycast_mode's "auto".

    Wall-clock, not FLOPs: the exact march is a lax.scan of cfg.n_ray_steps
    *serialized* scatter rounds, so its latency is ~steps x per-round cost
    regardless of how little total work each round does, while the polar
    cube is ~3 parallel scatters. Measured on v5e (70 steps): exact
    26/78/381/1592 ms at 2k/10k/50k/200k pts vs polar 5.2/5.7/6.6/12.7 ms —
    polar wins at every size once the march is more than a handful of
    steps. Keep exact only for short-ray configs where the scan can't
    dominate AND the cube would be much larger than the march."""
    mode = cfg.raycast_mode
    if mode != "auto":
        return mode
    cube = cfg.azimuth_bins * (cfg.n_ray_steps + 2) * cfg.raycast_elevation_bins
    march = cfg.n_ray_steps * cfg.max_points
    return (
        "exact"
        if (cfg.n_ray_steps <= _AUTO_MAX_STEPS and march * _AUTO_WORK_RATIO < cube)
        else "polar"
    )


def visibility_cleanup(
    layers: jax.Array,
    normal: jax.Array,
    assoc: PointAssociation,
    inlier_cnt: jax.Array,
    t: jax.Array,
    cfg: MapConfig,
    with_aux: bool = False,
) -> jax.Array:
    """Dispatch on cfg.raycast_mode ("polar" fast / "exact" reference-parity /
    "auto" = whichever formulation does less work for this config).

    With ``with_aux=True`` returns ``(layers, aux)`` where aux carries the
    gated march's segment survivor fraction (1.0 for every other
    implementation — they cull nothing), the routing signal consumed by
    :class:`AdaptiveExactRouter`.
    """
    if not cfg.enable_visibility_cleanup or cfg.n_ray_steps <= 0:
        if with_aux:
            return layers, {"gate_survivor_frac": jnp.ones((), layers.dtype)}
        return layers
    mode = resolve_raycast_mode(cfg)
    if mode == "polar":
        out = visibility_cleanup_polar(layers, normal, assoc, inlier_cnt, t, cfg)
        if with_aux:
            return out, {"gate_survivor_frac": jnp.ones((), layers.dtype)}
        return out
    return visibility_cleanup_exact(
        layers, normal, assoc, inlier_cnt, t, cfg, with_aux=with_aux
    )


def visibility_cleanup_exact(
    layers: jax.Array,
    normal: jax.Array,
    assoc: PointAssociation,
    inlier_cnt: jax.Array,
    t: jax.Array,
    cfg: MapConfig,
    with_aux: bool = False,
) -> jax.Array:
    """Apply visibility cleanup for one pointcloud; returns updated layers.

    Two implementations with bit-identical per-sample semantics (reference:
    custom_kernels.py:198-259): the step-serialized ``lax.scan`` march and a
    compacted flat march that enumerates only the *active* (ray, step)
    samples — a ray of length ``l`` contributes ``~l/step`` samples rather
    than the full ``n_ray_steps`` — and scatters them in fixed-size chunks
    (``cfg.raycast_flat_chunk``). At the deployed operating point (1M pts,
    353 steps) the scan serializes 353 scatter rounds regardless of how
    short the rays are; the flat march does ``ceil(sum(live)/chunk)`` rounds.
    """
    if not cfg.enable_visibility_cleanup or cfg.n_ray_steps <= 0:
        if with_aux:
            return layers, {"gate_survivor_frac": jnp.ones((), layers.dtype)}
        return layers
    impl = cfg.raycast_exact_impl
    if impl == "auto":
        # expansion machinery (cumsum + per-chunk segment-start scatter) only
        # pays for itself once the dense march exceeds ~1M raw samples; at
        # that scale the gated variant (flat + conservative segment culling)
        # strictly dominates on realistic scenes (writers are sparse)
        impl = (
            "gated"
            if cfg.n_ray_steps * cfg.max_points >= _FLAT_MIN_SAMPLES
            else "scan"
        )
    if impl == "gated":
        out, frac = _exact_gated(layers, normal, assoc, inlier_cnt, t, cfg)
        if with_aux:
            return out, {"gate_survivor_frac": frac}
        return out
    if impl == "flat":
        out = _exact_flat(layers, normal, assoc, inlier_cnt, t, cfg)
    else:
        out = _exact_scan(layers, normal, assoc, inlier_cnt, t, cfg)
    if with_aux:
        # flat/scan run no gate: report "everything survives" so the router
        # never flips toward gated purely on their account
        return out, {"gate_survivor_frac": jnp.ones((), layers.dtype)}
    return out


def _exact_precompute(layers, normal, inlier_cnt, cfg):
    """Cell-side snapshot pack shared by both exact implementations."""
    snap = layers.reshape(7, -1)          # R1 snapshot
    nrm = normal.reshape(3, -1)
    ic = inlier_cnt.reshape(-1)
    # Everything the march reads is per-CELL and constant across steps, so
    # the cell-side conditions are precomputed once here and the scan body
    # pays ONE packed gather + per-sample compares (measured at 1M indices:
    # ten scalar gathers 64 ms, (M,10) row gather 3.6 ms, packed column
    # gather 1.3 ms). Selections only — no re-associated arithmetic — so
    # the comparisons are bit-identical to the inline forms:
    #   q         = min(var,1)*0.05 (the penetration slack term)
    #   ub_thresh = +inf where is_upper_bound<0.5 else upper_bound
    #               (nz < ub_thresh  ==  (nz < ub) | (iub < 0.5))
    #   code      = 1 for invalid cells (upper-bound branch), 2 for cells
    #               eligible to be hit (valid & not-recent & not wall), 0 else
    q = jnp.minimum(snap[1], 1.0) * 0.05
    ub_thresh = jnp.where(snap[6] < 0.5, jnp.inf, snap[5])
    is_invalid = snap[2] < 0.5
    hit_ok = (
        ~is_invalid
        & (snap[4] >= 0.5)
        & ~((ic > cfg.wall_num_thresh) & (snap[4] < 1.0))
    )
    code = jnp.where(is_invalid, 1.0, jnp.where(hit_ok, 2.0, 0.0))
    pack = jnp.stack(
        [snap[0], q, ub_thresh, code, nrm[0], nrm[1], nrm[2]],
        axis=0,
    )                                      # (7, n*n)
    return pack


def _exact_scan(
    layers: jax.Array,
    normal: jax.Array,
    assoc: PointAssociation,
    inlier_cnt: jax.Array,
    t: jax.Array,
    cfg: MapConfig,
) -> jax.Array:
    """Step-serialized exact march: one scatter round per ray step."""
    n = cfg.cell_n
    n_steps = cfg.n_ray_steps
    step = jnp.asarray(cfg.ray_step, layers.dtype)
    pack = _exact_precompute(layers, normal, inlier_cnt, cfg)

    p = assoc.world                        # (N, 3) ray endpoints
    vvec = p - t                           # sensor → point
    norm = jnp.linalg.norm(vvec, axis=-1)
    rdir = jnp.where(norm[:, None] > 0, vvec / jnp.maximum(norm, 1e-30)[:, None], 0.0)
    ray_length = jnp.minimum(norm, cfg.max_ray_length)

    # `valid` for the in-loop is_valid(x,y,z,...) re-check; padding rays
    # contribute nothing because assoc.valid is already masked by pad_mask.
    ray_ok = assoc.valid

    zero_cells = jnp.zeros((n * n,), layers.dtype)
    init = (
        zero_cells,                                    # Σ validity decrement
        zero_cells,                                    # Σ variance add
        jnp.full((n * n,), jnp.inf, layers.dtype),     # min upper-bound cand.
        jnp.full(p.shape[:1], -1, jnp.int32),          # last cell per ray
    )

    def body(carry, s):
        dec, var, ubmin, last = carry
        sample = t + rdir * s[..., None]               # (N, 3)
        ix, iy = cell_indices(sample[:, :2], jnp.zeros((2,), layers.dtype), cfg)
        nidx = flat_cell_index(ix, iy, cfg)
        on_ray = s < ray_length                        # loop bound s < ray_length
        fresh = nidx != last
        last = jnp.where(on_ray, nidx, last)
        inside = is_inside(ix, iy, cfg)
        d = jnp.sum((p - sample) ** 2, axis=-1)
        active = on_ray & fresh & inside & (d >= 0.1) & ray_ok

        row = pack[:, nidx]                            # (7, N) one gather
        nz = sample[:, 2]

        ub_cond = nz < row[2]

        # branch A: invalid cell → upper-bound candidate only
        write_ub_a = active & (row[3] == 1.0) & ub_cond

        # branch B: eligible cell penetrated by a non-vertical ray
        penet = row[0] > nz + 0.01 - row[1]
        product = (
            rdir[:, 0] * row[4]
            + rdir[:, 1] * row[5]
            + rdir[:, 2] * row[6]
        )
        not_vertical = jnp.abs(product) >= cfg.cleanup_cos_thresh
        hit = active & (row[3] == 2.0) & penet & not_vertical

        dec_amount = cfg.cleanup_step / (ray_length / cfg.max_ray_length)
        # routed scatter choke point: MXU matmul-scatter on TPU (the fused
        # XLA 2-stream scatter costs 23.5 ms/step at 1M rays vs 2.8 ms),
        # XLA elsewhere; also inherits spatial-sharding dispatch
        adds = scatter.scatter_add_streams_2d(
            n,
            n,
            nidx,
            [
                jnp.where(hit, dec_amount, 0.0).astype(layers.dtype),
                jnp.ones_like(dec_amount),  # hit count; masked by `hit`
            ],
            hit,
            exact=(False, True),
        ).reshape(2, -1)
        dec = dec + adds[0]
        var = var + adds[1] * cfg.outlier_variance

        write_ub = write_ub_a | (hit & ub_cond)
        ubmin = jnp.minimum(
            ubmin, scatter.scatter_min(n * n, nidx, nz, write_ub, jnp.inf)
        )
        return (dec, var, ubmin, last), None

    steps = (jnp.arange(1, n_steps + 1, dtype=layers.dtype)) * step
    (dec, var, ubmin, _), _ = jax.lax.scan(body, init, steps)

    flat = layers.reshape(7, -1)
    flat = flat.at[2].add(-dec)
    flat = flat.at[1].add(var)
    wrote = jnp.isfinite(ubmin)
    flat = flat.at[5].set(jnp.where(wrote, ubmin, flat[5]))
    flat = flat.at[6].set(jnp.where(wrote, 1.0, flat[6]))
    return flat.reshape(7, n, n)


def _next_pow2(x: int) -> int:
    return 1 << max(int(x) - 1, 0).bit_length()


def _exact_flat(
    layers: jax.Array,
    normal: jax.Array,
    assoc: PointAssociation,
    inlier_cnt: jax.Array,
    t: jax.Array,
    cfg: MapConfig,
) -> jax.Array:
    """Compacted exact march over the active (ray, step) samples.

    A ray is live at step ``m`` only while ``steps[m] < ray_length`` (and the
    endpoint-proximity test ``d >= 0.1`` kills the last ~sqrt(0.1)/step
    samples), so the dense (N, n_steps) march is mostly dead work. This
    implementation:

    1. counts per-ray live steps ``k`` with the *same float comparisons* the
       scan would make (``jnp.searchsorted`` over the shared steps vector),
       trimming the endpoint region with one full step of slack so the exact
       in-pass ``d >= 0.1`` mask — not the trim — decides boundary samples;
    2. lays the samples out contiguously per ray (``offsets = cumsum(k)``)
       and walks them in fixed-size chunks under a ``lax.while_loop`` whose
       trip count adapts to the actual live total ``K``;
    3. reconstructs each sample's per-ray row WITHOUT any per-sample gather
       or owner-index recovery: ray rows are bitcast to int32, their
       consecutive-ray DELTAS are scattered at the segment starts falling
       inside the chunk (a ~_FLAT_SLICE_RAYS-wide dynamic slice of the ray
       table, indices sorted), and an int32 prefix sum rebuilds every
       sample's row — int32 addition is exact, so the reconstructed f32
       bits equal the gathered ones BIT-FOR-BIT (measured on v5e @4M
       samples: 20 ms vs 38 ms for owner-recovery + packed gather). Chunks
       spanning more rays than the slice width (pathological short-ray
       clouds) fall back to the gather path under a ``lax.cond``;
    4. replays the scan body's per-sample math bit-identically (same sample
       position, cell index, dedup-vs-previous-step, penetration and
       cos-threshold tests) and issues ONE routed 2-stream scatter + ONE
       scatter-min per chunk.

    Only float *summation order* differs from the scan (chunk-major instead
    of step-major), bounded by ~1e-6 relative on the decrement/variance
    accumulators; the upper-bound min is order-exact.
    """
    n = cfg.cell_n
    n_steps = cfg.n_ray_steps
    dt = layers.dtype
    # the delta+cumsum row reconstruction bitcasts ray rows to int32 (exact
    # integer telescoping); a non-32-bit layer dtype would change the bitcast
    # rank and silently break it (ADVICE r3) — fail loudly instead
    if jnp.dtype(dt).itemsize != 4:
        raise TypeError(
            f"_exact_flat requires a 32-bit layer dtype (got {jnp.dtype(dt)}); "
            "use raycast_exact_impl='scan' for other dtypes"
        )
    step = jnp.asarray(cfg.ray_step, dt)
    pack = _exact_precompute(layers, normal, inlier_cnt, cfg)

    p = assoc.world                        # (N, 3) ray endpoints
    n_rays = p.shape[0]
    vvec = p - t
    norm = jnp.linalg.norm(vvec, axis=-1)
    rdir = jnp.where(norm[:, None] > 0, vvec / jnp.maximum(norm, 1e-30)[:, None], 0.0)
    ray_length = jnp.minimum(norm, cfg.max_ray_length)
    dec_amount_ray = cfg.cleanup_step / (ray_length / cfg.max_ray_length)

    steps = (jnp.arange(1, n_steps + 1, dtype=dt)) * step   # == the scan's

    # live-step count per ray: steps[m] < ray_length (searchsorted 'left'
    # performs the identical f32 `<` compares) intersected with the endpoint
    # trim steps[m] <= norm - sqrt(0.1) + step. The +step slack guarantees no
    # sample the scan's d >= 0.1 test would accept is dropped: d differs from
    # (norm - s)^2 only by rdir-normalization rounding (~1e-6 relative).
    k1 = jnp.searchsorted(steps, ray_length, side="left")
    k2 = jnp.searchsorted(steps, norm - jnp.sqrt(jnp.asarray(0.1, dt)) + step,
                          side="right")
    k = jnp.where(assoc.valid, jnp.minimum(k1, k2), 0).astype(jnp.int32)
    offsets = jnp.cumsum(k)                # inclusive
    starts = offsets - k                   # non-decreasing segment starts
    total = offsets[-1]

    # Per-ray data the chunk body needs: 7 f32 rows plus the int32 segment
    # start, packed as int32 ROWS of one (8, N) table (f32 rows bitcast) so
    # the in-chunk reconstruction is one sliced delta-scatter + one (8, F)
    # prefix sum. The start row yields the in-ray step index directly
    # (m = flat id - start, exact int32).
    tbl_bits = jnp.concatenate(
        [
            jax.lax.bitcast_convert_type(
                jnp.stack(
                    [
                        rdir[:, 0], rdir[:, 1], rdir[:, 2],
                        p[:, 0], p[:, 1], p[:, 2],
                        dec_amount_ray,
                    ],
                    axis=0,
                ),
                jnp.int32,
            ),
            starts[None].astype(jnp.int32),
        ],
        axis=0,
    )                                      # (8, N) int32

    # worst case K = max_points * n_steps; small configs get one right-sized
    # chunk instead of the full memory-knob chunk
    chunk = min(int(cfg.raycast_flat_chunk),
                _next_pow2(max(n_rays * n_steps, 1024)))
    slice_rays = min(_FLAT_SLICE_RAYS, n_rays, chunk)

    half_n = jnp.asarray(0.5 * n, dt)
    inv_res = jnp.asarray(1.0 / cfg.resolution, dt)

    def _cell_idx_planar(cx, cy):
        """Bit-identical inline of geometry.cell_indices on planar coords
        (center == 0, so the reference's (x - c) subtraction is a no-op)."""
        ix = jnp.clip(jnp.trunc(cx / cfg.resolution + half_n).astype(jnp.int32), 0, n - 1)
        iy = jnp.clip(jnp.trunc(cy / cfg.resolution + half_n).astype(jnp.int32), 0, n - 1)
        return n * ix + iy, ix, iy

    zero_cells = jnp.zeros((n * n,), dt)
    init = (
        jnp.zeros((), jnp.int32),                       # chunk counter
        zero_cells,                                     # Σ validity decrement
        zero_cells,                                     # Σ variance add
        jnp.full((n * n,), jnp.inf, dt),                # min upper-bound cand.
    )

    def cond(carry):
        return carry[0] * chunk < total

    def _rows_sliced(lo, base_r):
        """Delta + prefix-sum reconstruction of every sample's (8,) row.

        Sample i's row = row of the last ray whose start <= lo + i
        (``base_r`` for i = 0). Scatter each in-chunk ray's
        CONSECUTIVE-RAY DELTA (int32, exact) at its start position, seed
        position 0 with the base ray's absolute row, prefix-sum: the
        telescoping sum reproduces the gathered bits exactly (zero-length
        rays sharing a start all land their deltas on the same position,
        telescoping to the LAST tie — the same owner the gather path
        picks). Scatter indices are clipped (not masked-to-end) so the
        indices_are_sorted hint stays truthful; clipped positions carry
        zero deltas."""
        sl = jax.lax.dynamic_slice(
            tbl_bits,
            (0, jnp.minimum(base_r, n_rays - slice_rays)),
            (8, slice_rays),
        )
        d8 = sl - jnp.concatenate([sl[:, :1], sl[:, :-1]], axis=1)
        pos = sl[7] - lo                   # start positions rel. chunk
        ok = (pos > 0) & (pos < chunk)
        posc = jnp.clip(pos, 0, chunk)     # non-decreasing
        buf = jnp.zeros((8, chunk + 1), jnp.int32)
        buf = buf.at[:, posc].add(
            jnp.where(ok, d8, 0),
            indices_are_sorted=True,
            unique_indices=False,
        )
        base_col = jax.lax.dynamic_slice(tbl_bits, (0, base_r), (8, 1))
        buf = buf.at[:, 0].add(base_col[:, 0])
        return jnp.cumsum(buf[:, :chunk], axis=1)

    def _rows_gathered(lo, base_r):
        """Fallback for chunks spanning more rays than the slice width:
        owner-index recovery (scatter +1 at starts → prefix sum) followed
        by a packed column gather — the pre-reconstruction formulation,
        bit-identical output."""
        base = jnp.searchsorted(starts, lo, side="left").astype(jnp.int32)
        pos = starts - lo
        in_chunk = (pos >= 0) & (pos < chunk)
        ind = jnp.zeros((chunk,), jnp.int32).at[
            jnp.where(in_chunk, pos, 0)
        ].add(jnp.where(in_chunk, 1, 0))
        ray = jnp.clip(base + jnp.cumsum(ind) - 1, 0, n_rays - 1)
        return tbl_bits[:, ray]

    def body(carry):
        j, dec, var, ubmin = carry
        lo = j * chunk
        ids = lo + jnp.arange(chunk, dtype=jnp.int32)
        live = ids < total

        # owner of the chunk's first sample: LAST ray with start <= lo
        base_r = jnp.maximum(
            jnp.searchsorted(starts, lo, side="right").astype(jnp.int32) - 1, 0
        )
        # every ray starting inside the chunk must fall inside the slice
        hi = jnp.searchsorted(starts, lo + chunk, side="left").astype(jnp.int32)
        fits = hi <= jnp.minimum(base_r, n_rays - slice_rays) + slice_rays
        bits8 = jax.lax.cond(fits, _rows_sliced, _rows_gathered, lo, base_r)
        row7 = jax.lax.bitcast_convert_type(bits8[:7], dt)
        rdx, rdy, rdz = row7[0], row7[1], row7[2]
        pex, pey, pez = row7[3], row7[4], row7[5]
        dec_amount = row7[6]
        # in-ray step index: flat id minus the owning ray's segment start
        m = jnp.clip(ids - bits8[7], 0, n_steps - 1)

        s_cur = (m + 1).astype(dt) * step                 # == steps[m]
        sx = t[0] + rdx * s_cur
        sy = t[1] + rdy * s_cur
        nz = t[2] + rdz * s_cur
        nidx, ix, iy = _cell_idx_planar(sx, sy)
        # same-cell dedup vs the previous step's cell (the scan's `last`
        # carry): the previous sample of the same ray is the ADJACENT flat
        # id, so shift nidx by one; ray starts (m == 0) are fresh by
        # definition, leaving only the chunk's first element to recompute.
        s_p0 = m[:1].astype(dt) * step                    # == steps[m0 - 1]
        p0idx, _, _ = _cell_idx_planar(t[0] + rdx[:1] * s_p0,
                                       t[1] + rdy[:1] * s_p0)
        pn = jnp.concatenate([p0idx, nidx[:-1]])
        fresh = (m == 0) | (nidx != pn)
        inside = (ix > 0) & (ix < n - 1) & (iy > 0) & (iy < n - 1)
        d = ((pex - sx) ** 2 + (pey - sy) ** 2) + (pez - nz) ** 2
        active = live & fresh & inside & (d >= 0.1)

        row = pack[:, nidx]                               # (7, F) one gather
        ub_cond = nz < row[2]
        write_ub_a = active & (row[3] == 1.0) & ub_cond
        penet = row[0] > nz + 0.01 - row[1]
        product = rdx * row[4] + rdy * row[5] + rdz * row[6]
        not_vertical = jnp.abs(product) >= cfg.cleanup_cos_thresh
        hit = active & (row[3] == 2.0) & penet & not_vertical

        adds = scatter.scatter_add_streams_2d(
            n,
            n,
            nidx,
            [
                jnp.where(hit, dec_amount, 0.0).astype(dt),
                jnp.ones_like(dec_amount),  # hit count; masked by `hit`
            ],
            hit,
            exact=(False, True),
        ).reshape(2, -1)
        dec = dec + adds[0]
        var = var + adds[1] * cfg.outlier_variance

        write_ub = write_ub_a | (hit & ub_cond)
        # exact per-cell min via a 2-key sort instead of an XLA scatter-min
        # (measured on v5e @4M samples: sort 12 ms vs scatter-min 31 ms, and
        # min is order-free so the result is bit-identical): masked samples
        # carry +inf so they sink to each cell run's tail, then every cell
        # reads its run head with a vectorized binary search (40k queries
        # into the sorted 4M — negligible).
        key2 = jnp.where(write_ub, nz, jnp.inf)
        skey, snz = jax.lax.sort((nidx, key2), num_keys=2)
        cells = jnp.arange(n * n, dtype=nidx.dtype)
        pos = jnp.searchsorted(skey, cells, side="left")
        posc = jnp.minimum(pos, chunk - 1)
        cellmin = jnp.where(skey[posc] == cells, snz[posc], jnp.inf)
        ubmin = jnp.minimum(ubmin, cellmin)
        return (j + 1, dec, var, ubmin)

    _, dec, var, ubmin = jax.lax.while_loop(cond, body, init)

    flat = layers.reshape(7, -1)
    flat = flat.at[2].add(-dec)
    flat = flat.at[1].add(var)
    wrote = jnp.isfinite(ubmin)
    flat = flat.at[5].set(jnp.where(wrote, ubmin, flat[5]))
    flat = flat.at[6].set(jnp.where(wrote, 1.0, flat[6]))
    return flat.reshape(7, n, n)


def _exact_gated(
    layers: jax.Array,
    normal: jax.Array,
    assoc: PointAssociation,
    inlier_cnt: jax.Array,
    t: jax.Array,
    cfg: MapConfig,
) -> jax.Array:
    """Segment-gated exact march: the flat march plus conservative culling.

    Observation (measured at the deployed 1M-pt operating point): virtually
    every live (ray, step) sample is a NON-writer — it neither penetrates an
    eligible cell nor undercuts an invalid cell's upper bound — yet the flat
    march still pays the full reconstruct/gather/scatter/sort pipeline for
    it. A sample can only write when ``nz < zgate(cell)`` where ``zgate`` is
    a per-cell threshold derivable from the same R1 snapshot the march reads
    (custom_kernels.py:198-259 semantics):

      code 0 (ineligible)            -> -inf       (never writes)
      code 1 (invalid cell)          -> ub_thresh  (the nz < upper_bound test)
      code 2 (hit-eligible cell)     -> h - 0.01 + q  (the penetration test)

    This implementation groups each ray's live samples into segments of
    ``C = _GATE_SEG`` consecutive steps and, per segment, evaluates ONE
    conservative gate: ``min(nz_first, nz_last)`` (nz is linear in s, so the
    segment min is at an endpoint) against a 3x3-dilated block-max table of
    ``zgate`` (blocks of ``B = _GATE_BLOCK`` cells). Segments that fail the
    gate provably contain no writer and are skipped wholesale — non-writer
    samples have NO other side effect (the scan's ``last`` dedup carry is
    recomputed locally from the ray row). Survivors are compacted and
    replayed through the bit-exact per-sample pipeline in adaptive
    fine launches, so output differs from _exact_flat/_exact_scan only in
    float summation order of the decrement/variance accumulators (bounded
    ~1e-6 relative); the upper-bound min is order-exact.

    Coverage proof for the 3x3 dilation: a segment spans at most
    ``(C-1) * step = 7 * res/sqrt(2) ~= 4.95 res`` in xy, so every sample's
    cell lies within 6 cells of the segment-start cell; with B = 8 that is
    at most one block away, and clipping the start cell into the map is a
    per-axis projection (1-Lipschitz), so out-of-map starts keep the bound.
    Comparison slack: the gate adds 2e-4 (~1000x f32 rounding at O(1)
    heights) so reassociated threshold arithmetic can never exclude a true
    writer.

    Worst case (every segment survives) degrades gracefully to ~the flat
    march's cost plus the coarse pass (~15%); typical converged maps cull
    80-100% of samples. Returns ``(layers, survivor_frac)`` where
    survivor_frac (f32 scalar, 0.0 on an empty march — a sensor-dropout
    frame must not read as "gating is useless") is the fraction of
    live segments that passed the gate — the routing signal
    :class:`AdaptiveExactRouter` feeds back into the NEXT update's
    gated-vs-flat choice (VERDICT r4 item 5).
    """
    n = cfg.cell_n
    n_steps = cfg.n_ray_steps
    dt = layers.dtype
    if jnp.dtype(dt).itemsize != 4:
        raise TypeError(
            f"_exact_gated requires a 32-bit layer dtype (got {jnp.dtype(dt)}); "
            "use raycast_exact_impl='scan' for other dtypes"
        )
    step = jnp.asarray(cfg.ray_step, dt)
    pack = _exact_precompute(layers, normal, inlier_cnt, cfg)

    C = _GATE_SEG
    B = _GATE_BLOCK
    # Coverage invariant (see the proof above): a segment spans at most
    # (C-1)*ray_step in xy, which must fit the one-block reach of the 3x3
    # block dilation. C and B are independently env-overridable
    # (ELEV_TPU_RAYCAST_GATE_SEG / GATE_BLOCK), so an unpaired override
    # would SILENTLY cull true writers — fail loudly instead (ADVICE r4).
    if (C - 1) * cfg.ray_step > B * cfg.resolution:
        raise ValueError(
            f"gated-march coverage invariant violated: segment span "
            f"(GATE_SEG-1)*ray_step = {(C - 1) * cfg.ray_step:.4f} m exceeds "
            f"the dilated block reach GATE_BLOCK*resolution = "
            f"{B * cfg.resolution:.4f} m; raise ELEV_TPU_RAYCAST_GATE_BLOCK "
            "to at least ceil((GATE_SEG-1)/sqrt(2)) or lower GATE_SEG"
        )

    p = assoc.world
    n_rays = p.shape[0]
    vvec = p - t
    norm = jnp.linalg.norm(vvec, axis=-1)
    rdir = jnp.where(norm[:, None] > 0, vvec / jnp.maximum(norm, 1e-30)[:, None], 0.0)
    ray_length = jnp.minimum(norm, cfg.max_ray_length)
    dec_amount_ray = cfg.cleanup_step / (ray_length / cfg.max_ray_length)

    steps_v = (jnp.arange(1, n_steps + 1, dtype=dt)) * step
    k1 = jnp.searchsorted(steps_v, ray_length, side="left")
    k2 = jnp.searchsorted(steps_v, norm - jnp.sqrt(jnp.asarray(0.1, dt)) + step,
                          side="right")
    k = jnp.where(assoc.valid, jnp.minimum(k1, k2), 0).astype(jnp.int32)

    n_seg = (k + (C - 1)) // C
    seg_off = jnp.cumsum(n_seg)
    seg_starts = (seg_off - n_seg).astype(jnp.int32)
    total_seg = seg_off[-1]

    # ---- per-cell write gate -> dilated block-max table ----
    zgate = jnp.where(
        pack[3] == 1.0,
        pack[2],
        jnp.where(pack[3] == 2.0, pack[0] - 0.01 + pack[1], -jnp.inf),
    ).reshape(n, n)
    ii = jnp.arange(n)
    border = (ii == 0) | (ii == n - 1)
    zgate = jnp.where(border[:, None] | border[None, :], -jnp.inf, zgate)
    nb = (n + B - 1) // B
    zpad = jnp.full((nb * B, nb * B), -jnp.inf, dt).at[:n, :n].set(zgate)
    blkmax = jnp.max(zpad.reshape(nb, B, nb, B), axis=(1, 3))
    blkmax = jnp.pad(blkmax, 1, constant_values=-jnp.inf)
    gate_tbl = jnp.stack(
        [jnp.roll(jnp.roll(blkmax, di, 0), dj, 1) for di in (-1, 0, 1) for dj in (-1, 0, 1)]
    ).max(axis=0)[1:-1, 1:-1].reshape(-1)
    gate_eps = jnp.asarray(2e-4, dt)

    # ---- coarse (segment) table: rdir + seg_start + k + ray index ----
    coarse_tbl = jnp.concatenate(
        [
            jax.lax.bitcast_convert_type(
                jnp.stack([rdir[:, 0], rdir[:, 1], rdir[:, 2]], axis=0), jnp.int32
            ),
            seg_starts[None],
            k[None],
            jnp.arange(n_rays, dtype=jnp.int32)[None],
        ],
        axis=0,
    )                                      # (6, N) int32
    # ---- fine (per-ray) table gathered by ray index in fine launches ----
    fine_tbl = jnp.concatenate(
        [
            jax.lax.bitcast_convert_type(
                jnp.stack(
                    [rdir[:, 0], rdir[:, 1], rdir[:, 2],
                     p[:, 0], p[:, 1], p[:, 2], dec_amount_ray],
                    axis=0,
                ),
                jnp.int32,
            ),
            k[None],
        ],
        axis=0,
    )                                      # (8, N) int32

    worst_seg = n_rays * ((n_steps + C - 1) // C)
    Fc = min(_GATE_COARSE_CHUNK, max(int(cfg.raycast_flat_chunk), 1024),
             _next_pow2(max(worst_seg, 1024)))
    W_seg = min(max(Fc // _GATE_FINE_DIV, _GATE_MIN_FINE), Fc)
    Wf = W_seg * C                          # samples per fine launch
    slice_rays = min(_GATE_SLICE_RAYS, n_rays, Fc)

    half_n = jnp.asarray(0.5 * n, dt)

    def _cell_idx_planar(cx, cy):
        ix = jnp.clip(jnp.trunc(cx / cfg.resolution + half_n).astype(jnp.int32), 0, n - 1)
        iy = jnp.clip(jnp.trunc(cy / cfg.resolution + half_n).astype(jnp.int32), 0, n - 1)
        return n * ix + iy, ix, iy

    def _crows_sliced(lo, base_r):
        """Delta+cumsum reconstruction of per-segment ray rows (the flat
        march's scheme over the segment-start table; int32 telescoping is
        exact, ties at shared starts resolve to the last ray as the gather
        path would)."""
        sl = jax.lax.dynamic_slice(
            coarse_tbl, (0, jnp.minimum(base_r, n_rays - slice_rays)), (6, slice_rays)
        )
        d6 = sl - jnp.concatenate([sl[:, :1], sl[:, :-1]], axis=1)
        pos = sl[3] - lo
        ok = (pos > 0) & (pos < Fc)
        posc = jnp.clip(pos, 0, Fc)
        buf = jnp.zeros((6, Fc + 1), jnp.int32)
        buf = buf.at[:, posc].add(jnp.where(ok, d6, 0), indices_are_sorted=True,
                                  unique_indices=False)
        base_col = jax.lax.dynamic_slice(coarse_tbl, (0, base_r), (6, 1))
        buf = buf.at[:, 0].add(base_col[:, 0])
        return jnp.cumsum(buf[:, :Fc], axis=1)

    def _crows_gathered(lo, base_r):
        base = jnp.searchsorted(seg_starts, lo, side="left").astype(jnp.int32)
        pos = seg_starts - lo
        in_chunk = (pos >= 0) & (pos < Fc)
        ind = jnp.zeros((Fc,), jnp.int32).at[
            jnp.where(in_chunk, pos, 0)
        ].add(jnp.where(in_chunk, 1, 0))
        ray = jnp.clip(base + jnp.cumsum(ind) - 1, 0, n_rays - 1)
        return coarse_tbl[:, ray]

    zero_cells = jnp.zeros((n * n,), dt)
    init = (
        jnp.zeros((), jnp.int32),
        zero_cells,
        zero_cells,
        jnp.full((n * n,), jnp.inf, dt),
        jnp.zeros((), jnp.int32),          # Σ surviving segments (aux)
    )

    def cond(carry):
        return carry[0] * Fc < total_seg

    def body(carry):
        jc, dec, var, ubmin, surv = carry
        lo = jc * Fc
        base_r = jnp.maximum(
            jnp.searchsorted(seg_starts, lo, side="right").astype(jnp.int32) - 1, 0
        )
        hi = jnp.searchsorted(seg_starts, lo + Fc, side="left").astype(jnp.int32)
        fits = hi <= jnp.minimum(base_r, n_rays - slice_rays) + slice_rays
        bits6 = jax.lax.cond(fits, _crows_sliced, _crows_gathered, lo, base_r)
        rd3 = jax.lax.bitcast_convert_type(bits6[:3], dt)
        seg_id = lo + jnp.arange(Fc, dtype=jnp.int32)
        live = seg_id < total_seg
        m_lo = jnp.clip((seg_id - bits6[3]) * C, 0, max(n_steps - 1, 0))
        m_hi = jnp.clip(jnp.minimum(m_lo + C, bits6[4]) - 1, 0, max(n_steps - 1, 0))
        s_lo = (m_lo + 1).astype(dt) * step
        s_hi = (m_hi + 1).astype(dt) * step
        x0 = t[0] + rd3[0] * s_lo
        y0 = t[1] + rd3[1] * s_lo
        nz_min = jnp.minimum(t[2] + rd3[2] * s_lo, t[2] + rd3[2] * s_hi)
        _, ix, iy = _cell_idx_planar(x0, y0)
        gate = gate_tbl[(ix // B) * nb + (iy // B)]
        survive = live & (nz_min < gate + gate_eps)

        # compaction: positions clip(cnt-1) are NON-DECREASING (dead entries
        # repeat the previous survivor's slot with a zero add), so the sorted
        # hint is truthful and each survivor slot receives exactly one
        # nonzero contribution
        cnt = jnp.cumsum(survive.astype(jnp.int32))
        S = cnt[-1]
        posc = jnp.clip(cnt - 1, 0, Fc - 1)
        rbuf = jnp.zeros((Fc,), jnp.int32).at[posc].add(
            jnp.where(survive, bits6[5], 0),
            indices_are_sorted=True, unique_indices=False,
        )
        mbuf = jnp.zeros((Fc,), jnp.int32).at[posc].add(
            jnp.where(survive, m_lo, 0),
            indices_are_sorted=True, unique_indices=False,
        )

        def fcond(fc):
            return fc[0] < S

        def fbody(fc):
            off, dec, var, ubmin = fc
            wi = off + jnp.arange(W_seg, dtype=jnp.int32)
            wvalid = wi < S
            wic = jnp.minimum(wi, Fc - 1)
            ray = rbuf[wic]
            mlo = mbuf[wic]
            cols = fine_tbl[:, ray]                          # (8, W_seg)
            row7 = jax.lax.bitcast_convert_type(cols[:7], dt)
            fk = cols[7]
            # Expansion layout is (C, W_seg): sublane dim exactly C = 8,
            # lane dim a multiple of 128 — zero tile padding. (The (W_seg, C)
            # orientation pads the trailing 8-wide dim to 128 lanes: 16-128x
            # HBM blowup on every materialized temp, OOM at compile.) Sample
            # order within a launch is (step-within-segment major), which is
            # irrelevant: dec/var are order-free adds, ubmin is a min, and
            # `fresh` recomputes the predecessor cell directly.
            m = (mlo[None, :] + jnp.arange(C, dtype=jnp.int32)[:, None])  # (C, W_seg)
            livef = (wvalid[None, :] & (m < fk[None, :])).reshape(-1)
            mf = m.reshape(-1)

            def bc(row):                                     # (W_seg,) -> (Wf,)
                return jnp.broadcast_to(row[None, :], (C, W_seg)).reshape(-1)

            rdx, rdy, rdz = bc(row7[0]), bc(row7[1]), bc(row7[2])
            pex, pey, pez = bc(row7[3]), bc(row7[4]), bc(row7[5])
            dec_amount = bc(row7[6])
            s_cur = (mf + 1).astype(dt) * step               # == steps[mf]
            sx = t[0] + rdx * s_cur
            sy = t[1] + rdy * s_cur
            nz = t[2] + rdz * s_cur
            nidx, ix, iy = _cell_idx_planar(sx, sy)
            # previous-step cell recomputed from the ray row: bit-identical
            # to the scan's `last` carry (same formula, same inputs)
            s_prev = mf.astype(dt) * step                    # == steps[mf - 1]
            pidx, _, _ = _cell_idx_planar(t[0] + rdx * s_prev, t[1] + rdy * s_prev)
            fresh = (mf == 0) | (nidx != pidx)
            inside = (ix > 0) & (ix < n - 1) & (iy > 0) & (iy < n - 1)
            d = ((pex - sx) ** 2 + (pey - sy) ** 2) + (pez - nz) ** 2
            active = livef & fresh & inside & (d >= 0.1)

            row = pack[:, nidx]
            ub_cond = nz < row[2]
            write_ub_a = active & (row[3] == 1.0) & ub_cond
            penet = row[0] > nz + 0.01 - row[1]
            product = rdx * row[4] + rdy * row[5] + rdz * row[6]
            not_vertical = jnp.abs(product) >= cfg.cleanup_cos_thresh
            hit = active & (row[3] == 2.0) & penet & not_vertical

            adds = scatter.scatter_add_streams_2d(
                n, n, nidx,
                [jnp.where(hit, dec_amount, 0.0).astype(dt),
                 jnp.ones_like(dec_amount)],
                hit,
                exact=(False, True),
            ).reshape(2, -1)
            dec = dec + adds[0]
            var = var + adds[1] * cfg.outlier_variance

            write_ub = write_ub_a | (hit & ub_cond)
            key2 = jnp.where(write_ub, nz, jnp.inf)
            skey, snz = jax.lax.sort((nidx, key2), num_keys=2)
            cells = jnp.arange(n * n, dtype=nidx.dtype)
            pos = jnp.searchsorted(skey, cells, side="left")
            posm = jnp.minimum(pos, Wf - 1)
            cellmin = jnp.where(skey[posm] == cells, snz[posm], jnp.inf)
            ubmin = jnp.minimum(ubmin, cellmin)
            return (off + W_seg, dec, var, ubmin)

        _, dec, var, ubmin = jax.lax.while_loop(
            fcond, fbody, (jnp.zeros((), jnp.int32), dec, var, ubmin)
        )
        return (jc + 1, dec, var, ubmin, surv + S)

    _, dec, var, ubmin, surv = jax.lax.while_loop(cond, body, init)
    # empty march (sensor-dropout frame, everything NaN-filtered): report
    # 0.0, not 1.0 — a dropout frame carries no evidence that gating is
    # useless, and 1.0 would flip the router to the slower flat march on
    # the next REAL update (review r5)
    surv_frac = jnp.where(
        total_seg > 0,
        surv.astype(jnp.float32) / jnp.maximum(total_seg, 1).astype(jnp.float32),
        0.0,
    ).astype(dt)

    flat = layers.reshape(7, -1)
    flat = flat.at[2].add(-dec)
    flat = flat.at[1].add(var)
    wrote = jnp.isfinite(ubmin)
    flat = flat.at[5].set(jnp.where(wrote, ubmin, flat[5]))
    flat = flat.at[6].set(jnp.where(wrote, 1.0, flat[6]))
    return flat.reshape(7, n, n), surv_frac


class AdaptiveExactRouter:
    """Host-side gated/flat routing policy for ``raycast_exact_impl="auto"``.

    The gated march wins big when the gate culls (fresh/converged maps:
    80-100% of segments skipped) but pays ~15% over the flat march when
    nearly everything survives (aged maps where every cell is hit-eligible,
    DEPLOYMENT.md §8: 2.08 s gated vs 1.82 s flat at 1M aged/no-cull). The
    survivor fraction is computed inside the gated kernel anyway; this class
    closes the loop (VERDICT r4 item 5): it keeps the LAST gated update's
    fraction and routes the NEXT update to "flat" once it exceeds
    ``_GATE_SURV_ROUTE`` (default 0.8 ≈ the measured breakeven). Because the
    flat march runs no gate, gated PROBES re-measure — with exponential
    backoff (1, 2, 4, ... flat updates between probes, capped at
    ``_GATE_PROBE_PERIOD - 1``): a TRANSIENT high fraction (e.g. the very
    first update on an empty map, where every cell's gate is +inf) costs a
    single flat update before the next probe re-routes, while a PERSISTENT
    aged regime converges to one probe per period, bounding the overhead at
    +14%/period ≈ +1.8%.

    Usage (see ``mapper.ElevationMap.input_pointcloud`` and bench exact):

        router = AdaptiveExactRouter(cfg)
        impl = router.route()                  # "gated" | "flat" | None
        cfg_step = cfg.replace(raycast_exact_impl=impl) if impl else cfg
        state, aux = core.update_pointcloud_aux(..., cfg_step, ...)
        router.observe(impl, aux["gate_survivor_frac"])

    The observed value may stay a device scalar: it is only forced to a
    Python float at the NEXT ``route()`` call, by which time the update that
    produced it has long finished (no extra sync on the hot path).
    """

    def __init__(self, cfg: MapConfig, threshold: float = None,
                 probe_period: int = None):
        self.threshold = _GATE_SURV_ROUTE if threshold is None else threshold
        self.probe_period = (
            _GATE_PROBE_PERIOD if probe_period is None else probe_period
        )
        # adaptive only when the exact path actually runs AND impl "auto"
        # would statically resolve to gated
        self._eligible = (
            cfg.raycast_exact_impl == "auto"
            and cfg.enable_visibility_cleanup
            and cfg.n_ray_steps > 0
            and resolve_raycast_mode(cfg) == "exact"
            and cfg.n_ray_steps * cfg.max_points >= _FLAT_MIN_SAMPLES
        )
        self._last_frac = None        # device scalar or float from last probe
        self._flat_streak = 0
        self._flat_budget = 1         # doubles on confirming probes
        self._probe_pending = False

    def route(self):
        """Implementation for the next update: "gated"/"flat", or None when
        the static `auto` resolution (scan for tiny marches) should stand."""
        if not self._eligible:
            return None
        frac = None if self._last_frac is None else float(self._last_frac)
        if self._probe_pending:
            # last gated run was a probe: confirming -> longer flat streak,
            # refuting -> reset so the next flip re-probes immediately
            self._probe_pending = False
            if frac is not None and frac >= self.threshold:
                self._flat_budget = min(self._flat_budget * 2,
                                        max(self.probe_period - 1, 1))
            else:
                self._flat_budget = 1
        if frac is not None and frac >= self.threshold:
            if self._flat_streak < self._flat_budget:
                self._flat_streak += 1
                return "flat"
            self._flat_streak = 0
            self._probe_pending = True
            return "gated"
        return "gated"

    def observe(self, impl, surv_frac) -> None:
        """Record the survivor fraction from a gated update (non-gated
        updates carry no gate information and are ignored)."""
        if impl == "gated":
            self._last_frac = surv_frac


def visibility_cleanup_polar(
    layers: jax.Array,
    normal: jax.Array,
    assoc: PointAssociation,
    inlier_cnt: jax.Array,
    t: jax.Array,
    cfg: MapConfig,
) -> jax.Array:
    """Shadow-cube visibility cleanup — the TPU-native formulation.

    Instead of marching every ray (one gather/scatter round per step on a
    vector machine, custom_kernels.py:198-259), rays are binned ONCE into an
    (azimuth A, radius R, elevation S) cube holding {count, sum(1/ray_len),
    min slope}; a suffix scan along R turns it into "rays still active at
    radius >= r" aggregates, an azimuth prefix sum / ring min-pyramid makes
    the azimuth axis range-queryable. Each map cell then answers its
    penetration query with a handful of row gathers at (its azimuth window,
    its radius) plus a reduction over the S elevation buckets whose
    slope/inclination conditions it satisfies.

    Semantics match visibility_cleanup_exact up to tolerance-level
    quantization (azimuth window vs. exact march line, elevation-bucket
    boundaries, one-ray_step radius binning). Cell-side gates (validity,
    time, wall count, border) and the decrement/variance/upper-bound
    arithmetic are exact. Key identity: the reference's endpoint-proximity
    test d < 0.1 is (ray_len - s)^2 along the ray, so a ray is active
    exactly while s <= len3d - sqrt(0.1).

    Cost: ONE scatter over the cloud + dense scans + O(1) row gathers.
    """
    import math as _math

    n = cfg.cell_n
    A = cfg.azimuth_bins
    S = cfg.raycast_elevation_bins
    R = cfg.n_ray_steps + 2
    step = cfg.ray_step
    dt = layers.dtype
    two_pi = 2.0 * _math.pi

    p = assoc.world
    v = p - t
    len_xy = jnp.sqrt(v[:, 0] ** 2 + v[:, 1] ** 2)
    len3d = jnp.sqrt(jnp.maximum(jnp.sum(v * v, axis=-1), 1e-30))
    phi = jnp.arctan2(v[:, 2], len_xy)                    # elevation
    az = jnp.arctan2(v[:, 1], v[:, 0])                    # azimuth [-pi, pi]
    slope = v[:, 2] / jnp.maximum(len_xy, 1e-30)          # tan(phi)

    a_idx = jnp.clip(((az + _math.pi) * (A / two_pi)).astype(jnp.int32), 0, A - 1)
    s_idx = jnp.clip(((phi + _math.pi / 2) * (S / _math.pi)).astype(jnp.int32), 0, S - 1)

    ray_len = jnp.minimum(len3d, cfg.max_ray_length)
    s_max = jnp.minimum(len3d - jnp.sqrt(0.1), ray_len)   # active span (see doc)
    r_act = jnp.cos(phi) * s_max                          # xy radius bound
    r_idx = jnp.clip(jnp.round(r_act / step).astype(jnp.int32), 0, R - 1)
    active = assoc.valid & (r_act > 0) & (len3d > 0)

    cube_idx = (a_idx * R + r_idx) * S + s_idx            # layout (A, R, S)
    inv_len = 1.0 / jnp.maximum(ray_len, 1e-30)

    # two single-stream scatters: XLA's multi-column scatter lowering is ~3x
    # slower than two scalar scatters at this bin count (measured on v5e)
    cnt_cube = scatter.scatter_add(
        A * R * S, cube_idx, jnp.ones_like(inv_len), active
    ).reshape(A, R, S)
    inv_cube = scatter.scatter_add(A * R * S, cube_idx, inv_len, active).reshape(
        A, R, S
    )
    # Min ray slope per bucket: either an exact scatter-min + azimuth
    # min-pyramid, or (default) the bucket-center slope — the elevation
    # binning already quantizes slopes to a bucket (pi/S rad ≈ ±1.8 cm at
    # 1.5 m for S=128), so occupancy (cnt>0) carries the same information
    # and the scatter-min + pyramid (~9 ms at 1M pts) can be skipped.
    use_bins_slope = cfg.raycast_slope_from_bins
    if not use_bins_slope:
        slope_cube = scatter.scatter_min(
            A * R * S, cube_idx, slope, active, jnp.inf
        ).reshape(A, R, S)

    # suffix scans along R: "rays with r_act >= r"
    cnt_suf = jnp.flip(jnp.cumsum(jnp.flip(cnt_cube, 1), axis=1), 1)
    inv_suf = jnp.flip(jnp.cumsum(jnp.flip(inv_cube, 1), axis=1), 1)

    # azimuth prefix for range sums; pack cnt+inv into one (A, R, 2S) tensor
    packed = jnp.concatenate([cnt_suf, inv_suf], axis=-1)
    pref = jnp.cumsum(packed, axis=0)                     # (A, R, 2S)
    total = pref[-1]                                      # (R, 2S)

    # ring min-pyramid over azimuth: level l = window [a, a + 2^l).
    # Capped at 2^6: only cells within ~6 cells of the sensor need wider
    # windows, and an under-covered min there errs conservative (higher min,
    # fewer upper-bound writes).
    n_levels = min(cfg.raycast_pyramid_levels, max(1, _math.ceil(_math.log2(A))))
    if not use_bins_slope:
        slope_suf = jnp.flip(
            jax.lax.associative_scan(jnp.minimum, jnp.flip(slope_cube, 1), axis=1), 1
        )
        levels = [slope_suf]
        for l in range(1, n_levels + 1):
            prev = levels[-1]
            levels.append(jnp.minimum(prev, jnp.roll(prev, -(1 << (l - 1)), axis=0)))
        pyramid = jnp.stack(levels)                       # (L+1, A, R, S)

    # ---- per-cell evaluation ----
    i = jnp.arange(n * n)
    cx = ((i // n).astype(dt) + 0.5 - 0.5 * n) * cfg.resolution - t[0]
    cy = ((i % n).astype(dt) + 0.5 - 0.5 * n) * cfg.resolution - t[1]
    r_c = jnp.sqrt(cx * cx + cy * cy)
    a_c = jnp.arctan2(cy, cx)
    ai = jnp.clip(((a_c + _math.pi) * (A / two_pi)).astype(jnp.int32), 0, A - 1)
    ri = jnp.clip(jnp.round(r_c / step).astype(jnp.int32), 0, R - 1)
    in_range = (r_c <= cfg.max_ray_length) & (r_c >= step * 0.5)

    # azimuth half-window = the cell's true crossing band for rays at this
    # azimuth: a line at grid angle theta crosses cells over a perpendicular
    # band of width res*(|cos|+|sin|)
    abs_c = jnp.abs(jnp.cos(a_c))
    abs_s = jnp.abs(jnp.sin(a_c))
    band = cfg.resolution * (abs_c + abs_s)
    half_ang = jnp.arctan2(0.5 * band, jnp.maximum(r_c, 1e-6))
    hw = jnp.clip((half_ang * (A / two_pi)).astype(jnp.int32), 0, A // 2 - 1)
    lo = ai - hw
    hi = ai + hw
    width = 2 * hw + 1

    # single-row gathers at the joint (azimuth, radius) index — no large
    # intermediates
    pref_flat = pref.reshape(A * R, 2 * S)
    hi_rows = pref_flat[(hi % A) * R + ri]
    lo_rows0 = pref_flat[((lo - 1) % A) * R + ri]
    zero_lo = (lo % A) == 0
    lo_rows = jnp.where(zero_lo[:, None], 0.0, lo_rows0)
    tot_rows = total.reshape(R, 2 * S)[ri]
    wrapped = (lo % A) > (hi % A)
    sums_rows = jnp.where(
        wrapped[:, None], tot_rows - (lo_rows - hi_rows), hi_rows - lo_rows
    )
    cnt_k = sums_rows[:, :S]
    inv_k = sums_rows[:, S:]

    if not use_bins_slope:
        # windowed min query: level l = ceil(log2(width)); two windows cover it
        lvl = jnp.ceil(jnp.log2(width.astype(dt))).astype(jnp.int32)
        lvl = jnp.clip(lvl, 0, n_levels)
        start1 = lo % A
        start2 = (lo + width - (1 << lvl)) % A
        pyr_flat = pyramid.reshape((n_levels + 1) * A * R, S)
        m1 = pyr_flat[(lvl * A + start1) * R + ri]
        m2 = pyr_flat[(lvl * A + start2) * R + ri]
        slope_k_min = jnp.minimum(m1, m2)                 # (n*n, S)

    flatL = layers.reshape(7, -1)
    cell_h = flatL[0]
    cell_v = flatL[1]
    cell_valid = flatL[2]
    cell_t = flatL[4]
    cell_ub = flatL[5]
    cell_iub = flatL[6]
    nrm = normal.reshape(3, -1)
    ic = inlier_cnt.reshape(-1)

    row_i = i // n
    col_i = i % n
    inside = (row_i > 0) & (row_i < n - 1) & (col_i > 0) & (col_i < n - 1)

    phi_k = (jnp.arange(S, dtype=dt) + 0.5) * (_math.pi / S) - _math.pi / 2
    tan_k = jnp.tan(phi_k)
    cos_pk = jnp.cos(phi_k)
    sin_pk = jnp.sin(phi_k)

    safe_r = jnp.maximum(r_c, 1e-6)

    # The exact march's same-cell dedup evaluates each cell at its ENTRY
    # sample, not its center: expected evaluation radius is r_c minus half
    # the mean chord (res^2 / band) plus half the xy sample spacing.
    delta_k = cfg.ray_step * cos_pk                         # (S,) xy spacing
    mean_chord = cfg.resolution**2 / jnp.maximum(band, 1e-9)
    r_eval = jnp.maximum(
        safe_r[:, None] - 0.5 * mean_chord[:, None] + 0.5 * delta_k[None, :],
        1e-6,
    )                                                        # (n*n, S)

    s_star_num = cell_h - 0.01 + jnp.minimum(cell_v, 1.0) * 0.05 - t[2]
    pen_k = tan_k[None, :] * r_eval < s_star_num[:, None]

    g_c = jnp.cos(a_c) * nrm[0] + jnp.sin(a_c) * nrm[1]
    dot_k = jnp.abs(g_c[:, None] * cos_pk[None, :] + nrm[2][:, None] * sin_pk[None, :])
    cos_ok = dot_k >= cfg.cleanup_cos_thresh

    # Sampling-acceptance correction: the march only registers a crossing if
    # a sample lands inside the cell — P(hit | chord l) = min(1, l / delta).
    # Integrated over the chord profile of a square for grid angle theta this
    # gives an effective band  W_eff = band - delta*|cos||sin|  (delta below
    # the max chord) continuing to  res^2/delta  (above). Weight per bucket:
    mx = jnp.maximum(abs_c, abs_s)
    w_lin = band[:, None] - delta_k[None, :] * (abs_c * abs_s)[:, None]
    w_sat = (cfg.resolution**2) / jnp.maximum(delta_k[None, :], 1e-9)
    use_sat = delta_k[None, :] >= (cfg.resolution / jnp.maximum(mx, 1e-9))[:, None]
    w_eff = jnp.where(use_sat, w_sat, w_lin)
    accept_k = jnp.clip(w_eff / jnp.maximum(band[:, None], 1e-9), 0.0, 1.0)

    has_rays = cnt_k > 0.5
    is_invalid = cell_valid < 0.5
    not_recent = cell_t >= 0.5
    wall_skip = (ic > cfg.wall_num_thresh) & (cell_t < 1.0)
    cell_gate = in_range & inside & ~is_invalid & not_recent & ~wall_skip

    hit_k = has_rays & pen_k & cos_ok & cell_gate[:, None]
    dec = cfg.cleanup_step * cfg.max_ray_length * jnp.sum(
        jnp.where(hit_k, inv_k * accept_k, 0.0), axis=1
    )
    var = cfg.outlier_variance * jnp.sum(jnp.where(hit_k, cnt_k * accept_k, 0.0), axis=1)

    # upper-bound candidates: min ray height per bucket at the eval radius
    if use_bins_slope:
        nz_k = t[2] + r_eval * tan_k[None, :]
    else:
        nz_k = t[2] + r_eval * slope_k_min
    ub_cond_k = (cell_iub[:, None] < 0.5) | (nz_k < cell_ub[:, None])
    candA = (in_range & inside & is_invalid)[:, None] & has_rays & ub_cond_k
    candB = hit_k & ub_cond_k
    cand = candA | candB
    ubmin = jnp.min(jnp.where(cand, nz_k, jnp.inf), axis=1)
    wrote = jnp.isfinite(ubmin)

    flatL = flatL.at[2].add(-dec.astype(dt))
    flatL = flatL.at[1].add(var.astype(dt))
    flatL = flatL.at[5].set(jnp.where(wrote, ubmin.astype(dt), flatL[5]))
    flatL = flatL.at[6].set(jnp.where(wrote, 1.0, flatL[6]))
    return flatL.reshape(7, n, n)
