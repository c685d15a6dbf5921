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

from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import MapConfig
from . import scatter
from .geometry import PointAssociation, cell_indices, flat_cell_index, is_inside

__all__ = ["visibility_cleanup"]


def visibility_cleanup(
    layers: jax.Array,
    normal: jax.Array,
    assoc: PointAssociation,
    inlier_cnt: jax.Array,
    t: jax.Array,
    cfg: MapConfig,
) -> jax.Array:
    """Apply visibility cleanup for one pointcloud; returns updated layers."""
    if not cfg.enable_visibility_cleanup or cfg.n_ray_steps <= 0:
        return layers

    n = cfg.cell_n
    n_steps = cfg.n_ray_steps
    step = jnp.asarray(cfg.ray_step, layers.dtype)

    snap = layers.reshape(7, -1)          # R1 snapshot
    nrm = normal.reshape(3, -1)
    ic = inlier_cnt.reshape(-1)

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

    dec_per_hit = None  # computed inside; depends on ray_length

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

        cell_valid = snap[2, nidx]
        cell_h = snap[0, nidx]
        cell_v = snap[1, nidx]
        cell_t = snap[4, nidx]
        cell_ub = snap[5, nidx]
        cell_iub = snap[6, nidx]
        nz = sample[:, 2]

        is_invalid_cell = cell_valid < 0.5
        ub_cond = (nz < cell_ub) | (cell_iub < 0.5)

        # branch A: invalid cell → upper-bound candidate only
        write_ub_a = active & is_invalid_cell & ub_cond

        # branch B: valid cell, not freshly updated, penetrated by the ray
        not_recent = cell_t >= 0.5
        penet = cell_h > nz + 0.01 - jnp.minimum(cell_v, 1.0) * 0.05
        product = (
            rdir[:, 0] * nrm[0, nidx]
            + rdir[:, 1] * nrm[1, nidx]
            + rdir[:, 2] * nrm[2, nidx]
        )
        not_vertical = jnp.abs(product) >= cfg.cleanup_cos_thresh
        wall_skip = (ic[nidx] > cfg.wall_num_thresh) & (cell_t < 1.0)
        hit = active & ~is_invalid_cell & not_recent & penet & not_vertical & ~wall_skip

        dec_amount = cfg.cleanup_step / (ray_length / cfg.max_ray_length)
        adds = scatter.scatter_add_multi(
            n * n,
            nidx,
            [
                jnp.where(hit, dec_amount, 0.0).astype(layers.dtype),
                jnp.where(hit, cfg.outlier_variance, 0.0).astype(layers.dtype),
            ],
            hit,
        )
        dec = dec + adds[0]
        var = var + adds[1]

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
