"""Height/variance Kalman fusion from point clouds — the hot path.

Vectorized, atomic-free re-derivation of the reference per-point CUDA kernels:
  * error_counting_kernel   (custom_kernels.py:280-345)
  * add_points_kernel       (custom_kernels.py:125-196; raycast part lives in
                             ops/raycast.py)
  * average_map_kernel      (custom_kernels.py:348-389)
  * clear_overlap_map       (elevation_mapping.py:393-410)

The per-point atomicAdd scatters become masked XLA scatter-adds over the flat
cell axis (see ops/scatter.py). Race-resolution choices R1-R4 are documented
in tests/golden/reference_numpy.py and implemented identically here.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..config import MapConfig
from . import scatter
from .geometry import PointAssociation

__all__ = [
    "ErrorCounts",
    "error_counting",
    "apply_drift_compensation",
    "point_fusion",
    "average_map",
    "clear_overlap",
]


class ErrorCounts(NamedTuple):
    inlier_cnt: jax.Array   # (H, W) drift-compensation inliers per cell
    point_cnt: jax.Array    # (H, W) valid points per cell
    error_sum: jax.Array    # ()  Σ (z - map_h) over inliers
    error_cnt: jax.Array    # ()  number of inliers


def gather_cell_rows(layers: jax.Array, idx: jax.Array) -> jax.Array:
    """One row-gather of all per-cell layer values at the point cells: (N, 7).

    Shared between error counting and fusion so the hot path pays a single
    gather pass instead of one per layer."""
    return layers.reshape(layers.shape[0], -1).T[idx]


def error_counting(
    layers: jax.Array,
    assoc: PointAssociation,
    cfg: MapConfig,
    cell_rows: jax.Array = None,
) -> ErrorCounts:
    """Count drift-compensation inliers and per-cell point totals."""
    n = cfg.cell_n
    j = assoc.flat_idx
    if cell_rows is None:
        cell_rows = gather_cell_rows(layers, j)
    map_h = cell_rows[:, 0]
    map_v = cell_rows[:, 1]
    map_valid = cell_rows[:, 2]
    map_t = cell_rows[:, 3]
    z = assoc.world[:, 2]

    inlier = (
        assoc.mask
        & (map_valid > 0.5)
        & (jnp.abs(map_h - z) < map_v * cfg.mahalanobis_thresh)
        & (map_v < cfg.drift_compensation_variance_inlier / 2.0)
        & (map_t > cfg.traversability_inlier)
    )
    sums = scatter.scatter_add_streams_2d(
        n,
        n,
        j,
        [inlier.astype(layers.dtype), assoc.mask.astype(layers.dtype)],
        assoc.mask,
        exact=(True, True),
    )
    error_sum = jnp.sum(jnp.where(inlier, z - map_h, 0.0))
    error_cnt = jnp.sum(inlier)
    return ErrorCounts(
        inlier_cnt=sums[0],
        point_cnt=sums[1],
        error_sum=error_sum,
        error_cnt=error_cnt,
    )


def apply_drift_compensation(
    layers: jax.Array,
    counts: ErrorCounts,
    position_noise: jax.Array,
    orientation_noise: jax.Array,
    mean_error_prev: jax.Array,
    additive_prev: jax.Array,
    cfg: MapConfig,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Height drift compensation (elevation_mapping.py:346-357).

    Returns (layers, mean_error, additive_mean_error). The host-side scalar
    branch becomes a data-dependent select so the whole step stays jittable.
    """
    if not cfg.enable_drift_compensation:
        return layers, mean_error_prev, additive_prev, jnp.zeros((), layers.dtype)
    gate = (counts.error_cnt > cfg.min_height_drift_cnt) & (
        (position_noise > cfg.position_noise_thresh)
        | (orientation_noise > cfg.orientation_noise_thresh)
    )
    new_mean = counts.error_sum / jnp.maximum(counts.error_cnt, 1).astype(layers.dtype)
    mean_error = jnp.where(gate, new_mean, mean_error_prev)
    additive = jnp.where(gate, additive_prev + new_mean, additive_prev)
    apply = gate & (jnp.abs(new_mean) < cfg.max_drift)
    delta = jnp.where(apply, new_mean * cfg.drift_compensation_alpha, 0.0).astype(layers.dtype)
    layers = layers.at[0].add(delta)
    return layers, mean_error, additive, delta


def point_fusion(
    layers: jax.Array,
    assoc: PointAssociation,
    point_cnt: jax.Array,
    cfg: MapConfig,
    cell_rows: jax.Array = None,
    h_delta: jax.Array = None,
) -> Tuple[jax.Array, jax.Array]:
    """Per-point Kalman proposals + outlier handling (custom_kernels.py:160-196).

    Returns (updated layers, newmap (3, H, W) = [Σnew_h, Σnew_v, count]).
    ``cell_rows`` may be the pre-drift gather shared with error_counting;
    ``h_delta`` is then the drift correction to add to the height column.
    """
    n = cfg.cell_n
    flat = layers.reshape(7, -1)
    j = assoc.flat_idx
    z = assoc.world[:, 2]
    v = assoc.noise
    if cell_rows is None:
        map_h = flat[0, j]
        map_v = flat[1, j]
    else:
        map_h = cell_rows[:, 0] + (h_delta if h_delta is not None else 0.0)
        map_v = cell_rows[:, 1]
    pc = point_cnt.reshape(-1)[j]

    outlier = assoc.mask & (jnp.abs(map_h - z) > map_v * cfg.mahalanobis_thresh)
    edge_skip = jnp.zeros_like(outlier)
    if cfg.enable_edge_sharpen:
        edge_skip = (pc > cfg.wall_num_thresh) & (
            z < map_h - map_v * cfg.mahalanobis_thresh / jnp.maximum(pc, 1e-12)
        )
    fuse = assoc.mask & ~outlier & ~edge_skip

    new_h = (map_h * v + z * map_v) / (map_v + v)
    new_v = (map_v * v) / (map_v + v)
    # Fold the outlier-variance scatter into the same index pass: a point is
    # either a fused inlier or an outlier, never both, so one scatter with a
    # per-stream mask via zeroed values suffices.
    sums = scatter.scatter_add_streams_2d(
        n,
        n,
        j,
        [
            jnp.where(fuse, new_h, 0.0),
            jnp.where(fuse, new_v, 0.0),
            fuse.astype(new_h.dtype),
            outlier.astype(new_h.dtype),  # x outlier_variance applied below
        ],
        fuse | outlier,
        exact=(False, False, True, True),
    ).reshape(4, -1)
    out_var = sums[3] * cfg.outlier_variance

    sum_h, sum_v, cnt = sums[0], sums[1], sums[2]
    has = cnt > 0
    mean_h = sum_h / jnp.maximum(cnt, 1.0)

    flat = flat.at[1].add(out_var)
    flat = flat.at[2].set(jnp.where(has, 1.0, flat[2]))
    flat = flat.at[4].set(jnp.where(has, 0.0, flat[4]))
    flat = flat.at[5].set(jnp.where(has, mean_h, flat[5]))  # R2
    flat = flat.at[6].set(jnp.where(has, 0.0, flat[6]))
    newmap = jnp.stack([sum_h, sum_v, cnt]).reshape(3, n, n)
    return flat.reshape(7, n, n), newmap


def average_map(layers: jax.Array, newmap: jax.Array, cfg: MapConfig) -> jax.Array:
    """Finalize per-cell averages (custom_kernels.py:348-389)."""
    valid_pre = layers[2]
    sum_h, sum_v, cnt = newmap
    has = cnt > 0
    safe_cnt = jnp.maximum(cnt, 1.0)
    overflow = has & ((sum_v / safe_cnt) > cfg.max_variance)
    ok = has & ~overflow

    h = jnp.where(ok, sum_h / safe_cnt, jnp.where(overflow, 0.0, layers[0]))
    v = jnp.where(ok, sum_v / safe_cnt, jnp.where(overflow, cfg.initial_variance, layers[1]))
    va = jnp.where(ok, 1.0, jnp.where(overflow, 0.0, layers[2]))

    reset = valid_pre < 0.5
    h = jnp.where(reset, 0.0, h)
    v = jnp.where(reset, cfg.initial_variance, v)
    va = jnp.where(reset, 0.0, va)
    return layers.at[0].set(h).at[1].set(v).at[2].set(va)


def clear_overlap(layers: jax.Array, t: jax.Array, cfg: MapConfig) -> jax.Array:
    """Clear cells far from the sensor height near the center
    (elevation_mapping.py:393-410)."""
    lo, hi = cfg.overlap_cell_range
    hmin = t[2] - cfg.overlap_clear_range_z
    hmax = t[2] + cfg.overlap_clear_range_z
    near = layers[:, lo:hi, lo:hi]
    ok = ~((near[0] < hmin) | (near[0] > hmax))
    near = near.at[0].set(jnp.where(ok, near[0], 0.0))
    near = near.at[1].set(jnp.where(ok, near[1], cfg.initial_variance))
    near = near.at[2].set(jnp.where(ok, near[2], 0.0))
    ok5 = ~((near[5] < hmin) | (near[5] > hmax))
    near = near.at[5].set(jnp.where(ok5, near[5], 0.0))
    near = near.at[6].set(jnp.where(ok5, near[6], 0.0))
    return layers.at[:, lo:hi, lo:hi].set(near)
