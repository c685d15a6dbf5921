"""Grid geometry: point→cell association and validity ramp.

Vectorized re-derivation of the reference's CUDA device helpers
(custom_kernels.py:20-108: get_x_idx / get_y_idx / is_inside / get_idx /
z_noise / is_valid).  All functions operate on whole point batches at once —
the per-point CUDA thread becomes a lane of the VPU.

Index convention (matches reference): flat index ``idx = W * ix + iy`` with
``ix`` derived from world x and ``iy`` from world y; cells on the 1-cell
border are "outside" (is_inside == False).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..config import MapConfig

__all__ = [
    "cell_indices",
    "is_inside",
    "flat_cell_index",
    "transform_points",
    "z_noise",
    "point_validity",
    "PointAssociation",
    "associate_points",
]


def _axis_index(coord: jax.Array, center: jax.Array, cfg: MapConfig) -> jax.Array:
    """(x - c)/res + 0.5*W, C-truncated toward zero (custom_kernels.py:26-33)."""
    f = (coord - center) / cfg.resolution + 0.5 * cfg.cell_n
    return jnp.trunc(f).astype(jnp.int32)


def cell_indices(xy: jax.Array, center_xy: jax.Array, cfg: MapConfig) -> Tuple[jax.Array, jax.Array]:
    """Clamped (ix, iy) per point. xy: (N, 2)."""
    ix = jnp.clip(_axis_index(xy[..., 0], center_xy[0], cfg), 0, cfg.cell_n - 1)
    iy = jnp.clip(_axis_index(xy[..., 1], center_xy[1], cfg), 0, cfg.cell_n - 1)
    return ix, iy


def flat_cell_index(ix: jax.Array, iy: jax.Array, cfg: MapConfig) -> jax.Array:
    return cfg.cell_n * ix + iy


def is_inside(ix: jax.Array, iy: jax.Array, cfg: MapConfig) -> jax.Array:
    """Border cells are outside (custom_kernels.py:34-44)."""
    n = cfg.cell_n
    return (ix > 0) & (ix < n - 1) & (iy > 0) & (iy < n - 1)


def transform_points(points: jax.Array, R: jax.Array, t: jax.Array) -> jax.Array:
    """World coordinates: R @ p + t for each point (custom_kernels.py:54-57).

    points: (N, 3); R: (3, 3); t: (3,) — t already shifted to map-center frame.
    Expanded elementwise rather than as a matmul: a 3-wide contraction gains
    nothing from the MXU, and the TPU's default bf16 matmul inputs would
    quantize coordinates (≈3 mm at 8 m range — above grid tolerance).
    """
    x, y, z = points[..., 0], points[..., 1], points[..., 2]
    out = [R[i, 0] * x + R[i, 1] * y + R[i, 2] * z + t[i] for i in range(3)]
    return jnp.stack(out, axis=-1)


def z_noise(raw_z: jax.Array, cfg: MapConfig) -> jax.Array:
    """Sensor noise model: factor * z_sensor^2 (custom_kernels.py:58-60)."""
    return cfg.sensor_noise_factor * raw_z * raw_z


def point_validity(world: jax.Array, t: jax.Array, cfg: MapConfig) -> jax.Array:
    """Validity ramp filter (custom_kernels.py:68-81).

    Rejects points too close to the sensor and points above a distance-ramped
    ceiling (overhang / ceiling exclusion). ``world`` is in the map-center
    frame; the ramp distance uses the point's XY distance from the map center.
    """
    x, y, z = world[..., 0], world[..., 1], world[..., 2]
    d2 = jnp.sum((world - t) ** 2, axis=-1)
    dxy = jnp.maximum(jnp.sqrt(x * x + y * y) - cfg.ramped_height_range_b, 0.0)
    too_close = d2 < cfg.min_valid_distance**2
    above_ramp = (z - t[2]) > (dxy * cfg.ramped_height_range_a + cfg.ramped_height_range_c)
    above_max = (z - t[2]) > cfg.max_height_range
    return ~(too_close | above_ramp | above_max)


class PointAssociation(NamedTuple):
    """Per-point association with the grid — the (idx, valid, inside) triple the
    reference writes back into the point buffer for reuse by semantic fusion
    (custom_kernels.py:260-262)."""

    world: jax.Array   # (N, 3) transformed points (map-center frame)
    noise: jax.Array   # (N,)   per-point z noise
    flat_idx: jax.Array  # (N,) flat cell index (clamped)
    valid: jax.Array   # (N,) bool validity-ramp result
    inside: jax.Array  # (N,) bool inside-border result
    mask: jax.Array    # (N,) bool = valid & inside & not-padding


def associate_points(
    points: jax.Array,
    pad_mask: jax.Array,
    R: jax.Array,
    t: jax.Array,
    cfg: MapConfig,
) -> PointAssociation:
    """Transform, classify, and bin a (possibly padded) pointcloud.

    ``points``: (N, 3) raw sensor-frame xyz (padding rows arbitrary/NaN-free);
    ``pad_mask``: (N,) True for real points. ``t`` must already be in the
    map-center frame (reference shift_translation_to_map_center,
    elevation_mapping.py:308-314).
    """
    world = transform_points(points, R, t)
    noise = z_noise(points[:, 2], cfg)
    ix, iy = cell_indices(world[:, :2], jnp.zeros((2,), world.dtype), cfg)
    flat = flat_cell_index(ix, iy, cfg)
    valid = point_validity(world, t, cfg) & pad_mask
    inside = is_inside(ix, iy, cfg)
    return PointAssociation(
        world=world,
        noise=noise,
        flat_idx=flat,
        valid=valid,
        inside=inside,
        mask=valid & inside & pad_mask,
    )
