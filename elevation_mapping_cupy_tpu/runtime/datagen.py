"""Procedural terrains + simulated depth/LiDAR sensors for batched datagen.

Supports the BASELINE config #5 workload: thousands of independent maps
updated per step from synthetic sensors (sim datagen / RL terrain curricula).
Terrain synthesis and ray sampling are pure JAX and run on device, so the
whole datagen→update loop never leaves the chip.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = ["procedural_terrain", "simulate_depth_cloud", "make_batch_clouds"]


def _smoothstep(t):
    return t * t * (3.0 - 2.0 * t)


def _value_noise(key: jax.Array, shape: Tuple[int, int], scale: int) -> jax.Array:
    """Bilinear value noise: coarse random lattice upsampled smoothly."""
    h, w = shape
    gh, gw = h // scale + 2, w // scale + 2
    lattice = jax.random.uniform(key, (gh, gw), minval=-1.0, maxval=1.0)
    y = jnp.arange(h) / scale
    x = jnp.arange(w) / scale
    y0 = jnp.floor(y).astype(jnp.int32)
    x0 = jnp.floor(x).astype(jnp.int32)
    ty = _smoothstep(y - y0)[:, None]
    tx = _smoothstep(x - x0)[None, :]
    v00 = lattice[y0][:, x0]
    v01 = lattice[y0][:, x0 + 1]
    v10 = lattice[y0 + 1][:, x0]
    v11 = lattice[y0 + 1][:, x0 + 1]
    return (
        v00 * (1 - ty) * (1 - tx)
        + v01 * (1 - ty) * tx
        + v10 * ty * (1 - tx)
        + v11 * ty * tx
    )


def procedural_terrain(
    key: jax.Array,
    cells: int,
    resolution: float,
    roughness: float = 0.15,
    step_height: float = 0.25,
    n_octaves: int = 3,
) -> jax.Array:
    """(cells, cells) height field: multi-octave noise + random terraces —
    the kind of terrain curricula used for legged-robot training."""
    keys = jax.random.split(key, n_octaves + 2)
    h = jnp.zeros((cells, cells))
    amp = roughness
    scale = max(cells // 4, 2)
    for i in range(n_octaves):
        h = h + amp * _value_noise(keys[i], (cells, cells), max(scale, 2))
        amp *= 0.5
        scale //= 2
    # terraces
    terr = jnp.round(_value_noise(keys[-2], (cells, cells), max(cells // 3, 2)) * 2) * step_height
    return h + terr


def simulate_depth_cloud(
    key: jax.Array,
    terrain: jax.Array,
    resolution: float,
    sensor_pos: jax.Array,      # (3,) in map frame
    n_points: int,
    fov_deg: float = 85.0,
) -> Tuple[jax.Array, jax.Array]:
    """Sample a depth-camera-like pointcloud of the terrain.

    Returns (points (n, 3) in SENSOR frame (identity R), sensor t). Points
    are terrain surface samples within the field of view, with small noise.
    """
    cells = terrain.shape[0]
    half = cells * resolution / 2
    k1, k2, k3 = jax.random.split(key, 3)
    # sample ground xy within fov footprint around the sensor
    r_max = sensor_pos[2] * jnp.tan(jnp.radians(fov_deg / 2)) + 1.0
    ang = jax.random.uniform(k1, (n_points,), minval=0, maxval=2 * jnp.pi)
    rad = jnp.sqrt(jax.random.uniform(k2, (n_points,))) * r_max
    x = jnp.clip(sensor_pos[0] + rad * jnp.cos(ang), -half, half - 1e-4)
    y = jnp.clip(sensor_pos[1] + rad * jnp.sin(ang), -half, half - 1e-4)
    ix = jnp.clip(((x + half) / resolution).astype(jnp.int32), 0, cells - 1)
    iy = jnp.clip(((y + half) / resolution).astype(jnp.int32), 0, cells - 1)
    z = terrain[ix, iy] + 0.005 * jax.random.normal(k3, (n_points,))
    world = jnp.stack([x, y, z], axis=-1)
    return world - sensor_pos, sensor_pos


@functools.partial(jax.jit, static_argnames=("batch", "cells", "n_points", "resolution"))
def make_batch_clouds(
    key: jax.Array, batch: int, cells: int, resolution: float, n_points: int
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Batched terrains + clouds: returns (points (B,n,3), t (B,3), terrain)."""
    keys = jax.random.split(key, batch)

    def one(k):
        k1, k2 = jax.random.split(k)
        terr = procedural_terrain(k1, cells, resolution)
        pos = jnp.array([0.0, 0.0, 0.8])
        pts, t = simulate_depth_cloud(k2, terr, resolution, pos, n_points)
        return pts, t, terr

    return jax.vmap(one)(keys)
