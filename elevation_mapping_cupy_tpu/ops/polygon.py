"""Polygon rasterization and traversability safety statistics.

Re-derivation of polygon_mask_kernel (custom_kernels.py:509-654) — the
integer-grid ray-casting point-in-polygon test with colinear/on-segment
special cases — vectorized over all cells at once, plus the masked
traversability statistics of traversability_polygon.py:10-43.

The convex hull of unsafe cells (reference: CPU shapely,
traversability_polygon.py:46-53) lives in utils/hull.py as a host-side
Andrew-monotone-chain implementation — it is controller-facing output, not
per-step hot.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import MapConfig

__all__ = ["polygon_mask", "masked_traversability", "polygon_area"]


def _orientation(px, py, qx, qy, rx, ry):
    """0 colinear, 1 clockwise, 2 counterclockwise (int math)."""
    val = (qy - py) * (rx - qx) - (qx - px) * (ry - qy)
    return jnp.where(val == 0, 0, jnp.where(val > 0, 1, 2))


def _on_segment(px, py, qx, qy, rx, ry):
    return (
        (qx <= jnp.maximum(px, rx))
        & (qx >= jnp.minimum(px, rx))
        & (qy <= jnp.maximum(py, ry))
        & (qy >= jnp.minimum(py, ry))
    )


def _do_intersect(p1x, p1y, q1x, q1y, p2x, p2y, q2x, q2y):
    o1 = _orientation(p1x, p1y, q1x, q1y, p2x, p2y)
    o2 = _orientation(p1x, p1y, q1x, q1y, q2x, q2y)
    o3 = _orientation(p2x, p2y, q2x, q2y, p1x, p1y)
    o4 = _orientation(p2x, p2y, q2x, q2y, q1x, q1y)
    general = (o1 != o2) & (o3 != o4)
    s1 = (o1 == 0) & _on_segment(p1x, p1y, p2x, p2y, q1x, q1y)
    s2 = (o2 == 0) & _on_segment(p1x, p1y, q2x, q2y, q1x, q1y)
    s3 = (o3 == 0) & _on_segment(p2x, p2y, p1x, p1y, q2x, q2y)
    s4 = (o4 == 0) & _on_segment(p2x, p2y, q1x, q1y, q2x, q2y)
    return general | s1 | s2 | s3 | s4


def _poly_cell(xy: jax.Array, center: jax.Array, cfg: MapConfig) -> Tuple[jax.Array, jax.Array]:
    """World xy -> (ix, iy) with the kernel's clamped get_idx semantics."""
    n = cfg.cell_n
    fx = (xy[..., 0] - center[0]) / cfg.resolution + 0.5 * n
    fy = (xy[..., 1] - center[1]) / cfg.resolution + 0.5 * n
    ix = jnp.clip(jnp.trunc(fx).astype(jnp.int32), 0, n - 1)
    iy = jnp.clip(jnp.trunc(fy).astype(jnp.int32), 0, n - 1)
    return ix, iy


def polygon_mask(
    polygon: jax.Array,      # (V, 2) world-frame vertices, padded to static V
    n_vertices: jax.Array,   # () actual vertex count
    center_xy: jax.Array,    # (2,)
    cfg: MapConfig,
) -> jax.Array:
    """Rasterize a polygon into a (H, W) 0/1 mask (polygon_mask_kernel)."""
    n = cfg.cell_n
    i = jnp.arange(n * n)
    px = (i // n).astype(jnp.int32)
    py = (i % n).astype(jnp.int32)
    ex = jnp.full_like(px, 100000)

    vmax = polygon.shape[0]
    vidx = jnp.arange(vmax)
    vmask = vidx < n_vertices

    vx, vy = _poly_cell(polygon, center_xy, cfg)
    # next vertex (j + 1) % polygon_n
    nxt = jnp.where(vidx + 1 >= n_vertices, 0, vidx + 1)
    wx, wy = vx[nxt], vy[nxt]

    # bbox gate (kernel :612-619)
    pmin = jnp.min(jnp.where(vmask[:, None], polygon, jnp.inf), axis=0)
    pmax = jnp.max(jnp.where(vmask[:, None], polygon, -jnp.inf), axis=0)
    bminx, bminy = _poly_cell(pmin[None], center_xy, cfg)
    bmaxx, bmaxy = _poly_cell(pmax[None], center_xy, cfg)
    in_bbox = (px >= bminx[0]) & (px <= bmaxx[0]) & (py >= bminy[0]) & (py <= bmaxy[0])

    def per_edge(carry, j):
        cnt, on_edge = carry
        p1x, p1y, p2x, p2y = vx[j], vy[j], wx[j], wy[j]
        inter = _do_intersect(p1x, p1y, p2x, p2y, px, py, ex, py)
        colinear = _orientation(p1x, p1y, px, py, p2x, p2y) == 0
        on_seg = colinear & _on_segment(p1x, p1y, px, py, p2x, p2y)
        straddle = ((p1y <= py) & (p2y > py)) | ((p1y > py) & (p2y <= py))
        use = vmask[j]
        on_edge = on_edge | (use & inter & on_seg)
        cnt = cnt + jnp.where(use & inter & ~colinear & straddle, 1, 0)
        return (cnt, on_edge), None

    (cnt, on_edge), _ = jax.lax.scan(
        per_edge, (jnp.zeros_like(px), jnp.zeros_like(px, dtype=bool)), jnp.arange(vmax)
    )
    inside = on_edge | ((cnt % 2) == 1)
    return jnp.where(in_bbox & inside, 1.0, 0.0).reshape(n, n)


def masked_traversability(
    layers: jax.Array, mask: jax.Array, traversability: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """traversability_polygon.get_masked_traversability (:10-19)."""
    trav = traversability[1:-1, 1:-1]
    is_valid = layers[2][1:-1, 1:-1]
    m = mask[1:-1, 1:-1]
    untrav = jnp.where(is_valid > 0.5, 1.0 - trav, 0.0)
    return untrav * m, is_valid * m


def polygon_area(polygon: jax.Array, n_vertices: jax.Array) -> jax.Array:
    """Shoelace area over the first n_vertices (traversability_polygon.py:37-43)."""
    v = polygon.shape[0]
    idx = jnp.arange(v)
    valid = idx < n_vertices
    prev = jnp.where(idx == 0, n_vertices - 1, idx - 1)
    p1 = polygon[prev]
    p2 = polygon
    terms = (p1[:, 0] * p2[:, 1] - p1[:, 1] * p2[:, 0]) / 2.0
    return jnp.abs(jnp.sum(jnp.where(valid, terms, 0.0)))
