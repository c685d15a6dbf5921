"""Per-cell stencil ops: dilation fill, surface normals, min/max/smooth filters.

Re-derivations of the reference per-cell CUDA kernels as vectorized XLA ops
over the whole (H, W) grid:
  * dilation_filter_kernel (custom_kernels.py:392-449) — including its quirky
    ``dx + dy`` "distance" metric and flat-index row-wraparound, reproduced
    faithfully for numeric parity.
  * normal_filter_kernel   (custom_kernels.py:452-506)
  * min_filter / max_filter plugins (plugins/min_filter.py:29-118,
    plugins/max_filter.py:36-113) with their 0.6 fill-mask sentinel.
  * smooth_filter plugin   (plugins/smooth_filter.py:48-59) — two passes of a
    3x3 uniform filter with reflect boundary (cupyx.scipy.ndimage default).

Each static neighborhood offset becomes one shifted gather; XLA fuses the
whole neighborhood scan into a single elementwise loop over the grid.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "dilation_fill",
    "surface_normals",
    "min_filter",
    "max_filter",
    "uniform_smooth",
]


def _flat_neighbor(fm: jax.Array, off: int, n: int) -> Tuple[jax.Array, jax.Array]:
    """Flat-index neighbor i+off with the reference's bounds semantics:
    valid iff 0 <= i+off < n*n and the decomposed (row, col) is interior.

    ``off`` is static, so the "gather" is a roll (slice+concat) — a dynamic
    gather here costs ~25 random-access passes per dilation on TPU; rolled
    values that wrap are masked out by ``in_range``."""
    nn = n * n
    i = jnp.arange(nn)
    j = i + off
    in_range = (j >= 0) & (j < nn)
    jc = jnp.clip(j, 0, nn - 1)
    jx = jc // n
    jy = jc % n
    interior = (jx > 0) & (jx < n - 1) & (jy > 0) & (jy < n - 1)
    return jnp.roll(fm, -off), in_range & interior


def dilation_fill(
    map2d: jax.Array, mask: jax.Array, size: int
) -> Tuple[jax.Array, jax.Array]:
    """Fill invalid cells from the neighbor minimizing dx+dy (ties: scan order).

    Returns (filled map, updated mask). Matches dilation_filter_kernel
    exactly, including that the "nearest" metric is the *sum* dx+dy (a
    reference quirk: the most negative offset wins).
    """
    n = map2d.shape[-1]
    fm = map2d.reshape(-1)
    fmask = mask.reshape(-1)

    best_dist = jnp.full_like(fm, 100.0)
    best_val = jnp.zeros_like(fm)
    for dy in range(-size, size + 1):
        for dx in range(-size, size + 1):
            val, ok = _flat_neighbor(fm, n * dy + dx, n)
            nb_mask, _ = _flat_neighbor(fmask, n * dy + dx, n)
            cand = ok & (nb_mask > 0.5) & ((dx + dy) < best_dist)
            best_dist = jnp.where(cand, float(dx + dy), best_dist)
            best_val = jnp.where(cand, val, best_val)

    invalid = fmask < 0.5
    found = invalid & (best_dist < 100.0)
    out = jnp.where(found, best_val, fm)
    out_mask = jnp.where(found, 1.0, fmask)
    return out.reshape(n, n), out_mask.reshape(n, n)


def surface_normals(map2d: jax.Array, mask: jax.Array, resolution: float) -> jax.Array:
    """Forward-difference normals (normal_filter_kernel). Returns (3, H, W)."""
    n = map2d.shape[-1]
    fm = map2d.reshape(-1)
    fmask = mask.reshape(-1)
    hx, okx = _flat_neighbor(fm, 1, n)
    hy, oky = _flat_neighbor(fm, n, n)
    ok = (fmask > 0.5) & okx & oky
    dzdx = hx - fm
    dzdy = hy - fm
    nx = -dzdy / resolution
    ny = -dzdx / resolution
    norm = jnp.sqrt(nx * nx + ny * ny + 1.0)
    out = jnp.stack([nx / norm, ny / norm, 1.0 / norm])
    return jnp.where(ok, out, 0.0).reshape(3, n, n)


def _extreme_filter(
    map2d: jax.Array, mask: jax.Array, size: int, iterations: int, mode: str
) -> jax.Array:
    """Shared body of min_filter/max_filter plugins.

    Semantics differences faithfully kept:
      * min_filter re-fills every *originally* invalid cell each iteration
        (it tests elevation_map[2], min_filter.py:108-110), so min values keep
        propagating; max_filter tests its own evolving mask snapshot
        (max_filter.py:102-107) and fills each cell once.
      * both stop iterating once every cell is filled (the Python-side
        ``.all()`` break) — emulated with a convergence gate so iteration
        count stays static under jit.
      * in-launch neighbor reads are racy in the reference; we use Jacobi
        (previous-iteration snapshot) semantics.
    """
    n = map2d.shape[-1]
    fm = map2d.reshape(-1)
    fmask = mask.reshape(-1)
    init = jnp.inf if mode == "min" else -jnp.inf
    orig_invalid = fmask < 0.5
    for _ in range(iterations):
        done = jnp.all(fmask > 0.5)
        best = jnp.full_like(fm, init)
        for dy in range(-size, size + 1):
            for dx in range(-size, size + 1):
                val, ok = _flat_neighbor(fm, n * dy + dx, n)
                nb_mask, _ = _flat_neighbor(fmask, n * dy + dx, n)
                usable = ok & (nb_mask > 0.5)
                v = jnp.where(usable, val, init)
                best = jnp.minimum(best, v) if mode == "min" else jnp.maximum(best, v)
        fill_target = orig_invalid if mode == "min" else (fmask < 0.5)
        found = ~done & fill_target & jnp.isfinite(best)
        fm = jnp.where(found, best, fm)
        fmask = jnp.where(found, 0.6, fmask)  # reference fill sentinel
    out = jnp.where(fmask > 0.5, fm, jnp.nan)
    return out.reshape(n, n)


def min_filter(map2d: jax.Array, mask: jax.Array, size: int = 5, iterations: int = 5) -> jax.Array:
    return _extreme_filter(map2d, mask, size, iterations, "min")


def max_filter(map2d: jax.Array, mask: jax.Array, size: int = 5, iterations: int = 5) -> jax.Array:
    return _extreme_filter(map2d, mask, size, iterations, "max")


def uniform_smooth(map2d: jax.Array, passes: int = 2, size: int = 3) -> jax.Array:
    """size x size uniform filter with reflect boundary, applied ``passes``
    times (smooth_filter.py:58-59)."""
    pad = size // 2
    out = map2d
    for _ in range(passes):
        x = jnp.pad(out, pad, mode="symmetric")
        acc = jnp.zeros_like(map2d)
        for dy in range(size):
            for dx in range(size):
                acc = acc + x[dy : dy + map2d.shape[0], dx : dx + map2d.shape[1]]
        out = acc / (size * size)
    return out
