"""Grid-map filter library — equivalent of plane_segmentation/grid_map_filters_rsl.

Vectorized JAX re-derivations of the reference's standalone C++ filter library
(grid_map_filters_rsl/src/*.cpp):

  inpainting:  minValues (inpainting.cpp:25-94), biLinearInterpolation
               (:96-203), resample (:244-289)
  smoothing:   median / boxBlur / gaussianBlur (smoothing.cpp:23-109)
  processing:  dilate / erode / outline / applyKernelFunction
               (processing.cpp:15-180)
  lookup:      maxValueBetweenLocations / valuesBetweenLocations (lookup.cpp)
  derivative:  estimateGradient / estimateGradientAndCurvature
               (GridMapDerivative.cpp:28-76)

All are NaN-aware: NaN marks missing cells, matching grid_map semantics.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "inpaint_min_values",
    "inpaint_bilinear",
    "resample",
    "median_filter",
    "box_blur",
    "gaussian_blur",
    "dilate",
    "erode",
    "outline",
    "shifted_window_stack",
    "apply_kernel_function",
    "values_between_locations",
    "max_value_between_locations",
    "estimate_gradient",
    "estimate_gradient_and_curvature",
]


def _shift_nan(x: jax.Array, dy: int, dx: int) -> jax.Array:
    """Shift with NaN fill (no wraparound)."""
    out = jnp.roll(x, (dy, dx), axis=(0, 1))
    if dy > 0:
        out = out.at[:dy].set(jnp.nan)
    elif dy < 0:
        out = out.at[dy:].set(jnp.nan)
    if dx > 0:
        out = out.at[:, :dx].set(jnp.nan)
    elif dx < 0:
        out = out.at[:, dx:].set(jnp.nan)
    return out


def inpaint_min_values(h: jax.Array, iterations: int = 0) -> jax.Array:
    """Min-of-neighbors flood fill to the reference's fixed point
    (inpainting.cpp:25-94): the C++ loops until no cell changes, and a
    filled cell keeps taking lower minima as they arrive from farther
    away, so every NaN-connected region converges to the MINIMUM finite
    value along its whole contour. iterations=0 (default) iterates to
    that fixed point in a bounded while_loop; iterations>0 caps the
    propagation rounds. All-NaN maps stay NaN."""
    missing = ~jnp.isfinite(h)
    work = jnp.where(missing, jnp.inf, h)

    def round_fn(w):
        best = w
        for dy, dx in ((-1, 0), (1, 0), (0, -1), (0, 1)):
            nb = jnp.roll(w, (dy, dx), axis=(0, 1))
            # out-of-map neighbors contribute +inf (no wraparound)
            if dy > 0:
                nb = nb.at[:dy].set(jnp.inf)
            elif dy < 0:
                nb = nb.at[dy:].set(jnp.inf)
            if dx > 0:
                nb = nb.at[:, :dx].set(jnp.inf)
            elif dx < 0:
                nb = nb.at[:, dx:].set(jnp.inf)
            best = jnp.minimum(best, nb)
        return jnp.where(missing, best, w)

    if iterations > 0:
        work = jax.lax.fori_loop(0, iterations, lambda _, w: round_fn(w), work)
    else:
        max_iters = h.shape[0] * h.shape[1]

        def cond(c):
            w, prev, it = c
            return (it < max_iters) & jnp.any(w != prev)

        def body(c):
            w, _, it = c
            return round_fn(w), w, it + 1

        work, _, _ = jax.lax.while_loop(cond, body, (round_fn(work), work, 0))
    return jnp.where(jnp.isinf(work), jnp.nan, work)


def inpaint_bilinear(h: jax.Array, iterations: int = 32) -> jax.Array:
    """Neighbor-mean diffusion fill (the biLinearInterpolation analogue,
    inpainting.cpp:96-203): each missing cell takes the mean of its finite
    4-neighbors, iterated to flood the hole from its rim."""
    def body(_, hh):
        missing = ~jnp.isfinite(hh)
        s = jnp.zeros_like(hh)
        c = jnp.zeros_like(hh)
        for dy, dx in ((-1, 0), (1, 0), (0, -1), (0, 1)):
            nb = _shift_nan(hh, dy, dx)
            ok = jnp.isfinite(nb)
            s = s + jnp.where(ok, nb, 0.0)
            c = c + ok
        fill = s / jnp.maximum(c, 1.0)
        return jnp.where(missing & (c > 0), fill, hh)

    return jax.lax.fori_loop(0, iterations, body, h)


def resample(h: jax.Array, out_shape: Tuple[int, int]) -> jax.Array:
    """Bilinear resample (inpainting.cpp:244-289 / cv::resize INTER_LINEAR:
    half-pixel centers, no antialiasing on downscale)."""
    return jax.image.resize(h, out_shape, method="linear", antialias=False)


def median_filter(h: jax.Array, size: int = 3) -> jax.Array:
    """NaN-aware kxk median: holes are excluded; all-NaN windows stay NaN."""
    pad = size // 2
    H, W = h.shape
    p = jnp.pad(h, pad, mode="edge")
    stack = jnp.stack(
        [p[dy : dy + H, dx : dx + W] for dy in range(size) for dx in range(size)]
    )
    return jnp.nanmedian(stack, axis=0)


def box_blur(h: jax.Array, size: int = 3, passes: int = 1) -> jax.Array:
    """NaN-aware box blur: averages the finite neighbors only, so a hole
    neither poisons its neighborhood nor grows with repeated passes."""
    pad = size // 2
    out = h
    for _ in range(passes):
        fin = jnp.isfinite(out)
        p = jnp.pad(jnp.where(fin, out, 0.0), pad, mode="edge")
        pm = jnp.pad(fin.astype(h.dtype), pad, mode="edge")
        acc = jnp.zeros_like(out)
        cnt = jnp.zeros_like(out)
        for dy in range(size):
            for dx in range(size):
                acc = acc + p[dy : dy + h.shape[0], dx : dx + h.shape[1]]
                cnt = cnt + pm[dy : dy + h.shape[0], dx : dx + h.shape[1]]
        out = jnp.where(cnt > 0, acc / jnp.maximum(cnt, 1.0), jnp.nan)
    return out


def gaussian_blur(h: jax.Array, size: int = 5, sigma: float = 1.0) -> jax.Array:
    """NaN-aware separable Gaussian: per-pass mask-renormalized weights."""
    pad = size // 2
    xs = jnp.arange(size) - pad
    k = jnp.exp(-(xs**2) / (2 * sigma**2))
    k = k / jnp.sum(k)

    def pass_1d(v, axis):
        fin = jnp.isfinite(v)
        vz = jnp.where(fin, v, 0.0)
        m = fin.astype(v.dtype)
        padding = [(0, 0), (pad, pad)] if axis == 1 else [(pad, pad), (0, 0)]
        pv = jnp.pad(vz, padding, mode="edge")
        pm = jnp.pad(m, padding, mode="edge")
        if axis == 1:
            num = sum(k[i] * pv[:, i : i + v.shape[1]] for i in range(size))
            den = sum(k[i] * pm[:, i : i + v.shape[1]] for i in range(size))
        else:
            num = sum(k[i] * pv[i : i + v.shape[0], :] for i in range(size))
            den = sum(k[i] * pm[i : i + v.shape[0], :] for i in range(size))
        return jnp.where(den > 0, num / jnp.maximum(den, 1e-30), jnp.nan)

    return pass_1d(pass_1d(h, 1), 0)


def shifted_window_stack(h: jax.Array, size: int) -> jax.Array:
    """(k*k, H, W) neighborhood stack with the grid_map_filters_rsl border
    rule: the kxk window is CLAMPED to lie fully inside the map, i.e. near
    borders it SHIFTS instead of truncating/replicating
    (processing.cpp:36-50 — cornerId = clamp(id - half, 0, N - k)).
    Entry (i*k+j) holds h[corner_r(r)+i, corner_c(c)+j]."""
    H, W = h.shape
    half = (size - 1) // 2
    cr = jnp.clip(jnp.arange(H) - half, 0, H - size)
    cc = jnp.clip(jnp.arange(W) - half, 0, W - size)
    planes = []
    for dy in range(size):
        hr = h[cr + dy, :]
        for dx in range(size):
            planes.append(hr[:, cc + dx])
    return jnp.stack(planes)


def dilate(h: jax.Array, size: int = 3, inpaint: bool = False) -> jax.Array:
    """Max-of-finites dilation with the shifted-window border rule
    (processing.cpp:15-60): all-NaN windows fall back to the centre
    value; NaN centres stay NaN unless inpaint=True."""
    stack = shifted_window_stack(h, size)
    mx = jnp.max(jnp.where(jnp.isfinite(stack), stack, -jnp.inf), axis=0)
    out = jnp.where(jnp.isfinite(mx), mx, h)
    if not inpaint:
        out = jnp.where(jnp.isfinite(h), out, jnp.nan)
    return out


def erode(h: jax.Array, size: int = 3, inpaint: bool = False) -> jax.Array:
    """Min-of-finites erosion, shifted-window border rule (processing.cpp:62-107)."""
    stack = shifted_window_stack(h, size)
    mn = jnp.min(jnp.where(jnp.isfinite(stack), stack, jnp.inf), axis=0)
    out = jnp.where(jnp.isfinite(mn), mn, h)
    if not inpaint:
        out = jnp.where(jnp.isfinite(h), out, jnp.nan)
    return out


def outline(mask: jax.Array) -> jax.Array:
    """Boundary cells of a boolean region (processing.cpp outline)."""
    m = mask.astype(bool)
    inner = m
    for dy, dx in ((-1, 0), (1, 0), (0, -1), (0, 1)):
        nb = jnp.roll(m, (dy, dx), axis=(0, 1))
        if dy > 0:
            nb = nb.at[:dy].set(False)
        elif dy < 0:
            nb = nb.at[dy:].set(False)
        if dx > 0:
            nb = nb.at[:, :dx].set(False)
        elif dx < 0:
            nb = nb.at[:, dx:].set(False)
        inner = inner & nb
    return m & ~inner


def apply_kernel_function(h: jax.Array, size: int, fn) -> jax.Array:
    """Generic kxk neighborhood reduce: fn(stack (k*k, H, W)) -> (H, W)
    (processing.cpp:145-180 applyKernelFunction; used for the 45-degree
    cone dilation in Postprocessing.cpp:73-144). Stack entry (i*k+j)
    corresponds to block element (i, j), with the reference's
    shifted-window border rule (window clamped fully inside the map)."""
    return fn(shifted_window_stack(h, size))


def values_between_locations(
    h: jax.Array, p0: jax.Array, p1: jax.Array, n_samples: int, resolution: float,
    origin: jax.Array = None,
) -> jax.Array:
    """Heights along the segment p0→p1 (lookup.cpp valuesBetweenLocations)."""
    if origin is None:
        origin = jnp.zeros((2,), h.dtype)
    ts = jnp.linspace(0.0, 1.0, n_samples)
    pts = p0[None] + ts[:, None] * (p1 - p0)[None]
    ij = ((pts - origin[None]) / resolution + 0.5 * jnp.asarray(h.shape, h.dtype)[None]).astype(jnp.int32)
    ij = jnp.clip(ij, 0, jnp.asarray(h.shape)[None] - 1)
    return h[ij[:, 0], ij[:, 1]]


def max_value_between_locations(
    h: jax.Array, p0: jax.Array, p1: jax.Array, n_samples: int, resolution: float,
    origin: jax.Array = None,
) -> jax.Array:
    vals = values_between_locations(h, p0, p1, n_samples, resolution, origin)
    return jnp.nanmax(vals)


def project_to_map_with_margin(
    position: jax.Array,       # (..., 2) world xy
    map_position: jax.Array,   # (2,) map center in world
    map_length: Tuple[float, float],
    margin: float = 0.0,
) -> jax.Array:
    """Clamp a world position into the map bounds shrunk by `margin`
    (lookup.cpp:73-96; margin is capped at half the map length)."""
    half = jnp.asarray(map_length, position.dtype) * 0.5
    m = jnp.minimum(jnp.maximum(margin, 0.0), jnp.min(half))
    lo = map_position - half + m
    hi = map_position + half - m
    return jnp.clip(position, lo, hi)


def estimate_gradient(h: jax.Array, resolution: float) -> Tuple[jax.Array, jax.Array]:
    """Central-difference gradient (GridMapDerivative.cpp:28-49).

    grid_map convention: world position decreases as the index grows, so
    d/dx_world = (h[i-1] - h[i+1]) / (2*res).
    """
    gx = (_shift_nan(h, 1, 0) - _shift_nan(h, -1, 0)) / (2 * resolution)
    gy = (_shift_nan(h, 0, 1) - _shift_nan(h, 0, -1)) / (2 * resolution)
    return gx, gy


def estimate_gradient_and_curvature(
    h: jax.Array, resolution: float
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """Gradient + Hessian entries (GridMapDerivative.cpp:51-76)."""
    gx, gy = estimate_gradient(h, resolution)
    r2 = resolution * resolution
    hxx = (_shift_nan(h, -1, 0) - 2 * h + _shift_nan(h, 1, 0)) / r2
    hyy = (_shift_nan(h, 0, -1) - 2 * h + _shift_nan(h, 0, 1)) / r2
    hxy = (
        _shift_nan(h, -1, -1) - _shift_nan(h, -1, 1)
        - _shift_nan(h, 1, -1) + _shift_nan(h, 1, 1)
    ) / (4 * r2)
    return gx, gy, hxx, hyy, hxy
