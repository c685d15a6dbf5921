"""On-device plane extraction: sliding-window planarity + connected components.

TPU-native re-derivation of the reference C++ pipeline
(plane_segmentation/convex_plane_decomposition/src/sliding_window_plane_extraction/
SlidingWindowPlaneExtractor.cpp):

  * per-cell kxk window covariance → closed-form symmetric 3x3 eigensolver →
    surface normal + mean-squared plane error (:19-41, :82-110). The per-cell
    CPU loop becomes shifted-gather accumulators over the whole grid (VPU).
  * local planarity test (:112-118)
  * optional morphological opening (:137-143)
  * connected components (cv::connectedComponents, :147-150) as iterative
    min-label propagation in a bounded while_loop
  * per-label plane fit via masked reductions + global planarity / inclination
    gates (:152-218). CGAL RANSAC refinement runs host-side (ransac.py).

Also includes the preprocessing stage (GridMapPreprocessing.cpp:14-39):
min-values inpaint → median denoise.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "PlaneSegParams",
    "PreprocessingParams",
    "eigh3_smallest",
    "sliding_window_normals",
    "connected_components",
    "extract_planes",
    "preprocess",
    "resample_shape",
    "true_resolution",
]


@dataclasses.dataclass(frozen=True)
class PlaneSegParams:
    """Mirrors SlidingWindowPlaneExtractorParameters.h defaults."""

    kernel_size: int = 3
    planarity_opening_filter: int = 0
    plane_inclination_threshold: float = math.cos(math.radians(30.0))
    local_plane_inclination_threshold: float = math.cos(math.radians(35.0))
    plane_patch_error_threshold: float = 0.02
    min_number_points_per_label: int = 4
    connectivity: int = 4
    global_plane_fit_distance_error_threshold: float = 0.025
    global_plane_fit_angle_error_threshold_degrees: float = 25.0
    max_labels: int = 64               # static bound on plane count
    cc_iterations: int = 0             # 0 → 2*(H+W) default
    # host-side stage; reference default true
    # (SlidingWindowPlaneExtractorParameters.h:34)
    include_ransac_refinement: bool = True


@dataclasses.dataclass(frozen=True)
class PreprocessingParams:
    """Mirrors PreprocessingParameters (GridMapPreprocessing.h:9-16) and the
    deployed parameters.yaml `preprocessing:` block. resolution is the
    resample target: negative skips; the default 0.04 is the REFERENCE
    HEADER default (GridMapPreprocessing.h:10-11), so — exactly like the
    reference — a pipeline running on a map of any other resolution
    resamples to 0.04 m unless configured otherwise. The deployed value
    equals the deployed map resolution, i.e. a no-op there
    (changeResolution skips within 1e-6). Pass
    PreprocessingParams(resolution=-1.0) to extract on the native grid."""

    resolution: float = 0.04
    kernel_size: int = 3        # median kernel, clamped to [1, 5]
    number_of_repeats: int = 1  # deployed parameters.yaml value (header: 2)


def resample_shape(shape, old_res: float, new_res: float):
    """New grid dims after resample (inpainting.cpp:265-270: truncation)."""
    scaling = old_res / new_res
    return (int(shape[0] * scaling), int(shape[1] * scaling))


def true_resolution(old_shape, old_res: float, new_shape) -> float:
    """The 'true new resolution' after size truncation — average of both
    dimensions (inpainting.cpp:280-282)."""
    return 0.5 * (
        (old_shape[0] * old_res) / new_shape[0]
        + (old_shape[1] * old_res) / new_shape[1]
    )


def eigh3_smallest(A: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Batched closed-form eigen-solve of symmetric 3x3 matrices.

    A: (..., 3, 3). Returns (lambda_min, lambda_mid, v_min) where v_min is the
    unit eigenvector of the smallest eigenvalue (the plane normal candidate).
    Uses the trigonometric method — branch-free, maps to the VPU.
    """
    a00 = A[..., 0, 0]
    a11 = A[..., 1, 1]
    a22 = A[..., 2, 2]
    a01 = A[..., 0, 1]
    a02 = A[..., 0, 2]
    a12 = A[..., 1, 2]

    p1 = a01 * a01 + a02 * a02 + a12 * a12
    q = (a00 + a11 + a22) / 3.0
    p2 = (a00 - q) ** 2 + (a11 - q) ** 2 + (a22 - q) ** 2 + 2.0 * p1
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 1e-30))

    b00 = (a00 - q) / p
    b11 = (a11 - q) / p
    b22 = (a22 - q) / p
    b01 = a01 / p
    b02 = a02 / p
    b12 = a12 / p
    detB = (
        b00 * (b11 * b22 - b12 * b12)
        - b01 * (b01 * b22 - b12 * b02)
        + b02 * (b01 * b12 - b11 * b02)
    )
    r = jnp.clip(detB / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    e1 = q + 2.0 * p * jnp.cos(phi)                       # largest
    e3 = q + 2.0 * p * jnp.cos(phi + 2.0 * math.pi / 3.0)  # smallest
    e2 = 3.0 * q - e1 - e3

    diagish = p2 < 1e-24
    e1 = jnp.where(diagish, a00, e1)
    e2 = jnp.where(diagish, a11, e2)
    e3 = jnp.where(diagish, a22, e3)

    # eigenvector of e3: cross products of rows of (A - e3 I)
    m00 = a00 - e3
    m11 = a11 - e3
    m22 = a22 - e3
    r0 = jnp.stack([m00, a01, a02], axis=-1)
    r1 = jnp.stack([a01, m11, a12], axis=-1)
    r2 = jnp.stack([a02, a12, m22], axis=-1)
    c01 = jnp.cross(r0, r1)
    c02 = jnp.cross(r0, r2)
    c12 = jnp.cross(r1, r2)
    n01 = jnp.sum(c01 * c01, axis=-1)
    n02 = jnp.sum(c02 * c02, axis=-1)
    n12 = jnp.sum(c12 * c12, axis=-1)
    best = jnp.stack([n01, n02, n12], axis=-1)
    which = jnp.argmax(best, axis=-1)
    cand = jnp.stack([c01, c02, c12], axis=-2)            # (..., 3 cands, 3)
    v = jnp.take_along_axis(cand, which[..., None, None], axis=-2)[..., 0, :]
    norm = jnp.sqrt(jnp.maximum(jnp.sum(v * v, axis=-1, keepdims=True), 1e-30))
    v = v / norm
    degenerate = jnp.max(best, axis=-1) < 1e-30
    unit_z = jnp.zeros_like(v).at[..., 2].set(1.0)
    v = jnp.where(degenerate[..., None], unit_z, v)
    return e3, e2, v


def sliding_window_normals(
    height: jax.Array,       # (H, W) heights, NaN = missing
    resolution: float,
    params: PlaneSegParams,
) -> Tuple[jax.Array, jax.Array]:
    """Per-cell window plane fit. Returns (normals (3, H, W), planar (H, W)).

    Edge cells (EMPTY edge handling) and cells with NaN centers are not
    planar; normals default to +Z flip like the reference.
    """
    H, W = height.shape
    k = params.kernel_size
    half = (k - 1) // 2
    finite = jnp.isfinite(height)
    z = jnp.where(finite, height, 0.0)

    # accumulate window sums with shifted gathers; offsets use the window-local
    # coordinates (-kr*res, -kc*res) like computeNormalAndErrorForWindow
    pads = [(half, half), (half, half)]
    zp = jnp.pad(z, pads)
    mp = jnp.pad(finite.astype(z.dtype), pads)

    n = jnp.zeros_like(z)
    sx = jnp.zeros_like(z)
    sy = jnp.zeros_like(z)
    sz = jnp.zeros_like(z)
    sxx = jnp.zeros_like(z)
    sxy = jnp.zeros_like(z)
    sxz = jnp.zeros_like(z)
    syy = jnp.zeros_like(z)
    syz = jnp.zeros_like(z)
    szz = jnp.zeros_like(z)
    for kr in range(k):
        for kc in range(k):
            x_o = -kr * resolution
            y_o = -kc * resolution
            zs = zp[kr : kr + H, kc : kc + W]
            ms = mp[kr : kr + H, kc : kc + W]
            n += ms
            sx += x_o * ms
            sy += y_o * ms
            sz += zs * ms
            sxx += x_o * x_o * ms
            sxy += x_o * y_o * ms
            sxz += x_o * zs * ms
            syy += y_o * y_o * ms
            syz += y_o * zs * ms
            szz += zs * zs * ms

    safe_n = jnp.maximum(n, 1.0)
    mx = sx / safe_n
    my = sy / safe_n
    mz = sz / safe_n
    c00 = sxx / safe_n - mx * mx
    c01 = sxy / safe_n - mx * my
    c02 = sxz / safe_n - mx * mz
    c11 = syy / safe_n - my * my
    c12 = syz / safe_n - my * mz
    c22 = szz / safe_n - mz * mz
    cov = jnp.stack(
        [
            jnp.stack([c00, c01, c02], -1),
            jnp.stack([c01, c11, c12], -1),
            jnp.stack([c02, c12, c22], -1),
        ],
        axis=-2,
    )
    lam_min, lam_mid, v = eigh3_smallest(cov)
    flip = v[..., 2] < 0
    v = jnp.where(flip[..., None], -v, v)
    defined = lam_mid > 1e-8
    sq_err = jnp.where(defined, jnp.maximum(lam_min, 0.0), 1e30)
    unit_z = jnp.zeros_like(v).at[..., 2].set(1.0)
    v = jnp.where(defined[..., None], v, unit_z)

    enough = n >= 3
    sq_err = jnp.where(enough, sq_err, 1e30)
    v = jnp.where(enough[..., None], v, unit_z)

    thresh2 = params.plane_patch_error_threshold**2
    planar = (sq_err < thresh2) & (v[..., 2] > params.local_plane_inclination_threshold)

    # EMPTY edge handling: windows not fully inside are not visited
    row = jnp.arange(H)[:, None]
    col = jnp.arange(W)[None, :]
    interior = (row >= half) & (row < H - half) & (col >= half) & (col < W - half)
    planar = planar & interior & finite

    if params.planarity_opening_filter > 0:
        r = params.planarity_opening_filter
        planar = _morph_cross(planar, r, erode=True)
        planar = _morph_cross(planar, r, erode=False)

    normals = jnp.moveaxis(jnp.where(interior[..., None], v, unit_z * 0), -1, 0)
    return normals, planar


def _morph_cross(mask: jax.Array, r: int, erode: bool) -> jax.Array:
    """Morphological erode/dilate with a cross structuring element of radius r
    (cv::MORPH_CROSS), BORDER_REPLICATE."""
    m = mask
    out = mask
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            if abs(dy) + abs(dx) > r or (dy == 0 and dx == 0):
                continue
            shifted = jnp.roll(m, (dy, dx), axis=(0, 1))
            # replicate border: re-fill wrapped rows/cols with edge values
            if dy > 0:
                shifted = shifted.at[:dy].set(shifted[dy : dy + 1])
            elif dy < 0:
                shifted = shifted.at[dy:].set(shifted[dy - 1 : dy])
            if dx > 0:
                shifted = shifted.at[:, :dx].set(shifted[:, dx : dx + 1])
            elif dx < 0:
                shifted = shifted.at[:, dx:].set(shifted[:, dx - 1 : dx])
            out = out & shifted if erode else out | shifted
    return out


def connected_components(mask: jax.Array, connectivity: int = 4, max_iters: int = 0) -> jax.Array:
    """4/8-connected component labels: 0 = background, components keep the
    (flat-index+1) of their minimal member — made compact by extract_planes.

    Each round does one neighbor min-propagation followed by a pointer-jump
    (label <- label of the cell that coined the label), so convergence is
    O(log diameter) rounds instead of O(diameter): a label value v encodes
    flat cell index v-1, which is always a mask cell of the same component,
    so hopping to its current label is monotone-decreasing and stays inside
    the component."""
    H, W = mask.shape
    if max_iters <= 0:
        max_iters = 2 * (H + W)
    init = jnp.where(mask, jnp.arange(1, H * W + 1).reshape(H, W), 0)
    big = H * W + 2

    if connectivity == 4:
        offsets = [(-1, 0), (1, 0), (0, -1), (0, 1)]
    else:
        offsets = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1) if (dy, dx) != (0, 0)]

    def step(labels):
        best = jnp.where(mask, labels, big)
        for dy, dx in offsets:
            nb = jnp.roll(labels, (dy, dx), axis=(0, 1))
            # zero out wrapped borders
            if dy > 0:
                nb = nb.at[:dy].set(0)
            elif dy < 0:
                nb = nb.at[dy:].set(0)
            if dx > 0:
                nb = nb.at[:, :dx].set(0)
            elif dx < 0:
                nb = nb.at[:, dx:].set(0)
            cand = jnp.where(mask & (nb > 0), nb, big)
            best = jnp.minimum(best, cand)
        best = jnp.where(mask, best, 0)
        # pointer jump (twice): follow the label to its coining cell's label
        for _ in range(2):
            hop = best.reshape(-1)[jnp.maximum(best, 1) - 1].reshape(H, W)
            best = jnp.where(mask, jnp.minimum(best, hop), 0)
        return best

    def cond(carry):
        labels, prev, it = carry
        return (it < max_iters) & jnp.any(labels != prev)

    def body(carry):
        labels, _, it = carry
        return step(labels), labels, it + 1

    labels, _, _ = jax.lax.while_loop(cond, body, (step(init), init, 0))
    return labels


class PlaneExtraction(NamedTuple):
    labels: jax.Array        # (H, W) int32 compact labels, 0 = background
    normals: jax.Array       # (3, H, W) per-cell surface normals
    plane_normals: jax.Array  # (max_labels, 3) per-plane normal (row 0 unused)
    plane_support: jax.Array  # (max_labels, 3) per-plane support point
    plane_valid: jax.Array   # (max_labels,) bool
    needs_refine: jax.Array  # (max_labels,) bool — failed global-planarity (RANSAC candidates)


@functools.partial(
    jax.jit,
    static_argnames=("resolution", "params", "kernel_size", "median_passes", "out_shape"),
)
def preprocess_and_extract(
    height: jax.Array,
    resolution: float,
    params: PlaneSegParams,
    map_origin: jax.Array = None,
    kernel_size: int = 3,
    median_passes: int = 1,
    out_shape=None,
):
    """One fused dispatch: preprocess (inpaint → median → optional resample,
    GridMapPreprocessing.cpp:14-18) → extract_planes. On tunneled/remote
    backends each host sync costs tens of ms, so the pipeline runs both
    device stages in a single jit (PlaneDecompositionPipeline.update).

    `resolution` is the EXTRACTION resolution (post-resample); `out_shape`
    is the static resampled grid size (resample_shape) or None to skip;
    `map_origin` is the world position of cell (0,0) at that resolution."""
    h = preprocess(height, median_passes=median_passes, kernel_size=kernel_size)
    if out_shape is not None and tuple(out_shape) != h.shape:
        # cv::resize INTER_LINEAR (inpainting.cpp:272-277): half-pixel
        # centers, NO antialiasing on downscale (plain bilinear sampling)
        h = jax.image.resize(h, tuple(out_shape), method="linear", antialias=False)
    return h, extract_planes(h, resolution, params, map_origin)


@functools.partial(
    jax.jit,
    static_argnames=("resolution", "params", "kernel_size", "median_passes", "out_shape"),
)
def batched_preprocess_and_extract(
    heights: jax.Array,          # (B, H, W)
    resolution: float,
    params: PlaneSegParams,
    map_origins: jax.Array = None,  # (B, 2)
    kernel_size: int = 3,
    median_passes: int = 1,
    out_shape=None,
):
    """vmapped preprocess_and_extract over a leading env/batch axis.

    One device dispatch + one batched fetch amortizes the per-dispatch
    host↔device round-trip (~30-40 ms on tunneled backends) over B maps —
    the reference runs one plane-decomposition node per robot and has no
    analogue; this is the multi-env (sim/fleet) operating mode. All maps
    share the (static) resolution/params; per-map world origins batch."""
    if map_origins is None:
        map_origins = jnp.zeros((heights.shape[0], 2), heights.dtype)

    def one(hm, org):
        return preprocess_and_extract(
            hm, resolution, params, org,
            kernel_size=kernel_size, median_passes=median_passes,
            out_shape=out_shape,
        )

    return jax.vmap(one)(heights, map_origins)


@functools.partial(jax.jit, static_argnames=("resolution", "params"))
def extract_planes(
    height: jax.Array,        # (H, W), NaN = missing
    resolution: float,
    params: PlaneSegParams,
    map_origin: jax.Array = None,  # (2,) world position of cell (0,0)
) -> PlaneExtraction:
    H, W = height.shape
    if map_origin is None:
        map_origin = jnp.zeros((2,), height.dtype)

    normals, planar = sliding_window_normals(height, resolution, params)
    raw_labels = connected_components(planar, params.connectivity)

    # compact to [1, max_labels]; pad with a +inf-like sentinel so the array
    # stays sorted for searchsorted (fill_value=0 would break the order).
    # Components beyond max_labels are dropped to background — never merged
    # onto another label's plane fit.
    sentinel = jnp.iinfo(jnp.int32).max
    with_bg = jnp.concatenate([raw_labels.reshape(-1), jnp.zeros((1,), raw_labels.dtype)])
    uniq = jnp.unique(with_bg, size=params.max_labels + 1, fill_value=sentinel)
    compact = jnp.searchsorted(uniq, raw_labels).astype(jnp.int32)
    compact = jnp.clip(compact, 0, params.max_labels)
    found = uniq[compact] == raw_labels
    compact = jnp.where((raw_labels > 0) & found, compact, 0)

    # per-label plane fit in world coordinates (:167-175)
    row = jnp.arange(H)[:, None] * jnp.ones((1, W))
    col = jnp.ones((H, 1)) * jnp.arange(W)[None, :]
    px = map_origin[0] - row * resolution
    py = map_origin[1] - col * resolution
    finite = jnp.isfinite(height)
    pz = jnp.where(finite, height, 0.0)

    L = params.max_labels + 1
    flat_lab = jnp.where(finite, compact, 0).reshape(-1)
    ones = finite.astype(height.dtype).reshape(-1)

    # The 10 per-label moment reductions run as ONE one-hot matmul on the
    # MXU: with L ≈ 65 labels the (HW, L) one-hot operand is small, and a
    # single HIGHEST-precision dot replaces 10 serialized 41k-update
    # scatters (the XLA segment_sum lowering), ~4 ms → ~0.1 ms on v5e.
    onehot = (flat_lab[:, None] == jnp.arange(L, dtype=jnp.int32)[None, :]).astype(
        height.dtype
    )                                                     # (HW, L)
    moments = jnp.stack(
        [
            jnp.ones_like(pz), px, py, pz,
            px * px, px * py, px * pz,
            py * py, py * pz, pz * pz,
        ],
        axis=-1,
    ).reshape(-1, 10) * ones[:, None]                     # (HW, 10)
    sums = jax.lax.dot_general(
        onehot,
        moments,
        dimension_numbers=(((0,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
    )                                                     # (L, 10)
    n, sx, sy, sz, sxx, sxy, sxz, syy, syz, szz = [sums[:, k] for k in range(10)]
    safe_n = jnp.maximum(n, 1.0)
    mean = jnp.stack([sx, sy, sz], -1) / safe_n[:, None]
    c00 = sxx / safe_n - mean[:, 0] ** 2
    c01 = sxy / safe_n - mean[:, 0] * mean[:, 1]
    c02 = sxz / safe_n - mean[:, 0] * mean[:, 2]
    c11 = syy / safe_n - mean[:, 1] ** 2
    c12 = syz / safe_n - mean[:, 1] * mean[:, 2]
    c22 = szz / safe_n - mean[:, 2] ** 2
    cov = jnp.stack(
        [
            jnp.stack([c00, c01, c02], -1),
            jnp.stack([c01, c11, c12], -1),
            jnp.stack([c02, c12, c22], -1),
        ],
        axis=-2,
    )
    _, _, pn = eigh3_smallest(cov)
    pn = jnp.where(pn[:, 2:3] < 0, -pn, pn)

    # global planarity check per cell, reduced per label (:276-299)
    pn_cells = pn[compact]                                # (H, W, 3)
    mean_cells = mean[compact]
    ndotp = pn_cells[..., 0] * px + pn_cells[..., 1] * py + pn_cells[..., 2] * pz
    ndots = jnp.sum(pn_cells * mean_cells, axis=-1)
    dist_err = jnp.abs(ndotp - ndots)
    cell_norm = jnp.moveaxis(normals, 0, -1)
    ndotn = jnp.sum(pn_cells * cell_norm, axis=-1)
    cos_thresh = math.cos(math.radians(params.global_plane_fit_angle_error_threshold_degrees))
    bad = (dist_err > params.global_plane_fit_distance_error_threshold) | (ndotn < cos_thresh)
    bad = bad & (compact > 0) & finite
    # per-label "any bad cell" via the same one-hot operand (max of 0/1 = sum > 0)
    label_bad = (
        jax.lax.dot_general(
            onehot,
            bad.astype(height.dtype).reshape(-1, 1),
            dimension_numbers=(((0,), (0,)), ((), ())),
        )[:, 0]
        > 0.5
    )

    enough = (n >= params.min_number_points_per_label) & (n >= 3)
    within_incl = pn[:, 2] > params.plane_inclination_threshold
    valid = enough & within_incl & ~label_bad
    valid = valid.at[0].set(False)
    needs_refine = enough & label_bad
    needs_refine = needs_refine.at[0].set(False)

    # labels failing all gates go to background (:198-216)
    keep = (valid | needs_refine)[compact]
    labels_out = jnp.where(keep, compact, 0).astype(jnp.int32)

    return PlaneExtraction(
        labels=labels_out,
        normals=normals,
        plane_normals=pn,
        plane_support=mean,
        plane_valid=valid,
        needs_refine=needs_refine,
    )


# ---------------------------------------------------------------------------
# preprocessing (GridMapPreprocessing.cpp:14-39)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("inpaint_iters", "median_passes", "kernel_size"))
def preprocess(
    height: jax.Array,
    inpaint_iters: int = 0,
    median_passes: int = 1,
    kernel_size: int = 3,
) -> jax.Array:
    """GridMapPreprocessing inpaint + denoise (GridMapPreprocessing.cpp:14-39):
    min-values inpaint to the reference fixed point (every NaN-connected
    region takes the MINIMUM value along its contour — inpainting.cpp:25-94
    keeps lowering filled cells until nothing changes) then kxk median
    denoise repeated median_passes times (kernel clamped to [1,5] like
    denoise(), which bounds cv::medianBlur's float support).
    """
    from ..ops.gridmap_filters import inpaint_min_values

    H, W = height.shape
    h = inpaint_min_values(height, iterations=inpaint_iters)

    k = max(1, min(kernel_size, 5))
    if k % 2 == 0:
        k += 1
    half = k // 2
    for _ in range(median_passes):
        if k == 1:
            break
        pad = jnp.pad(h, half, mode="edge")
        center = pad[half : half + H, half : half + W]
        # NaN neighbors (only possible in isolated all-NaN islands) fall
        # back to the center value so min/max exchanges stay NaN-free
        v = [
            jnp.where(
                jnp.isfinite(pad[dy : dy + H, dx : dx + W]),
                pad[dy : dy + H, dx : dx + W],
                center,
            )
            for dy in range(k)
            for dx in range(k)
        ]
        med = _median9(v) if k == 3 else jnp.median(jnp.stack(v), axis=0)
        h = jnp.where(jnp.isfinite(h), med, h)
    return h


def _median9(v):
    """Median of 9 via Paeth's 19-exchange network — pure VPU min/max,
    no sort (cheaper than jnp.median's general sort on TPU and CPU)."""
    v = list(v)

    def mnmx(i, j):
        lo = jnp.minimum(v[i], v[j])
        hi = jnp.maximum(v[i], v[j])
        v[i], v[j] = lo, hi

    for i, j in [(1, 2), (4, 5), (7, 8), (0, 1), (3, 4), (6, 7), (1, 2), (4, 5),
                 (7, 8), (0, 3), (5, 8), (4, 7), (3, 6), (1, 4), (2, 5), (4, 7),
                 (4, 2), (6, 4), (4, 2)]:
        mnmx(i, j)
    return v[4]
