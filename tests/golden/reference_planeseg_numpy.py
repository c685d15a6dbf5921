"""Golden oracle for GridMapPreprocessing + Postprocessing.

A faithful host-side execution of the reference pipeline stages using REAL
OpenCV for every cv:: call the C++ makes, and literal NumPy loop ports of
the grid_map_filters_rsl free functions. This is as close to running the
reference as this environment allows (the C++ links the same OpenCV ops):

  * ``min_values_inpaint``   — inpainting.cpp:25-94 (loop port, in-place sweep)
  * ``apply_kernel_function``— processing.cpp:145-180 (shifted-window rule)
  * ``preprocess``           — GridMapPreprocessing.cpp:14-39
                               (inpaint → cv2.medianBlur → cv2.resize)
  * ``add_smooth_layer``     — Postprocessing.cpp:73-144
                               (NaN mask → inpaint → cv2.morphologyEx CLOSE →
                                45°-cone applyKernelFunction → cv2.boxFilter →
                                cv2.GaussianBlur)
  * ``postprocess``          — Postprocessing.cpp:14-63
                               (smooth layer, cv2.dilate non-planar merge,
                                height offsets)
"""

from __future__ import annotations

import dataclasses
import math

import cv2
import numpy as np


@dataclasses.dataclass
class PreprocessingParams:
    resolution: float = 0.04
    kernel_size: int = 3
    number_of_repeats: int = 1


@dataclasses.dataclass
class PostprocessingParams:
    extracted_planes_height_offset: float = 0.0
    nonplanar_height_offset: float = 0.02
    nonplanar_horizontal_offset: int = 1
    smoothing_dilation_size: float = 0.2
    smoothing_box_kernel_size: float = 0.1
    smoothing_gauss_kernel_size: float = 0.05


# ---------------------------------------------------------------------------
# grid_map_filters_rsl loop ports
# ---------------------------------------------------------------------------

def min_values_inpaint(h_in: np.ndarray) -> np.ndarray:
    """inpainting::minValues (inpainting.cpp:25-94): sweep until no cell
    changes; each originally-NaN cell keeps taking the min of its 4
    neighbours' current values, so a NaN-connected region converges to the
    minimum along its contour."""
    h_in = np.asarray(h_in, np.float32)
    out = h_in.copy()
    H, W = h_in.shape
    nan_in = np.isnan(h_in)

    def store_min(new, cur):
        if not np.isnan(new) and (np.isnan(cur) or new < cur):
            return new, True
        return cur, False

    changed = True
    has_value = True
    while changed and has_value:
        changed = False
        has_value = False
        # reference sweeps column-major (col outer, row inner), in place
        for c in range(W):
            for r in range(H):
                if nan_in[r, c]:
                    v = out[r, c]
                    for rr, cc in ((r, c - 1), (r, c + 1), (r - 1, c), (r + 1, c)):
                        if 0 <= rr < H and 0 <= cc < W:
                            v, ch = store_min(out[rr, cc], v)
                            changed = changed or ch
                    out[r, c] = v
                else:
                    has_value = True
    return out


def apply_kernel_function(h: np.ndarray, size: int, fn) -> np.ndarray:
    """processing::applyKernelFunction (processing.cpp:145-180): the kxk
    block is clamped fully inside the map (shifted near borders)."""
    H, W = h.shape
    half = (size - 1) // 2
    out = np.empty_like(h)
    for r in range(H):
        for c in range(W):
            r0 = min(max(r - half, 0), H - size)
            c0 = min(max(c - half, 0), W - size)
            out[r, c] = fn(h[r0 : r0 + size, c0 : c0 + size])
    return out


def _max_of_finites(block: np.ndarray) -> float:
    finite = block[np.isfinite(block)]
    return float(finite.max()) if finite.size else float("nan")


# ---------------------------------------------------------------------------
# GridMapPreprocessing (GridMapPreprocessing.cpp:14-39)
# ---------------------------------------------------------------------------

def denoise(h: np.ndarray, kernel_size: int, repeats: int) -> np.ndarray:
    """GridMapPreprocessing::denoise → smoothing::median with deltaKernelSize
    0 → cv::medianBlur repeated (smoothing.cpp:23-43)."""
    k = max(1, min(kernel_size, 5))
    if k % 2 == 0:
        k += 1
    img = np.ascontiguousarray(h, np.float32)
    for _ in range(repeats):
        if k > 1:
            img = cv2.medianBlur(img, k)
    return img


def resample(h: np.ndarray, old_res: float, new_res: float):
    """inpainting::resample (inpainting.cpp:244-289). Returns (resized,
    true_new_res)."""
    H, W = h.shape
    scaling = old_res / new_res
    width = int(W * scaling)
    height = int(H * scaling)
    resized = cv2.resize(
        np.ascontiguousarray(h, np.float32), (width, height),
        interpolation=cv2.INTER_LINEAR,
    )
    true_res = 0.5 * ((H * old_res) / height + (W * old_res) / width)
    return resized, true_res


def preprocess(h: np.ndarray, old_res: float, params: PreprocessingParams):
    """inpaint → denoise → changeResolution. Returns (map, resolution)."""
    h = min_values_inpaint(h)
    h = denoise(h, params.kernel_size, params.number_of_repeats)
    if params.resolution > 0.0 and abs(old_res - params.resolution) >= 1e-6:
        h, res = resample(h, old_res, params.resolution)
        return h, res
    return h, old_res


# ---------------------------------------------------------------------------
# Postprocessing (Postprocessing.cpp)
# ---------------------------------------------------------------------------

def _kernel_size_in_pixels(real_size: float, res: float) -> int:
    return 2 * int(math.floor(real_size / res + 0.5)) + 1


def add_smooth_layer(
    elevation: np.ndarray, mask: np.ndarray, res: float, p: PostprocessingParams
) -> np.ndarray:
    """Postprocessing::addSmoothLayer (Postprocessing.cpp:73-144)."""
    dilation_size = _kernel_size_in_pixels(p.smoothing_dilation_size, res)
    kernel = _kernel_size_in_pixels(p.smoothing_box_kernel_size, res)
    kernel_gauss = _kernel_size_in_pixels(p.smoothing_gauss_kernel_size, res)

    with_nan = np.where(mask == 1.0, elevation, np.nan).astype(np.float32)
    inpainted = min_values_inpaint(with_nan)

    ellipse = cv2.getStructuringElement(
        cv2.MORPH_ELLIPSE, (dilation_size, dilation_size)
    )
    closed = cv2.morphologyEx(
        inpainted, cv2.MORPH_CLOSE, ellipse, anchor=(-1, -1), iterations=1,
        borderType=cv2.BORDER_REPLICATE,
    )

    half = (dilation_size - 1) // 2
    offsets = np.empty((dilation_size, dilation_size), np.float32)
    for i in range(dilation_size):
        for j in range(dilation_size):
            offsets[i, j] = res * math.sqrt((i - half) ** 2 + (j - half) ** 2)
    dilated = apply_kernel_function(
        closed, dilation_size, lambda block: _max_of_finites(block - offsets)
    )

    box = cv2.boxFilter(
        dilated, -1, (kernel, kernel), anchor=(-1, -1), normalize=True,
        borderType=cv2.BORDER_REPLICATE,
    )
    smooth = cv2.GaussianBlur(
        box, (kernel_gauss, kernel_gauss), 0, 0, borderType=cv2.BORDER_REPLICATE
    )
    return smooth


def postprocess(
    elevation: np.ndarray, mask: np.ndarray, res: float, p: PostprocessingParams
):
    """Postprocessing::postprocess on the elevation layer
    (Postprocessing.cpp:14-63). Returns (elevation_out, smooth_planar)."""
    elevation = np.asarray(elevation, np.float32).copy()
    mask = np.asarray(mask, np.float32)

    smooth = add_smooth_layer(elevation, mask, res, p)

    if p.nonplanar_horizontal_offset > 0:
        size = 2 * p.nonplanar_horizontal_offset + 1
        ellipse = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (size, size))
        dilated = cv2.dilate(
            elevation, ellipse, anchor=(-1, -1), iterations=1,
            borderType=cv2.BORDER_REPLICATE,
        )
        elevation = mask * elevation + (1.0 - mask) * dilated

    if p.extracted_planes_height_offset != 0.0 or p.nonplanar_height_offset != 0.0:
        elevation = elevation + (
            p.extracted_planes_height_offset + p.nonplanar_height_offset
        )
        if p.nonplanar_height_offset != 0.0:
            elevation = elevation - p.nonplanar_height_offset * mask

    return elevation, smooth
