"""Built-in post-processing plugins.

Equivalents of the reference plugin set (plugins/*.py), re-expressed as
vectorized XLA ops where the reference used CUDA kernels, and as host-side
cv2/linalg where the reference deliberately ran on CPU (inpainting, erosion):

  min_filter / max_filter     plugins/min_filter.py:29-118, max_filter.py:36-113
  smooth_filter               plugins/smooth_filter.py:48-59
  inpainting                  plugins/inpainting.py:53-61 (cv2, host)
  erosion                     plugins/erosion.py:41-113 (cv2, host)
  semantic_filter             plugins/semantic_filter.py:92-133
  semantic_traversability     plugins/semantic_traversability.py:36-81
  max_layer_filter            plugins/max_layer_filter.py:44-108
  robot_centric_elevation     plugins/robot_centric_elevation.py:30-121
  features_pca                plugins/features_pca.py:42-96
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import stencil
from ..semantic.fusions import uint_to_rgb_float
from .manager import PluginBase

__all__ = ["REGISTRY"]


class MinFilter(PluginBase):
    def __init__(self, cell_n: int = 100, dilation_size: int = 5, iteration_n: int = 5, **kw):
        self.size = int(dilation_size)
        self.iters = int(iteration_n)

    def __call__(self, elevation_map, layer_names, *args):
        return stencil.min_filter(elevation_map[0], elevation_map[2], self.size, self.iters)


class MaxFilter(PluginBase):
    def __init__(self, cell_n: int = 100, dilation_size: int = 5, iteration_n: int = 5, **kw):
        self.size = int(dilation_size)
        self.iters = int(iteration_n)

    def __call__(self, elevation_map, layer_names, *args):
        return stencil.max_filter(elevation_map[0], elevation_map[2], self.size, self.iters)


class SmoothFilter(PluginBase):
    def __init__(self, cell_n: int = 100, input_layer_name: str = "elevation", **kw):
        self.input_layer_name = input_layer_name

    def __call__(self, elevation_map, layer_names, plugin_layers, plugin_layer_names, *args):
        if self.input_layer_name in layer_names:
            h = elevation_map[layer_names.index(self.input_layer_name)]
        elif self.input_layer_name in plugin_layer_names:
            h = plugin_layers[plugin_layer_names.index(self.input_layer_name)]
        else:
            h = elevation_map[0]
        return stencil.uniform_smooth(h, passes=2, size=3)


class Inpainting(PluginBase):
    """cv2.inpaint on the normalized-uint8 height image (host-side, like the
    reference). Falls back to iterative neighbor-mean diffusion without cv2."""

    def __init__(self, cell_n: int = 100, method: str = "telea", **kw):
        self.method = method

    def __call__(self, elevation_map, layer_names, *args):
        h = np.asarray(elevation_map[0], np.float32)
        mask = (np.asarray(elevation_map[2]) < 0.5).astype(np.uint8)
        if not (mask < 1).any():
            return elevation_map[0]
        try:
            import cv2 as cv

            flag = cv.INPAINT_NS if self.method == "ns" else cv.INPAINT_TELEA
            known = h[mask < 1]
            h_max, h_min = float(known.max()), float(known.min())
            scale = (h_max - h_min) or 1.0
            h8 = ((h - h_min) * 255 / scale).astype(np.uint8)
            dst = cv.inpaint(h8, mask, 1, flag)
            out = dst.astype(np.float32) * scale / 255 + h_min
            return jnp.asarray(out)
        except ImportError:
            out = jnp.asarray(h)
            m = jnp.asarray(mask == 0, jnp.float32)
            for _ in range(32):
                s = stencil.uniform_smooth(out * m, passes=1, size=3)
                c = stencil.uniform_smooth(m, passes=1, size=3)
                fill = s / jnp.maximum(c, 1e-6)
                out = jnp.where(m > 0.5, out, fill)
                m = jnp.maximum(m, (c > 1e-6).astype(jnp.float32))
            return out


class Erosion(PluginBase):
    def __init__(
        self,
        cell_n: int = 100,
        input_layer_name: str = "traversability",
        kernel_size: int = 3,
        iterations: int = 1,
        reverse: bool = False,
        default_layer_name: str = "traversability",
        **kw,
    ):
        self.input_layer_name = input_layer_name
        self.kernel_size = int(kernel_size)
        self.iterations = int(iterations)
        self.reverse = bool(reverse)
        self.default_layer_name = default_layer_name

    def __call__(self, elevation_map, layer_names, plugin_layers, plugin_layer_names,
                 semantic_map, semantic_layer_names, *args):
        layer = self.get_layer_data(
            elevation_map, layer_names, plugin_layers, plugin_layer_names,
            semantic_map, semantic_layer_names, self.input_layer_name,
        )
        if layer is None:
            layer = self.get_layer_data(
                elevation_map, layer_names, plugin_layers, plugin_layer_names,
                semantic_map, semantic_layer_names, self.default_layer_name,
            )
        if layer is None:
            layer = elevation_map[3]
        x = np.asarray(layer, np.float32)
        if self.reverse:
            x = 1 - x
        lo, hi = float(x.min()), float(x.max())
        scale = (hi - lo) or 1.0
        x8 = ((x - lo) * 255 / scale).astype(np.uint8)
        try:
            import cv2 as cv

            kernel = np.ones((self.kernel_size, self.kernel_size), np.uint8)
            x8 = cv.erode(x8, kernel, iterations=self.iterations)
        except ImportError:
            pad = self.kernel_size // 2
            for _ in range(self.iterations):
                padded = np.pad(x8, pad, mode="edge")
                views = [
                    padded[dy : dy + x8.shape[0], dx : dx + x8.shape[1]]
                    for dy in range(self.kernel_size)
                    for dx in range(self.kernel_size)
                ]
                x8 = np.minimum.reduce(views)
        out = x8.astype(np.float32) * scale / 255 + lo
        if self.reverse:
            out = 1 - out
        return jnp.asarray(out)


def _pascal_color_map(n: int = 256) -> np.ndarray:
    """VOC-style colormap with the reference's overrides
    (semantic_filter.py:36-62)."""
    cmap = np.zeros((n + 1, 3), np.uint8)
    for i in range(n + 1):
        r = g = b = 0
        c = i
        for j in range(8):
            r |= ((c >> 0) & 1) << (7 - j)
            g |= ((c >> 1) & 1) << (7 - j)
            b |= ((c >> 2) & 1) << (7 - j)
            c >>= 3
        cmap[i] = (r, g, b)
    cmap[1] = [81, 113, 162]
    cmap[2] = [81, 113, 162]
    cmap[3] = [188, 63, 59]
    return cmap[1:]


class SemanticFilter(PluginBase):
    def __init__(self, cell_n: int = 100, classes: Sequence[str] = ("person", "grass"), **kw):
        self.classes = list(classes)
        colors = _pascal_color_map(255).astype(np.uint32)
        packed = (colors[:, 0] << 16) | (colors[:, 1] << 8) | colors[:, 2]
        self.color_encoding = jnp.asarray(packed.view(np.float32))

    def _indices(self, names: Sequence[str]) -> List[int]:
        return [i for i, nm in enumerate(names) if any(re.match(p, nm) for p in self.classes)]

    def __call__(self, elevation_map, layer_names, plugin_layers, plugin_layer_names,
                 semantic_map, semantic_layer_names, *args):
        data = []
        for m, names in (
            (elevation_map, layer_names),
            (plugin_layers, plugin_layer_names),
            (semantic_map, semantic_layer_names),
        ):
            idx = self._indices(list(names))
            if idx:
                data.append(m[jnp.asarray(idx)])
        if data:
            stack = jnp.concatenate(data, axis=0)
            class_id = jnp.argmax(stack, axis=0)
        else:
            class_id = jnp.zeros(elevation_map[0].shape, jnp.int32)
        return self.color_encoding[class_id]


class SemanticTraversability(PluginBase):
    def __init__(self, cell_n: int = 100, layers: Sequence[str] = ("traversability",),
                 thresholds: Sequence[float] = (0.5,), type: Sequence[str] = ("traversability",), **kw):
        self.layers = list(layers)
        self.thresholds = list(thresholds)
        self.types = list(type)

    def __call__(self, elevation_map, layer_names, plugin_layers, plugin_layer_names,
                 semantic_map, semantic_layer_names, *args):
        votes = jnp.zeros(elevation_map[0].shape, jnp.float32)
        for name, thresh, typ in zip(self.layers, self.thresholds, self.types):
            layer = self.get_layer_data(
                elevation_map, layer_names, plugin_layers, plugin_layer_names,
                semantic_map, semantic_layer_names, name,
            )
            if layer is None:
                continue
            if typ == "traversability":
                votes = votes + (layer <= thresh)
            else:
                votes = votes + (layer >= thresh)
        return jnp.where(votes <= 0.9, 0.1, 1.0)


class MaxLayerFilter(PluginBase):
    def __init__(self, cell_n: int = 100, layers: Sequence[str] = ("traversability",),
                 reverse: Sequence[bool] = (False,), min_or_max: str = "max",
                 thresholds: Sequence[Any] = (False,), scales: Sequence[Any] = (1.0,),
                 default_value: Any = 0.0, **kw):
        self.layers = list(layers)
        self.reverse = list(reverse)
        self.min_or_max = min_or_max
        self.thresholds = list(thresholds)
        self.scales = list(scales)
        self.default_value = default_value

    def __call__(self, elevation_map, layer_names, plugin_layers, plugin_layer_names,
                 semantic_map, semantic_layer_names, *args):
        stack = []
        for it, name in enumerate(self.layers):
            layer = self.get_layer_data(
                elevation_map, layer_names, plugin_layers, plugin_layer_names,
                semantic_map, semantic_layer_names, name,
            )
            if layer is None:
                continue
            if isinstance(self.default_value, float):
                layer = jnp.where(layer == 0.0, float(self.default_value), layer)
            elif isinstance(self.default_value, str):
                dflt = self.get_layer_data(
                    elevation_map, layer_names, plugin_layers, plugin_layer_names,
                    semantic_map, semantic_layer_names, self.default_value,
                )
                if dflt is not None:
                    layer = jnp.where(layer == 0.0, dflt, layer)
            if it < len(self.reverse) and self.reverse[it]:
                layer = 1.0 - layer
            if it < len(self.scales) and isinstance(self.scales[it], float):
                layer = layer * float(self.scales[it])
            if it < len(self.thresholds) and isinstance(self.thresholds[it], float):
                layer = jnp.where(layer > float(self.thresholds[it]), 1.0, 0.0)
            stack.append(layer)
        if not stack:
            if isinstance(self.default_value, float):
                return jnp.full(elevation_map[0].shape, float(self.default_value))
            return elevation_map[3]
        arr = jnp.stack(stack, axis=0)
        return jnp.min(arr, axis=0) if self.min_or_max == "min" else jnp.max(arr, axis=0)


class RobotCentricElevation(PluginBase):
    """Rotate valid heights into the base frame
    (robot_centric_elevation.py:25-121)."""

    def __init__(self, cell_n: int = 100, resolution: float = 0.04,
                 threshold: float = 0.0, use_threshold: bool = False, **kw):
        self.resolution = float(resolution)
        self.threshold = float(threshold)
        self.use_threshold = bool(use_threshold)

    def __call__(self, elevation_map, layer_names, plugin_layers, plugin_layer_names,
                 semantic_map, semantic_layer_names, rotation, *args):
        n = elevation_map.shape[-1]
        R = jnp.asarray(rotation) if rotation is not None else jnp.eye(3)
        i = jnp.arange(n * n)
        # the reference derives cell coords from the flat index with integer
        # division *before* scaling (robot_centric_elevation.py:52-58)
        rx = (i // n).astype(jnp.float32) * self.resolution
        ry = (i % n).astype(jnp.float32) * self.resolution
        rz = elevation_map[0].reshape(-1)
        z_b = R[2, 0] * rx + R[2, 1] * ry + R[2, 2] * rz
        if self.use_threshold:
            z_b = jnp.where(z_b >= self.threshold, 1.0, 0.0)
        valid = elevation_map[2].reshape(-1) > 0.5
        out = jnp.where(valid, z_b, rz)
        return out.reshape(n, n)


class FeaturesPca(PluginBase):
    """PCA of feature layers → packed RGB (features_pca.py:42-96), computed
    with an on-device eigendecomposition instead of sklearn."""

    def __init__(self, cell_n: int = 100, process_layer_names: Sequence[str] = (), **kw):
        self.process_layer_names = list(process_layer_names)

    def _indices(self, names: Sequence[str]) -> List[int]:
        return [
            i for i, nm in enumerate(names)
            if any(re.match(p, nm) for p in self.process_layer_names)
        ]

    def __call__(self, elevation_map, layer_names, plugin_layers, plugin_layer_names,
                 semantic_map, semantic_layer_names, *args):
        data = []
        for m, names in (
            (elevation_map, layer_names),
            (plugin_layers, plugin_layer_names),
            (semantic_map, semantic_layer_names),
        ):
            idx = self._indices(list(names))
            if idx:
                data.append(jnp.clip(m[jnp.asarray(idx)], -1, 1))
        if not data:
            return jnp.zeros_like(elevation_map[0])
        feats = jnp.concatenate(data, axis=0)          # (F, H, W)
        n = feats.shape[-1]
        x = feats.reshape(feats.shape[0], -1).T        # (H*W, F)
        mu = jnp.mean(x, axis=0, keepdims=True)
        xc = x - mu
        cov = xc.T @ xc
        _, vecs = jnp.linalg.eigh(cov)
        comps = vecs[:, -3:][:, ::-1]                  # top-3 principal axes
        proj = xc @ comps                              # (H*W, 3)
        pmin = jnp.min(proj, axis=0)
        pmax = jnp.max(proj, axis=0)
        scale = jnp.where(pmax - pmin == 0, 1.0, pmax - pmin)
        img = ((proj - pmin) / scale * 255).astype(jnp.uint32)
        packed = uint_to_rgb_float(img[:, 0], img[:, 1], img[:, 2])
        return packed.reshape(n, n)


REGISTRY: Dict[str, Any] = {
    "min_filter": MinFilter,
    "max_filter": MaxFilter,
    "smooth_filter": SmoothFilter,
    "inpainting": Inpainting,
    "erosion": Erosion,
    "semantic_filter": SemanticFilter,
    "semantic_traversability": SemanticTraversability,
    "max_layer_filter": MaxLayerFilter,
    "robot_centric_elevation": RobotCentricElevation,
    "features_pca": FeaturesPca,
}
