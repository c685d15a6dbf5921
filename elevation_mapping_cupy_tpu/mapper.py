"""Stateful elevation map — drop-in API surface of the reference ElevationMap.

Wraps the functional core (core.py) with the reference's imperative interface
(elevation_mapping.py:49-922): input_pointcloud / input_image / move_to /
get_map_with_name_ref / get_polygon_traversability / initialize_map / ....
Holds one MapState pytree; every mutation routes through a jitted pure
function, so there is no lock (the reference needed map_lock, :66).

Variable-size pointclouds are padded to power-of-two buckets so each bucket
compiles once (the static-shape analogue of the reference's per-geometry
kernel compile).
"""

from __future__ import annotations

import dataclasses
import functools
import math
import os
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import core
from .config import MapConfig
from .nn.traversability import TravWeights, default_weights, load_weights_npz
from .ops import polygon as poly_ops
from .plugins import PluginManager
from .state import MapState, init_state
from .utils.hull import convex_hull

__all__ = ["ElevationMap"]

_CORE_LAYERS = [
    "elevation",
    "variance",
    "is_valid",
    "traversability",
    "time",
    "upper_bound",
    "is_upper_bound",
]


@functools.partial(jax.jit, static_argnames=("cfg", "name", "flip"))
def _export_layer(state: MapState, cfg: MapConfig, name: str, flip: bool = False):
    """One fused export: crop, NaN-fill, z-offset, optional double flip.

    Keeping the whole export inside a single jit matters on tunneled
    backends: eager per-op dispatch costs ~26 ms each."""
    L = state.layers

    def pub(m, fill_nan=False, add_z=False):
        if fill_nan:
            m = jnp.where(L[2] > 0.5, m, jnp.nan)
        if add_z:
            m = m + state.center[2]
        return m[1:-1, 1:-1]

    if name == "elevation":
        m = pub(L[0], fill_nan=True, add_z=True)
    elif name == "variance":
        m = pub(L[1])
    elif name == "is_valid":
        # Deviation: the reference lists is_valid in layer_names but its
        # get_map_with_name_ref has no branch for it and prints "not in the
        # map" (elevation_mapping.py:720-767). We export the raw mask — the
        # replay/parity harness needs it.
        m = pub(L[2])
    elif name == "traversability":
        trav = jnp.where((L[2] + L[6]) > 0.5, L[3], jnp.nan)
        buf = jnp.full_like(trav, jnp.nan)
        buf = buf.at[3:-3, 3:-3].set(trav[3:-3, 3:-3])
        m = buf[1:-1, 1:-1]
    elif name == "time":
        m = pub(L[4])
    elif name in ("upper_bound", "is_upper_bound"):
        if cfg.use_only_above_for_upper_bound:
            valid = ((L[5] > 0.0) & (L[6] > 0.5)) | (L[2] > 0.5)
        else:
            valid = (L[2] > 0.5) | (L[6] > 0.5)
        if name == "upper_bound":
            m = jnp.where(valid, L[5], jnp.nan)[1:-1, 1:-1] + state.center[2]
        else:
            m = jnp.where(valid, L[6], jnp.nan)[1:-1, 1:-1]
    elif name in ("normal_x", "normal_y", "normal_z"):
        m = state.normal[("normal_x", "normal_y", "normal_z").index(name)][1:-1, 1:-1]
    elif name in cfg.semantic_layers:
        m = state.semantic[cfg.semantic_layers.index(name)][1:-1, 1:-1]
    else:
        raise KeyError(name)
    if flip:
        m = jnp.flip(jnp.flip(m, 0), 1)
    return m


@functools.partial(jax.jit, static_argnames=("cfg", "names", "flip"))
def _export_layers(state: MapState, cfg: MapConfig, names, flip: bool = False):
    """Batched export: every named layer in one compiled program, so a
    publish cycle pays ONE dispatch+fetch instead of one per layer."""
    return tuple(_export_layer(state, cfg, nm, flip) for nm in names)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _polygon_stats(
    state: MapState,
    checker: jax.Array,          # (H, W) layer used for safety
    poly_padded: jax.Array,      # (V, 2)
    n_vertices: jax.Array,
    cfg: MapConfig,
):
    """Fused polygon mask + masked traversability stats + unsafe-cell mask."""
    mask = poly_ops.polygon_mask(poly_padded, n_vertices, state.center[:2], cfg)
    masked, masked_isvalid = poly_ops.masked_traversability(state.layers, mask, checker)
    s = jnp.sum(masked_isvalid)
    t = jnp.where(s > 0, jnp.sum(masked) / jnp.maximum(s, 1), 0.0)
    over = masked > (1 - cfg.safe_thresh)
    return t, jnp.max(masked), over


class ElevationMap:
    def __init__(
        self,
        cfg: MapConfig,
        weights: Optional[TravWeights] = None,
        weight_file: Optional[str] = None,
        plugin_config_file: Optional[str] = None,
    ):
        # backend is about to be used anyway: route the persistent compile
        # cache to the live backend's dir (utils/compile_cache.py)
        from .utils.compile_cache import ensure_compile_cache

        ensure_compile_cache()

        self.cfg = cfg
        self.cell_n = cfg.cell_n
        self.resolution = cfg.resolution
        self.map_length = cfg.map_length
        self.layer_names = list(_CORE_LAYERS)

        if weights is None:
            if weight_file:
                weights = load_weights_npz(weight_file)
            else:
                import os

                default_path = os.path.join(
                    os.path.dirname(__file__), "data", "traversability_weights.npz"
                )
                weights = (
                    load_weights_npz(default_path)
                    if os.path.exists(default_path)
                    else default_weights()
                )
        self.weights = weights

        self.state = init_state(cfg)
        self.untraversable_polygon = np.zeros((1, 2))

        self.plugin_manager = PluginManager(cell_n=self.cell_n)
        if plugin_config_file:
            self.plugin_manager.load_plugin_settings(plugin_config_file)

        # gated/flat routing loop for raycast_exact_impl="auto" (VERDICT r4
        # item 5): the previous update's gate survivor fraction routes the
        # next update off the gated march when the gate culls too little.
        # NOTE: the first flip to "flat" on a live map lazily compiles a
        # second program (~50 s on a cold tunneled TPU, once per persistent
        # cache); latency-critical deployments should call
        # warm_raycast_impls() at startup.
        from .ops.raycast import AdaptiveExactRouter

        self._exact_router = AdaptiveExactRouter(cfg)

    # ------------------------------------------------------------------ util
    @property
    def semantic_layer_names(self) -> List[str]:
        return list(self.cfg.semantic_layers)

    @property
    def center(self) -> np.ndarray:
        return np.asarray(self.state.center)

    def _bucket(self, n: int) -> int:
        return max(1024, 1 << int(math.ceil(math.log2(max(n, 1)))))

    def _pad_points(self, pts: np.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        n = len(pts)
        m = self._bucket(n)
        out = np.zeros((m, pts.shape[1]), np.float32)
        out[:n] = pts
        mask = np.zeros((m,), bool)
        mask[:n] = True
        return jnp.asarray(out), jnp.asarray(mask)

    def _grow_semantic_layers(self, new_channels: Sequence[str]) -> None:
        """Dynamic add_layer equivalent (semantic_map.py:80-97): grow the
        static config and zero-pad the semantic state arrays."""
        added = [c for c in new_channels if c not in self.cfg.semantic_layers]
        if not added:
            return
        self.cfg = self.cfg.replace(
            semantic_layers=tuple(self.cfg.semantic_layers) + tuple(added)
        )
        n = self.cell_n
        k = len(added)
        pad = jnp.zeros((k, n, n), self.state.semantic.dtype)
        self.state = self.state._replace(
            semantic=jnp.concatenate([self.state.semantic, pad]),
            sem_new=jnp.concatenate([self.state.sem_new, pad]),
            id_max=jnp.concatenate(
                [self.state.id_max, jnp.zeros((k, n, n), jnp.uint32)]
            ),
        )

    # -------------------------------------------------------------- mutation
    def clear(self) -> None:
        self.state = core.clear(self.state, self.cfg)

    def get_position(self, position) -> None:
        position[0][:] = np.asarray(self.state.center)

    def move(self, delta_position) -> None:
        self.state = core.move(self.state, jnp.asarray(delta_position, jnp.float32), self.cfg)

    def move_to(self, position, R) -> None:
        self.state = core.move_to(
            self.state,
            jnp.asarray(position, jnp.float32),
            jnp.asarray(R, jnp.float32),
            self.cfg,
        )

    def warm_raycast_impls(self, n_points: Optional[int] = None) -> list:
        """Pre-compile BOTH adaptive exact-raycast programs (gated + flat)
        at the padded bucket for ``n_points`` (default cfg.max_points), on a
        throwaway state. The AdaptiveExactRouter's first flip to "flat"
        otherwise lazily compiles mid-operation (~50 s cold on a tunneled
        TPU, once per persistent cache) — latency-critical deployments call
        this at startup (the runtime service does when exact-eligible).
        Returns the list of warmed impls ([] when routing is inactive)."""
        if not self._exact_router._eligible:
            return []
        m = self._bucket(n_points or self.cfg.max_points)
        pts = jnp.zeros((m, 3), jnp.float32)
        mask = jnp.zeros((m,), bool)
        R = jnp.eye(3)
        t = jnp.zeros((3,), jnp.float32)
        z = jnp.float32(0.0)
        warmed = []
        for impl in ("gated", "flat"):
            cfg_step = self.cfg.replace(raycast_exact_impl=impl)
            out, _ = core.update_pointcloud_aux(
                init_state(cfg_step), pts, mask, R, t, z, z, self.weights,
                cfg_step,
            )
            out.layers.block_until_ready()
            warmed.append(impl)
        return warmed

    def input_pointcloud(
        self,
        raw_points: np.ndarray,
        channels: Sequence[str],
        R: np.ndarray,
        t: np.ndarray,
        position_noise: float,
        orientation_noise: float,
    ) -> None:
        """channels: names of all columns; the first three must be x, y, z."""
        raw_points = np.asarray(raw_points, np.float32)
        if len(channels) != raw_points.shape[1]:
            # a mismatch would silently misread columns (OOB gathers clamp)
            raise ValueError(
                f"channels names every column: got {len(channels)} names "
                f"for {raw_points.shape[1]} columns"
            )
        raw_points = raw_points[~np.isnan(raw_points[:, :3]).any(axis=1)]
        additional = tuple(channels[3:])
        kept = tuple(
            c for c in additional if self.cfg.fusion_for_channel(c, "pointcloud")
        )
        self._grow_semantic_layers(kept)
        pts, mask = self._pad_points(raw_points)
        args = (
            self.state,
            pts,
            mask,
            jnp.asarray(R, jnp.float32),
            jnp.asarray(t, jnp.float32),
            jnp.float32(position_noise),
            jnp.float32(orientation_noise),
            self.weights,
            self.cfg,
        )
        if additional:
            self.state = core.update_pointcloud_semantic(*args, additional)
        else:
            impl = self._exact_router.route()
            if impl is not None:
                cfg_step = self.cfg.replace(raycast_exact_impl=impl)
                self.state, aux = core.update_pointcloud_aux(
                    *args[:1] + (pts[:, :3],) + args[2:-1] + (cfg_step,)
                )
                self._exact_router.observe(impl, aux["gate_survivor_frac"])
            else:
                self.state = core.update_pointcloud(
                    *args[:1] + (pts[:, :3],) + args[2:]
                )

    def input_image(
        self,
        image: Sequence[np.ndarray],
        channels: Sequence[str],
        R: np.ndarray,
        t: np.ndarray,
        K: np.ndarray,
        D: np.ndarray,
        distortion_model: str = "radtan",
        image_height: Optional[int] = None,
        image_width: Optional[int] = None,
    ) -> None:
        if isinstance(image, (list, tuple)):
            img = np.stack([np.asarray(c, np.float32) for c in image], axis=0)
        else:
            img = np.asarray(image, np.float32)
        if img.ndim == 2:
            img = img[None]
        D = np.asarray(D, np.float32).reshape(-1)
        if len(D) < 4:
            D = np.zeros(5, np.float32)
        elif len(D) == 4:
            D = np.concatenate([D, np.zeros(1, np.float32)])
        else:
            D = D[:5]
        if distortion_model != "radtan":
            D = D * 0  # other models unimplemented in the reference too
        chans = tuple(channels)
        kept = tuple(c for c in chans if self.cfg.fusion_for_channel(c, "image"))
        self._grow_semantic_layers(kept)
        self.state = core.input_image(
            self.state,
            jnp.asarray(img),
            jnp.asarray(R, jnp.float32),
            jnp.asarray(t, jnp.float32),
            jnp.asarray(K, jnp.float32).reshape(3, 3),
            jnp.asarray(D, jnp.float32),
            self.cfg,
            chans,
        )

    def update_variance(self) -> None:
        self.state = core.update_variance(self.state, self.cfg)

    def update_time(self) -> None:
        self.state = core.update_time(self.state, self.cfg)

    def get_additive_mean_error(self) -> float:
        """Accumulated drift estimate (elevation_mapping.py:412-418)."""
        return float(np.asarray(self.state.additive_mean_error))

    def update_upper_bound_with_valid_elevation(self) -> None:
        """Refresh upper_bound/is_upper_bound from valid elevation
        (elevation_mapping.py:428-432)."""
        self.state = core.update_upper_bound_with_valid_elevation(self.state)

    def update_normal(self, input_map=None) -> None:
        m = self.state.layers[0] if input_map is None else jnp.asarray(input_map)
        self.state = core.update_normal(self.state, m, self.cfg)

    # --------------------------------------------------------------- exports
    def _process_for_publish(self, m, fill_nan=False, add_z=False):
        if fill_nan:
            m = jnp.where(self.state.layers[2] > 0.5, m, jnp.nan)
        if add_z:
            m = m + self.state.center[2]
        return m[1:-1, 1:-1]

    # single source of truth for the export semantics is the jitted
    # _export_layer — these named getters are thin unflipped views
    def get_elevation(self):
        return _export_layer(self.state, self.cfg, "elevation")

    def get_variance(self):
        return _export_layer(self.state, self.cfg, "variance")

    def get_traversability(self):
        return _export_layer(self.state, self.cfg, "traversability")

    def get_time(self):
        return _export_layer(self.state, self.cfg, "time")

    def get_upper_bound(self):
        return _export_layer(self.state, self.cfg, "upper_bound")

    def get_is_upper_bound(self):
        return _export_layer(self.state, self.cfg, "is_upper_bound")

    def exists_layer(self, name: str) -> bool:
        return (
            name in self.layer_names
            or name in self.semantic_layer_names
            or name in self.plugin_manager.layer_names
        )

    def get_map_with_name_ref(self, name: str, data: np.ndarray) -> None:
        """Write the named layer (cropped + double-flipped like the reference
        GridMap export, elevation_mapping.py:720-775) into ``data``.

        Non-plugin layers go through the single-jit ``_export_layer`` fast
        path (one dispatch instead of ~5 eager ops per publish)."""
        if name in self.layer_names or name in (
            "normal_x", "normal_y", "normal_z",
        ) or name in self.semantic_layer_names:
            m = _export_layer(self.state, self.cfg, name, flip=True)
        else:
            m = self._get_named_map(name)
            if m is None:
                print(f"Layer {name} is not in the map")
                return
            m = jnp.flip(jnp.flip(m, 0), 1)
        data[...] = np.asarray(m, np.float32)

    def get_layers(self, names) -> dict:
        """Fetch several layers in ONE device round-trip.

        The per-layer ``get_map_with_name_ref`` pays a dispatch+fetch
        round-trip per layer (~42 ms each on tunneled backends, 5 layers =
        ~210 ms per publish); this stacks all non-plugin exports into one
        jitted tuple and one ``device_get``. Plugin layers (host-side
        compute) fall back to the per-layer path. Returns {name: (n, n)
        float32}, flipped like the GridMap export."""
        names = tuple(names)
        fast = [
            nm for nm in names
            if nm in self.layer_names
            or nm in ("normal_x", "normal_y", "normal_z")
            or nm in self.semantic_layer_names
        ]
        out = {}
        if fast:
            ms = _export_layers(self.state, self.cfg, tuple(fast), True)
            for nm, m in zip(fast, jax.device_get(ms)):
                out[nm] = np.asarray(m, np.float32)
        for nm in names:
            if nm in out:
                continue
            m = self._get_named_map(nm)
            if m is None:
                print(f"Layer {nm} is not in the map")
                continue
            out[nm] = np.asarray(jnp.flip(jnp.flip(m, 0), 1), np.float32)
        return out

    def _get_named_map(self, name: str):
        if (
            name in self.layer_names
            or name in ("normal_x", "normal_y", "normal_z")
            or name in self.semantic_layer_names
        ):
            return _export_layer(self.state, self.cfg, name)
        if name in self.plugin_manager.layer_names:
            self.plugin_manager.update_with_name(
                name,
                self.state.layers,
                self.layer_names,
                self.state.semantic,
                self.semantic_layer_names,
                self.state.rotation,
                {"id_max": self.state.id_max},
            )
            m = jnp.asarray(self.plugin_manager.get_map_with_name(name))
            p = self.plugin_manager.get_param_with_name(name)
            return self._process_for_publish(m, fill_nan=p.fill_nan, add_z=p.is_height_layer)
        return None

    def get_layer(self, name: str):
        """Uncropped layer access (elevation_mapping.py:807-835)."""
        if name in self.layer_names:
            return self.state.layers[self.layer_names.index(name)]
        if name in self.semantic_layer_names:
            return self.state.semantic[self.semantic_layer_names.index(name)]
        if name in self.plugin_manager.layer_names:
            self.plugin_manager.update_with_name(
                name,
                self.state.layers,
                self.layer_names,
                self.state.semantic,
                self.semantic_layer_names,
                self.state.rotation,
                {"id_max": self.state.id_max},
            )
            return jnp.asarray(self.plugin_manager.get_map_with_name(name))
        return None

    def get_normal_maps(self):
        normal = self.state.normal[:, 1:-1, 1:-1]
        return np.asarray(jnp.flip(jnp.flip(normal, 1), 2))

    def get_normal_ref(self, nx, ny, nz) -> None:
        maps = self.get_normal_maps()
        nx[...], ny[...], nz[...] = maps[0], maps[1], maps[2]

    # --------------------------------------------------------------- queries
    def get_polygon_traversability(self, polygon, result) -> int:
        """Polygon safety check (elevation_mapping.py:837-889)."""
        polygon = np.asarray(polygon, np.float32)
        area = _shoelace(polygon)
        center = np.asarray(self.state.center)
        pmin = center[:2] - self.map_length / 2 + self.resolution
        pmax = center[:2] + self.map_length / 2 - self.resolution
        clipped = polygon.copy()
        clipped[:, 0] = clipped[:, 0].clip(pmin[0], pmax[0])
        clipped[:, 1] = clipped[:, 1].clip(pmin[1], pmax[1])
        clipped_area = _shoelace(clipped)

        nv = clipped.shape[0]
        vpad = max(8, 1 << int(math.ceil(math.log2(max(nv, 1)))))
        poly_padded = np.zeros((vpad, 2), np.float32)
        poly_padded[:nv] = clipped
        tmp_map = self.get_layer(self.cfg.checker_layer)
        t_dev, max_dev, over_dev = _polygon_stats(
            self.state,
            jnp.asarray(tmp_map),
            jnp.asarray(poly_padded),
            jnp.asarray(nv),
            self.cfg,
        )
        t, max_untrav, over = jax.device_get((t_dev, max_dev, over_dev))
        t, max_untrav = float(t), float(max_untrav)
        is_safe = True
        if over.sum() > self.cfg.max_unsafe_n:
            is_safe = False
        elif max_untrav > 1 - self.cfg.safe_min_thresh:
            is_safe = False

        un_poly = None
        xy = np.argwhere(over)
        if len(xy) >= 3:
            un_poly = convex_hull(xy.astype(np.float64))
        n_unpoly = 0
        if un_poly is not None:
            un_poly = center[:2].reshape(1, 2) + (un_poly - self.cell_n / 2.0) * self.resolution
            n_unpoly = un_poly.shape[0]
            self.untraversable_polygon = un_poly
        else:
            self.untraversable_polygon = np.zeros((0, 2))
        if clipped_area < 0.001:
            is_safe = False
        result[...] = np.array([is_safe, t, area])
        return n_unpoly

    def get_untraversable_polygon(self, out) -> None:
        out[...] = self.untraversable_polygon

    # ------------------------------------------------------------------ init
    def initialize_map(self, points, method: str = "cubic") -> None:
        """Sparse-point initialization via scipy griddata
        (map_initializer.py:25-62 + elevation_mapping.py:899-922)."""
        from scipy.interpolate import griddata

        self.clear()
        pts = np.asarray(points, np.float64)
        center = np.asarray(self.state.center)
        indices = ((pts[:, :2] - center[:2].reshape(1, 2)) / self.resolution + self.cell_n / 2).astype(np.int32)
        values_z = pts[:, 2] - center[2]

        layers = np.array(self.state.layers)
        known = np.argwhere(layers[2] > 0.5)
        known_vals = layers[0][layers[2] > 0.5]
        pidx = np.vstack([known, indices]).astype(np.float64)
        vals = np.concatenate([known_vals, values_z])
        assert pidx.shape[0] > 3, "Initialization points must be more than 3."
        gx, gy = np.mgrid[0 : self.cell_n, 0 : self.cell_n]
        interp = griddata(pidx, vals, (gx, gy), method=method)

        layers[0] = np.nan_to_num(interp)
        layers[1] = np.where(~np.isnan(interp), self.cfg.initialized_variance, self.cfg.initial_variance)
        layers[2] = np.where(~np.isnan(interp), 1.0, 0.0)
        state = self.state._replace(layers=jnp.asarray(layers, self.state.layers.dtype))

        if self.cfg.dilation_size_initialize > 0:
            from .ops import stencil

            L = state.layers
            for _ in range(2):
                h, m = stencil.dilation_fill(L[0], L[2], self.cfg.dilation_size_initialize)
                L = L.at[0].set(h).at[2].set(m)
            state = state._replace(layers=L)
        self.state = core.update_upper_bound_with_valid_elevation(state)

    # ------------------------------------------------------------ checkpoint
    def save_checkpoint(self, path: str) -> None:
        """Map-state checkpointing (absent in the reference — SURVEY §5)."""
        flat = {
            "layers": self.state.layers,
            "normal": self.state.normal,
            "semantic": self.state.semantic,
            "sem_new": self.state.sem_new,
            "id_max": self.state.id_max,
            "center": self.state.center,
            "rotation": self.state.rotation,
            "mean_error": self.state.mean_error,
            "additive_mean_error": self.state.additive_mean_error,
        }
        np.savez(path, semantic_layers=np.array(self.cfg.semantic_layers, dtype=object),
                 **{k: np.asarray(v) for k, v in flat.items()})

    def load_checkpoint(self, path: str) -> None:
        # np.savez appends ".npz" when absent; accept the same path here
        if not path.endswith(".npz") and not os.path.exists(path):
            path = path + ".npz"
        z = np.load(path, allow_pickle=True)
        sem_layers = tuple(z["semantic_layers"].tolist())
        if sem_layers != self.cfg.semantic_layers:
            self.cfg = self.cfg.replace(semantic_layers=sem_layers)
        self.state = MapState(
            layers=jnp.asarray(z["layers"]),
            normal=jnp.asarray(z["normal"]),
            semantic=jnp.asarray(z["semantic"]),
            sem_new=jnp.asarray(z["sem_new"]),
            id_max=jnp.asarray(z["id_max"]),
            center=jnp.asarray(z["center"]),
            rotation=jnp.asarray(z["rotation"]),
            mean_error=jnp.asarray(z["mean_error"]),
            additive_mean_error=jnp.asarray(z["additive_mean_error"]),
        )


def _shoelace(polygon: np.ndarray) -> float:
    area = 0.0
    for i in range(len(polygon)):
        p1 = polygon[i - 1]
        p2 = polygon[i]
        area += (p1[0] * p2[1] - p1[1] * p2[0]) / 2.0
    return abs(area)
