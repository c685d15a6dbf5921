"""Functional core: one jitted step replaces the reference's callback soup.

The reference orchestrates per-sensor callbacks mutating a lock-guarded map
(elevation_mapping.py:316-391 update_map_with_kernel, :154-226 move_to/shift).
Here every operation is a pure function ``MapState -> MapState`` composed into
jit-compiled steps; the config is static so XLA specializes exactly like the
reference's source-templated kernels.

All functions take a single-environment state; batch over environments with
``jax.vmap`` (see parallel/batch.py).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .config import MapConfig
from .nn.traversability import TravWeights, traversability_filter
from .ops import pointcloud as pc
from .ops import raycast as rc
from .ops import stencil
from .ops.geometry import associate_points
from .state import MapState

__all__ = [
    "update_pointcloud",
    "update_pointcloud_aux",
    "update_pointcloud_semantic",
    "input_image",
    "move_to",
    "move",
    "shift_map_xy",
    "shift_map_z",
    "update_variance",
    "update_time",
    "update_upper_bound_with_valid_elevation",
    "clear",
    "update_normal",
]


# ---------------------------------------------------------------------------
# pointcloud update (hot path)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("cfg",))
def update_pointcloud(
    state: MapState,
    points: jax.Array,          # (N, 3) sensor-frame xyz, padded to static N
    pad_mask: jax.Array,        # (N,) bool, True = real point
    R: jax.Array,               # (3, 3) sensor rotation
    t: jax.Array,               # (3,)  sensor translation (world frame)
    position_noise: jax.Array,
    orientation_noise: jax.Array,
    weights: TravWeights,
    cfg: MapConfig,
) -> MapState:
    """Full geometric update for one pointcloud (no semantic channels).

    Mirrors update_map_with_kernel (elevation_mapping.py:316-391): error
    counting -> drift compensation -> Kalman fusion -> visibility cleanup ->
    averaging -> overlap clearance -> dilation -> traversability CNN ->
    normals. Deterministic race resolutions per tests/golden/reference_numpy.py.
    """
    return _update_impl(
        state, points, pad_mask, R, t, position_noise, orientation_noise, weights, cfg, ()
    )


@functools.partial(jax.jit, static_argnames=("cfg", "channels"))
def update_pointcloud_semantic(
    state: MapState,
    points_all: jax.Array,      # (N, 3 + C) xyz + semantic channel columns
    pad_mask: jax.Array,
    R: jax.Array,
    t: jax.Array,
    position_noise: jax.Array,
    orientation_noise: jax.Array,
    weights: TravWeights,
    cfg: MapConfig,
    channels: Tuple[str, ...],  # static semantic channel names (columns 3..)
) -> MapState:
    """Geometric update + MEM semantic fusion sharing one association pass
    (reference: update_map_with_kernel + SemanticMap.update_layers_pointcloud)."""
    return _update_impl(
        state, points_all, pad_mask, R, t, position_noise, orientation_noise,
        weights, cfg, channels,
    )


@functools.partial(jax.jit, static_argnames=("cfg",))
def update_pointcloud_aux(
    state: MapState,
    points: jax.Array,
    pad_mask: jax.Array,
    R: jax.Array,
    t: jax.Array,
    position_noise: jax.Array,
    orientation_noise: jax.Array,
    weights: TravWeights,
    cfg: MapConfig,
) -> Tuple[MapState, dict]:
    """``update_pointcloud`` plus an aux dict of host-consumable step
    telemetry: ``gate_survivor_frac`` (f32 scalar) — the gated raycast's
    segment survivor fraction, 1.0 for every other raycast path — feeding
    :class:`ops.raycast.AdaptiveExactRouter`'s gated/flat routing loop."""
    return _update_impl(
        state, points, pad_mask, R, t, position_noise, orientation_noise,
        weights, cfg, (), with_aux=True,
    )


def _update_impl(
    state: MapState,
    points_all: jax.Array,
    pad_mask: jax.Array,
    R: jax.Array,
    t: jax.Array,
    position_noise: jax.Array,
    orientation_noise: jax.Array,
    weights: TravWeights,
    cfg: MapConfig,
    channels: Tuple[str, ...],
    with_aux: bool = False,
) -> MapState:
    from .semantic.update import update_semantic_pointcloud

    t_c = t - state.center            # shift_translation_to_map_center
    assoc = associate_points(points_all[:, :3], pad_mask, R, t_c, cfg)

    layers = state.layers
    # one shared row-gather of the point cells feeds both stages
    cell_rows = pc.gather_cell_rows(layers, assoc.flat_idx)
    counts = pc.error_counting(layers, assoc, cfg, cell_rows)
    layers, mean_error, additive, h_delta = pc.apply_drift_compensation(
        layers,
        counts,
        position_noise,
        orientation_noise,
        state.mean_error,
        state.additive_mean_error,
        cfg,
    )
    # fusion decisions read the drift-compensated snapshot (R1)
    layers, newmap = pc.point_fusion(layers, assoc, counts.point_cnt, cfg, cell_rows, h_delta)
    layers, ray_aux = rc.visibility_cleanup(
        layers, state.normal, assoc, counts.inlier_cnt, t_c, cfg, with_aux=True
    )
    layers = pc.average_map(layers, newmap, cfg)

    semantic, sem_new, id_max = state.semantic, state.sem_new, state.id_max
    if channels:
        semantic, sem_new, id_max = update_semantic_pointcloud(
            semantic,
            sem_new,
            id_max,
            assoc,
            points_all[:, 3 : 3 + len(channels)],
            channels,
            newmap[2],
            cfg,
        )

    if cfg.enable_overlap_clearance:
        layers = pc.clear_overlap(layers, t_c, cfg)
    trav_input, _ = stencil.dilation_fill(layers[5], layers[2] + layers[6], cfg.dilation_size)
    layers = _apply_traversability(layers, trav_input, weights)
    normal = stencil.surface_normals(trav_input, layers[2], cfg.resolution)
    out = state._replace(
        layers=layers,
        normal=normal,
        semantic=semantic,
        sem_new=sem_new,
        id_max=id_max,
        mean_error=mean_error,
        additive_mean_error=additive,
    )
    if with_aux:
        return out, ray_aux
    return out


@functools.partial(jax.jit, static_argnames=("cfg", "channels"))
def input_image(
    state: MapState,
    image: jax.Array,           # (C_img, H_i, W_i) channel-stacked image
    R: jax.Array,               # (3, 3) camera optical rotation (world→cam)
    t: jax.Array,               # (3,)  camera optical translation
    K: jax.Array,               # (3, 3) intrinsics
    D: jax.Array,               # (5,)  radtan distortion (pre-normalized)
    cfg: MapConfig,
    channels: Tuple[str, ...],  # static semantic channel names
) -> MapState:
    """Fuse an image into semantic layers (elevation_mapping.py:468-562).

    Computes P = K[R|t], the camera cell, the per-cell uv correspondence with
    Bresenham occlusion, and dispatches the per-channel image fusions.
    """
    from .ops import image as img_ops
    from .semantic.update import resolve_channels, persistent_mask

    P = K @ jnp.concatenate([R, t[:, None]], axis=1)
    t_cam_map = -R.T @ t - state.center
    # uint32 truncation of cell coordinates (elevation_mapping.py:532-533)
    x1 = jnp.floor(cfg.cell_n / 2 + t_cam_map[0] / cfg.resolution).astype(jnp.int32)
    y1 = jnp.floor(cfg.cell_n / 2 + t_cam_map[1] / cfg.resolution).astype(jnp.int32)
    z1 = t_cam_map[2]

    image_height = jnp.asarray(image.shape[-2], state.layers.dtype)
    image_width = jnp.asarray(image.shape[-1], state.layers.dtype)

    uv, valid = img_ops.image_to_map_correspondence(
        state.layers,
        state.center,
        jnp.stack([x1, y1]),
        z1,
        P,
        K,
        D,
        image_height,
        image_width,
        cfg,
    )

    keep = persistent_mask(cfg)
    reset = jnp.asarray([not k for k in keep], bool)
    sem_new = (
        jnp.where(reset[:, None, None], 0.0, state.sem_new)
        if state.sem_new.shape[0]
        else state.sem_new
    )
    # Channel -> image-plane mapping: a color channel consumes THREE planes
    # (the C++ node validates "rgb counts for 3 layers",
    # elevation_mapping_ros.cpp:428-441). The reference Python then indexes
    # fusions by channel POSITION (image[j], image_exponential.py:69), which
    # silently reads the wrong plane whenever a color channel precedes a
    # mono one — here a plane cursor advances by each channel's true width.
    plane_of = {}
    cursor = 0
    for col, ch in enumerate(channels):
        plane_of[col] = cursor
        fus = cfg.fusion_for_channel(ch, "image")
        cursor += 3 if (fus == "color" or ch == "rgb") else 1

    semantic = state.semantic
    for col, lay, fusion in resolve_channels(channels, cfg, "image"):
        off = plane_of[col]
        if fusion == "color":
            semantic = semantic.at[lay].set(
                img_ops.image_fuse_color(
                    semantic[lay], image[off : off + 3], uv, valid, image_width
                )
            )
        elif fusion == "exponential":
            semantic = semantic.at[lay].set(
                img_ops.image_fuse_exponential(
                    semantic[lay], image[off], uv, valid, image_width,
                    cfg.image_exponential_alpha,
                )
            )
        elif fusion == "average":
            semantic = semantic.at[lay].set(
                img_ops.image_fuse_replace(semantic[lay], image[off], uv, valid, image_width)
            )
    return state._replace(semantic=semantic, sem_new=sem_new)


def _apply_traversability(layers: jax.Array, trav_input: jax.Array, weights: TravWeights) -> jax.Array:
    trav = traversability_filter(trav_input, weights)
    return layers.at[3, 3:-3, 3:-3].set(trav.astype(layers.dtype))


def update_normal(state: MapState, input_map: jax.Array, cfg: MapConfig) -> MapState:
    """Recompute normals from an arbitrary height layer (elevation_mapping.py:564-577)."""
    return state._replace(
        normal=stencil.surface_normals(input_map, state.layers[2], cfg.resolution)
    )


# ---------------------------------------------------------------------------
# recentering (elevation_mapping.py:139-226)
# ---------------------------------------------------------------------------

def _pad_rolled(x: jax.Array, shift: jax.Array, value, axis0: int, axis1: int) -> jax.Array:
    """Zero the region revealed by a roll of (shift[0], shift[1]); works with
    traced shifts by masking with iota instead of dynamic slices."""
    n0 = x.shape[axis0]
    n1 = x.shape[axis1]
    r0 = jnp.arange(n0)
    r1 = jnp.arange(n1)
    m0 = jnp.where(shift[0] > 0, r0 < shift[0], r0 >= n0 + shift[0]) & (shift[0] != 0)
    m1 = jnp.where(shift[1] > 0, r1 < shift[1], r1 >= n1 + shift[1]) & (shift[1] != 0)
    shape0 = [1] * x.ndim
    shape0[axis0] = n0
    shape1 = [1] * x.ndim
    shape1[axis1] = n1
    mask = m0.reshape(shape0) | m1.reshape(shape1)
    return jnp.where(mask, jnp.asarray(value, x.dtype), x)


def _roll_pad(x: jax.Array, shift: jax.Array, value=0.0) -> jax.Array:
    """cp.roll + pad_value equivalent for (L, H, W) stacks."""
    rolled = jnp.roll(x, shift, axis=(-2, -1))
    return _pad_rolled(rolled, shift, value, x.ndim - 2, x.ndim - 1)


@functools.partial(jax.jit, static_argnames=("cfg",))
def shift_map_xy(state: MapState, delta_pixel: jax.Array, cfg: MapConfig) -> MapState:
    """Roll all layer stacks by integer cells; newly revealed cells reset
    (variance to initial_variance, everything else 0)."""
    shift = delta_pixel.astype(jnp.int32)
    layers = _roll_pad(state.layers, shift, 0.0)
    # variance layer pads with initial_variance (elevation_mapping.py:213);
    # re-mask the already-rolled slice instead of rolling it a second time
    layers = layers.at[1].set(_pad_rolled(layers[1], shift, cfg.initial_variance, 0, 1))
    semantic = _roll_pad(state.semantic, shift, 0.0) if state.semantic.shape[0] else state.semantic
    sem_new = _roll_pad(state.sem_new, shift, 0.0) if state.sem_new.shape[0] else state.sem_new
    id_max = (
        _pad_rolled(jnp.roll(state.id_max, shift, axis=(-2, -1)), shift, 0, 1, 2)
        if state.id_max.shape[0]
        else state.id_max
    )
    return state._replace(layers=layers, semantic=semantic, sem_new=sem_new, id_max=id_max)


def shift_map_z(state: MapState, delta_z: jax.Array) -> MapState:
    layers = state.layers.at[0].add(delta_z).at[5].add(delta_z)
    return state._replace(layers=layers)


@functools.partial(jax.jit, static_argnames=("cfg",))
def move_to(state: MapState, position: jax.Array, R: jax.Array, cfg: MapConfig) -> MapState:
    """Shift the map to an absolute position (elevation_mapping.py:154-170)."""
    delta = position - state.center
    delta_pixel = jnp.round(delta[:2] / cfg.resolution)
    delta_xy = delta_pixel * cfg.resolution
    center = state.center.at[:2].add(delta_xy).at[2].add(delta[2])
    state = state._replace(center=center, rotation=R.astype(state.rotation.dtype))
    state = shift_map_xy(state, -delta_pixel, cfg)
    return shift_map_z(state, -delta[2])


@functools.partial(jax.jit, static_argnames=("cfg",))
def move(state: MapState, delta_position: jax.Array, cfg: MapConfig) -> MapState:
    """Relative shift (elevation_mapping.py:139-152)."""
    delta_pixel = jnp.round(delta_position[:2] / cfg.resolution)
    delta_xy = delta_pixel * cfg.resolution
    center = state.center.at[:2].add(delta_xy).at[2].add(delta_position[2])
    state = state._replace(center=center)
    state = shift_map_xy(state, delta_pixel, cfg)
    return shift_map_z(state, -delta_position[2])


# ---------------------------------------------------------------------------
# timers & maintenance (elevation_mapping.py:119-127, 420-432)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("cfg",))
def update_variance(state: MapState, cfg: MapConfig) -> MapState:
    layers = state.layers.at[1].add(cfg.time_variance * state.layers[2])
    return state._replace(layers=layers)


@functools.partial(jax.jit, static_argnames=("cfg",))
def update_time(state: MapState, cfg: MapConfig) -> MapState:
    layers = state.layers.at[4].add(cfg.time_interval)
    return state._replace(layers=layers)


def update_upper_bound_with_valid_elevation(state: MapState) -> MapState:
    mask = state.layers[2] > 0.5
    layers = state.layers
    layers = layers.at[5].set(jnp.where(mask, layers[0], layers[5]))
    layers = layers.at[6].set(jnp.where(mask, 0.0, layers[6]))
    return state._replace(layers=layers)


@functools.partial(jax.jit, static_argnames=("cfg",))
def clear(state: MapState, cfg: MapConfig) -> MapState:
    layers = jnp.zeros_like(state.layers).at[1].set(cfg.initial_variance)
    return state._replace(
        layers=layers,
        semantic=jnp.zeros_like(state.semantic),
        sem_new=jnp.zeros_like(state.sem_new),
        id_max=jnp.zeros_like(state.id_max),
        mean_error=jnp.zeros_like(state.mean_error),
        additive_mean_error=jnp.zeros_like(state.additive_mean_error),
    )
