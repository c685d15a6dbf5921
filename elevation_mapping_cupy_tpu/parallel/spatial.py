"""Spatially-sharded large maps: one world map partitioned across the mesh.

Two complementary mechanisms:

1. ``spatial_sharding`` / ``spatial_update``: the full jitted update step run
   with the map's row axis sharded over the mesh (GSPMD). XLA partitions the
   stencils/convolutions with automatic halo exchanges and turns the
   point scatters into shard-local scatters + collectives — the
   "annotate shardings, let XLA insert collectives" recipe. Use this for
   maps too large for one chip (city-scale datagen worlds).

2. ``halo.py``'s shard_map stencils: explicit lax.ppermute halo rings for
   custom kernels where manual control beats GSPMD.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import core
from ..config import MapConfig
from ..nn.traversability import TravWeights
from ..state import MapState

__all__ = [
    "spatial_sharding",
    "shard_state_spatial",
    "spatial_update_pointcloud",
    "shard_states_spatial_batched",
    "batched_spatial_update_pointcloud",
]


def spatial_sharding(
    mesh: Mesh, axis: str = "x", col_axis: Optional[str] = None
) -> NamedSharding:
    """Row (or 2D-tile) sharding for (L, H, W) layer stacks."""
    return NamedSharding(mesh, P(None, axis, col_axis))


def shard_state_spatial(
    state: MapState, mesh: Mesh, axis: str = "x", col_axis: Optional[str] = None
) -> MapState:
    """Place one (unbatched) map state with its row axis — or, with
    ``col_axis``, both map axes — over the mesh; small per-map scalars stay
    replicated. 2D tiling is the pod-scale layout: row-only sharding over
    many chips degenerates to slivers whose halo rings dominate."""
    for ax_name, dim in ((axis, 1), (col_axis, 2)):
        if ax_name is None:
            continue
        n = mesh.shape[ax_name]
        if state.layers.shape[dim] % n:
            raise ValueError(
                f"spatial sharding needs the map extent ({state.layers.shape[dim]}"
                f" = cell_n) divisible by mesh axis {ax_name!r} ({n}); pick "
                f"map_length so round(map_length/resolution)+2 is a multiple of {n}"
            )
    tile = NamedSharding(mesh, P(None, axis, col_axis))
    rep = NamedSharding(mesh, P())

    def put(x):
        if x.ndim == 3:
            return jax.device_put(x, tile)
        return jax.device_put(x, rep)

    return jax.tree.map(put, state)


def spatial_update_pointcloud(
    mesh: Mesh,
    cfg: MapConfig,
    axis: str = "x",
    channels: tuple = (),
    col_axis: Optional[str] = None,
):
    """Build a jitted update step whose map state is sharded over `mesh`.

    Points are replicated (every shard sees the whole cloud and keeps the
    cells it owns); stencils, the traversability CNN, and recentering rolls
    get their halo exchanges from GSPMD. Pass `channels` (as for
    core.update_pointcloud_semantic, e.g. ("rgb", "grass")) to fuse MEM
    semantic layers too — their scatters ride the same shard-local path and
    the semantic stack stays sharded. With ``col_axis`` the map is tiled
    over a 2D mesh (rows x cols) — the pod-scale layout.
    """
    tile = NamedSharding(mesh, P(None, axis, col_axis))
    rep = NamedSharding(mesh, P())

    def constrain(state):
        out = state._replace(
            layers=jax.lax.with_sharding_constraint(state.layers, tile),
            normal=jax.lax.with_sharding_constraint(state.normal, tile),
        )
        if state.semantic.size:
            out = out._replace(
                semantic=jax.lax.with_sharding_constraint(state.semantic, tile),
                sem_new=jax.lax.with_sharding_constraint(state.sem_new, tile),
            )
        return out

    def sharded_step(state, points, pad_mask, R, t, pn, on, weights):
        # the body runs at trace time, so the context routes every
        # map-shaped scatter through the shard-local MXU path (each shard
        # scatters only the points it owns onto its VMEM-sized block)
        from .sharded_scatter import sharded_scatter_ctx

        with sharded_scatter_ctx(mesh, axis, col_axis):
            out = core._update_impl(
                constrain(state), points, pad_mask, R, t, pn, on, weights,
                cfg, tuple(channels),
            )
            return constrain(out)

    # the sharded map state is donated: at the scales that need spatial
    # sharding the state is the dominant HBM cost per shard, and callers
    # step it functionally (state = step(state, ...))
    return jax.jit(sharded_step, donate_argnums=0)


def shard_states_spatial_batched(
    states: MapState,
    mesh: Mesh,
    env_axis: str = "env",
    axis: str = "x",
    col_axis: Optional[str] = None,
) -> MapState:
    """Place a BATCH of spatially-sharded maps over an (env, rows[, cols])
    mesh: the fleet-of-robots-with-large-maps layout (BASELINE config #5
    composed literally — env batching x spatial sharding x halo exchange).
    Map-shaped leaves are (B, C, H, W): B over ``env_axis``, H over ``axis``
    (and W over ``col_axis``); per-env scalars shard over ``env_axis``."""
    b = states.layers.shape[0]
    ne = mesh.shape[env_axis]
    if b % ne:
        raise ValueError(f"batch {b} not divisible by mesh axis {env_axis!r} ({ne})")
    for ax_name, dim in ((axis, 2), (col_axis, 3)):
        if ax_name is None:
            continue
        n = mesh.shape[ax_name]
        if states.layers.shape[dim] % n:
            raise ValueError(
                f"spatial sharding needs the map extent ({states.layers.shape[dim]}"
                f" = cell_n) divisible by mesh axis {ax_name!r} ({n})"
            )
    tile = NamedSharding(mesh, P(env_axis, None, axis, col_axis))

    def put(x):
        if x.ndim == 4:
            return jax.device_put(x, tile)
        spec = P(env_axis, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, states)


def batched_spatial_update_pointcloud(
    mesh: Mesh,
    cfg: MapConfig,
    env_axis: str = "env",
    axis: str = "x",
    channels: tuple = (),
    col_axis: Optional[str] = None,
):
    """Jitted update for a BATCH of spatially-sharded maps on an
    (env, rows[, cols]) mesh — env batching composed with spatial sharding.

    The step is the vmapped core update with GSPMD sharding constraints:
    stencils / the traversability CNN / recentering rolls get their
    cross-row halo exchanges from XLA exactly as in the unbatched spatial
    path, and every map-shaped scatter routes through the shard-local MXU
    path — the scatter shard_map composes with vmap (the Pallas kernel's
    custom-vmap rule turns the per-shard batch into ONE kernel launch with
    grid (B_local, chunks)).

    Inputs mirror ``parallel.batch.batched_update``: states (B, ...) pytree
    (donated), points (B, N, 3[+C]), pad_mask (B, N), R (B, 3, 3), t (B, 3),
    noises (B,). Reference analogue: the single fixed 8 m window the CuPy
    engine never lifted (elevation_mapping.py:200-215) — here a fleet of
    robots each with a city-block-scale map.
    """
    tile = NamedSharding(mesh, P(env_axis, None, axis, col_axis))
    env_only = NamedSharding(mesh, P(env_axis))

    def constrain(states):
        def c(x):
            if x.ndim == 4:
                return jax.lax.with_sharding_constraint(x, tile)
            return jax.lax.with_sharding_constraint(
                x, NamedSharding(mesh, P(env_axis, *([None] * (x.ndim - 1))))
            )
        # keep empty semantic stacks unconstrained (S may be 0)
        out = states._replace(
            layers=c(states.layers), normal=c(states.normal),
            center=c(states.center), rotation=c(states.rotation),
            mean_error=c(states.mean_error),
            additive_mean_error=c(states.additive_mean_error),
        )
        if states.semantic.size:
            out = out._replace(
                semantic=c(states.semantic), sem_new=c(states.sem_new),
                id_max=c(states.id_max),
            )
        return out

    def step(states, points, pad_mask, R, t, pn, on, weights):
        from .sharded_scatter import sharded_scatter_ctx

        points = jax.lax.with_sharding_constraint(points, env_only)
        with sharded_scatter_ctx(mesh, axis, col_axis):
            fn = lambda s, p, m, r, tt, pn1, on1: core._update_impl(
                s, p, m, r, tt, pn1, on1, weights, cfg, tuple(channels)
            )
            out = jax.vmap(fn)(constrain(states), points, pad_mask, R, t, pn, on)
            return constrain(out)

    return jax.jit(step, donate_argnums=0)
