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

__all__ = ["spatial_sharding", "shard_state_spatial", "spatial_update_pointcloud"]


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
