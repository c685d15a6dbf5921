"""Shard-local MXU scatter for spatially-sharded maps.

For maps too large for the whole-map-in-VMEM Pallas kernel (ops/
pallas_scatter.py), ``scatter_add_streams_2d`` used to fall back to XLA's
serialized scatter. This module restores the MXU path under spatial
sharding: the map's row axis is sharded over a mesh axis, points are
replicated, and each shard runs the Pallas matmul-scatter on ONLY its own
(h/n, w) row block — which fits VMEM again — after masking the points it
owns (reference analogue: the 8 m map-size cap the CuPy engine never
lifted, elevation_mapping.py:200-215).

Why no halo spill is needed:
  * scatter-ADD: every point lands in exactly one cell, so ownership
    binning by row block is an exact partition — shards never write each
    other's cells and no collective is required for the scatter itself.
  * polar raycast: the shadow cube is built from the (replicated) points,
    so each shard can rebuild it locally and apply the per-cell cleanup to
    its own rows — again no cross-shard writes.
  * exact-march raycast: each march step is itself a scatter-add of
    decrements, so it routes through the same ownership binning.

Cost model (why this beats the XLA fallback): the MXU kernel's work is
N * h_local * w per value-part; slicing h_local = h/n divides the per-chip
matmul work by the shard count while the XLA scatter's serialized cost
stays O(N) regardless of map size. Measured v5e numbers live in bench.py's
spatial mode.

Use ``sharded_scatter_ctx`` to route every ``scatter_add_streams_2d`` call
traced inside the context through this path (how
``spatial_update_pointcloud`` wires the full update step), or call
``sharded_scatter_add_streams_2d`` directly.
"""

from __future__ import annotations

import contextlib
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map as _shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map as _shard_map

__all__ = ["sharded_scatter_add_streams_2d", "sharded_scatter_ctx"]


def sharded_scatter_add_streams_2d(
    h: int,
    w: int,
    flat_idx: jax.Array,
    values: Sequence[jax.Array],
    mask: jax.Array,
    exact: Tuple[bool, ...],
    mesh: Mesh,
    axis_name: str = "x",
    col_axis_name: str = None,
) -> jax.Array:
    """Scatter K per-point streams into a mesh-sharded (h, w) grid.

    Equivalent to ``ops.scatter.scatter_add_streams_2d`` (returns
    (K, h, w), sharded P(None, axis_name, col_axis_name)) but each shard
    scatters only the points whose target cell falls in its block, through
    the per-shard Pallas MXU kernel on TPU. With only ``axis_name`` the map
    is row-sharded; with ``col_axis_name`` it is tiled over a 2D mesh —
    the pod-scale layout, where row-only sharding degenerates to
    slivers. Extents that don't divide a mesh axis are padded up (the pad
    cells are unreachable: indices are < h*w) and sliced off after.
    """
    from ..ops import scatter as sc

    nr = mesh.shape[axis_name]
    nc = mesh.shape[col_axis_name] if col_axis_name else 1
    h_pad = ((h + nr - 1) // nr) * nr
    w_pad = ((w + nc - 1) // nc) * nc
    h_loc = h_pad // nr
    w_loc = w_pad // nc

    def block(flat_idx, mask, *values):
        i = jax.lax.axis_index(axis_name)
        j = jax.lax.axis_index(col_axis_name) if col_axis_name else 0
        row = flat_idx // w
        col = flat_idx % w
        own = (
            mask
            & (row >= i * h_loc) & (row < (i + 1) * h_loc)
            & (col >= j * w_loc) & (col < (j + 1) * w_loc)
        )
        local_idx = (row - i * h_loc) * w_loc + (col - j * w_loc)
        # the non-routing body: platform dispatch (MXU on TPU / XLA
        # elsewhere) and the VMEM-fit guard apply to the per-shard block
        # size; calling the public router here would recurse
        return sc._scatter_add_streams_2d_local(
            h_loc, w_loc, jnp.where(own, local_idx, 0), values, own, exact
        )

    specs = dict(
        mesh=mesh,
        in_specs=(P(), P()) + tuple(P() for _ in values),
        out_specs=P(None, axis_name, col_axis_name),
    )
    try:
        # pallas_call can't declare its output's varying-over-mesh axes, so
        # the vma check must be off (the out_specs above are authoritative)
        fn = _shard_map(block, check_vma=False, **specs)
    except TypeError:  # older jax: the kwarg was check_rep
        fn = _shard_map(block, check_rep=False, **specs)
    out = fn(flat_idx, mask, *values)
    return out[:, :h, :w] if (h_pad, w_pad) != (h, w) else out


@contextlib.contextmanager
def sharded_scatter_ctx(mesh: Mesh, axis_name: str = "x", col_axis_name: str = None):
    """Trace-time override: every ``scatter_add_streams_2d`` call traced
    inside this context routes through the shard-local path. Used by
    ``spatial_update_pointcloud`` (pass ``col_axis_name`` for 2D tiling)."""
    from ..ops import scatter as sc

    token = sc._SPATIAL_SHARDING.set((mesh, axis_name, col_axis_name))
    try:
        yield
    finally:
        sc._SPATIAL_SHARDING.reset(token)
