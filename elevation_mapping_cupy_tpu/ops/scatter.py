"""Atomic-free scatter primitives for point→cell accumulation.

TPU has no atomicAdd; the reference's race-managed per-point scatters
(custom_kernels.py:174-185, custom_semantic_kernels.py:44) become
deterministic XLA scatter-adds / segment-sums over a flat cell axis.
Masked-out points contribute a zero to cell 0, which keeps every shape
static and the whole op fusable.

These helpers are the single choke point for the scatter strategy: swapping
in a sorted-bin Pallas kernel later only touches this module.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "scatter_add",
    "scatter_add_multi",
    "scatter_add_streams_2d",
    "scatter_min",
    "scatter_max",
    "scatter_or",
]

# None = auto (Pallas MXU kernel on TPU backends, XLA scatter elsewhere);
# settable for tests / debugging, or via ELEV_TPU_MXU_SCATTER=0/1.
USE_MXU_SCATTER: Optional[bool] = (
    None
    if "ELEV_TPU_MXU_SCATTER" not in os.environ
    else os.environ["ELEV_TPU_MXU_SCATTER"] == "1"
)

# Trace-time spatial-sharding override: (mesh, axis_name, col_axis_name)
# set by parallel.sharded_scatter.sharded_scatter_ctx. When set, every
# scatter_add_streams_2d call traced in the SAME context (a ContextVar, so
# concurrent traces in other threads/tasks are unaffected) routes through
# the shard-local per-block path (each shard scatters only its own points
# via the MXU kernel on its VMEM-sized block).
import contextvars

_SPATIAL_SHARDING: contextvars.ContextVar = contextvars.ContextVar(
    "elev_spatial_sharding", default=None
)


def _mxu_forced() -> Optional[bool]:
    """Explicit override (env/test); None means resolve per lowering platform."""
    return USE_MXU_SCATTER


def _masked(idx: jax.Array, values: jax.Array, mask: jax.Array, neutral) -> Tuple[jax.Array, jax.Array]:
    safe_idx = jnp.where(mask, idx, 0)
    safe_val = jnp.where(mask, values, neutral)
    return safe_idx, safe_val


def scatter_add(n_cells: int, idx: jax.Array, values: jax.Array, mask: jax.Array) -> jax.Array:
    """sum_i values[i] into flat cells; returns (n_cells,)."""
    safe_idx, safe_val = _masked(idx, values, mask, 0.0)
    return jnp.zeros((n_cells,), values.dtype).at[safe_idx].add(safe_val)


def scatter_add_multi(
    n_cells: int, idx: jax.Array, values: Sequence[jax.Array], mask: jax.Array
) -> jax.Array:
    """Scatter several per-point value streams with one shared index set.

    Stacking the streams into a trailing axis lets XLA emit a single scatter
    (one sort/bin pass) instead of one per stream. Returns (K, n_cells).
    """
    vals = jnp.stack(values, axis=-1)  # (N, K)
    k = vals.shape[-1]
    safe_idx = jnp.where(mask, idx, 0)
    safe_val = jnp.where(mask[:, None], vals, 0.0)
    out = jnp.zeros((n_cells, k), vals.dtype).at[safe_idx].add(safe_val)
    return out.T


def scatter_add_streams_2d(
    h: int,
    w: int,
    flat_idx: jax.Array,
    values: Sequence[jax.Array],
    mask: jax.Array,
    exact: Tuple[bool, ...],
) -> jax.Array:
    """Scatter K per-point streams into an (h, w) grid; returns (K, h, w).

    Routes to the Pallas MXU matmul-scatter on TPU (ops/pallas_scatter.py,
    ~3-10x faster than XLA's serialized scatter at 1M points) and to the XLA
    scatter elsewhere. ``exact[k]`` marks streams whose values are bf16-exact
    (flags/counts) — informational for the MXU path's precision splitting.

    In auto mode the branch is picked with ``lax.platform_dependent`` at
    lowering time, so a program traced under a TPU default backend but
    lowered for CPU devices (e.g. the multi-chip CPU dry run) still gets
    the XLA path. ELEV_TPU_MXU_SCATTER=0/1 forces one branch.

    Under an active ``sharded_scatter_ctx`` (spatially-sharded maps), the
    call is dispatched shard-locally instead: each mesh shard scatters the
    points it owns onto its own row block (parallel/sharded_scatter.py).
    """
    sharding = _SPATIAL_SHARDING.get()
    if sharding is not None:
        mesh, axis_name, col_axis_name = sharding
        from ..parallel.sharded_scatter import sharded_scatter_add_streams_2d

        return sharded_scatter_add_streams_2d(
            h, w, flat_idx, values, mask, tuple(exact), mesh, axis_name,
            col_axis_name,
        )
    return _scatter_add_streams_2d_local(h, w, flat_idx, values, mask, exact)


def _scatter_add_streams_2d_local(
    h: int,
    w: int,
    flat_idx: jax.Array,
    values: Sequence[jax.Array],
    mask: jax.Array,
    exact: Tuple[bool, ...],
) -> jax.Array:
    """Single-device (or single-shard) scatter body; see
    scatter_add_streams_2d for semantics."""

    def _pallas(flat_idx, mask, *values):
        from .pallas_scatter import mxu_scatter_add_2d

        safe_idx = jnp.where(mask, flat_idx, 0)
        rows = safe_idx // w
        cols = safe_idx % w
        vals = jnp.stack(
            [jnp.where(mask, v, 0.0).astype(jnp.float32) for v in values], axis=-1
        )
        return mxu_scatter_add_2d(rows, cols, vals, h, w, tuple(exact))

    def _xla(flat_idx, mask, *values):
        vals32 = [v.astype(jnp.float32) for v in values]
        return scatter_add_multi(h * w, flat_idx, vals32, mask).reshape(-1, h, w)

    forced = _mxu_forced()
    if forced is True:
        return _pallas(flat_idx, mask, *values)
    if forced is False:
        return _xla(flat_idx, mask, *values)
    from .pallas_scatter import fits_vmem

    if not fits_vmem(h, w, tuple(exact)):
        # map too large for the whole-map-in-VMEM kernel even at the
        # minimum chunk (use spatial sharding for maps this size)
        return _xla(flat_idx, mask, *values)
    return jax.lax.platform_dependent(
        flat_idx, mask, *values, tpu=_pallas, default=_xla
    )


def scatter_min(n_cells: int, idx: jax.Array, values: jax.Array, mask: jax.Array, init: float) -> jax.Array:
    safe_idx, safe_val = _masked(idx, values, mask, init)
    return jnp.full((n_cells,), init, values.dtype).at[safe_idx].min(safe_val)


def scatter_max(n_cells: int, idx: jax.Array, values: jax.Array, mask: jax.Array, init: float) -> jax.Array:
    safe_idx, safe_val = _masked(idx, values, mask, init)
    return jnp.full((n_cells,), init, values.dtype).at[safe_idx].max(safe_val)


def scatter_or(n_cells: int, idx: jax.Array, mask: jax.Array) -> jax.Array:
    """Boolean "any point landed here" per cell."""
    return scatter_max(n_cells, idx, mask.astype(jnp.float32), mask, 0.0) > 0.5
