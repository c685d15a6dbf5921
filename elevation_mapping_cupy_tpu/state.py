"""Map state as an immutable JAX pytree.

The reference holds mutable CuPy arrays guarded by ``threading.Lock``
(elevation_mapping.py:66-91). The TPU-native design replaces the lock-guarded
mutation with a pure functional state pytree threaded through jitted update
functions: there is nothing to race on by construction, and the whole state
can be batched over environments with ``vmap`` / sharded with ``shard_map``.

Layer stack layout (indices match reference elevation_mapping.py:69-77):
    0 elevation, 1 variance, 2 is_valid, 3 traversability,
    4 time, 5 upper_bound, 6 is_upper_bound
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .config import MapConfig

__all__ = ["MapState", "init_state"]


class MapState(NamedTuple):
    """Full elevation-map state for one environment (or batched via vmap)."""

    layers: jax.Array          # (7, H, W) float32 core layer stack
    normal: jax.Array          # (3, H, W) float32 surface normals
    semantic: jax.Array        # (S, H, W) float32 semantic/MEM layers (S may be 0)
    sem_new: jax.Array         # (S, H, W) float32 per-update accumulation buffer
    id_max: jax.Array          # (S, H, W) uint32 class-id bookkeeping (class_max fusion)
    center: jax.Array          # (3,)  map center in world frame
    rotation: jax.Array        # (3, 3) last robot base rotation
    mean_error: jax.Array      # ()   last drift-compensation mean error
    additive_mean_error: jax.Array  # () accumulated drift correction

    @property
    def cell_n(self) -> int:
        return self.layers.shape[-1]


def init_state(cfg: MapConfig, dtype=jnp.float32) -> MapState:
    """Fresh map state (reference init: elevation_mapping.py:68-95).

    variance starts at ``initial_variance``; traversability starts at 1.
    """
    n = cfg.cell_n
    s = len(cfg.semantic_layers)
    layers = jnp.zeros((7, n, n), dtype)
    layers = layers.at[1].set(cfg.initial_variance)
    layers = layers.at[3].set(1.0)
    return MapState(
        layers=layers,
        normal=jnp.zeros((3, n, n), dtype),
        semantic=jnp.zeros((s, n, n), dtype),
        sem_new=jnp.zeros((s, n, n), dtype),
        id_max=jnp.zeros((s, n, n), jnp.uint32),
        center=jnp.zeros((3,), dtype),
        rotation=jnp.eye(3, dtype=dtype),
        mean_error=jnp.zeros((), dtype),
        additive_mean_error=jnp.zeros((), dtype),
    )
