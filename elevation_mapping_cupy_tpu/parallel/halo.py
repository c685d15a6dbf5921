"""Spatially-sharded maps with halo exchange over the device mesh.

For maps larger than one chip's comfortable working set (or pods of envs that
share one world map), the grid is sharded row-block-wise across a mesh axis
and stencil ops exchange `halo` boundary rows with ring neighbors via
``lax.ppermute`` over ICI — the stencil analogue of ring attention
(SURVEY §5 long-context note). Recentering (jnp.roll) under sharding also
crosses shard borders; XLA lowers it to collective permutes automatically
inside jit, so only explicit-stencil code needs manual halos.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["halo_exchange_rows", "sharded_stencil", "sharded_uniform_smooth", "sharded_dilation"]


def halo_exchange_rows(
    x: jax.Array, halo: int, axis_name: str, edge: str = "zero"
) -> jax.Array:
    """Pad a row-sharded block (h, w) with `halo` rows from ring neighbors.

    Edge shards (global map border) fill their outer halo per ``edge``:
      * "zero"      — map-border semantics
      * "symmetric" — np.pad symmetric reflection of the shard's own rows,
        so stencils with reflect boundaries match the unsharded op exactly
      * "neg_inf"   — neutral element for max-dilation

    Returns (h + 2*halo, w).
    """
    n = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)

    top_send = x[:halo]       # my top rows -> previous shard's bottom halo
    bot_send = x[-halo:]      # my bottom rows -> next shard's top halo

    # ppermute: send to (i-1) to fill their bottom halo; send to (i+1) for top
    fwd = [(i, (i + 1) % n) for i in range(n)]
    bwd = [(i, (i - 1) % n) for i in range(n)]
    from_prev = jax.lax.ppermute(bot_send, axis_name, fwd)   # rows above my block
    from_next = jax.lax.ppermute(top_send, axis_name, bwd)   # rows below my block

    if edge == "symmetric":
        top_edge = x[:halo][::-1]
        bot_edge = x[-halo:][::-1]
    elif edge == "neg_inf":
        top_edge = jnp.full_like(from_prev, -jnp.inf)
        bot_edge = jnp.full_like(from_next, -jnp.inf)
    else:
        top_edge = jnp.zeros_like(from_prev)
        bot_edge = jnp.zeros_like(from_next)
    top_halo = jnp.where(idx == 0, top_edge, from_prev)
    bot_halo = jnp.where(idx == n - 1, bot_edge, from_next)
    return jnp.concatenate([top_halo, x, bot_halo], axis=0)


def sharded_stencil(
    fn: Callable[[jax.Array], jax.Array],
    mesh: Mesh,
    halo: int,
    axis_name: str = "x",
    edge: str = "zero",
):
    """Lift a (H, W)->(H, W) stencil with radius ≤ halo onto a row-sharded map.

    `fn` must treat its input as a standalone block (it sees halo rows); the
    output's halo rows are dropped. ``edge`` picks the global-border fill
    (see halo_exchange_rows).
    """
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    def block(xb: jax.Array) -> jax.Array:
        padded = halo_exchange_rows(xb, halo, axis_name, edge)
        out = fn(padded)
        return out[halo:-halo]

    return shard_map(
        block,
        mesh=mesh,
        in_specs=P(axis_name, None),
        out_specs=P(axis_name, None),
    )


def sharded_uniform_smooth(mesh: Mesh, passes: int = 2, size: int = 3, axis_name: str = "x"):
    """Row-sharded stencil.uniform_smooth with halo exchange.

    Symmetric edge halos keep the global border rows bit-identical to the
    unsharded op: a mirror-symmetric padded block stays mirror-symmetric
    under every reflect-padded smoothing pass, so the halo rows evolve
    exactly like the unsharded reflection would."""
    from ..ops import stencil

    halo = passes * (size // 2)
    return sharded_stencil(
        lambda x: stencil.uniform_smooth(x, passes=passes, size=size),
        mesh, halo, axis_name, edge="symmetric",
    )


def sharded_dilation(mesh: Mesh, size: int, axis_name: str = "x"):
    """Row-sharded morphological max-dilation (planning-map helper)."""
    def block(x):
        p = jnp.pad(x, size, mode="constant", constant_values=-jnp.inf)
        out = jnp.full_like(x, -jnp.inf)
        for dy in range(2 * size + 1):
            for dx in range(2 * size + 1):
                out = jnp.maximum(out, p[dy : dy + x.shape[0], dx : dx + x.shape[1]])
        return out

    return sharded_stencil(block, mesh, size, axis_name, edge="neg_inf")
