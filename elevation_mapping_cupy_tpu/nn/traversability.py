"""Learned traversability filter: 3 dilated 3x3 convs + 1x1 head.

JAX re-implementation of the frozen CNN in the reference
(traversability_filter.py:12-47): conv(3x3, dilation 1/2/3) -> center-crop to
a common (H-6, W-6) frame -> concat 12ch -> |.| -> 1x1 conv -> exp(-x).

Runs as a single fused XLA convolution stack; with batched maps the convs hit
the MXU. Weights are passed as arrays (not baked into the config) so the same
compiled step serves any weight set.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["TravWeights", "traversability_filter", "default_weights", "load_weights_npz"]


class TravWeights(NamedTuple):
    w1: jax.Array   # (4, 1, 3, 3)
    w2: jax.Array   # (4, 1, 3, 3)
    w3: jax.Array   # (4, 1, 3, 3)
    w_out: jax.Array  # (1, 12, 1, 1)


def default_weights(dtype=jnp.float32) -> TravWeights:
    return TravWeights(
        w1=jnp.zeros((4, 1, 3, 3), dtype),
        w2=jnp.zeros((4, 1, 3, 3), dtype),
        w3=jnp.zeros((4, 1, 3, 3), dtype),
        w_out=jnp.zeros((1, 12, 1, 1), dtype),
    )


def load_weights_npz(path: str) -> TravWeights:
    """Load converted weights (see utils/convert_weights.py)."""
    import numpy as np

    z = np.load(path)
    return TravWeights(
        w1=jnp.asarray(z["w1"], jnp.float32),
        w2=jnp.asarray(z["w2"], jnp.float32),
        w3=jnp.asarray(z["w3"], jnp.float32),
        w_out=jnp.asarray(z["w_out"], jnp.float32),
    )


def _conv(x: jax.Array, w: jax.Array, dilation: int) -> jax.Array:
    """VALID dilated conv; x: (N, 1, H, W), w: (O, 1, 3, 3)."""
    return jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(1, 1),
        padding="VALID",
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=x.dtype,
    )


def traversability_filter(elevation: jax.Array, weights: TravWeights) -> jax.Array:
    """elevation: (H, W) dilated upper-bound layer -> (H-6, W-6) traversability."""
    x = elevation[None, None, :, :]
    o1 = _conv(x, weights.w1, 1)[:, :, 2:-2, 2:-2]
    o2 = _conv(x, weights.w2, 2)[:, :, 1:-1, 1:-1]
    o3 = _conv(x, weights.w3, 3)
    cat = jnp.abs(jnp.concatenate([o1, o2, o3], axis=1))
    out = jax.lax.conv_general_dilated(
        cat,
        weights.w_out,
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=cat.dtype,
    )
    return jnp.exp(-out)[0, 0]
