"""Device mesh construction helpers."""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np
import jax
from jax.sharding import Mesh

__all__ = ["make_mesh"]


def make_mesh(
    shape: Optional[Tuple[int, ...]] = None,
    axis_names: Sequence[str] = ("env",),
    devices=None,
) -> Mesh:
    """Mesh over available devices. Default: 1-D env-parallel mesh.

    For multi-host pods call jax.distributed.initialize() first; jax.devices()
    then spans all hosts and the env axis shards across DCN+ICI (env updates
    are independent, so only stats psums cross hosts — the ≥90% maps/s scaling
    path in BASELINE.md).
    """
    devices = devices if devices is not None else jax.devices()
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axis_names)
