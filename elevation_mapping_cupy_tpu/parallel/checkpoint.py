"""Checkpoint / resume for (batched, sharded) map states.

The reference has no map persistence at all — the map is ephemeral and
`clear_map` resets it (SURVEY §5; elevation_mapping_ros.cpp:555-562). Here
the whole state is a pytree, so checkpointing is exact and trivial:

  * `save` / `restore` — orbax-backed, multi-host safe: each host writes
    only its addressable shards, and restore places leaves directly onto
    the provided sharding (no host gather of the global array). This is
    the path for long multi-host datagen runs.
  * `mapper.ElevationMap.save_checkpoint` — single-map npz (no orbax
    dependency), for the single-robot workflow.

Restore round-trips bit-exactly: every leaf (float layers, uint32 id_max,
scalar drift accumulators) is stored raw.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np

from ..state import MapState

__all__ = ["save", "restore"]


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def _empty_meta(states: MapState):
    """Orbax cannot store zero-size arrays (e.g. the semantic stack with no
    channels configured): record their shapes/dtypes and drop them."""
    return {
        name: (tuple(leaf.shape), str(leaf.dtype))
        for name, leaf in zip(MapState._fields, states)
        if leaf.size == 0
    }


def save(path: str, states: MapState, force: bool = True) -> None:
    """Write a (possibly batched + mesh-sharded) MapState to `path`.

    Under a multi-process runtime every host participates and writes its
    own shards; call from all processes.
    """
    import json

    path = os.path.abspath(path)
    empties = _empty_meta(states)
    if empties:
        as_dict = {
            name: leaf
            for name, leaf in zip(MapState._fields, states)
            if name not in empties
        }
        _checkpointer().save(path, as_dict, force=force)
    else:
        _checkpointer().save(path, states, force=force)
    if jax.process_index() == 0:
        with open(os.path.join(path, "empty_leaves.json"), "w") as f:
            json.dump(empties, f)


def restore(path: str, template: Optional[MapState] = None) -> MapState:
    """Restore a MapState checkpoint.

    `template` (e.g. `shard_states(init_batch(cfg, B), mesh, "env")`)
    supplies the target shapes/dtypes/shardings so leaves are restored
    directly onto the mesh without materializing the global arrays on any
    single host. Without a template, arrays restore unsharded on the
    default device.
    """
    import json

    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    meta_path = os.path.join(path, "empty_leaves.json")
    empties = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            empties = json.load(f)

    def restore_args(x):
        return ocp.ArrayRestoreArgs(
            sharding=getattr(x, "sharding", None),
            global_shape=x.shape,
            dtype=x.dtype,
        )

    if template is None:
        restored = _checkpointer().restore(path)
    else:
        stored_template = {
            name: leaf
            for name, leaf in zip(MapState._fields, template)
            if name not in empties
        }
        if len(stored_template) < len(MapState._fields):
            args = {k: restore_args(v) for k, v in stored_template.items()}
            restored = _checkpointer().restore(path, item=stored_template, restore_args=args)
        else:
            args = jax.tree.map(restore_args, template)
            restored = _checkpointer().restore(path, item=template, restore_args=args)
            return MapState(*jax.tree.leaves(restored)) if not isinstance(restored, MapState) else restored

    if isinstance(restored, MapState):
        return restored
    if isinstance(restored, dict):
        leaves = []
        for name in MapState._fields:
            if name in restored:
                leaves.append(restored[name])
            else:
                shape, dtype = empties[name]
                leaves.append(jnp.zeros(tuple(shape), dtype))
        return MapState(*leaves)
    return MapState(*jax.tree.leaves(restored))
