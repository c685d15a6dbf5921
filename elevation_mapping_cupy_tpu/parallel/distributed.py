"""Multi-host runtime: jax.distributed bring-up + pod meshes + per-host feeds.

The reference's inter-process story is ROS TCPROS pub/sub between nodes on
one robot (SURVEY §2.4). The TPU-native equivalent is the jax.distributed
runtime over ICI/DCN: every host runs the same program, owns the sensor
feeds for its local envs, and XLA inserts the collectives implied by the
sharding annotations.

Typical multi-host datagen bring-up (one process per host):

    from elevation_mapping_cupy_tpu.parallel import distributed as dist

    dist.initialize()                       # env-driven (TPU pods: automatic)
    mesh = dist.pod_mesh(("host", "chip"))  # hosts x local chips
    states = init_batch(cfg, global_batch)  # same on every host
    states = shard_states(states, mesh, axis="host")
    feed = dist.HostFeed(global_batch, mesh)
    for step in range(n_steps):
        clouds = feed.globalize(local_clouds())   # per-host -> global array
        states = batched_update(states, clouds, ...)

Everything here degrades gracefully to single-process: ``initialize`` is a
no-op when no coordinator is configured, and ``pod_mesh`` becomes a mesh
over local devices.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["initialize", "pod_mesh", "HostFeed", "process_local_slice"]


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Bring up jax.distributed; returns True if a multi-process runtime is up.

    On TPU pods all arguments come from the environment; elsewhere pass the
    coordinator explicitly or set JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    # Do NOT touch jax.process_count()/devices() before initialize: querying
    # them initializes the local backend and distributed bring-up would then
    # always fail with "must be called before any JAX computations".
    if coordinator_address is None and os.environ.get("TPU_WORKER_HOSTNAMES") is None:
        return jax.process_count() > 1  # single-process (backend query now safe)
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError:
        # already initialized (double-init) — fall through to the probe
        pass
    return jax.process_count() > 1


def pod_mesh(axis_names: Tuple[str, str] = ("host", "chip")) -> Mesh:
    """(n_hosts, chips_per_host) mesh; collapses to (1, n_devices) locally."""
    n_proc = jax.process_count()
    devs = np.asarray(jax.devices())
    per_host = len(devs) // n_proc
    return Mesh(devs.reshape(n_proc, per_host), axis_names)


def process_local_slice(global_batch: int) -> Tuple[int, int]:
    """[start, stop) of the env range this host owns under env-sharding."""
    n = jax.process_count()
    i = jax.process_index()
    per = global_batch // n
    return i * per, (i + 1) * per if i < n - 1 else global_batch


class HostFeed:
    """Assemble a globally-sharded array from per-host local sensor data.

    Each host produces only its own envs' clouds;
    ``jax.make_array_from_process_local_data`` stitches them into one global
    array laid out to match the env sharding — the TPU-native replacement
    for N ROS subscribers feeding one process.
    """

    def __init__(self, global_batch: int, mesh: Mesh, axis: str = "host"):
        self.global_batch = global_batch
        self.mesh = mesh
        self.sharding = NamedSharding(mesh, P(axis))

    def globalize(self, local: np.ndarray) -> jax.Array:
        """local: (local_batch, ...) host-local data -> global jax.Array."""
        global_shape = (self.global_batch,) + tuple(local.shape[1:])
        if jax.process_count() == 1:
            return jax.device_put(jnp.asarray(local), self.sharding)
        return jax.make_array_from_process_local_data(
            self.sharding, local, global_shape
        )
