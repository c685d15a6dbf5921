"""Batched multi-environment datagen over a device mesh.

The BASELINE north-star workload: B independent robot-centric maps updated
per step from simulated sensors over procedural terrains, env-sharded over
all available devices (8 virtual CPU devices by default; a real TPU slice
under `jax.distributed`). Reports maps/s.

    python examples/batched_datagen.py [--batch 32] [--steps 5] [--cpu]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--points", type=int, default=20_000)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from elevation_mapping_cupy_tpu import MapConfig
    from elevation_mapping_cupy_tpu.nn.traversability import default_weights
    from elevation_mapping_cupy_tpu.parallel import (
        batched_update, init_batch, make_mesh, shard_states,
    )
    from elevation_mapping_cupy_tpu.runtime.datagen import make_batch_clouds

    n_dev = len(jax.devices())
    B = args.batch
    cfg = MapConfig(resolution=0.08, map_length=6.0, max_ray_length=1.0,
                    max_points=args.points)
    w = default_weights()
    mesh = make_mesh((n_dev,), ("env",))
    states = shard_states(init_batch(cfg, B), mesh)
    print(f"devices={n_dev}  envs={B}  cells={cfg.cell_n}^2  pts/env={args.points}")

    key = jax.random.PRNGKey(0)
    zeros = jnp.zeros((B,))
    Rs = jnp.broadcast_to(jnp.eye(3), (B, 3, 3))
    mask = jnp.ones((B, args.points), bool)

    t_total = 0.0
    for step in range(args.steps):
        key, sub = jax.random.split(key)
        pts, t, _ = make_batch_clouds(sub, B, cfg.cell_n, cfg.resolution, args.points)
        t0 = time.perf_counter()
        states = batched_update(states, pts, mask, Rs, t, zeros, zeros, w, cfg)
        _ = float(jnp.sum(states.layers[:, 2]))  # sync
        dt = time.perf_counter() - t0
        if step > 0:  # skip compile step
            t_total += dt
        print(f"step {step}: {dt*1e3:8.1f} ms  ({B/dt:8.1f} maps/s)")
    if args.steps > 1:
        print(f"steady-state: {B*(args.steps-1)/t_total:.1f} maps/s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
