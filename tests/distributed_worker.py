"""Two-process jax.distributed worker used by test_parallel.py::test_two_process_distributed_update.

Usage: distributed_worker.py <coordinator_addr> <process_id> <num_processes> <repo_root>
"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, sys.argv[4])
from elevation_mapping_cupy_tpu import MapConfig
from elevation_mapping_cupy_tpu.nn.traversability import default_weights
from elevation_mapping_cupy_tpu.parallel import (
    batch_stats, batched_update, init_batch, shard_states,
)
from elevation_mapping_cupy_tpu.parallel import distributed as dist

addr, pid = sys.argv[1], int(sys.argv[2])
ok = dist.initialize(coordinator_address=addr, num_processes=2, process_id=pid)
assert ok, "distributed runtime did not come up"
assert jax.process_count() == 2
mesh = dist.pod_mesh(("host", "chip"))
assert mesh.shape == {"host": 2, "chip": 2}

cfg = MapConfig(resolution=0.1, map_length=2.0, max_ray_length=0.5, max_points=256)
B = 4
lo, hi = dist.process_local_slice(B)
assert (hi - lo) == 2
states = shard_states(init_batch(cfg, B), mesh, "host")
rng = np.random.default_rng(pid)
local_pts = rng.uniform(-0.9, 0.9, (hi - lo, cfg.max_points, 3)).astype(np.float32)
local_pts[..., 2] = rng.uniform(-0.1, 0.3, (hi - lo, cfg.max_points))
feed = dist.HostFeed(B, mesh, axis="host")
pts = feed.globalize(local_pts)
mask = feed.globalize(np.ones((hi - lo, cfg.max_points), bool))
R = feed.globalize(np.broadcast_to(np.eye(3, dtype=np.float32), (hi - lo, 3, 3)).copy())
t = feed.globalize(np.tile(np.array([0, 0, 0.5], np.float32), (hi - lo, 1)))
z = feed.globalize(np.zeros((hi - lo,), np.float32))
w = default_weights()
out = batched_update(states, pts, mask, R, t, z, z, w, cfg)
stats = batch_stats(out)
fv = float(stats["frac_valid_mean"])
assert np.isfinite(fv) and fv > 0.0
print(f"proc{pid} ok frac_valid={fv:.3f}")
