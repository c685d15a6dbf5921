"""End-to-end timing of the exact flat march at the deployed OP."""
import os, time, sys
import numpy as np
import jax, jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from elevation_mapping_cupy_tpu import core, init_state
from elevation_mapping_cupy_tpu.config import load_config
from elevation_mapping_cupy_tpu.nn.traversability import default_weights
from elevation_mapping_cupy_tpu.ops import raycast, scatter
from elevation_mapping_cupy_tpu.ops.geometry import associate_points

n_pts = int(os.environ.get("NPTS", 1_000_000))
chunk = int(os.environ.get("CHUNK", 1 << 22))
cfg = load_config("configs/core_param.yaml").replace(
    raycast_mode="exact", max_points=n_pts, raycast_flat_chunk=chunk)
print("n_ray_steps:", cfg.n_ray_steps, "chunk:", chunk)

w = default_weights()
rng = np.random.default_rng(0)
pts = rng.uniform(-4, 4, (n_pts, 3)).astype(np.float32)
pts[:, 2] = rng.uniform(-0.2, 0.5, n_pts).astype(np.float32)
points = jnp.asarray(pts)
mask = jnp.ones((n_pts,), bool)
R = jnp.eye(3)
t = jnp.asarray([0.0, 0.0, 0.5], jnp.float32)
zero = jnp.float32(0.0)
state = init_state(cfg)
state = core.update_pointcloud(state, points, mask, R, t, zero, zero, w, cfg)
jax.block_until_ready(state.layers)

# isolate the raycast: build assoc once, call visibility_cleanup_exact
layers = state.layers
normal = state.normal
assoc = jax.jit(lambda: associate_points(points, mask, R, t, cfg))()
inlier = jnp.ones((cfg.cell_n, cfg.cell_n), jnp.float32)

fn = jax.jit(lambda l: raycast.visibility_cleanup_exact(l, normal, assoc, inlier, t, cfg))
r = fn(layers); jax.block_until_ready(r)
iters = 3
t0 = time.perf_counter()
for _ in range(iters):
    r = fn(layers)
jax.block_until_ready(r)
print(f"visibility_cleanup_exact (flat): {(time.perf_counter()-t0)/iters*1e3:.0f} ms")

t0 = time.perf_counter()
for _ in range(iters):
    state2 = core.update_pointcloud(state, points, mask, R, t, zero, zero, w, cfg)
jax.block_until_ready(state2.layers)
print(f"full update (exact): {(time.perf_counter()-t0)/iters*1e3:.0f} ms")
