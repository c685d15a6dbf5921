"""City-block-scale mapping: ONE large world map sharded across a mesh.

The reference caps the world at a robot-centric 8 m window because one GPU
holds one map (elevation_mapping.py:200-215). Here a 512-cell (51 m @ 0.1 m)
world runs as a single map whose rows are sharded over all devices:

  * the full update step is jitted with the map row-sharded
    (`spatial_update_pointcloud`); stencils and the traversability CNN get
    halo exchanges from GSPMD,
  * the point scatters do NOT go through GSPMD — each shard bins the points
    it owns and runs the MXU matmul-scatter on its own VMEM-sized row block
    (`parallel/sharded_scatter.py`), zero collectives in the scatter,
  * a robot drives a loop through the world; every frame fuses a local
    LiDAR scan into the shared world map.

Runs on the 8 virtual CPU devices in CI (JAX_PLATFORMS=cpu +
xla_force_host_platform_device_count=8); the same program spans real chips
over ICI unchanged.

Run:  python examples/large_world_sharded.py    (CPU-safe, ~60 s with compiles)
"""

import os
import sys

os.environ.setdefault("XLA_FLAGS", "") and None
if "--xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    )

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from elevation_mapping_cupy_tpu import MapConfig, init_state
from elevation_mapping_cupy_tpu.nn.traversability import default_weights
from elevation_mapping_cupy_tpu.parallel import make_mesh
from elevation_mapping_cupy_tpu.parallel.spatial import (
    shard_state_spatial,
    spatial_update_pointcloud,
)


def world_height(x, y):
    """Streets + two raised 'building' slabs."""
    h = 0.02 * np.sin(0.4 * x) * np.cos(0.3 * y)
    h = np.where((np.abs(x - 8) < 4) & (np.abs(y - 6) < 3), 1.2, h)
    h = np.where((np.abs(x + 10) < 5) & (np.abs(y + 8) < 4), 0.8, h)
    return h.astype(np.float32)


def main():
    n_dev = len(jax.devices())
    mesh = make_mesh((n_dev,), ("x",), devices=jax.devices()[:n_dev])
    # cell_n = round(51.0/0.1)+2 = 512 — divisible by the 8-way mesh
    cfg = MapConfig(resolution=0.1, map_length=51.0, max_ray_length=1.0,
                    max_points=20000)
    assert cfg.cell_n % n_dev == 0
    print(f"world: {cfg.cell_n}x{cfg.cell_n} cells "
          f"({cfg.map_length:.0f} m @ {cfg.resolution} m) over {n_dev} shards")

    w = default_weights()
    step = spatial_update_pointcloud(mesh, cfg, "x")
    state = shard_state_spatial(init_state(cfg), mesh, "x")

    rng = np.random.default_rng(0)
    n = cfg.max_points
    R = jnp.eye(3)
    # the robot drives a loop; each frame scans a 12 m disc around it
    waypoints = [(r * np.cos(a), r * np.sin(a))
                 for r, a in zip(np.linspace(4, 18, 12),
                                 np.linspace(0, 2 * np.pi, 12, endpoint=False))]
    for wx, wy in waypoints:
        px = rng.uniform(wx - 6, wx + 6, n).astype(np.float32)
        py = rng.uniform(wy - 6, wy + 6, n).astype(np.float32)
        wz = world_height(px, py) + rng.normal(0, 0.01, n).astype(np.float32)
        pts = np.stack([px, py, wz - 1.5], -1)      # sensor frame, z=1.5
        state = step(
            state, jnp.asarray(pts), jnp.ones(n, bool), R,
            jnp.asarray([0.0, 0.0, 1.5], jnp.float32),
            jnp.float32(0.0), jnp.float32(0.0), w,
        )
    jax.block_until_ready(state)
    assert len(state.layers.sharding.device_set) == n_dev

    layers = np.asarray(state.layers)
    valid = layers[2] > 0.5
    print(f"world coverage after {len(waypoints)} frames: "
          f"{100 * valid.mean():.1f}% of {cfg.cell_n ** 2} cells")
    elev = np.where(valid, layers[0], np.nan)
    print(f"height range: [{np.nanmin(elev):.2f}, {np.nanmax(elev):.2f}] m "
          f"(buildings at 0.8 / 1.2 m)")
    # the slab tops are mapped at their true heights
    cn = cfg.cell_n
    def cell(xw, yw):
        return (int(cn / 2 + xw / cfg.resolution), int(cn / 2 + yw / cfg.resolution))
    i, j = cell(8.0, 6.0)
    tall = elev[i - 3:i + 3, j - 3:j + 3]
    print(f"building A top: {np.nanmean(tall):.2f} m (true 1.20)")
    print("sharded world map ok")


if __name__ == "__main__":
    main()
