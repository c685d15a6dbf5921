"""Minimal end-to-end demo: synthetic depth sweeps → elevation map → exports.

Mirrors the reference's simple_example turtlebot workflow
(elevation_mapping_cupy docs getting-started) without ROS: build a map from
a few simulated depth-camera frames over procedural terrain, then export
layers, query polygon safety, and run plane decomposition.

    python examples/minimal_mapping.py [--cpu]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp

    from elevation_mapping_cupy_tpu import MapConfig
    from elevation_mapping_cupy_tpu.mapper import ElevationMap
    from elevation_mapping_cupy_tpu.runtime.datagen import (
        procedural_terrain,
        simulate_depth_cloud,
    )
    from elevation_mapping_cupy_tpu.planeseg.pipeline import PlaneDecompositionPipeline

    cfg = MapConfig(resolution=0.05, map_length=6.0, max_ray_length=2.0,
                    max_points=40_000)
    em = ElevationMap(cfg)

    # simulated robot walking over procedural terrain
    terrain = procedural_terrain(jax.random.PRNGKey(3), cfg.cell_n, cfg.resolution)
    for step in range(6):
        pos = np.array([0.15 * step, 0.05 * step, 0.0], np.float32)
        cloud, t = simulate_depth_cloud(
            jax.random.PRNGKey(10 + step), terrain, cfg.resolution,
            jnp.asarray(pos + np.array([0, 0, 0.7], np.float32)), 40_000,
        )
        em.input_pointcloud(
            np.asarray(cloud), ["x", "y", "z"],
            np.eye(3, dtype=np.float32), np.asarray(t), 0.0, 0.0,
        )
        em.move_to(pos, np.eye(3, dtype=np.float32))
        em.update_normal()

    out = np.zeros((em.cell_n - 2, em.cell_n - 2), np.float32)
    for layer in ["elevation", "traversability", "normal_z"]:
        em.get_map_with_name_ref(layer, out)
        print(f"{layer:15s} valid={np.isfinite(out).sum():6d} "
              f"range=[{np.nanmin(out):+.2f}, {np.nanmax(out):+.2f}]")

    poly = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]], np.float32)
    result = np.zeros(3)
    em.get_polygon_traversability(poly, result)
    print(f"polygon safety: is_safe={bool(result[0])} trav={result[1]:.3f}")

    em.get_map_with_name_ref("elevation", out)
    planes = PlaneDecompositionPipeline(cfg.resolution).update(out)
    print(f"plane decomposition: {len(planes.regions)} planar regions")
    return 0


if __name__ == "__main__":
    sys.exit(main())
