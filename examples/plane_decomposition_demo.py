"""Convex plane decomposition demo — the ConvexApproximationDemoNode analogue.

Reference: plane_segmentation/convex_plane_decomposition_ros/src/
ConvexApproximationDemoNode.cpp (subscribes PlanarTerrain, projects a query
point onto the best planar region, grows a convex polygon there and publishes
markers). Here: synthetic stepped terrain -> PlaneDecompositionPipeline ->
per-query convex approximation, printed as text + the pipeline's per-stage
timer table (ConvexPlaneDecompositionRos.cpp:28-48).

Run:  python examples/plane_decomposition_demo.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from elevation_mapping_cupy_tpu.planeseg.pipeline import PlaneDecompositionPipeline


def make_terrain(n: int = 160) -> np.ndarray:
    """Stepped terrain with a ramp and sensor holes."""
    rng = np.random.default_rng(3)
    h = np.zeros((n, n), np.float32)
    h[40:100, 30:130] = 0.25                       # platform
    h[110:150, 20:70] = 0.12                       # lower step
    ramp = np.linspace(0.0, 0.25, 30, dtype=np.float32)
    h[40:100, 100:130] = ramp[None, :]             # ramp onto the platform
    h += rng.normal(0, 0.0015, (n, n)).astype(np.float32)
    h[rng.random((n, n)) < 0.015] = np.nan         # dropouts
    return h


def main() -> None:
    resolution = 0.04
    h = make_terrain()
    pipe = PlaneDecompositionPipeline(resolution=resolution)
    terrain = pipe.update(h)
    print(f"regions: {len(terrain.regions)}")
    for i, r in enumerate(terrain.regions):
        nrm = np.asarray(r.normal).round(3)
        sup = np.asarray(r.support).round(3)
        print(
            f"  region {i}: label={r.label}, support={sup.tolist()}, "
            f"normal={nrm.tolist()}, boundary_pts={len(r.boundary_with_holes.boundary)}"
        )

    # debug rendering (Draw.cpp / RosVisualizations parity): region
    # boundaries + holes + insets over the elevation image
    from elevation_mapping_cupy_tpu.planeseg import draw

    overlay_path = os.path.join(os.path.dirname(__file__), "decomposition_overlay.png")
    draw.save_decomposition_overlay(
        overlay_path, terrain.elevation, terrain.regions,
        terrain.resolution, terrain.map_origin,
    )
    n_markers = len(draw.boundary_markers(terrain.regions)) - 1
    print(f"overlay written: {overlay_path} ({n_markers} boundary markers)")

    # project query points and grow convex footholds (the demo node's loop)
    # world frame: x = -row*res, y = -col*res from the map origin
    queries = np.array([[-2.8, -2.6], [-2.8, -4.6], [-5.9, -5.9]], np.float32)
    for q in queries:
        poly = pipe.convex_approximation(terrain, q, n_vertices=12)
        if poly is None:
            print(f"query {q.tolist()}: no planar region")
            continue
        area = 0.5 * abs(
            float(
                np.sum(
                    poly[:, 0] * np.roll(poly[:, 1], -1)
                    - np.roll(poly[:, 0], -1) * poly[:, 1]
                )
            )
        )
        print(
            f"query {q.tolist()}: convex {len(poly)}-gon, area {area:.3f} m^2, "
            f"first vertex {poly[0].round(3).tolist()}"
        )

    # steady-state per-stage timings (compile excluded by re-running)
    pipe._stats = {}
    for _ in range(5):
        terrain = pipe.update(h)
    print()
    print(pipe.timing_report())


if __name__ == "__main__":
    main()
