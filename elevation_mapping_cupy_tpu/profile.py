"""Profiling harness — parity with the reference's cProfile __main__ block
(elevation_mapping.py:925-967): N iterations of input + move + publish +
polygon check, with per-stage wall times and an optional jax profiler trace.

Usage:
    python -m elevation_mapping_cupy_tpu.profile [--points 100000] [--iters 50]
        [--trace /tmp/jaxtrace]
"""

from __future__ import annotations

import argparse
import time
from collections import defaultdict

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=100_000)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--trace", type=str, default=None, help="jax profiler trace dir")
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    from .config import MapConfig
    from .mapper import ElevationMap

    cfg = MapConfig(
        max_points=args.points,
        pointcloud_channel_fusions=(("rgb", "color"), ("default", "class_bayesian")),
    )
    em = ElevationMap(cfg)
    rng = np.random.default_rng(123)
    R = np.eye(3, dtype=np.float32)
    channels = ["x", "y", "z", "rgb", "grass", "tree", "people"]
    layers = ["elevation", "variance", "traversability", "upper_bound", "rgb"]
    data = np.zeros((em.cell_n - 2, em.cell_n - 2), np.float32)
    polygon = np.array([[0, 0], [2, 0], [0, 2]], np.float32)
    result = np.zeros(3)

    def make_points():
        pts = rng.uniform(-4, 4, (args.points, len(channels))).astype(np.float32)
        pts[:, 2] = rng.uniform(-0.2, 0.5, args.points)
        return pts

    stage = defaultdict(list)

    def timed(name, fn):
        t0 = time.perf_counter()
        out = fn()
        stage[name].append(time.perf_counter() - t0)
        return out

    # warmup (compile) — run EVERY timed stage once: the first
    # input_pointcloud grows the semantic layers, which changes the static
    # config and forces a second compile wave through move_to/export/polygon;
    # without this the per-stage table mixes compiles into the means
    em.input_pointcloud(make_points(), channels, R, np.array([0, 0, 0.6], np.float32), 0, 0)
    em.update_normal()
    em.move_to(np.zeros(3), R)
    for layer in layers:
        em.get_map_with_name_ref(layer, data)
    em.get_polygon_traversability(polygon, result)

    ctx = jax.profiler.trace(args.trace) if args.trace else None
    if ctx:
        ctx.__enter__()
    t_start = time.perf_counter()
    for i in range(args.iters):
        pts = make_points()
        t = np.array([i * 0.01, i * 0.02, 0.6], np.float32)
        timed("input_pointcloud", lambda: em.input_pointcloud(pts, channels, R, t, 0, 0))
        timed("update_normal", lambda: em.update_normal())
        timed("move_to", lambda: em.move_to(np.array([i * 0.01, i * 0.02, i * 0.01]), R))
        def publish():
            for layer in layers:
                em.get_map_with_name_ref(layer, data)
        timed("publish", publish)
        timed("polygon", lambda: em.get_polygon_traversability(polygon, result))
    # force final sync
    float(np.asarray(em.state.layers[2]).sum())
    total = time.perf_counter() - t_start
    if ctx:
        ctx.__exit__(None, None, None)

    print(f"{args.iters} iterations x {args.points} points: {total:.2f}s "
          f"({args.iters * args.points / total / 1e6:.2f} M pts/s end-to-end)")
    print(f"{'stage':<18}{'mean_ms':>10}{'p99_ms':>10}")
    for name, v in stage.items():
        a = np.asarray(v) * 1e3
        print(f"{name:<18}{a.mean():>10.2f}{np.percentile(a, 99):>10.2f}")


if __name__ == "__main__":
    main()
