"""Polar-vs-exact divergence at the DEPLOYED operating point (VERDICT r4 #3).

Every committed fidelity bound lives at 42-82 cells, where the 512-bin
azimuth cap satisfies the measured ~12-bins-per-cell-of-map-width
saturation. The deployed 202-cell map gets 512/202 ~= 2.5 bins per
cell-width — 5x below saturation — so the production path's accuracy at
the production scale was an extrapolation. This harness measures it: the
round-4 trajectory scene (recentering traverse, world-fixed box, transient
obstacle that raycast must clear) scaled to the deployed YAML
(202x202 @ 0.04 m, max_ray 10 m, 100k-pt clouds), replayed through
raycast_mode="exact" (the parity oracle) and "polar" (production), with
the same per-frame metrics as tests/test_raycast_modes.py's bounds:
validity IoU, elevation max |diff| on jointly-valid cells,
traversability frac(>0.1) and p99 where both finite.

Usage (TPU by default; --platform cpu for a host run — the env var alone is
NOT enough on this harness, sitecustomize force-sets JAX_PLATFORMS=axon):
    python scripts/deployed_scale_divergence.py [--frames 12] [--points 100000]
        [--azimuth-bins 0]   # 0 = config auto (512 cap); try 1024/2048 on CPU
        [--platform cpu]

Prints one JSON line per frame and a final summary line. Results are
committed in PARITY.md ("Deployed-scale polar divergence").
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def build_log(n_frames: int, n_points: int, seed: int = 1234) -> "LogWriter":
    from elevation_mapping_cupy_tpu.runtime.replay import LogWriter

    rng = np.random.default_rng(seed)
    w = LogWriter()
    for i in range(n_frames):
        x0 = 0.24 * i                 # ~2.6 m travel over 12 frames -> recenters
        pts = rng.uniform(-3.8, 3.8, (n_points, 3)).astype(np.float32)
        pts[:, 2] = rng.uniform(-0.05, 0.05, n_points).astype(np.float32)
        wx = pts[:, 0] + x0           # world-fixed box obstacle
        box = (wx > 3.0) & (wx < 3.8) & (np.abs(pts[:, 1]) < 0.8)
        pts[box, 2] = 0.35
        # transient obstacle in frames 3-6, then rays must clear it
        dyn = (pts[:, 0] > 1.2) & (pts[:, 0] < 1.8) & (pts[:, 1] > 1.0) & (pts[:, 1] < 1.8)
        if 3 <= i <= 6:
            pts[dyn, 2] = 0.45
        t = np.array([x0, 0.0, 0.6], np.float32)
        w.add(pts, np.eye(3, dtype=np.float32), t, position=t, stamp=0.1 * i)
    return w


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--points", type=int, default=100_000)
    ap.add_argument("--azimuth-bins", default="0",
                    help="polar azimuth bins: one value or comma list to "
                         "sweep (0 = config auto = 512 cap)")
    ap.add_argument("--seed", type=int, default=1234)
    ap.add_argument("--save-log", default=None)
    ap.add_argument("--platform", default=None,
                    help="jax platform override (e.g. cpu); default = harness")
    args = ap.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from elevation_mapping_cupy_tpu.config import load_config
    from elevation_mapping_cupy_tpu.runtime.replay import replay
    from elevation_mapping_cupy_tpu.utils.compile_cache import ensure_compile_cache

    ensure_compile_cache()
    yaml_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "..", "configs", "core_param.yaml")
    cfg = load_config(yaml_path, max_points=args.points,
                      enable_drift_compensation=False)
    bin_sweep = [int(x) for x in str(args.azimuth_bins).split(",")]
    print(json.dumps({"cell_n": cfg.cell_n, "azimuth_bins_sweep": bin_sweep,
                      "n_ray_steps": cfg.n_ray_steps, "frames": args.frames,
                      "points": args.points}), flush=True)

    w = build_log(args.frames, args.points, args.seed)
    import tempfile
    path = args.save_log or os.path.join(tempfile.gettempdir(),
                                         "deployed_divergence_log.npz")
    w.save(path)

    layers = ("elevation", "traversability", "is_valid")
    t0 = time.perf_counter()
    ex = replay(path, cfg, snapshot_layers=layers, raycast_mode="exact")
    t_ex = time.perf_counter() - t0
    print(json.dumps({"exact_replay_s": round(t_ex, 1)}), flush=True)

    for bins in bin_sweep:
        cfg_b = cfg.replace(raycast_azimuth_bins=bins) if bins else cfg
        t0 = time.perf_counter()
        po = replay(path, cfg_b, snapshot_layers=layers, raycast_mode="polar")
        t_po = time.perf_counter() - t0

        rows = []
        for k in range(args.frames):
            e, p = ex[k], po[k]
            ve, vp = e["is_valid"] > 0.5, p["is_valid"] > 0.5
            iou = float((ve & vp).sum() / max((ve | vp).sum(), 1))
            both = ve & vp
            de = np.abs(e["elevation"][both] - p["elevation"][both])
            elev_max = float(de.max()) if de.size else 0.0
            fe = np.isfinite(e["traversability"]) & np.isfinite(p["traversability"])
            dt = np.abs(e["traversability"][fe] - p["traversability"][fe])
            frac = float(np.mean(dt > 0.1)) if dt.size else 0.0
            p99 = float(np.quantile(dt, 0.99)) if dt.size else 0.0
            flips = int((ve != vp).sum())
            rows.append({"frame": k, "iou": round(iou, 4),
                         "elev_max": round(elev_max, 5),
                         "frac_gt_0p1": round(frac, 4), "p99": round(p99, 4),
                         "validity_flips": flips})
            print(json.dumps({"bins": cfg_b.azimuth_bins, **rows[-1]}),
                  flush=True)

        summary = {
            "azimuth_bins": cfg_b.azimuth_bins,
            "cell_n": cfg.cell_n,
            "worst_iou": min(r["iou"] for r in rows),
            "worst_elev_max": max(r["elev_max"] for r in rows),
            "worst_frac_gt_0p1": max(r["frac_gt_0p1"] for r in rows),
            "worst_p99": max(r["p99"] for r in rows),
            "total_validity_flips": sum(r["validity_flips"] for r in rows),
            "exact_replay_s": round(t_ex, 1),
            "polar_replay_s": round(t_po, 1),
        }
        print("SUMMARY " + json.dumps(summary), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
