"""Experiment matrix for the 24-frame trajectory polar-vs-exact divergence
(VERDICT r3 weak #5 follow-up to scripts/analyze_traj_divergence.py).

The analysis run showed: divergent cells have IDENTICAL elevation, the
divergence persists frames after the transient obstacle disappears, and
70% of disagreeing cells are outside every obstacle footprint. That points
at the upper-bound layer: traversability is the CNN over
dilation_fill(upper_bound, valid|is_upper_bound), so any polar-vs-exact
difference in raycast-written upper-bound VALUES or MEMBERSHIP persists
(shadow cells receive no points to overwrite it) and bleeds through the
CNN's receptive field into neighboring valid cells.

This script replays the same scene under polar variants to find which knob
carries the gap:
  base              current defaults (slope from bucket centers)
  slope_exact       raycast_slope_from_bins=False (scatter-min ray slope)
  ebins256/512      finer elevation buckets
  abins1024         finer azimuth windows
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

from elevation_mapping_cupy_tpu import MapConfig
from elevation_mapping_cupy_tpu.runtime.replay import LogWriter, replay

rng = np.random.default_rng(1234)

w = LogWriter()
n_frames = 24
for i in range(n_frames):
    x0 = 0.12 * i
    pts = rng.uniform(-1.8, 1.8, (6000, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(-0.05, 0.05, 6000).astype(np.float32)
    wx = pts[:, 0] + x0
    box = (wx > 1.5) & (wx < 1.9) & (np.abs(pts[:, 1]) < 0.4)
    pts[box, 2] = 0.35
    dyn = (pts[:, 0] > 0.6) & (pts[:, 0] < 0.9) & (pts[:, 1] > 0.5) & (pts[:, 1] < 0.9)
    if 5 <= i <= 10:
        pts[dyn, 2] = 0.45
    t = np.array([x0, 0.0, 0.6], np.float32)
    w.add(pts, np.eye(3, dtype=np.float32), t, position=t, stamp=0.1 * i)
path = "/tmp/traj_exp.npz"
w.save(path)

base = MapConfig(resolution=0.1, map_length=4.0, max_ray_length=1.5,
                 max_points=8192, enable_drift_compensation=False)
layers = ("traversability", "upper_bound", "is_upper_bound")
ex = replay(path, base, snapshot_layers=layers, raycast_mode="exact")

variants = {
    "base": base,
    "slope_exact": base.replace(raycast_slope_from_bins=False),
    "ebins256": base.replace(raycast_elevation_bins=256),
    "ebins512": base.replace(raycast_elevation_bins=512),
    "abins1024": base.replace(raycast_azimuth_bins=1024),
    "slope_exact+eb256": base.replace(raycast_slope_from_bins=False,
                                      raycast_elevation_bins=256),
    "slope_exact+eb256+ab1024": base.replace(
        raycast_slope_from_bins=False, raycast_elevation_bins=256,
        raycast_azimuth_bins=1024),
}


def stats(po):
    p99s, fracs, ub99s, mflips = [], [], [], []
    for k in range(n_frames):
        e, p = ex[k], po[k]
        fe = np.isfinite(e["traversability"]) & np.isfinite(p["traversability"])
        dt = np.abs(np.where(fe, e["traversability"] - p["traversability"], 0.0))
        p99s.append(float(np.quantile(dt[fe], 0.99)) if fe.any() else 0.0)
        fracs.append(float(np.mean(dt[fe] > 0.1)) if fe.any() else 0.0)
        fu = np.isfinite(e["upper_bound"]) & np.isfinite(p["upper_bound"])
        du = np.abs(np.where(fu, e["upper_bound"] - p["upper_bound"], 0.0))
        ub99s.append(float(np.quantile(du[fu], 0.99)) if fu.any() else 0.0)
        me = np.isfinite(e["is_upper_bound"]) & (e["is_upper_bound"] > 0.5)
        mp = np.isfinite(p["is_upper_bound"]) & (p["is_upper_bound"] > 0.5)
        mflips.append(int((me != mp).sum()))
    return (max(p99s), max(fracs), max(ub99s), max(mflips),
            float(np.mean(p99s)))


print(f"{'variant':>26} {'p99max':>7} {'frac>.1':>8} {'ub_d99':>7} "
      f"{'iubflip':>7} {'p99mean':>8}")
for name, cfg in variants.items():
    po = replay(path, cfg, snapshot_layers=layers, raycast_mode="polar")
    p99, frac, ub99, mf, p99m = stats(po)
    print(f"{name:>26} {p99:7.3f} {frac:8.4f} {ub99:7.3f} {mf:7d} {p99m:8.3f}")

# -- round 2: saturation + validity-flip chain ------------------------------
variants2 = {
    "abins2048": base.replace(raycast_azimuth_bins=2048),
    "abins4096": base.replace(raycast_azimuth_bins=4096),
}
layers2 = ("traversability", "is_valid")
ex2 = replay(path, base, snapshot_layers=layers2, raycast_mode="exact")


def stats2(po):
    p99s, fracs, vflips = [], [], []
    for k in range(n_frames):
        e, p = ex2[k], po[k]
        fe = np.isfinite(e["traversability"]) & np.isfinite(p["traversability"])
        dt = np.abs(np.where(fe, e["traversability"] - p["traversability"], 0.0))
        p99s.append(float(np.quantile(dt[fe], 0.99)) if fe.any() else 0.0)
        fracs.append(float(np.mean(dt[fe] > 0.1)) if fe.any() else 0.0)
        vflips.append(int(((e["is_valid"] > 0.5) != (p["is_valid"] > 0.5)).sum()))
    return max(p99s), max(fracs), max(vflips), float(np.mean(p99s)), sum(vflips)


print()
print(f"{'variant':>26} {'p99max':>7} {'frac>.1':>8} {'vflipmax':>8} "
      f"{'p99mean':>8} {'vfliptot':>8}")
for name, cfg in [("base", base),
                  ("abins1024", base.replace(raycast_azimuth_bins=1024))] + \
                 list(variants2.items()):
    po = replay(path, cfg, snapshot_layers=layers2, raycast_mode="polar")
    p99, frac, vf, p99m, vft = stats2(po)
    print(f"{name:>26} {p99:7.3f} {frac:8.4f} {vf:8d} {p99m:8.3f} {vft:8d}")
