"""Instrument the 24-frame trajectory polar-vs-exact divergence (VERDICT r3
weak #5): which frames/cells carry the p99≈0.33 traversability gap, and is
it the transient obstacle, recentering, or near-range sampling acceptance?

Replicates tests/test_raycast_modes.py::test_polar_trajectory_divergence_bound
and classifies every disagreeing cell (dt > 0.1) by:
  * frame index (transient obstacle lives in frames 5-10)
  * world position: inside the dynamic-obstacle footprint / the static box /
    elsewhere
  * range from the sensor (near-range accept_k quantization suspect)
  * validity-flip (cells where exactly one backend considers the cell valid)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

from elevation_mapping_cupy_tpu import MapConfig
from elevation_mapping_cupy_tpu.runtime.replay import LogWriter, replay

rng = np.random.default_rng(1234)  # test uses fixture rng; same scene family

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
path = "/tmp/traj_analysis.npz"
w.save(path)

cfg = MapConfig(resolution=0.1, map_length=4.0, max_ray_length=1.5,
                max_points=8192, enable_drift_compensation=False)
layers = ("elevation", "traversability", "is_valid")
ex = replay(path, cfg, snapshot_layers=layers, raycast_mode="exact")
po = replay(path, cfg, snapshot_layers=layers, raycast_mode="polar")

n = cfg.cell_n - 2
print(f"map {n}x{n} @ {cfg.resolution} m")
print(f"{'frm':>3} {'p99':>6} {'frac>.1':>8} {'n>.1':>5} "
      f"{'dyn%':>5} {'box%':>5} {'near%':>6} {'vflip%':>6} {'medR':>5}")
tot = {"dyn": 0, "box": 0, "near": 0, "other": 0, "vflip": 0, "n": 0}
for k in range(n_frames):
    x0 = 0.12 * k
    e, p = ex[k], po[k]
    fe = np.isfinite(e["traversability"]) & np.isfinite(p["traversability"])
    dt = np.abs(np.where(fe, e["traversability"] - p["traversability"], 0.0))
    p99 = float(np.quantile(dt[fe], 0.99)) if fe.any() else 0.0
    bad = dt > 0.1
    nb = int(bad.sum())
    # world coords of inner map cells: map centered on snapped robot center
    cx = np.round(x0 / cfg.resolution) * cfg.resolution
    ii, jj = np.nonzero(bad)
    wx = (ii + 1 + 0.5 - 0.5 * cfg.cell_n) * cfg.resolution + cx
    wy = (jj + 1 + 0.5 - 0.5 * cfg.cell_n) * cfg.resolution
    r = np.sqrt((wx - x0) ** 2 + wy ** 2)
    in_dyn = (wx > 0.6 - cfg.resolution) & (wx < 0.9 + cfg.resolution) & \
             (wy > 0.5 - cfg.resolution) & (wy < 0.9 + cfg.resolution)
    in_box = (wx > 1.5 - cfg.resolution) & (wx < 1.9 + cfg.resolution) & \
             (np.abs(wy) < 0.4 + cfg.resolution)
    near = r < 0.45
    ve = e["is_valid"] > 0.5
    vp = p["is_valid"] > 0.5
    vflip = (ve != vp)[bad]
    frac = float(np.mean(dt[fe] > 0.1)) if fe.any() else 0.0
    if nb:
        print(f"{k:>3} {p99:6.3f} {frac:8.4f} {nb:5d} "
              f"{100*in_dyn.mean():5.1f} {100*in_box.mean():5.1f} "
              f"{100*near.mean():6.1f} {100*vflip.mean():6.1f} "
              f"{np.median(r):5.2f}")
        tot["dyn"] += int(in_dyn.sum()); tot["box"] += int(in_box.sum())
        tot["near"] += int(near.sum()); tot["vflip"] += int(vflip.sum())
        tot["other"] += int((~in_dyn & ~in_box & ~near).sum()); tot["n"] += nb
    else:
        print(f"{k:>3} {p99:6.3f} {frac:8.4f} {nb:5d}")

print("\ntotals over all disagreeing cells:")
for key in ("dyn", "box", "near", "other", "vflip"):
    print(f"  {key:6s} {tot[key]:5d} ({100*tot[key]/max(tot['n'],1):.1f}%)")

# drill into the worst frame: list the disagreeing cells with both values
worst = int(np.argmax([
    float(np.quantile(np.abs(np.where(
        np.isfinite(ex[k]['traversability']) & np.isfinite(po[k]['traversability']),
        ex[k]['traversability'] - po[k]['traversability'], 0.0)), 0.99))
    for k in range(n_frames)]))
print(f"\nworst frame {worst}: top disagreements")
e, p = ex[worst], po[worst]
fe = np.isfinite(e["traversability"]) & np.isfinite(p["traversability"])
dt = np.abs(np.where(fe, e["traversability"] - p["traversability"], 0.0))
flat = np.argsort(dt.ravel())[::-1][:15]
x0 = 0.12 * worst
cx = np.round(x0 / cfg.resolution) * cfg.resolution
for f in flat:
    i, j = divmod(int(f), dt.shape[1])
    wx = (i + 1 + 0.5 - 0.5 * cfg.cell_n) * cfg.resolution + cx
    wy = (j + 1 + 0.5 - 0.5 * cfg.cell_n) * cfg.resolution
    r = np.sqrt((wx - x0) ** 2 + wy ** 2)
    print(f"  cell({i:3d},{j:3d}) world=({wx:+.2f},{wy:+.2f}) r={r:.2f} "
          f"dt={dt[i, j]:.3f} trav e={e['traversability'][i, j]:.3f} "
          f"p={p['traversability'][i, j]:.3f} "
          f"elev e={e['elevation'][i, j]:+.3f} p={p['elevation'][i, j]:+.3f} "
          f"valid e={e['is_valid'][i, j]:.0f} p={p['is_valid'][i, j]:.0f}")
