"""Log replay round-trip."""

import numpy as np

from elevation_mapping_cupy_tpu import MapConfig
from elevation_mapping_cupy_tpu.runtime.replay import LogWriter, read_log, replay


def test_replay_roundtrip(tmp_path, rng):
    cfg = MapConfig(resolution=0.1, map_length=2.0, max_ray_length=0.5, max_points=1024)
    w = LogWriter(["x", "y", "z"])
    for i in range(3):
        pts = rng.uniform(-0.9, 0.9, (500, 3)).astype(np.float32)
        pts[:, 2] = rng.uniform(-0.1, 0.2, 500)
        w.add(pts, np.eye(3), np.array([0, 0, 0.5]), position=np.array([0.01 * i, 0, 0]), stamp=0.1 * i)
    path = str(tmp_path / "log.npz")
    w.save(path)

    frames = list(read_log(path))
    assert len(frames) == 3
    assert frames[0]["points"].shape == (500, 3)

    snaps = replay(path, cfg, snapshot_layers=("elevation", "variance"))
    assert len(snaps) == 3
    assert np.isfinite(snaps[-1]["variance"]).all()
    assert snaps[-1]["variance"].sum() > 0
    # determinism: replaying twice gives identical maps
    snaps2 = replay(path, cfg, snapshot_layers=("elevation", "variance"))
    np.testing.assert_array_equal(snaps[-1]["variance"], snaps2[-1]["variance"])
