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


def test_long_horizon_soak(rng):
    """200-frame soak: a wandering robot with noisy clouds, recentering
    every frame, raycast on. Pins long-run stability invariants the
    trajectory goldens don't: every layer stays finite, variance stays in
    (0, initial], traversability in [0,1], valid fraction sane, and drift
    scalars bounded — i.e. no slow NaN/overflow creep over hundreds of
    updates (the reference runs indefinitely on a robot)."""
    import jax.numpy as jnp

    from elevation_mapping_cupy_tpu import core, init_state
    from elevation_mapping_cupy_tpu.nn.traversability import default_weights

    cfg = MapConfig(resolution=0.1, map_length=3.0, max_ray_length=1.0,
                    max_points=2048, enable_drift_compensation=True)
    w = default_weights()
    state = init_state(cfg)
    n = cfg.max_points
    pos = np.zeros(3, np.float32)
    for i in range(200):
        pos[:2] += rng.uniform(-0.08, 0.08, 2).astype(np.float32)
        pts = rng.uniform(-1.4, 1.4, (n, 3)).astype(np.float32)
        pts[:, 2] = (0.05 * np.sin(pts[:, 0] * 2.0)
                     + rng.normal(0, 0.01, n)).astype(np.float32)
        state = core.move_to(state, jnp.asarray(pos), jnp.eye(3), cfg)
        state = core.update_pointcloud(
            state, jnp.asarray(pts), jnp.ones(n, bool), jnp.eye(3),
            jnp.asarray([pos[0], pos[1], 0.6], jnp.float32),
            jnp.float32(0.01), jnp.float32(0.005), w, cfg,
        )
    layers = np.asarray(state.layers)
    assert np.isfinite(layers).all(), "non-finite values crept into the map"
    var = layers[1]
    assert (var > 0).all() and (var <= cfg.initial_variance + 1e-3).all()
    trav = layers[3]
    assert (trav >= 0).all() and (trav <= 1.0 + 1e-5).all()
    valid_frac = float((layers[2] > 0.5).mean())
    assert 0.05 < valid_frac <= 1.0
    assert np.isfinite(float(state.mean_error))
    assert abs(float(state.mean_error)) < 1.0


def test_turnkey_parity_cli(tmp_path, rng):
    """VERDICT r3 item 7: one-command real-log parity. Round-trips a raw
    PointCloud2-style dump through the converter (native deinterleave), the
    exact-raycast replay, a layer dump, and the diff — self-diff must be
    parity_ok (exit 0); a perturbed reference must fail (exit 1)."""
    from elevation_mapping_cupy_tpu import replay as cli

    # synthetic RAW PointCloud2 dump: 3 frames, xyz + intensity, 20-byte
    # records with a 4-byte pad to exercise non-contiguous offsets
    n_frames, n_pts, step = 3, 400, 20
    raw = {"n_frames": np.int64(n_frames),
           "channels": np.array(["x", "y", "z", "intensity"], dtype=object)}
    for i in range(n_frames):
        pts = rng.uniform(-0.9, 0.9, (n_pts, 3)).astype(np.float32)
        pts[:, 2] = rng.uniform(-0.1, 0.2, n_pts)
        pts[0] = np.nan  # the reference's NaN-skip path
        inten = rng.uniform(0, 1, (n_pts, 1)).astype(np.float32)
        buf = np.zeros((n_pts, step // 4), np.float32)
        buf[:, 0:3] = pts
        buf[:, 4] = inten[:, 0]
        raw[f"f{i}_data"] = buf.view(np.uint8).reshape(-1)
        raw[f"f{i}_n_points"] = np.int64(n_pts)
        raw[f"f{i}_point_step"] = np.int64(step)
        raw[f"f{i}_offsets"] = np.array([0, 4, 8, 16], np.int64)
        raw[f"f{i}_R"] = np.eye(3, dtype=np.float32)
        raw[f"f{i}_t"] = np.array([0, 0, 0.5], np.float32)
        raw[f"f{i}_position"] = np.array([0.01 * i, 0, 0], np.float32)
        raw[f"f{i}_stamp"] = np.float64(0.1 * i)
    raw_path = str(tmp_path / "raw.npz")
    np.savez_compressed(raw_path, **raw)

    log_path = str(tmp_path / "log.npz")
    out_path = str(tmp_path / "mine.npz")
    cfg_yaml = str(tmp_path / "cfg.yaml")
    with open(cfg_yaml, "w") as f:
        f.write("resolution: 0.1\nmap_length: 2.0\nmax_ray_length: 0.5\n"
                "max_points: 1024\n")

    rc = cli.main(["--from-pointcloud2", raw_path, "--save-log", log_path,
                   "--config", cfg_yaml, "--out", out_path,
                   "--layers", "elevation,is_valid"])
    assert rc == 0
    z = np.load(log_path, allow_pickle=True)
    assert int(z["n_frames"]) == n_frames
    assert z["f0_points"].shape[1] == 4      # xyz + intensity
    assert z["f0_points"].shape[0] == n_pts - 1   # NaN row dropped

    # self-diff: parity_ok, exit 0
    rc = cli.main(["--log", log_path, "--config", cfg_yaml,
                   "--diff-against", out_path, "--summary-only",
                   "--layers", "elevation,is_valid"])
    assert rc == 0

    # perturbed reference: must fail
    ref = dict(np.load(out_path, allow_pickle=True))
    ref["f1_elevation"] = ref["f1_elevation"] + 0.05
    bad_path = str(tmp_path / "bad.npz")
    np.savez_compressed(bad_path, **ref)
    rc = cli.main(["--log", log_path, "--config", cfg_yaml,
                   "--diff-against", bad_path, "--summary-only",
                   "--layers", "elevation,is_valid"])
    assert rc == 1
