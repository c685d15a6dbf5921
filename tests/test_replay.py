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
