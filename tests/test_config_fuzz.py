"""Config-fuzz sweep: engine vs the NumPy oracle at random operating points.

The two hand-picked golden configs (defaults + the deployed YAML) cannot
cover interactions between the ~60 tunables (wall_num_thresh x cleanup
scaling x drift gating x upper-bound flags, parameter.py:137-226). This
sweep samples N random small-map configs over every oracle-consumed field,
forces exact raycast (the oracle's semantics), and requires the jitted
engine to match the loop-based oracle at golden tolerances on a 2-frame
trajectory with a rotated sensor and per-frame drift noises.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from elevation_mapping_cupy_tpu import MapConfig, init_state
from elevation_mapping_cupy_tpu import core
from elevation_mapping_cupy_tpu.nn.traversability import TravWeights

from .golden import reference_numpy as gold

N_CONFIGS = 50


def _sample_cfg(rng) -> MapConfig:
    u = rng.uniform
    return MapConfig(
        resolution=0.1,
        map_length=1.4,                      # cell_n = 16: compile stays small
        max_points=256,
        raycast_mode="exact",                # the oracle's semantics
        raycast_exact_impl=rng.choice(["scan", "flat", "gated"]),
        raycast_flat_chunk=int(rng.choice([1024, 4096])),
        sensor_noise_factor=float(10 ** u(-3, -0.7)),
        mahalanobis_thresh=float(u(1.0, 4.0)),
        outlier_variance=float(u(0.001, 0.2)),
        drift_compensation_variance_inlier=float(u(0.01, 1.0)),
        time_variance=float(u(0.001, 0.1)),
        max_variance=float(u(0.5, 100.0)),
        initial_variance=float(u(1.0, 1000.0)),
        initialized_variance=float(u(1.0, 1000.0)),
        dilation_size=int(rng.integers(1, 4)),
        wall_num_thresh=float(rng.choice([2.0, 10.0, 100.0])),
        enable_drift_compensation=bool(rng.random() < 0.7),
        max_drift=float(u(0.01, 0.3)),
        drift_compensation_alpha=float(u(0.1, 1.0)),
        min_height_drift_cnt=float(rng.choice([5.0, 50.0, 100.0])),
        position_noise_thresh=float(rng.choice([0.01, 0.1])),
        orientation_noise_thresh=float(rng.choice([0.01, 0.1])),
        traversability_inlier=float(u(0.05, 0.9)),
        enable_visibility_cleanup=bool(rng.random() < 0.8),
        max_ray_length=float(u(0.35, 1.0)),
        cleanup_step=float(u(0.01, 0.5)),
        cleanup_cos_thresh=float(u(0.0, 0.9)),
        min_valid_distance=float(u(0.05, 0.4)),
        max_height_range=float(u(0.3, 1.5)),
        ramped_height_range_a=float(u(0.1, 0.6)),
        ramped_height_range_b=float(u(0.3, 1.5)),
        ramped_height_range_c=float(u(0.05, 0.5)),
        enable_edge_sharpen=bool(rng.random() < 0.7),
        enable_overlap_clearance=bool(rng.random() < 0.7),
        overlap_clear_range_xy=float(u(0.3, 2.0)),
        overlap_clear_range_z=float(u(0.1, 1.0)),
    )


def _small_rotation(rng) -> np.ndarray:
    ang = rng.uniform(-0.3, 0.3)
    c, s = np.cos(ang), np.sin(ang)
    yaw = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
    ang2 = rng.uniform(-0.15, 0.15)
    c2, s2 = np.cos(ang2), np.sin(ang2)
    pitch = np.array([[c2, 0, s2], [0, 1, 0], [-s2, 0, c2]], np.float32)
    return (yaw @ pitch).astype(np.float32)


@pytest.mark.parametrize("seed", range(N_CONFIGS))
def test_fuzzed_config_matches_oracle(seed):
    rng = np.random.default_rng(31_000 + seed)
    cfg = _sample_cfg(rng)

    weights = TravWeights(
        w1=jnp.asarray(rng.normal(0, 0.3, (4, 1, 3, 3)), jnp.float32),
        w2=jnp.asarray(rng.normal(0, 0.3, (4, 1, 3, 3)), jnp.float32),
        w3=jnp.asarray(rng.normal(0, 0.3, (4, 1, 3, 3)), jnp.float32),
        w_out=jnp.asarray(rng.normal(0, 0.3, (1, 12, 1, 1)), jnp.float32),
    )
    wnp = tuple(np.asarray(w) for w in weights)

    state = init_state(cfg)
    gstate = gold.GoldenState(
        m=np.asarray(state.layers).copy(), normal=np.asarray(state.normal).copy()
    )
    R = _small_rotation(rng)
    for it in range(2):
        n = int(rng.integers(100, 180))
        pts = rng.uniform(-0.75, 0.75, (n, 3)).astype(np.float32)
        pts[:, 2] = rng.uniform(-0.15, 0.35, n).astype(np.float32)
        t = np.array([0.05 * it, -0.03 * it, rng.uniform(0.3, 0.7)], np.float32)
        pn = float(rng.choice([0.0, 0.2]))
        on = float(rng.choice([0.0, 0.2]))
        padded = np.zeros((cfg.max_points, 3), np.float32)
        padded[:n] = pts
        mask = np.zeros(cfg.max_points, bool)
        mask[:n] = True
        state = core.update_pointcloud(
            state, jnp.asarray(padded), jnp.asarray(mask), jnp.asarray(R),
            jnp.asarray(t), jnp.float32(pn), jnp.float32(on), weights, cfg,
        )
        gstate, _ = gold.update_pointcloud(
            gstate, pts, R, t, pn, on, cfg, weights=wnp
        )
        for _ in range(int(rng.integers(0, 5))):
            state = core.update_time(state, cfg)
            gstate.m[4] += cfg.time_interval
        state = core.update_variance(state, cfg)
        gstate.m[1] = (
            gstate.m[1] + np.float32(cfg.time_variance) * gstate.m[2]
        ).astype(np.float32)

    got = np.asarray(state.layers)
    want = gstate.m
    kw = dict(atol=2e-4, rtol=1e-5, err_msg=f"seed {seed} cfg {cfg}")
    np.testing.assert_allclose(got[0], want[0], **kw)     # elevation
    np.testing.assert_allclose(got[1], want[1], **kw)     # variance
    np.testing.assert_allclose(got[2], want[2], **kw)     # validity
    np.testing.assert_allclose(got[3], want[3], atol=5e-4,
                               err_msg=f"seed {seed} traversability")
    np.testing.assert_allclose(got[4], want[4], atol=1e-5)
    np.testing.assert_allclose(got[5], want[5], **kw)     # upper bound
    np.testing.assert_allclose(got[6], want[6], atol=1e-5)
    np.testing.assert_allclose(np.asarray(state.normal), gstate.normal, atol=5e-4)
    assert np.isclose(float(state.mean_error), gstate.mean_error, atol=1e-5)
