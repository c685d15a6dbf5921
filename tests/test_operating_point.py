"""Parity at the reference's DEPLOYED operating point.

The reference's shipped core_param.yaml differs hugely from its dataclass
defaults (initial_variance 1000 vs 10, max_variance 100 vs 1,
max_ray_length 10 m vs 2 m, cleanup_step 0.1 vs 0.01, dilation_size 3,
wall_num_thresh 20, ...). These tests (a) pin the YAML loader's behavior on
a verbatim transcription of that file — including its misspelled
``drift_compensation_variance_inler`` key and the unknown-key warning —
and (b) run the golden pipeline AT that operating point in exact raycast
mode (the long-ray regime: ~353 scan steps at 0.04 m resolution, and
cleanup_step scaled by max_ray_length/ray_length gives much larger validity
decrements for nearby rays).

Reference: elevation_mapping_cupy/config/core/core_param.yaml,
src/elevation_mapping_wrapper.cpp:45-77, kernels/custom_kernels.py:198-259.
"""

import os
import warnings

import numpy as np
import jax.numpy as jnp
import pytest

from elevation_mapping_cupy_tpu import (
    MapConfig,
    init_state,
    load_config,
    load_config_with_extras,
)
from elevation_mapping_cupy_tpu import core

from .golden import reference_numpy as gold
from .test_core_update import make_cloud, make_weights, pad

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "reference_core_param.yaml")
SHIPPED = os.path.join(os.path.dirname(__file__), "..", "configs", "core_param.yaml")

# the deployed values that differ from the dataclass defaults
DEPLOYED = dict(
    initial_variance=1000.0,
    max_variance=100.0,
    time_variance=0.0001,
    max_ray_length=10.0,
    cleanup_step=0.1,
    cleanup_cos_thresh=0.1,
    dilation_size=3,
    wall_num_thresh=20.0,
    traversability_inlier=0.9,
    drift_compensation_alpha=0.1,
    min_valid_distance=0.5,
    position_noise_thresh=0.01,
    orientation_noise_thresh=0.01,
    safe_thresh=0.7,
    safe_min_thresh=0.4,
    max_unsafe_n=10,
    use_only_above_for_upper_bound=False,
)


def test_loader_reads_deployed_values():
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # only the EXPECTED warning may fire
        with pytest.warns(UserWarning, match="misspelling"):
            cfg, extras = load_config_with_extras(FIXTURE)
    for k, v in DEPLOYED.items():
        got = getattr(cfg, k)
        assert got == pytest.approx(v), f"{k}: {got} != {v}"
    # the misspelled key is applied to the correct field
    assert cfg.drift_compensation_variance_inlier == pytest.approx(0.05)
    # ROS-layer keys land in extras, silently
    assert extras["map_frame"] == "odom"
    assert extras["update_pose_fps"] == pytest.approx(10.0)
    assert extras["initialize_method"] == "linear"
    assert cfg.cell_n == 202


def test_loader_warns_on_unknown_key(tmp_path):
    p = tmp_path / "typo.yaml"
    p.write_text("resolution: 0.05\nmax_ray_legnth: 5.0\n")
    with pytest.warns(UserWarning, match="max_ray_legnth"):
        cfg = load_config(str(p))
    assert cfg.resolution == 0.05
    assert cfg.max_ray_length == MapConfig().max_ray_length  # typo not applied


def test_shipped_config_is_deployed_operating_point():
    cfg = load_config(SHIPPED)
    for k, v in DEPLOYED.items():
        assert getattr(cfg, k) == pytest.approx(v), k
    assert cfg.drift_compensation_variance_inlier == pytest.approx(0.05)


def deployed_small_cfg():
    """Deployed operating point on a small map (same raycast regime: 0.04 m
    resolution, 10 m max ray → 353 scan steps, exact mode)."""
    cfg = load_config(FIXTURE)
    return cfg.replace(map_length=2.0, max_points=4096, raycast_mode="exact")


def test_golden_parity_at_deployed_operating_point(rng):
    cfg = deployed_small_cfg()
    assert cfg.n_ray_steps == 353  # the long-ray regime VERDICT flagged
    weights = make_weights(rng)
    wnp = tuple(np.asarray(w) for w in weights)

    state = init_state(cfg)
    gstate = gold.GoldenState(
        m=np.asarray(state.layers).copy(), normal=np.asarray(state.normal).copy()
    )
    R = np.eye(3, dtype=np.float32)
    for it in range(3):
        pts = make_cloud(rng, 900, spread=0.9, z=0.4)
        t = np.array([0.05 * it, -0.03 * it, 0.6], np.float32)
        padded, mask = pad(pts, cfg.max_points)
        state = core.update_pointcloud(
            state, jnp.asarray(padded), jnp.asarray(mask), jnp.asarray(R),
            jnp.asarray(t), jnp.float32(0.2), jnp.float32(0.0), weights, cfg,
        )
        gstate, _ = gold.update_pointcloud(
            gstate, pts, R, t, 0.2, 0.0, cfg, weights=wnp
        )
        for _ in range(6):
            state = core.update_time(state, cfg)
            gstate.m[4] += cfg.time_interval
        state = core.update_variance(state, cfg)
        gstate.m[1] += cfg.time_variance * gstate.m[2]

    got = np.asarray(state.layers)
    want = gstate.m
    # absolute scales are much larger here (variance up to 1000) — tolerances
    # scale with the layer magnitude
    np.testing.assert_allclose(got[0], want[0], atol=2e-4)     # elevation
    np.testing.assert_allclose(got[1], want[1], rtol=1e-5, atol=2e-3)  # variance
    np.testing.assert_allclose(got[2], want[2], atol=2e-4)     # validity
    np.testing.assert_allclose(got[3], want[3], atol=5e-4)     # traversability
    np.testing.assert_allclose(got[4], want[4], atol=1e-5)     # time
    np.testing.assert_allclose(got[5], want[5], atol=2e-4)     # upper bound
    np.testing.assert_allclose(got[6], want[6], atol=1e-5)
    assert np.isclose(float(state.mean_error), gstate.mean_error, atol=1e-5)
    # (the deployed cleanup_step scaling itself is pinned by
    # test_deployed_cleanup_decrements_are_scaled below)


def test_deployed_cleanup_decrements_are_scaled(rng):
    """cleanup_step/(ray_length/max_ray_length) with max_ray_length=10 and
    ~1 m rays gives per-hit decrements ~10x cleanup_step — pin that the
    engine's exact path reproduces the golden's big negative validity."""
    cfg = deployed_small_cfg().replace(enable_drift_compensation=False)
    weights = make_weights(rng)
    state = init_state(cfg)
    R = np.eye(3, dtype=np.float32)
    t = np.array([0.0, 0.0, 0.6], np.float32)

    pts = make_cloud(rng, 1200, spread=0.8, z=0.3)
    padded, mask = pad(pts, cfg.max_points)
    state = core.update_pointcloud(
        state, jnp.asarray(padded), jnp.asarray(mask), jnp.asarray(R),
        jnp.asarray(t), jnp.float32(0.0), jnp.float32(0.0), weights, cfg,
    )
    for _ in range(12):
        state = core.update_time(state, cfg)

    pts2 = make_cloud(rng, 1200, spread=0.95, z=0.0)
    pts2[:, 2] = -0.55
    padded, mask = pad(pts2, cfg.max_points)
    state2 = core.update_pointcloud(
        state, jnp.asarray(padded), jnp.asarray(mask), jnp.asarray(R),
        jnp.asarray(t), jnp.float32(0.0), jnp.float32(0.0), weights, cfg,
    )
    before = np.asarray(state.layers[2])
    after = np.asarray(state2.layers[2])
    dec = before - after
    # decrement per raycast hit is >= cleanup_step * (max_ray / ray) >= 0.1;
    # with several rays crossing a cell the drop is large
    assert dec.max() > 0.5, f"max validity decrement {dec.max()}"
