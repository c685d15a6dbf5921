"""Core pointcloud-update pipeline vs the loop-based NumPy golden."""

import numpy as np
import jax.numpy as jnp
import pytest

from elevation_mapping_cupy_tpu import MapConfig, init_state
from elevation_mapping_cupy_tpu import core
from elevation_mapping_cupy_tpu.nn.traversability import TravWeights
from elevation_mapping_cupy_tpu.ops.geometry import associate_points

from .golden import reference_numpy as gold


# exact raycast: these tests pin the reference-parity semantics against the
# loop-based golden; the polar production path is covered by test_raycast_modes
CFG = MapConfig(
    resolution=0.1, map_length=3.0, max_ray_length=1.0, max_points=4096,
    raycast_mode="exact",
)


def make_cloud(rng, n, spread=1.2, z=0.4):
    pts = rng.uniform(-spread, spread, size=(n, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(-0.1, z, size=n).astype(np.float32)
    return pts


def make_weights(rng):
    return TravWeights(
        w1=jnp.asarray(rng.normal(0, 0.3, (4, 1, 3, 3)), jnp.float32),
        w2=jnp.asarray(rng.normal(0, 0.3, (4, 1, 3, 3)), jnp.float32),
        w3=jnp.asarray(rng.normal(0, 0.3, (4, 1, 3, 3)), jnp.float32),
        w_out=jnp.asarray(rng.normal(0, 0.3, (1, 12, 1, 1)), jnp.float32),
    )


def pad(points, n_max):
    n = len(points)
    out = np.zeros((n_max, 3), np.float32)
    out[:n] = points
    mask = np.zeros(n_max, bool)
    mask[:n] = True
    return out, mask


def test_association_matches_golden(rng):
    pts = make_cloud(rng, 500)
    R = np.eye(3, dtype=np.float32)
    t = np.array([0.0, 0.0, 0.5], np.float32)
    world, noise, idx, valid, inside = gold.associate(pts, R, t, CFG)

    padded, mask = pad(pts, 512)
    assoc = associate_points(
        jnp.asarray(padded), jnp.asarray(mask), jnp.asarray(R), jnp.asarray(t), CFG
    )
    np.testing.assert_allclose(np.asarray(assoc.world)[:500], world, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(assoc.flat_idx)[:500], idx)
    np.testing.assert_array_equal(np.asarray(assoc.valid)[:500], valid)
    np.testing.assert_array_equal(np.asarray(assoc.inside)[:500], inside)


def run_both(rng, n_updates=2, n_pts=1500, with_time=True):
    weights = make_weights(rng)
    wnp = tuple(np.asarray(w) for w in weights)

    state = init_state(CFG)
    gstate = gold.GoldenState(
        m=np.asarray(state.layers).copy(), normal=np.asarray(state.normal).copy()
    )

    R = np.eye(3, dtype=np.float32)
    for it in range(n_updates):
        pts = make_cloud(rng, n_pts)
        t = np.array([0.1 * it, -0.05 * it, 0.5], np.float32)
        padded, mask = pad(pts, CFG.max_points)
        state = core.update_pointcloud(
            state,
            jnp.asarray(padded),
            jnp.asarray(mask),
            jnp.asarray(R),
            jnp.asarray(t),
            jnp.float32(0.2),
            jnp.float32(0.0),
            weights,
            CFG,
        )
        gstate, _ = gold.update_pointcloud(
            gstate, pts, R, t, 0.2, 0.0, CFG, weights=wnp
        )
        if with_time:
            for _ in range(6):
                state = core.update_time(state, CFG)
                gstate.m[4] += CFG.time_interval
            state = core.update_variance(state, CFG)
            gstate.m[1] += CFG.time_variance * gstate.m[2]
    return state, gstate


@pytest.mark.parametrize("n_updates", [1, 3])
def test_update_matches_golden(rng, n_updates):
    state, gstate = run_both(rng, n_updates=n_updates)
    got = np.asarray(state.layers)
    want = gstate.m
    # elevation, variance, validity
    np.testing.assert_allclose(got[0], want[0], atol=2e-4)
    np.testing.assert_allclose(got[1], want[1], atol=2e-4)
    np.testing.assert_allclose(got[2], want[2], atol=2e-4)
    # traversability (CNN on dilated upper bound)
    np.testing.assert_allclose(got[3], want[3], atol=5e-4)
    # time / upper bound layers
    np.testing.assert_allclose(got[4], want[4], atol=1e-5)
    np.testing.assert_allclose(got[5], want[5], atol=2e-4)
    np.testing.assert_allclose(got[6], want[6], atol=1e-5)
    # normals
    np.testing.assert_allclose(np.asarray(state.normal), gstate.normal, atol=5e-4)
    assert np.isclose(float(state.mean_error), gstate.mean_error, atol=1e-5)


def test_raycast_actually_fires(rng):
    """After the time layer ages, occluded cells must lose validity."""
    cfg = CFG.replace(enable_drift_compensation=False)
    weights = make_weights(rng)
    state = init_state(cfg)
    R = np.eye(3, dtype=np.float32)
    t = np.array([0.0, 0.0, 0.6], np.float32)

    # 1) a tall block of points near the center
    pts = make_cloud(rng, 2000, spread=1.0, z=0.3)
    padded, mask = pad(pts, cfg.max_points)
    state = core.update_pointcloud(
        state, jnp.asarray(padded), jnp.asarray(mask), jnp.asarray(R), jnp.asarray(t),
        jnp.float32(0.0), jnp.float32(0.0), weights, cfg,
    )
    valid_before = np.asarray(state.layers[2]).sum()
    assert valid_before > 50

    for _ in range(12):
        state = core.update_time(state, cfg)

    # 2) ground-level points far away: rays pass through the old cells
    pts2 = make_cloud(rng, 2000, spread=1.2, z=0.0)
    pts2[:, 2] = -0.55  # below sensor → rays cross previously-seen cells
    padded, mask = pad(pts2, cfg.max_points)
    state2 = core.update_pointcloud(
        state, jnp.asarray(padded), jnp.asarray(mask), jnp.asarray(R), jnp.asarray(t),
        jnp.float32(0.0), jnp.float32(0.0), weights, cfg,
    )
    assert np.isfinite(np.asarray(state2.layers)).all()
    # the raycast must actually DECREMENT validity somewhere: compare the
    # validity layer against a run with visibility cleanup disabled — the
    # only difference is the raycast's dec_valid/outlier_variance writes
    state_nc = core.update_pointcloud(
        state, jnp.asarray(padded), jnp.asarray(mask), jnp.asarray(R), jnp.asarray(t),
        jnp.float32(0.0), jnp.float32(0.0), weights,
        cfg.replace(enable_visibility_cleanup=False),
    )
    dec = np.asarray(state_nc.layers[2]) - np.asarray(state2.layers[2])
    assert dec.max() > cfg.cleanup_step - 1e-6, "raycast never fired"
    assert (dec >= -1e-6).all()  # cleanup only ever lowers validity


def test_move_to_shifts_map(rng):
    state = init_state(CFG)
    state = state._replace(layers=state.layers.at[0, 5, 5].set(1.5).at[2, 5, 5].set(1.0))
    R = jnp.eye(3)
    state2 = core.move_to(state, jnp.asarray([0.2, 0.0, 0.1]), R, CFG)
    # shift of +0.2m at 0.1m res = 2 cells; row index decreases by 2
    got = np.asarray(state2.layers)
    assert got[0, 3, 5] == pytest.approx(1.5 - 0.1, abs=1e-6)
    assert got[2, 3, 5] == 1.0
    assert got[2, 5, 5] == 0.0
    np.testing.assert_allclose(np.asarray(state2.center), [0.2, 0.0, 0.1], atol=1e-6)


def _golden_move_to(gstate, center, position, cfg):
    """NumPy mirror of core.move_to (elevation_mapping.py:154-170 semantics):
    integer-cell roll with border reset (variance -> initial_variance),
    z handled additively on elevation + upper_bound."""
    # mirror the engine's f32 arithmetic: at exact half-cell boundaries
    # f32 vs f64 round-half-even can differ by one cell
    delta = np.asarray(position, np.float32) - center.astype(np.float32)
    delta_pixel = np.round(delta[:2] / np.float32(cfg.resolution)).astype(int)
    center = center.copy()
    center[:2] += delta_pixel * cfg.resolution
    center[2] += delta[2]
    s0, s1 = -delta_pixel[0], -delta_pixel[1]
    m = np.roll(gstate.m, (s0, s1), axis=(1, 2))
    n = cfg.cell_n

    def revealed(shift, size):
        mask = np.zeros(size, bool)
        if shift > 0:
            mask[:shift] = True
        elif shift < 0:
            mask[shift:] = True
        return mask

    row_mask = revealed(s0, n)[:, None] | revealed(s1, n)[None, :]
    for k in range(7):
        m[k][row_mask] = cfg.initial_variance if k == 1 else 0.0
    m[0] -= np.float32(delta[2])
    m[5] -= np.float32(delta[2])
    gstate.m = m
    return gstate, center


def test_trajectory_with_recentering_matches_golden(rng):
    """Multi-frame trajectory: update -> move_to -> update ... against the
    NumPy oracle (catches state-threading / centering bugs the single-shot
    golden cannot)."""
    weights = make_weights(rng)
    wnp = tuple(np.asarray(w) for w in weights)

    state = init_state(CFG)
    gstate = gold.GoldenState(
        m=np.asarray(state.layers).copy(), normal=np.asarray(state.normal).copy()
    )
    gcenter = np.zeros(3)
    R = np.eye(3, dtype=np.float32)

    for it in range(4):
        # robot walks diagonally; sensor above the robot
        robot = np.array([0.23 * it, -0.17 * it, 0.02 * it], np.float64)
        t = (robot + [0.0, 0.0, 0.5]).astype(np.float32)
        pts = make_cloud(rng, 1200)
        pts[:, :2] += robot[:2].astype(np.float32)  # terrain around the robot

        padded, mask = pad(pts, CFG.max_points)
        state = core.update_pointcloud(
            state, jnp.asarray(padded), jnp.asarray(mask), jnp.asarray(R),
            jnp.asarray(t), jnp.float32(0.2), jnp.float32(0.0), weights, CFG,
        )
        # golden works in the map-center frame: sensor-frame points are
        # unchanged, the translation shifts by the full 3D center
        gstate, _ = gold.update_pointcloud(
            gstate, pts, R, t - gcenter.astype(np.float32), 0.2, 0.0, CFG,
            weights=wnp,
        )

        state = core.move_to(state, jnp.asarray(robot, jnp.float32), jnp.asarray(R), CFG)
        gstate, gcenter = _golden_move_to(gstate, gcenter, robot, CFG)
        # golden normal is not shifted (matches engine: normals refresh on update)
        gstate.normal = np.asarray(state.normal).copy()

    got = np.asarray(state.layers)
    np.testing.assert_allclose(
        np.asarray(state.center), gcenter.astype(np.float32), atol=1e-5
    )
    for k, atol in [(0, 3e-4), (1, 3e-4), (2, 3e-4), (4, 1e-5), (5, 3e-4), (6, 1e-5)]:
        np.testing.assert_allclose(got[k], gstate.m[k], atol=atol, err_msg=f"layer {k}")
