"""Regenerate tests/fixtures/recorded_map_v1.npz — the pinned-output
regression fixture (a tamper detector for fusion/raycast refactors).

Run from the repo root:  python -m tests.make_recorded_fixture

The fixture is the engine's CPU float32 output for a fully deterministic
3-frame update at a pinned config (exact raycast, shipped traversability
weights, seed 20240817). test_recorded_fixture replays the same inputs and
requires byte-level agreement within 1e-5 — any semantic drift in
association, fusion, raycast, dilation or the CNN shows up as a diff.
"""

import os

# the fixture pins the CPU backend's float32 output (tests run on CPU)
os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "recorded_map_v1.npz")
FIXTURE_DEPLOYED = os.path.join(
    os.path.dirname(__file__), "fixtures", "recorded_map_deployed_v1.npz"
)
SEED = 20240817


def pinned_config():
    from elevation_mapping_cupy_tpu import MapConfig

    return MapConfig(
        resolution=0.1,
        map_length=3.0,
        max_ray_length=1.0,
        max_points=4096,
        raycast_mode="exact",
    )


def deployed_config():
    """The reference's DEPLOYED operating point (core_param.yaml values that
    differ from the dataclass defaults) at a small map: the 10 m-ray exact
    regime the first fixture doesn't cover."""
    from elevation_mapping_cupy_tpu import MapConfig

    return MapConfig(
        resolution=0.1,
        map_length=3.0,
        max_ray_length=10.0,
        max_points=4096,
        raycast_mode="exact",
        initial_variance=1000.0,
        initialized_variance=1000.0,
        max_variance=100.0,
        cleanup_step=0.1,
        dilation_size=3,
    )


def run_pinned(cfg_factory=None):
    import jax.numpy as jnp

    import elevation_mapping_cupy_tpu
    from elevation_mapping_cupy_tpu import core, init_state
    from elevation_mapping_cupy_tpu.nn.traversability import load_weights_npz

    cfg = (cfg_factory or pinned_config)()
    weights = load_weights_npz(
        os.path.join(
            os.path.dirname(elevation_mapping_cupy_tpu.__file__),
            "data", "traversability_weights.npz",
        )
    )
    rng = np.random.default_rng(SEED)
    state = init_state(cfg)
    R = np.eye(3, dtype=np.float32)
    for it in range(3):
        pts = rng.uniform(-1.2, 1.2, size=(1500, 3)).astype(np.float32)
        pts[:, 2] = rng.uniform(-0.1, 0.4, size=1500).astype(np.float32)
        t = np.array([0.1 * it, -0.05 * it, 0.5], np.float32)
        padded = np.zeros((cfg.max_points, 3), np.float32)
        padded[: len(pts)] = pts
        mask = np.zeros(cfg.max_points, bool)
        mask[: len(pts)] = True
        state = core.update_pointcloud(
            state, jnp.asarray(padded), jnp.asarray(mask), jnp.asarray(R),
            jnp.asarray(t), jnp.float32(0.2), jnp.float32(0.0), weights, cfg,
        )
        state = core.update_time(state, cfg)
        state = core.update_variance(state, cfg)
    return np.asarray(state.layers), np.asarray(state.normal)


def main():
    layers, normal = run_pinned()
    np.savez_compressed(FIXTURE, layers=layers, normal=normal, seed=SEED)
    print(f"wrote {FIXTURE}: layers {layers.shape}, normal {normal.shape}")
    layers, normal = run_pinned(deployed_config)
    np.savez_compressed(FIXTURE_DEPLOYED, layers=layers, normal=normal, seed=SEED)
    print(f"wrote {FIXTURE_DEPLOYED}: layers {layers.shape}, normal {normal.shape}")


if __name__ == "__main__":
    main()
