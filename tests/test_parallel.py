"""Batched stepping + mesh sharding + halo exchange on the 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from elevation_mapping_cupy_tpu import MapConfig, init_state
from elevation_mapping_cupy_tpu import core
from elevation_mapping_cupy_tpu.nn.traversability import default_weights
from elevation_mapping_cupy_tpu.ops import stencil
from elevation_mapping_cupy_tpu.parallel import (
    batch_stats,
    batched_update,
    init_batch,
    make_mesh,
    shard_states,
)
from elevation_mapping_cupy_tpu.parallel.halo import sharded_uniform_smooth

CFG = MapConfig(resolution=0.1, map_length=2.0, max_ray_length=0.5, max_points=512)


def make_batch_inputs(rng, B, n):
    pts = rng.uniform(-0.9, 0.9, (B, n, 3)).astype(np.float32)
    pts[..., 2] = rng.uniform(-0.1, 0.3, (B, n)).astype(np.float32)
    mask = np.ones((B, n), bool)
    R = np.broadcast_to(np.eye(3, dtype=np.float32), (B, 3, 3)).copy()
    t = np.tile(np.array([0, 0, 0.5], np.float32), (B, 1))
    z = np.zeros((B,), np.float32)
    return pts, mask, R, t, z


def test_batched_matches_sequential(rng):
    B = 4
    w = default_weights()
    pts, mask, R, t, z = make_batch_inputs(rng, B, CFG.max_points)
    states = init_batch(CFG, B)
    out = batched_update(
        states, jnp.asarray(pts), jnp.asarray(mask), jnp.asarray(R),
        jnp.asarray(t), jnp.asarray(z), jnp.asarray(z), w, CFG,
    )
    for b in range(B):
        single = core.update_pointcloud(
            init_state(CFG), jnp.asarray(pts[b]), jnp.asarray(mask[b]),
            jnp.asarray(R[b]), jnp.asarray(t[b]), jnp.float32(0), jnp.float32(0),
            w, CFG,
        )
        np.testing.assert_allclose(
            np.asarray(out.layers[b]), np.asarray(single.layers), atol=1e-5
        )


def test_sharded_batched_update_runs():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    mesh = make_mesh((8,), ("env",))
    B = 8
    rng = np.random.default_rng(0)
    w = default_weights()
    pts, mask, R, t, z = make_batch_inputs(rng, B, CFG.max_points)
    states = shard_states(init_batch(CFG, B), mesh, "env")

    def put(x, spec):
        return jax.device_put(jnp.asarray(x), NamedSharding(mesh, spec))

    out = batched_update(
        states,
        put(pts, P("env", None, None)),
        put(mask, P("env", None)),
        put(R, P("env", None, None)),
        put(t, P("env", None)),
        put(z, P("env")),
        put(z, P("env")),
        w,
        CFG,
    )
    jax.block_until_ready(out)
    # state stays sharded over env
    assert len(out.layers.sharding.device_set) == 8
    stats = batch_stats(out)
    assert 0.0 < float(stats["frac_valid_mean"]) < 1.0


def test_halo_smooth_matches_unsharded(rng):
    mesh = make_mesh((8,), ("env",))
    x = rng.normal(0, 1, (64, 128)).astype(np.float32)
    smooth = sharded_uniform_smooth(mesh, passes=2, size=3, axis_name="env")
    got = np.asarray(jax.jit(smooth)(jnp.asarray(x)))
    want = np.asarray(stencil.uniform_smooth(jnp.asarray(x), passes=2, size=3))
    # full equality including the global border rows: symmetric edge halos
    # evolve exactly like the unsharded reflect padding
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_spatial_sharding_matches_unsharded(rng):
    """One large map row-sharded over 8 devices: GSPMD result == single-device."""
    from elevation_mapping_cupy_tpu.parallel.spatial import (
        shard_state_spatial, spatial_update_pointcloud,
    )
    from elevation_mapping_cupy_tpu import init_state

    cfg = MapConfig(resolution=0.1, map_length=6.2, max_ray_length=0.5, max_points=2048)
    assert cfg.cell_n % 8 == 0 or True  # GSPMD handles uneven shards too
    mesh = make_mesh((8,), ("x",))
    w = default_weights()
    pts = rng.uniform(-2.9, 2.9, (2048, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(-0.1, 0.3, 2048).astype(np.float32)
    mask = np.ones(2048, bool)
    R = np.eye(3, dtype=np.float32)
    t = np.array([0, 0, 0.5], np.float32)

    ref = core.update_pointcloud(
        init_state(cfg), jnp.asarray(pts), jnp.asarray(mask), jnp.asarray(R),
        jnp.asarray(t), jnp.float32(0), jnp.float32(0), w, cfg,
    )

    step = spatial_update_pointcloud(mesh, cfg, "x")
    state = shard_state_spatial(init_state(cfg), mesh, "x")
    out = step(state, jnp.asarray(pts), jnp.asarray(mask), jnp.asarray(R),
               jnp.asarray(t), jnp.float32(0), jnp.float32(0), w)
    jax.block_until_ready(out)
    assert len(out.layers.sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(out.layers), np.asarray(ref.layers), atol=1e-5)

    # recentering crosses shard boundaries (roll → collective permute)
    moved = core.move_to(out, jnp.asarray([0.5, -0.3, 0.1]), jnp.eye(3), cfg)
    ref_moved = core.move_to(ref, jnp.asarray([0.5, -0.3, 0.1]), jnp.eye(3), cfg)
    np.testing.assert_allclose(
        np.asarray(moved.layers), np.asarray(ref_moved.layers), atol=1e-5
    )


def test_distributed_helpers_single_process(rng):
    """distributed module degrades to single-process: mesh shape, local
    slice, and HostFeed globalize produce a correctly sharded batch."""
    from elevation_mapping_cupy_tpu.parallel import distributed as dist

    assert dist.initialize() is False  # no coordinator configured
    mesh = dist.pod_mesh(("host", "chip"))
    assert mesh.devices.shape == (1, 8)
    lo, hi = dist.process_local_slice(32)
    assert (lo, hi) == (0, 32)
    feed = dist.HostFeed(16, make_mesh((8,), ("host",)))
    local = rng.standard_normal((16, 5, 3)).astype(np.float32)
    arr = feed.globalize(local)
    assert len(arr.sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(arr), local)


def test_sharded_checkpoint_roundtrip(tmp_path, rng):
    """Sharded batched state -> orbax save -> restore onto the mesh:
    bit-exact round-trip, restored leaves land sharded."""
    from elevation_mapping_cupy_tpu.parallel import checkpoint as ckpt

    assert len(jax.devices()) >= 8
    mesh = make_mesh((8,), ("env",))
    B = 8
    w = default_weights()
    pts, mask, R, t, z = make_batch_inputs(rng, B, CFG.max_points)
    states = shard_states(init_batch(CFG, B), mesh, "env")

    def put(x, spec):
        return jax.device_put(jnp.asarray(x), NamedSharding(mesh, spec))

    out = batched_update(
        states, put(pts, P("env", None, None)), put(mask, P("env", None)),
        put(R, P("env", None, None)), put(t, P("env", None)),
        put(z, P("env")), put(z, P("env")), w, CFG,
    )
    jax.block_until_ready(out)

    path = str(tmp_path / "ckpt")
    ckpt.save(path, out)
    template = shard_states(init_batch(CFG, B), mesh, "env")
    back = ckpt.restore(path, template=template)

    for a, b in zip(jax.tree.leaves(out), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert len(back.layers.sharding.device_set) == 8
    # restore without a template also round-trips values
    back2 = ckpt.restore(path)
    np.testing.assert_array_equal(np.asarray(out.layers), np.asarray(back2.layers))


def test_sharded_scatter_matches_local(rng):
    """Shard-local scatter == single-device scatter, including the row-pad
    path (h=1026 over 8 shards pads to 1032 and slices back)."""
    from elevation_mapping_cupy_tpu.ops import scatter as sc
    from elevation_mapping_cupy_tpu.parallel.sharded_scatter import (
        sharded_scatter_add_streams_2d,
    )

    mesh = make_mesh((8,), ("x",))
    for h, w in ((1024, 1024), (1026, 1026)):
        n = 4096
        idx = rng.integers(0, h * w, n).astype(np.int32)
        mask = rng.random(n) < 0.9
        vals = [rng.normal(0, 1, n).astype(np.float32),
                rng.integers(0, 2, n).astype(np.float32)]
        exact = (False, True)
        ref = sc._scatter_add_streams_2d_local(
            h, w, jnp.asarray(idx), [jnp.asarray(v) for v in vals],
            jnp.asarray(mask), exact)
        out = sharded_scatter_add_streams_2d(
            h, w, jnp.asarray(idx), [jnp.asarray(v) for v in vals],
            jnp.asarray(mask), exact, mesh, "x")
        assert out.shape == (2, h, w)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_spatial_sharding_matches_unsharded_1024(rng):
    """Full update step at a 1024x1024 map (the scale where the unsharded
    MXU kernel stops fitting VMEM): shard-local scatter path == single
    device (VERDICT r1 item 5 done-when)."""
    from elevation_mapping_cupy_tpu.parallel.spatial import (
        shard_state_spatial, spatial_update_pointcloud,
    )
    from elevation_mapping_cupy_tpu import init_state

    cfg = MapConfig(resolution=0.1, map_length=102.2, max_ray_length=0.5,
                    max_points=8192)
    assert cfg.cell_n == 1024
    mesh = make_mesh((8,), ("x",))
    w = default_weights()
    pts = rng.uniform(-50, 50, (8192, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(-0.1, 0.3, 8192).astype(np.float32)
    mask = np.ones(8192, bool)
    R = np.eye(3, dtype=np.float32)
    t = np.array([0, 0, 0.5], np.float32)

    ref = core.update_pointcloud(
        init_state(cfg), jnp.asarray(pts), jnp.asarray(mask), jnp.asarray(R),
        jnp.asarray(t), jnp.float32(0), jnp.float32(0), w, cfg,
    )
    step = spatial_update_pointcloud(mesh, cfg, "x")
    state = shard_state_spatial(init_state(cfg), mesh, "x")
    out = step(state, jnp.asarray(pts), jnp.asarray(mask), jnp.asarray(R),
               jnp.asarray(t), jnp.float32(0), jnp.float32(0), w)
    jax.block_until_ready(out)
    assert len(out.layers.sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(out.layers), np.asarray(ref.layers),
                               atol=1e-5)


def test_spatial_semantic_matches_unsharded(rng):
    """Row-sharded update WITH semantic channels == single-device semantic
    update (the MEM scatters ride the shard-local path too)."""
    from elevation_mapping_cupy_tpu.parallel.spatial import (
        shard_state_spatial, spatial_update_pointcloud,
    )

    channels = ("rgb", "grass")
    cfg = MapConfig(resolution=0.1, map_length=2.2, max_ray_length=0.5,
                    max_points=512, semantic_layers=channels)
    assert cfg.cell_n % 8 == 0
    mesh = make_mesh((8,), ("x",))
    w = default_weights()
    n = cfg.max_points
    pts = rng.uniform(-0.9, 0.9, (n, 3 + 2)).astype(np.float32)
    pts[:, 2] = rng.uniform(-0.1, 0.3, n).astype(np.float32)
    rgbs = rng.integers(0, 255, (n, 3)).astype(np.uint32)
    pts[:, 3] = ((rgbs[:, 0] << 16) | (rgbs[:, 1] << 8) | rgbs[:, 2]).view(np.float32)
    pts[:, 4] = rng.uniform(0, 1, n).astype(np.float32)
    mask = np.ones(n, bool)
    R = np.eye(3, dtype=np.float32)
    t = np.array([0, 0, 0.5], np.float32)

    ref = core.update_pointcloud_semantic(
        init_state(cfg), jnp.asarray(pts), jnp.asarray(mask), jnp.asarray(R),
        jnp.asarray(t), jnp.float32(0), jnp.float32(0), w, cfg, channels,
    )
    step = spatial_update_pointcloud(mesh, cfg, "x", channels=channels)
    state = shard_state_spatial(init_state(cfg), mesh, "x")
    out = step(state, jnp.asarray(pts), jnp.asarray(mask), jnp.asarray(R),
               jnp.asarray(t), jnp.float32(0), jnp.float32(0), w)
    jax.block_until_ready(out)
    assert len(out.semantic.sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(out.layers), np.asarray(ref.layers),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.semantic), np.asarray(ref.semantic),
                               atol=1e-4)


@pytest.mark.parametrize("mesh_spec", [
    ((2, 4), ("env", "x"), None),          # fleet of row-sharded maps
    ((2, 2, 2), ("env", "x", "y"), "y"),   # fleet of 2D-tiled maps
])
def test_batched_spatial_matches_sequential(rng, mesh_spec):
    """Env batching COMPOSED with spatial sharding (BASELINE config #5
    literally): a batch of B maps on an (env, rows[, cols]) mesh must equal
    the per-env unsharded update."""
    from elevation_mapping_cupy_tpu.parallel.spatial import (
        batched_spatial_update_pointcloud, shard_states_spatial_batched,
    )

    shape, names, col_axis = mesh_spec
    mesh = make_mesh(shape, names)
    cfg = MapConfig(resolution=0.1, map_length=2.2, max_ray_length=0.5,
                    max_points=512)   # cell_n=24: divisible by 2 and 4
    B = 4
    w = default_weights()
    pts, mask, R, t, z = make_batch_inputs(rng, B, cfg.max_points)

    states = shard_states_spatial_batched(
        init_batch(cfg, B), mesh, "env", "x", col_axis)
    step = batched_spatial_update_pointcloud(mesh, cfg, "env", "x",
                                             col_axis=col_axis)
    out = step(states, jnp.asarray(pts), jnp.asarray(mask), jnp.asarray(R),
               jnp.asarray(t), jnp.asarray(z), jnp.asarray(z), w)
    jax.block_until_ready(out)
    assert len(out.layers.sharding.device_set) == 8
    for b in range(B):
        single = core.update_pointcloud(
            init_state(cfg), jnp.asarray(pts[b]), jnp.asarray(mask[b]),
            jnp.asarray(R[b]), jnp.asarray(t[b]), jnp.float32(0),
            jnp.float32(0), w, cfg,
        )
        np.testing.assert_allclose(
            np.asarray(out.layers[b]), np.asarray(single.layers), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(out.normal[b]), np.asarray(single.normal), atol=1e-5
        )


def test_batched_spatial_semantic_and_move(rng):
    """The composed path also carries MEM semantic channels and recentering
    (roll crosses shard boundaries — SURVEY §7 hard part #5)."""
    from elevation_mapping_cupy_tpu.parallel.spatial import (
        batched_spatial_update_pointcloud, shard_states_spatial_batched,
    )
    from elevation_mapping_cupy_tpu.parallel import batched_move_to

    channels = ("grass",)
    cfg = MapConfig(resolution=0.1, map_length=2.2, max_ray_length=0.5,
                    max_points=512, semantic_layers=channels)
    mesh = make_mesh((2, 4), ("env", "x"))
    B = 2
    w = default_weights()
    n = cfg.max_points
    pts = rng.uniform(-0.9, 0.9, (B, n, 4)).astype(np.float32)
    pts[..., 2] = rng.uniform(-0.1, 0.3, (B, n)).astype(np.float32)
    pts[..., 3] = rng.uniform(0, 1, (B, n)).astype(np.float32)
    mask = np.ones((B, n), bool)
    R = np.broadcast_to(np.eye(3, dtype=np.float32), (B, 3, 3)).copy()
    t = np.tile(np.array([0, 0, 0.5], np.float32), (B, 1))
    z = np.zeros((B,), np.float32)

    states = shard_states_spatial_batched(init_batch(cfg, B), mesh, "env", "x")
    step = batched_spatial_update_pointcloud(mesh, cfg, "env", "x",
                                             channels=channels)
    out = step(states, jnp.asarray(pts), jnp.asarray(mask), jnp.asarray(R),
               jnp.asarray(t), jnp.asarray(z), jnp.asarray(z), w)
    # recenter the whole sharded fleet (GSPMD handles the cross-shard roll)
    moved = batched_move_to(
        out, jnp.asarray(np.tile(np.array([0.35, -0.15, 0], np.float32), (B, 1))),
        jnp.asarray(R), cfg,
    )
    jax.block_until_ready(moved)

    for b in range(B):
        single = core.update_pointcloud_semantic(
            init_state(cfg), jnp.asarray(pts[b]), jnp.asarray(mask[b]),
            jnp.asarray(R[b]), jnp.asarray(t[b]), jnp.float32(0),
            jnp.float32(0), w, cfg, channels,
        )
        single = core.move_to(
            single, jnp.asarray(np.array([0.35, -0.15, 0], np.float32)),
            jnp.asarray(R[b]), cfg,
        )
        np.testing.assert_allclose(
            np.asarray(moved.layers[b]), np.asarray(single.layers), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(moved.semantic[b]), np.asarray(single.semantic), atol=1e-4
        )


def test_spatial_sharding_rejects_indivisible_rows():
    from elevation_mapping_cupy_tpu.parallel.spatial import shard_state_spatial

    cfg = MapConfig(resolution=0.1, map_length=2.0, max_points=64)  # cell_n=22
    mesh = make_mesh((8,), ("x",))
    with pytest.raises(ValueError, match="divisible"):
        shard_state_spatial(init_state(cfg), mesh, "x")


def test_batched_input_image_matches_sequential(rng):
    """Per-env camera fusion (vmapped input_image) == sequential."""
    from elevation_mapping_cupy_tpu.parallel import batched_input_image

    channels = ("rgb", "mask")
    cfg = MapConfig(
        resolution=0.1, map_length=2.0, max_points=64,
        image_occlusion_mode="bresenham",
        semantic_layers=channels,
        image_channel_fusions=(("rgb", "color"), ("mask", "exponential"),
                               ("default", "exponential")),
    )
    B = 3
    n = cfg.cell_n
    K = np.array([[50, 0, 32], [0, 50, 24], [0, 0, 1]], np.float32)
    Rm = np.array([[1, 0, 0], [0, -1, 0], [0, 0, -1]], np.float32)
    ih, iw = 48, 64
    states, imgs, ts = [], [], []
    for b in range(B):
        st = init_state(cfg)
        h = rng.uniform(-0.02, 0.02, (n, n)).astype(np.float32)
        st = st._replace(layers=st.layers.at[0].set(jnp.asarray(h)).at[2].set(1.0))
        states.append(st)
        imgs.append(rng.uniform(0, 1, (4, ih, iw)).astype(np.float32))
        ts.append(np.array([0.0, 0.05 * b, 1.0], np.float32))

    seq = [
        core.input_image(
            states[b], jnp.asarray(imgs[b]), jnp.asarray(Rm), jnp.asarray(ts[b]),
            jnp.asarray(K), jnp.zeros(5), cfg, channels,
        )
        for b in range(B)
    ]
    batch_states = jax.tree.map(lambda *xs: jnp.stack(xs), *states)
    out = batched_input_image(
        batch_states,
        jnp.asarray(np.stack(imgs)),
        jnp.broadcast_to(jnp.asarray(Rm), (B, 3, 3)),
        jnp.asarray(np.stack(ts)),
        jnp.broadcast_to(jnp.asarray(K), (B, 3, 3)),
        jnp.zeros((B, 5)),
        cfg,
        channels,
    )
    for b in range(B):
        np.testing.assert_allclose(
            np.asarray(out.semantic[b]), np.asarray(seq[b].semantic), atol=1e-5
        )


def test_sharded_scatter_2d_mesh_matches_local(rng):
    """2D-tiled scatter (rows x cols over a (4,2) mesh) == single device,
    including non-divisible extents (padding on both axes)."""
    from elevation_mapping_cupy_tpu.ops import scatter as sc
    from elevation_mapping_cupy_tpu.parallel.sharded_scatter import (
        sharded_scatter_add_streams_2d,
    )

    mesh = make_mesh((4, 2), ("x", "y"))
    for h, w in ((128, 256), (130, 258)):
        n = 4096
        idx = rng.integers(0, h * w, n).astype(np.int32)
        mask = rng.random(n) < 0.9
        vals = [rng.normal(0, 1, n).astype(np.float32),
                rng.integers(0, 2, n).astype(np.float32)]
        exact = (False, True)
        ref = sc._scatter_add_streams_2d_local(
            h, w, jnp.asarray(idx), [jnp.asarray(v) for v in vals],
            jnp.asarray(mask), exact)
        out = sharded_scatter_add_streams_2d(
            h, w, jnp.asarray(idx), [jnp.asarray(v) for v in vals],
            jnp.asarray(mask), exact, mesh, "x", "y")
        assert out.shape == (2, h, w)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_spatial_2d_tiling_matches_unsharded(rng):
    """Full update on a map 2D-tiled over a (4,2) mesh == single device."""
    from elevation_mapping_cupy_tpu.parallel.spatial import (
        shard_state_spatial, spatial_update_pointcloud,
    )

    cfg = MapConfig(resolution=0.1, map_length=3.0, max_ray_length=0.5,
                    max_points=2048)
    assert cfg.cell_n % 4 == 0 and cfg.cell_n % 2 == 0  # 32
    mesh = make_mesh((4, 2), ("x", "y"))
    w = default_weights()
    pts = rng.uniform(-1.4, 1.4, (2048, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(-0.1, 0.3, 2048).astype(np.float32)
    mask = np.ones(2048, bool)
    R = np.eye(3, dtype=np.float32)
    t = np.array([0, 0, 0.5], np.float32)

    ref = core.update_pointcloud(
        init_state(cfg), jnp.asarray(pts), jnp.asarray(mask), jnp.asarray(R),
        jnp.asarray(t), jnp.float32(0), jnp.float32(0), w, cfg,
    )
    step = spatial_update_pointcloud(mesh, cfg, "x", col_axis="y")
    state = shard_state_spatial(init_state(cfg), mesh, "x", col_axis="y")
    out = step(state, jnp.asarray(pts), jnp.asarray(mask), jnp.asarray(R),
               jnp.asarray(t), jnp.float32(0), jnp.float32(0), w)
    jax.block_until_ready(out)
    assert len(out.layers.sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(out.layers), np.asarray(ref.layers),
                               atol=1e-5)


def test_two_process_distributed_update(tmp_path):
    """REAL multi-process bring-up: two OS processes form a (2 hosts x 2
    chips) pod mesh over jax.distributed (CPU backend), each feeds its own
    envs via HostFeed, and both run the env-sharded batched update with
    psum'd stats — the TCPROS-replacement path end-to-end."""
    import os
    import socket
    import subprocess
    import sys

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    worker = os.path.join(os.path.dirname(__file__), "distributed_worker.py")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    procs = [
        subprocess.Popen(
            [sys.executable, worker, f"localhost:{port}", str(i), "2", repo],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=300)[0].decode() for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{i} failed:\n{out}"
        assert f"proc{i} ok frac_valid=" in out
    # psum'd stats agree across processes
    v0 = outs[0].split("frac_valid=")[1].split()[0]
    v1 = outs[1].split("frac_valid=")[1].split()[0]
    assert v0 == v1


def test_batched_move_to_matches_sequential(rng):
    """Batched recentering == per-env core.move_to (donated input)."""
    from elevation_mapping_cupy_tpu.parallel import batched_move_to

    B = 3
    w = default_weights()
    pts, mask, R, t, z = make_batch_inputs(rng, B, CFG.max_points)
    states = batched_update(
        init_batch(CFG, B), jnp.asarray(pts), jnp.asarray(mask), jnp.asarray(R),
        jnp.asarray(t), jnp.asarray(z), jnp.asarray(z), w, CFG,
    )
    positions = rng.uniform(-0.5, 0.5, (B, 3)).astype(np.float32)
    Rs = np.broadcast_to(np.eye(3, dtype=np.float32), (B, 3, 3)).copy()

    seq = [
        core.move_to(
            jax.tree.map(lambda x: x[b], states),
            jnp.asarray(positions[b]), jnp.asarray(Rs[b]), CFG,
        )
        for b in range(B)
    ]
    out = batched_move_to(states, jnp.asarray(positions), jnp.asarray(Rs), CFG)
    for b in range(B):
        np.testing.assert_array_equal(
            np.asarray(out.layers[b]), np.asarray(seq[b].layers))
        np.testing.assert_allclose(
            np.asarray(out.center[b]), np.asarray(seq[b].center))
