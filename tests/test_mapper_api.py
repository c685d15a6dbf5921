"""API-parity smoke tests, modeled on the reference test suite
(tests/test_elevation_mapping.py: input, move_to, exports, polygon
traversability, initialize_map, plugins)."""

import os

import numpy as np
import pytest

from elevation_mapping_cupy_tpu import MapConfig
from elevation_mapping_cupy_tpu.mapper import ElevationMap

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def small_cfg(**kw):
    return MapConfig(resolution=0.1, map_length=4.0, max_ray_length=1.0, **kw)


@pytest.fixture(params=[
    (("x", "y", "z"), ()),
    (("x", "y", "z", "rgb"), (("rgb", "color"), ("default", "class_average"))),
    (("x", "y", "z", "grass", "tree"), (("default", "class_average"),)),
    (("x", "y", "z", "grass", "tree"), (("default", "average"),)),
    (("x", "y", "z", "grass", "tree"), (("default", "class_bayesian"),)),
    (("x", "y", "z", "max1", "max2"), (("default", "class_max"),)),
])
def mapper(request):
    channels, fusions = request.param
    cfg = small_cfg(pointcloud_channel_fusions=fusions or (("default", "class_average"),))
    em = ElevationMap(cfg, plugin_config_file=os.path.join(FIXTURES, "plugin_config.yaml"))
    em._channels = channels
    return em


def random_cloud(rng, channels, n=4000):
    pts = rng.uniform(-2, 2, (n, len(channels))).astype(np.float32)
    pts[:, 2] = rng.uniform(-0.2, 0.4, n)
    return pts


def test_input_move_publish(mapper, rng):
    channels = mapper._channels
    R = np.eye(3, dtype=np.float32)
    t = np.array([0.0, 0.0, 0.6], np.float32)
    data = np.zeros((mapper.cell_n - 2, mapper.cell_n - 2), np.float32)
    for i in range(3):
        pts = random_cloud(rng, channels)
        mapper.input_pointcloud(pts, list(channels), R, t, 0.0, 0.0)
        mapper.update_normal()
        mapper.move_to(np.array([0.02 * i, -0.01 * i, 0.01 * i]), R)
        mapper.update_variance()
        mapper.update_time()
    for name in ["elevation", "variance", "traversability", "time",
                 "upper_bound", "is_upper_bound", "normal_x"]:
        mapper.get_map_with_name_ref(name, data)
        assert np.isfinite(data).any() or name == "normal_x"
    for ch in channels[3:]:
        assert mapper.exists_layer(ch)
        mapper.get_map_with_name_ref(ch, data)


@pytest.fixture()
def simple_mapper():
    em = ElevationMap(
        small_cfg(), plugin_config_file=os.path.join(FIXTURES, "plugin_config.yaml")
    )
    em._channels = ("x", "y", "z")
    return em


def test_polygon_traversability(simple_mapper, rng):
    mapper = simple_mapper
    channels = mapper._channels
    R = np.eye(3, dtype=np.float32)
    t = np.zeros(3, np.float32)
    mapper.input_pointcloud(random_cloud(rng, channels), list(channels), R, t, 0.0, 0.0)
    polygon = np.array([[0, 0], [1.5, 0], [0, 1.5]], np.float32)
    result = np.zeros(3)
    n = mapper.get_polygon_traversability(polygon, result)
    assert result[2] == pytest.approx(1.125, abs=1e-5)   # shoelace area
    assert 0.0 <= result[1] <= 1.0
    out = np.zeros((n, 2))
    mapper.get_untraversable_polygon(out)


def test_initialize_map(simple_mapper):
    mapper = simple_mapper
    points = np.array(
        [[-1.0, -1.0, 0.2], [1.0, -1.0, 0.2], [0.0, 1.0, 0.2], [1.0, 1.0, 0.2]]
    )
    mapper.initialize_map(points, method="linear")
    elev = np.asarray(mapper.get_elevation())
    inner = elev[np.isfinite(elev)]
    assert len(inner) > 0
    assert np.allclose(inner, 0.2, atol=1e-3)


def test_plugins_compute(simple_mapper, rng):
    mapper = simple_mapper
    channels = mapper._channels
    R = np.eye(3, dtype=np.float32)
    t = np.zeros(3, np.float32)
    mapper.input_pointcloud(random_cloud(rng, channels), list(channels), R, t, 0.0, 0.0)
    data = np.zeros((mapper.cell_n - 2, mapper.cell_n - 2), np.float32)
    for name in mapper.plugin_manager.layer_names:
        mapper.get_map_with_name_ref(name, data)


def test_checkpoint_roundtrip(tmp_path, rng):
    cfg = small_cfg()
    em = ElevationMap(cfg)
    R = np.eye(3, dtype=np.float32)
    t = np.zeros(3, np.float32)
    em.input_pointcloud(random_cloud(rng, ("x", "y", "z")), ["x", "y", "z"], R, t, 0.0, 0.0)
    path = str(tmp_path / "ckpt.npz")
    em.save_checkpoint(path)
    em2 = ElevationMap(cfg)
    em2.load_checkpoint(path)
    np.testing.assert_array_equal(np.asarray(em.state.layers), np.asarray(em2.state.layers))


def test_clear(rng):
    em = ElevationMap(small_cfg())
    R = np.eye(3, dtype=np.float32)
    em.input_pointcloud(random_cloud(rng, ("x", "y", "z")), ["x", "y", "z"], R,
                        np.zeros(3, np.float32), 0.0, 0.0)
    assert np.asarray(em.state.layers[2]).sum() > 0
    em.clear()
    assert np.asarray(em.state.layers[2]).sum() == 0
    assert np.allclose(np.asarray(em.state.layers[1]), em.cfg.initial_variance)


def test_shipped_configs_load_and_run(rng):
    """Every YAML shipped under configs/ loads and drives a map end-to-end
    (guards the example configs against drift from the loader/schema)."""
    from elevation_mapping_cupy_tpu import load_config
    from elevation_mapping_cupy_tpu.plugins import PluginManager

    root = os.path.join(os.path.dirname(__file__), "..", "configs")
    cfg = load_config(os.path.join(root, "core_param.yaml"),
                      resolution=0.1, map_length=4.0, max_ray_length=1.0)
    assert cfg.cell_n == 42
    mem = load_config(os.path.join(root, "semantic_mem.yaml"),
                      resolution=0.1, map_length=4.0, max_ray_length=1.0)
    assert "rgb" in mem.semantic_layers
    assert mem.fusion_for_channel("rgb") == "color"
    assert mem.fusion_for_channel("grass") == "class_average"

    em = ElevationMap(mem)
    pm = PluginManager(cell_n=em.cell_n)
    pm.load_plugin_settings(os.path.join(root, "plugin_config.yaml"))
    assert pm.layer_names

    pts = rng.uniform(-1.5, 1.5, (2000, 4)).astype(np.float32)
    pts[:, 2] = 0.05
    rgbs = rng.integers(0, 255, (2000, 3)).astype(np.uint32)
    pts[:, 3] = ((rgbs[:, 0] << 16) | (rgbs[:, 1] << 8) | rgbs[:, 2]).view(np.float32)
    em.input_pointcloud(pts, ["x", "y", "z", "rgb"], np.eye(3, dtype=np.float32),
                        np.array([0, 0, 0.5], np.float32), 0.0, 0.0)
    out = np.zeros((em.cell_n - 2, em.cell_n - 2), np.float32)
    em.get_map_with_name_ref("rgb", out)
    assert np.isfinite(out).any()


def test_degenerate_inputs():
    """Empty clouds, all-NaN clouds, single points and unfusable image
    channels must not crash and must behave sensibly (the reference relies
    on CUDA launches with size=0 silently doing nothing)."""
    em = ElevationMap(small_cfg())
    R = np.eye(3, dtype=np.float32)
    t = np.array([0, 0, 0.5], np.float32)
    em.input_pointcloud(np.zeros((0, 3), np.float32), ["x", "y", "z"], R, t, 0.0, 0.0)
    em.input_pointcloud(np.full((64, 3), np.nan, np.float32), ["x", "y", "z"], R, t, 0.0, 0.0)
    out = np.zeros((em.cell_n - 2,) * 2, np.float32)
    em.get_map_with_name_ref("elevation", out)
    assert np.isfinite(out).sum() == 0

    # a single point beyond min_valid_distance lands in exactly one cell
    em.input_pointcloud(
        np.array([[1.0, 1.0, -0.4]], np.float32), ["x", "y", "z"], R, t, 0.0, 0.0
    )
    em.get_map_with_name_ref("elevation", out)
    assert np.isfinite(out).sum() == 1
    assert abs(np.nanmax(out) - 0.1) < 0.05

    # image whose only channel resolves to no fusion: a clean no-op
    em.input_image(
        np.zeros((1, 8, 8), np.float32), ["no_such_channel"], R, t,
        np.eye(3, dtype=np.float32), np.zeros(5, np.float32),
    )


def test_drift_and_upper_bound_passthroughs(rng):
    """get_additive_mean_error / update_upper_bound_with_valid_elevation
    mirror the reference's public methods (elevation_mapping.py:412-432)."""
    em = ElevationMap(small_cfg())
    pts = rng.uniform(-0.9, 0.9, (500, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(0.0, 0.1, 500)
    em.input_pointcloud(pts, ["x", "y", "z"], np.eye(3, dtype=np.float32),
                        np.array([0, 0, 0.5], np.float32), 0.0, 0.0)
    assert isinstance(em.get_additive_mean_error(), float)

    # poke an upper bound into an invalid cell, then refresh from a valid one
    layers = np.asarray(em.state.layers).copy()
    iy, ix = 5, 5
    layers[2, iy, ix] = 1.0          # valid
    layers[0, iy, ix] = 0.42
    layers[5, iy, ix] = 9.0          # stale upper bound
    layers[6, iy, ix] = 1.0
    import jax.numpy as jnp
    em.state = em.state._replace(layers=jnp.asarray(layers))
    em.update_upper_bound_with_valid_elevation()
    out = np.asarray(em.state.layers)
    assert out[5, iy, ix] == np.float32(0.42)   # ub <- elevation where valid
    assert out[6, iy, ix] == 0.0


def test_get_layers_matches_per_layer(rng):
    """Fused multi-layer export == per-layer get_map_with_name_ref,
    including a plugin layer via the fallback path."""
    em = ElevationMap(small_cfg(semantic_layers=("rgb",),
                                pointcloud_channel_fusions=(("rgb", "color"),
                                                            ("default", "average"))))
    pts = rng.uniform(-0.9, 0.9, (2000, 4)).astype(np.float32)
    pts[:, 2] = rng.uniform(0.0, 0.2, 2000)
    rgbs = rng.integers(0, 255, (2000, 3)).astype(np.uint32)
    pts[:, 3] = ((rgbs[:, 0] << 16) | (rgbs[:, 1] << 8) | rgbs[:, 2]).view(np.float32)
    em.input_pointcloud(pts, ["x", "y", "z", "rgb"], np.eye(3, dtype=np.float32),
                        np.array([0, 0, 0.5], np.float32), 0.0, 0.0)
    names = ["elevation", "variance", "traversability", "upper_bound", "rgb",
             "normal_x"]
    fused = em.get_layers(names)
    data = np.zeros((em.cell_n - 2, em.cell_n - 2), np.float32)
    for nm in names:
        em.get_map_with_name_ref(nm, data)
        np.testing.assert_array_equal(fused[nm], data, err_msg=nm)
    assert set(fused) == set(names)
