"""Runtime service, sensor frontend, datagen, and grid-map filters."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from elevation_mapping_cupy_tpu import MapConfig
from elevation_mapping_cupy_tpu.ops import gridmap_filters as gmf
from elevation_mapping_cupy_tpu.runtime.service import MappingService, SensorFrame
from elevation_mapping_cupy_tpu.runtime import datagen
from elevation_mapping_cupy_tpu.sensor import create_pcl_from_image, encode_max, decode_max


CFG = MapConfig(resolution=0.1, map_length=2.0, max_ray_length=0.5, max_points=1024)


def test_service_end_to_end(rng):
    svc = MappingService(CFG)
    published = {}
    svc.add_publisher("map", ["elevation", "traversability"], fps=100.0,
                      callback=published.update)
    alive = []
    svc.on_alive(lambda: alive.append(1))

    svc.update_pose(np.array([0.0, 0.0, 0.0]), np.eye(3))
    for i in range(3):
        pts = rng.uniform(-0.9, 0.9, (800, 3)).astype(np.float32)
        pts[:, 2] = rng.uniform(-0.1, 0.2, 800)
        assert svc.enqueue(SensorFrame(
            kind="pointcloud", channels=("x", "y", "z"), data=pts,
            R=np.eye(3, dtype=np.float32), t=np.array([0, 0, 0.5], np.float32),
        ))
    n = svc.spin_once(now=100.0)
    assert n == 3
    assert svc.stats.frames_processed == 3
    assert svc.stats.pointcloud_process_fps > 0
    assert len(alive) == 3
    assert "elevation" in published and np.isfinite(published["elevation"]).any()

    sub = svc.get_submap(np.zeros(2), (0.6, 0.6), ["elevation"])
    assert sub["elevation"].shape[0] <= 8

    results = svc.check_safety([np.array([[0, 0], [0.5, 0], [0, 0.5]])])
    assert len(results) == 1

    svc.clear_map()
    assert np.asarray(svc.mapper.state.layers[2]).sum() == 0


def test_queue_overflow_drops(rng):
    svc = MappingService(CFG, queue_size=2)
    f = SensorFrame(kind="pointcloud", channels=("x", "y", "z"),
                    data=np.zeros((10, 3), np.float32),
                    R=np.eye(3, dtype=np.float32), t=np.zeros(3, np.float32))
    assert svc.enqueue(f) and svc.enqueue(f)
    assert not svc.enqueue(f)
    assert svc.stats.frames_dropped == 1


def test_create_pcl_from_image(rng):
    H, W = 24, 32
    depth = rng.uniform(0.5, 3.0, (H, W)).astype(np.float32)
    depth[0, 0] = 0.0
    K = np.array([[30, 0, 16], [0, 30, 12], [0, 0, 1]], np.float32)
    rgb = rng.integers(0, 255, (3, H, W)).astype(np.uint8)
    sem = {"grass": rng.uniform(0, 1, (H, W)).astype(np.float32)}
    cloud, names = create_pcl_from_image(depth, K, channels=sem, rgb=rgb)
    assert names == ["x", "y", "z", "rgb", "grass"]
    assert cloud.shape == (H * W - 1, 5)
    # back-projection consistency: z column equals depth
    assert np.allclose(sorted(cloud[:, 2]), sorted(depth.reshape(-1)[1:]), atol=1e-5)


def test_encode_decode_numpy(rng):
    prob = rng.uniform(0, 1, 50).astype(np.float32)
    cls = rng.integers(0, 100, 50).astype(np.uint32)
    p, c = decode_max(encode_max(prob, cls))
    np.testing.assert_array_equal(c, cls)
    np.testing.assert_allclose(p, prob.astype(np.float16).astype(np.float32))


def test_datagen_shapes():
    key = jax.random.PRNGKey(0)
    pts, t, terr = datagen.make_batch_clouds(key, batch=4, cells=32, resolution=0.1, n_points=256)
    assert pts.shape == (4, 256, 3)
    assert t.shape == (4, 3)
    assert terr.shape == (4, 32, 32)
    assert np.isfinite(np.asarray(pts)).all()


def test_gridmap_filters(rng):
    h = rng.normal(0, 0.1, (32, 32)).astype(np.float32)
    h[10:14, 10:14] = np.nan
    filled = np.asarray(gmf.inpaint_min_values(jnp.asarray(h)))
    assert np.isfinite(filled).all()
    filled2 = np.asarray(gmf.inpaint_bilinear(jnp.asarray(h)))
    assert np.isfinite(filled2).all()
    # min-values fill uses neighborhood minima
    assert filled[11, 11] <= np.nanmax(h[8:16, 8:16])

    sm = np.asarray(gmf.box_blur(jnp.asarray(filled)))
    assert sm.std() < filled.std()
    md = np.asarray(gmf.median_filter(jnp.asarray(filled)))
    assert md.shape == h.shape
    g = np.asarray(gmf.gaussian_blur(jnp.asarray(filled)))
    assert g.std() < filled.std()

    d = np.asarray(gmf.dilate(jnp.asarray(filled), 3))
    e = np.asarray(gmf.erode(jnp.asarray(filled), 3))
    assert (d >= filled - 1e-6).all() and (e <= filled + 1e-6).all()

    mask = np.zeros((32, 32), bool)
    mask[5:10, 5:10] = True
    ol = np.asarray(gmf.outline(jnp.asarray(mask)))
    assert ol[5, 5] and ol[9, 9] and not ol[7, 7]

    ramp = np.outer(np.arange(32, dtype=np.float32), np.ones(32, np.float32)) * 0.1
    gx, gy = gmf.estimate_gradient(jnp.asarray(ramp), 0.1)
    np.testing.assert_allclose(np.asarray(gx)[1:-1, 1:-1], -1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gy)[1:-1, 1:-1], 0.0, atol=1e-5)

    vals = gmf.values_between_locations(
        jnp.asarray(ramp), jnp.asarray([-1.0, 0.0]), jnp.asarray([1.0, 0.0]), 16, 0.1
    )
    assert np.asarray(vals).shape == (16,)

    rs = gmf.resample(jnp.asarray(ramp), (16, 16))
    assert rs.shape == (16, 16)

    # NaN-awareness (module contract): a hole must not poison or grow
    hole = filled.copy()
    hole[16, 16] = np.nan
    for fn in (lambda v: gmf.box_blur(v, 3), lambda v: gmf.gaussian_blur(v, 5),
               lambda v: gmf.median_filter(v, 3)):
        r = np.asarray(fn(jnp.asarray(hole)))
        assert np.isfinite(np.delete(r.reshape(-1), 16 * 32 + 16)).all(), fn
    # all-NaN neighborhood stays NaN in box blur
    allnan = np.full((8, 8), np.nan, np.float32)
    assert np.isnan(np.asarray(gmf.box_blur(jnp.asarray(allnan)))).all()

    # projectToMapWithMargin: outside point clamps to margin-shrunk bounds
    p = gmf.project_to_map_with_margin(
        jnp.asarray([10.0, -10.0]), jnp.asarray([1.0, 1.0]), (4.0, 4.0), margin=0.5
    )
    np.testing.assert_allclose(np.asarray(p), [2.5, -0.5], atol=1e-6)
    # inside point unchanged; margin capped at half length
    p2 = gmf.project_to_map_with_margin(
        jnp.asarray([1.0, 1.2]), jnp.asarray([1.0, 1.0]), (4.0, 4.0), margin=9.0
    )
    np.testing.assert_allclose(np.asarray(p2), [1.0, 1.0], atol=1e-6)


def test_semantic_image_node(rng):
    """SemanticImageNode: resize scaling, channel stack, intrinsics, vis."""
    from elevation_mapping_cupy_tpu.sensor.image_node import (
        ImageParameter, SemanticImageNode, voc_color_map,
    )

    node = SemanticImageNode(
        ImageParameter(channels=("f0", "f1"), semantic_model="random_features",
                       resize=0.5)
    )
    img = rng.integers(0, 255, (3, 40, 60), np.uint8)
    K = np.array([[50, 0, 30], [0, 50, 20], [0, 0, 1]], np.float32)
    out = node(img, K)
    assert out["image"].shape == (2, 20, 30)
    assert out["channels"] == ["sem_f0", "sem_f1"]
    np.testing.assert_allclose(out["K"][0, 0], 25.0)
    np.testing.assert_allclose(out["K"][2, 2], 1.0)
    assert out["label_vis"].shape == (3, 20, 30)
    assert node.channel_info() == ["sem_f0", "sem_f1"]
    cm = voc_color_map(21)
    assert cm.shape == (21, 3) and cm.dtype == np.uint8


def test_service_aux_services(rng):
    """set_publish_points / map pointcloud export / clear-with-initializer /
    map→odom drift error."""
    from elevation_mapping_cupy_tpu import MapConfig
    from elevation_mapping_cupy_tpu.runtime.service import MappingService, SensorFrame

    cfg = MapConfig(resolution=0.1, map_length=4.0, max_ray_length=1.0,
                    max_points=2048)
    svc = MappingService(cfg)
    pts = rng.uniform(-1.8, 1.8, (2000, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(0.0, 0.2, 2000)
    svc.enqueue(SensorFrame(kind="pointcloud", channels=("x", "y", "z"),
                            data=pts, R=np.eye(3, dtype=np.float32),
                            t=np.array([0, 0, 0.8], np.float32)))
    svc.spin_once()

    assert svc.get_map_pointcloud().shape == (0, 3)  # disabled by default
    assert svc.set_publish_points(True)
    cloud = svc.get_map_pointcloud()
    assert cloud.shape[1] == 3 and len(cloud) > 100
    # exported points sit on the mapped surface: sensor-frame z in [0, 0.2]
    # plus the t_z=0.8 offset puts world elevation around 0.9
    assert np.isfinite(cloud).all() and 0.5 < float(np.median(cloud[:, 2])) < 1.1

    assert isinstance(svc.map_to_odom_error(), float)

    svc.initialize_points_provider = lambda: np.array(
        [[-1, -1, 0.1], [1, -1, 0.1], [1, 1, 0.1], [-1, 1, 0.1]], np.float64
    )
    svc.clear_map_with_initializer()
    elev = np.zeros((svc.mapper.cell_n - 2,) * 2, np.float32)
    svc.mapper.get_map_with_name_ref("elevation", elev)
    inner = elev[10:-10, 10:-10]
    assert np.isfinite(inner).sum() > 0  # initializer repopulated the map

    # <3 provider points expand to a tf_grid_size square
    # (initializeWithTF, elevation_mapping_ros.cpp:593-598)
    svc.initialize_points_provider = lambda: np.array([[0, 0, 0.3]], np.float64)
    svc.clear_map_with_initializer(tf_grid_size=0.8)
    svc.mapper.get_map_with_name_ref("elevation", elev)
    assert np.isfinite(elev[10:-10, 10:-10]).sum() > 0


def test_native_frame_ring(rng):
    """Native slab ring buffer: bounded memory, drop policies, stats."""
    from elevation_mapping_cupy_tpu.runtime.native import FrameRing

    ring = FrameRing(capacity=3, slab_bytes=4096, header_bytes=16)
    payloads = [rng.standard_normal(i + 4).astype(np.float32) for i in range(5)]
    results = [ring.push(f"h{i}".encode(), p) for i, p in enumerate(payloads)]
    assert results == [True, True, True, False, False]  # drop-newest
    assert len(ring) == 3
    h, p = ring.pop()
    assert h[:2] == b"h0"
    np.testing.assert_array_equal(p.view(np.float32), payloads[0])
    s = ring.stats()
    assert s["dropped"] == 2

    old = FrameRing(capacity=2, slab_bytes=64, header_bytes=8, drop_oldest=True)
    for i in range(4):
        old.push(bytes([65 + i]), np.int32([i]))
    h, p = old.pop()
    assert p.view(np.int32)[0] == 2  # two oldest were overwritten

    # oversized payload raises (native) — bounded memory is a contract
    import pytest as _pytest
    if ring._ring is not None:
        with _pytest.raises(ValueError):
            ring.push(b"x", np.zeros(4097, np.uint8))


def test_raw_ingest_end_to_end(rng):
    """Raw interleaved PointCloud2-style bytes → native ring → native
    deinterleave → map update must equal the direct SensorFrame path
    (the reference's hot loop, elevation_mapping_ros.cpp:330-339)."""
    n_pts = 700
    pts = rng.uniform(-0.9, 0.9, (n_pts, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(-0.1, 0.2, n_pts).astype(np.float32)
    intensity = rng.uniform(0, 1, n_pts).astype(np.float32)

    # interleave as x,y,z,pad,intensity records (20-byte point_step) and
    # poison a few records with NaN — the native path must drop them
    rec = np.zeros((n_pts, 5), np.float32)
    rec[:, :3] = pts
    rec[:, 4] = intensity
    bad = np.array([3, 77, 500])
    rec[bad, 1] = np.nan
    raw = rec.tobytes()

    R = np.eye(3, dtype=np.float32)
    t = np.array([0, 0, 0.5], np.float32)
    svc = MappingService(CFG.replace(enable_visibility_cleanup=False))
    svc.enable_raw_ingest(capacity=4, slab_bytes=1 << 20)
    assert svc.enqueue_raw_pointcloud(
        raw, n_pts, 20, [0, 4, 8, 16], ["x", "y", "z", "intensity"], R, t,
        stamp=1.5,
    )
    assert svc.spin_once(now=1.0) == 1
    assert svc.stats.frames_processed == 1

    keep = np.ones(n_pts, bool)
    keep[bad] = False
    direct = MappingService(CFG.replace(enable_visibility_cleanup=False))
    mat = np.concatenate([pts[keep], intensity[keep, None]], axis=1)
    direct.enqueue(SensorFrame(
        kind="pointcloud", channels=("x", "y", "z", "intensity"),
        data=mat, R=R, t=t,
    ))
    direct.spin_once(now=1.0)

    n = svc.mapper.cell_n - 2
    a = np.zeros((n, n), np.float32)
    b = np.zeros((n, n), np.float32)
    svc.mapper.get_map_with_name_ref("elevation", a)
    direct.mapper.get_map_with_name_ref("elevation", b)
    np.testing.assert_array_equal(np.nan_to_num(a), np.nan_to_num(b))

    # backpressure: a full ring drops (queue_size semantics) and counts it
    svc2 = MappingService(CFG)
    svc2.enable_raw_ingest(capacity=2, slab_bytes=1 << 20)
    results = [
        svc2.enqueue_raw_pointcloud(
            raw, n_pts, 20, [0, 4, 8, 16], ["x", "y", "z", "intensity"], R, t)
        for _ in range(4)
    ]
    assert results == [True, True, False, False]
    assert svc2.stats.frames_dropped == 2

    # subscriber wiring: channels fall back to the configured list
    svc3 = MappingService(CFG.replace(enable_visibility_cleanup=False))
    from elevation_mapping_cupy_tpu.runtime.service import parse_subscribers
    svc3.subscribers = parse_subscribers(
        {"front_lidar": {"data_type": "pointcloud", "topic_name": "/pc"}}
    )
    svc3.enable_raw_ingest()
    assert svc3.enqueue_raw_pointcloud(
        raw, n_pts, 20, [0, 4, 8], [], R, t, subscriber="front_lidar",
    )
    assert svc3.spin_once(now=1.0) == 1
    assert not svc3.enqueue_raw_pointcloud(
        raw, n_pts, 20, [0, 4, 8], [], R, t, subscriber="nope",
    )


def test_get_submap_asymmetric_region(rng):
    """get_submap must return the terrain at the queried world position, not
    its mirror image (the export is double-flipped)."""
    from elevation_mapping_cupy_tpu.runtime.service import MappingService, SensorFrame

    svc = MappingService(CFG.replace(enable_visibility_cleanup=False))
    # a bump at world (+0.5, +0.5); flat floor elsewhere. Points are in the
    # SENSOR frame (sensor at z=0.8): world z = pts_z + 0.8
    n_pts = 900
    pts = rng.uniform(-0.9, 0.9, (n_pts, 3)).astype(np.float32)
    pts[:, 2] = -0.8
    bump = (np.abs(pts[:, 0] - 0.5) < 0.15) & (np.abs(pts[:, 1] - 0.5) < 0.15)
    pts[bump, 2] = -0.4
    svc.enqueue(SensorFrame(kind="pointcloud", channels=("x", "y", "z"), data=pts,
                            R=np.eye(3, dtype=np.float32),
                            t=np.array([0, 0, 0.8], np.float32)))
    svc.spin_once()

    hi = svc.get_submap(np.array([0.5, 0.5]), (0.3, 0.3), ["elevation"])["elevation"]
    lo = svc.get_submap(np.array([-0.5, -0.5]), (0.3, 0.3), ["elevation"])["elevation"]
    assert np.nanmax(hi) > 0.3, "bump missing at its true world position"
    assert np.nanmax(np.where(np.isfinite(lo), lo, 0)) < 0.2, "bump mirrored"


def test_pointcloud_sensor_node(rng):
    """Sidecar node: depth+rgb frame -> semantic cloud end-to-end into the
    mapping service."""
    from elevation_mapping_cupy_tpu.sensor.pointcloud import (
        PointcloudParameter, PointcloudSensorNode,
    )

    H, W = 24, 32
    node = PointcloudSensorNode(
        PointcloudParameter(channels=("feat_0", "feat_1")),
        semantic_model="random_features",
    )
    depth = rng.uniform(0.6, 1.3, (H, W)).astype(np.float32)
    rgb = rng.integers(0, 255, (3, H, W)).astype(np.uint8)
    K = np.array([[30, 0, 16], [0, 30, 12], [0, 0, 1]], np.float32)
    cloud, names = node(depth, K, rgb=rgb)
    assert names == ["x", "y", "z", "rgb", "feat_0", "feat_1"]
    assert cloud.shape == (H * W, 6)

    cfg = MapConfig(resolution=0.1, map_length=2.0, max_ray_length=0.5,
                    max_points=1024,
                    pointcloud_channel_fusions=(("rgb", "color"), ("default", "average")),
                    semantic_layers=("rgb", "feat_0", "feat_1"))
    svc = MappingService(cfg)
    # camera optical frame looking straight down from 1 m
    R_cam = np.array([[1, 0, 0], [0, -1, 0], [0, 0, -1]], np.float32)
    ok = svc.enqueue(SensorFrame(kind="pointcloud", channels=tuple(names),
                                 data=cloud, R=R_cam,
                                 t=np.array([0, 0, 1.0], np.float32)))
    assert ok and svc.spin_once() == 1
    out = np.zeros((cfg.cell_n - 2, cfg.cell_n - 2), np.float32)
    svc.mapper.get_map_with_name_ref("feat_0", out)
    assert np.abs(out).sum() > 0


def test_get_submap_identity_transform_matches(rng):
    """frame_transform = identity must reproduce the map-frame submap (up to
    the forward-splat regridding, which is exact for an axis-aligned
    identity transform)."""
    svc = MappingService(CFG)
    pts = rng.uniform(-0.9, 0.9, (900, 3)).astype(np.float32)
    pts[:, 2] = 0.1 * np.sign(pts[:, 0])  # step along x
    svc.enqueue(SensorFrame(kind="pointcloud", channels=("x", "y", "z"), data=pts,
                            R=np.eye(3, dtype=np.float32),
                            t=np.array([0, 0, 0.5], np.float32)))
    svc.spin_once(now=1.0)
    plain = svc.get_submap(np.zeros(2), (1.0, 1.0), ["elevation"])["elevation"]
    ident = svc.get_submap(np.zeros(2), (1.0, 1.0), ["elevation"],
                           frame_transform=(np.eye(3), np.zeros(3)))["elevation"]
    assert ident.shape == plain.shape
    both = np.isfinite(plain) & np.isfinite(ident)
    assert both.sum() > 10
    np.testing.assert_allclose(ident[both], plain[both], atol=1e-5)


def test_get_submap_rotated_frame(rng):
    """90-deg-yaw request frame: the x-step terrain must appear as a y-step
    in the returned grid, and the transform's z offset must shift heights
    (reference: request frame transform + getTransformedMap,
    elevation_mapping_ros.cpp:507-553)."""
    svc = MappingService(CFG)
    pts = rng.uniform(-0.9, 0.9, (4000, 3)).astype(np.float32)
    pts[:, 2] = np.where(pts[:, 0] > 0, 0.2, 0.0).astype(np.float32)
    svc.enqueue(SensorFrame(kind="pointcloud", channels=("x", "y", "z"), data=pts,
                            R=np.eye(3, dtype=np.float32),
                            t=np.array([0, 0, 0.5], np.float32)))
    svc.spin_once(now=1.0)
    # request frame = map frame yawed by +90deg and lifted by 1 m:
    # q = R p + t with R = Rz(90), t = (0, 0, 1)
    c, s = 0.0, 1.0
    Rf = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float64)
    tf = np.array([0.0, 0.0, 1.0])
    sub = svc.get_submap(np.zeros(2), (1.2, 1.2), ["elevation"],
                         frame_transform=(Rf, tf))["elevation"]
    ok = np.isfinite(sub)
    assert ok.sum() > 50
    # map +x (high side) maps to request +y; exported col 0 = max y, so the
    # high step must sit in the low-index columns
    nx, ny = sub.shape
    left = np.nanmean(sub[:, : ny // 3])
    right = np.nanmean(sub[:, -ny // 3 :])
    assert left > right + 0.1
    # z offset applied: terrain at world z 0.5/0.7 (sensor t_z=0.5) + 1.0
    assert 1.4 < np.nanmin(sub) < np.nanmax(sub) < 1.75


def test_config_driven_two_sensor_setup(tmp_path, rng):
    """subscribers: YAML block wires two sensors (pointcloud with a semantic
    channel + rgb image) with distinct per-channel fusions
    (elevation_mapping_ros.cpp:77-152)."""
    yaml_text = """
resolution: 0.1
map_length: 2.0
max_ray_length: 0.5
max_points: 1024
semantic_layers: [grass, rgb]
pointcloud_channel_fusions:
  default: class_average
image_channel_fusions:
  rgb: color
  default: exponential
update_variance_fps: 2.0
time_interval: 0.5
subscribers:
  front_lidar:
    topic_name: /lidar/points
    data_type: pointcloud
    channels: [grass]
  color_cam:
    topic_name: /camera/rgb/image_raw
    camera_info_topic_name: /camera/depth/camera_info
    data_type: image
publishers:
  elevation_map_raw:
    layers: [elevation, rgb, grass]
    basic_layers: [elevation]
    fps: 100.0
"""
    path = tmp_path / "setup.yaml"
    path.write_text(yaml_text)
    svc = MappingService.from_config(str(path))
    assert set(svc.subscribers) == {"front_lidar", "color_cam"}
    assert svc.subscribers["front_lidar"].channels == ("x", "y", "z", "grass")
    assert svc.subscribers["color_cam"].channels == ("rgb",)
    assert svc._variance_period == 0.5 and svc._time_period == 0.5

    # pointcloud with a semantic channel, channels defaulted from the config
    pts = rng.uniform(-0.9, 0.9, (800, 4)).astype(np.float32)
    pts[:, 2] = rng.uniform(-0.05, 0.05, 800)
    pts[:, 3] = 0.8  # grass score
    assert svc.enqueue(SensorFrame(
        kind="pointcloud", channels=(), data=pts,
        R=np.eye(3, dtype=np.float32), t=np.array([0, 0, 0.5], np.float32),
    ), subscriber="front_lidar")

    # rgb image through the image subscriber
    H, W = 24, 24
    img = np.zeros((3, H, W), np.float32)
    img[1] = 200.0  # green
    K = np.array([[20, 0, W / 2], [0, 20, H / 2], [0, 0, 1]], np.float32)
    frame = SensorFrame(
        kind="image", channels=(), data=img,
        R=np.eye(3, dtype=np.float32), t=np.array([0, 0, 1.0], np.float32),
        K=K, D=np.zeros(5, np.float32),
    )
    assert svc.enqueue(frame, subscriber="color_cam")
    # kind mismatch against the configured data_type is dropped
    assert not svc.enqueue(frame, subscriber="front_lidar")
    assert svc.stats.frames_dropped == 1

    assert svc.spin_once(now=1.0) == 2
    published = {}
    svc.set_publisher_callback("elevation_map_raw", published.update)
    svc.spin_once(now=2.0)
    assert "grass" in published and "rgb" in published
    grass = published["grass"]
    assert np.nanmax(grass) > 0.3  # class_average pulled toward 0.8


def test_submap_pitched_transform_drops_out_of_range(rng):
    """A pitched request frame carries tall cells beyond the z=0 corner
    bounds; grid_map getTransformedMap DROPS !isInside points — clamping
    them would overwrite unrelated border cells with tall heights."""
    from elevation_mapping_cupy_tpu.runtime.service import _transform_submap

    res = 0.1
    n = 11
    xs = (np.arange(n) - n // 2) * res
    ys = (np.arange(n) - n // 2) * res
    h = np.zeros((n, n), np.float32)
    h[0, :] = 5.0          # a 5 m wall along the min-x edge
    th = np.deg2rad(30.0)  # pitch: z leaks into x by z*sin(30) = 2.5 m
    R = np.array([[np.cos(th), 0, np.sin(th)],
                  [0, 1, 0],
                  [-np.sin(th), 0, np.cos(th)]], np.float64)
    out = _transform_submap({"elevation": h}, xs, ys, "elevation",
                            R, np.zeros(3), res)["elevation"]
    # the wall points land ~2.5 m beyond the footprint -> dropped, and no
    # border cell of the output carries the 5 m height
    finite = out[np.isfinite(out)]
    assert finite.size > 0
    assert np.nanmax(finite) < 1.0, "clamped tall cells leaked into the border"
