"""End-to-end robot stack: config-driven service -> map -> plane decomposition.

The full deployment shape of the reference system in one script:
  1. a YAML config (the reference's core_param.yaml + subscribers/publishers
     blocks) wires a MappingService with TWO sensors — a LiDAR publishing a
     semantic channel and an RGB camera — with per-channel fusions,
  2. simulated frames stream through the queues; spin_once drives the
     update/variance/time timers and the fps-limited publishers exactly like
     the reference node's ros::Timers,
  3. services answer: get_submap in a ROTATED request frame
     (get_raw_submap), check_safety polygons, drift for the map->odom TF,
  4. the published elevation feeds the plane-decomposition pipeline
     (the reference's separate convex_plane_decomposition_ros node) and a
     convex foothold polygon is grown at a query point.

Run:  python examples/robot_stack.py     (CPU-safe, ~40 s with compiles)
"""

import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from elevation_mapping_cupy_tpu.planeseg.pipeline import PlaneDecompositionPipeline
from elevation_mapping_cupy_tpu.runtime.service import MappingService, SensorFrame

CONFIG = """
resolution: 0.05
map_length: 4.0
max_ray_length: 1.0
max_points: 20000
semantic_layers: [grass, rgb]
pointcloud_channel_fusions:
  default: class_average
image_channel_fusions:
  rgb: color
  default: exponential
update_variance_fps: 5.0
time_interval: 0.2
subscribers:
  front_lidar:
    topic_name: /lidar/points
    data_type: pointcloud
    channels: [grass]
  color_cam:
    topic_name: /camera/rgb/image_raw
    camera_info_topic_name: /camera/rgb/camera_info
    data_type: image
publishers:
  elevation_map_raw:
    layers: [elevation, traversability, grass, rgb]
    basic_layers: [elevation]
    fps: 10.0
"""


def terrain_height(x, y):
    """Ground plane with a raised platform (the foothold target)."""
    h = 0.01 * np.sin(3.0 * x)
    h = np.where((np.abs(x - 0.6) < 0.45) & (np.abs(y) < 0.5), h + 0.25, h)
    return h.astype(np.float32)


def lidar_frame_raw(rng, n=20000):
    """Simulated LiDAR scan as RAW interleaved sensor bytes (PointCloud2
    layout: x,y,z,grass float32 records) — exercised through the native
    ring + deinterleave ingest path. Points are in the SENSOR frame
    (world = R @ p + t, sensor at z=0.8)."""
    pts = np.zeros((n, 4), np.float32)
    pts[:, 0] = rng.uniform(-1.9, 1.9, n)
    pts[:, 1] = rng.uniform(-1.9, 1.9, n)
    world_z = terrain_height(pts[:, 0], pts[:, 1]) + rng.normal(0, 0.005, n)
    pts[:, 2] = world_z - 0.8
    pts[:, 3] = np.where(world_z < 0.1, 0.9, 0.1)  # ground is grassy
    return pts.tobytes(), n


def camera_frame():
    """Overhead RGB camera: green ground, brick platform."""
    H, W = 48, 64
    img = np.zeros((3, H, W), np.float32)
    img[1] = 180.0
    img[0, :, 40:] = 150.0  # the platform side of the image reads brick-ish
    K = np.array([[40, 0, W / 2], [0, 40, H / 2], [0, 0, 1]], np.float32)
    R = np.array([[1, 0, 0], [0, -1, 0], [0, 0, -1]], np.float32)  # looking down
    return SensorFrame(
        kind="image", channels=(), data=img,
        R=R, t=np.array([0.0, 0.0, 1.5], np.float32),
        K=K, D=np.zeros(5, np.float32),
    )


def main():
    rng = np.random.default_rng(0)
    with tempfile.NamedTemporaryFile("w", suffix=".yaml", delete=False) as f:
        f.write(CONFIG)
        cfg_path = f.name
    svc = MappingService.from_config(cfg_path)
    os.unlink(cfg_path)
    print(f"service up: sensors={sorted(svc.subscribers)}")

    published = {}
    svc.set_publisher_callback("elevation_map_raw", published.update)

    # stream 10 ticks of both sensors; the lidar arrives as raw interleaved
    # bytes through the native ring (the reference's PointCloud2 hot loop)
    svc.enable_raw_ingest(capacity=8, slab_bytes=2 << 20)
    R_l = np.eye(3, dtype=np.float32)
    t_l = np.array([0, 0, 0.8], np.float32)
    for i in range(10):
        raw, n_pts = lidar_frame_raw(rng)
        svc.enqueue_raw_pointcloud(
            raw, n_pts, 16, [0, 4, 8, 12], [], R_l, t_l,
            stamp=0.2 * i, subscriber="front_lidar",
        )
        if i % 3 == 0:
            svc.enqueue(camera_frame(), subscriber="color_cam")
        svc.spin_once(now=0.2 * (i + 1))
    print(f"pointcloud fps: {svc.stats.pointcloud_process_fps:.1f}, "
          f"dropped: {svc.stats.frames_dropped}, "
          f"ring: {svc._ring.stats()}")
    print(f"published layers: {sorted(published)}")

    # services — submap in a 45-degree-rotated request frame
    th = np.pi / 4
    Rf = np.array([[np.cos(th), -np.sin(th), 0],
                   [np.sin(th), np.cos(th), 0],
                   [0, 0, 1]], np.float64)
    sub = svc.get_submap(np.zeros(2), (1.5, 1.5), ["elevation"],
                         frame_transform=(Rf, np.zeros(3)))
    e = sub["elevation"]
    print(f"rotated-frame submap: {e.shape}, "
          f"height range [{np.nanmin(e):.2f}, {np.nanmax(e):.2f}] m")

    flat_poly = np.array([[-1.2, -1.2], [-0.4, -1.2], [-0.4, -0.4], [-1.2, -0.4]],
                         np.float32)
    edge_poly = np.array([[0.0, -0.4], [1.0, -0.4], [1.0, 0.4], [0.0, 0.4]],
                         np.float32)
    for name, poly in (("flat ground", flat_poly), ("platform edge", edge_poly)):
        # result[1] is the polygon's mean UNtraversability (the reference's
        # masked-untraversability, traversability_polygon.py:10-19)
        is_safe, untrav, _ = svc.check_safety([poly])[0]
        print(f"check_safety[{name}]: safe={is_safe} untraversability={untrav:.2f}")
    print(f"map->odom drift: {svc.map_to_odom_error():+.4f} m")

    # plane decomposition on the published elevation (the sidecar node)
    pipe = PlaneDecompositionPipeline(resolution=svc.mapper.resolution)
    elev = published["elevation"]
    terrain = pipe.update(elev)
    print(f"planar regions: {len(terrain.regions)}")
    # foothold on the platform top: locate it from the data (the pipeline's
    # frame with map_origin=(0,0) is x=-row*res, y=-col*res)
    rows, cols = np.where(np.nan_to_num(elev, nan=-1.0) > 0.15)
    query = np.array([-rows.mean() * pipe.resolution,
                      -cols.mean() * pipe.resolution])
    poly = pipe.convex_approximation(terrain, query, n_vertices=12)
    if poly is not None:
        a = poly - poly.mean(0)
        b = np.roll(poly, -1, 0) - poly.mean(0)
        area = abs((a[:, 0] * b[:, 1] - a[:, 1] * b[:, 0]).sum() / 2)
        print(f"foothold polygon: convex {len(poly)}-gon, area ~{area:.3f} m^2")
    else:
        print("foothold polygon: none")


if __name__ == "__main__":
    main()
