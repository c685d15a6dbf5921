"""End-to-end MEM (multi-modal) mapping demo.

The full semantic story in one script (BASELINE config #3):
  1. a sensor sidecar node back-projects synthetic depth+rgb into a
     structured pointcloud with semantic channels (the reference's
     semantic_sensor PointcloudNode),
  2. the map fuses geometry + RGB color + class-probability layers from the
     cloud through ONE shared association pass (SemanticMap + FusionManager),
  3. a camera image updates semantic layers through the on-device
     projection/occlusion path (input_image),
  4. layers export exactly like the reference GridMap publisher.

Run:  python examples/semantic_mapping.py      (CPU-safe, ~30 s with compiles)
"""

import os
import sys
import warnings

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from elevation_mapping_cupy_tpu import MapConfig
from elevation_mapping_cupy_tpu.mapper import ElevationMap
from elevation_mapping_cupy_tpu.sensor.pointcloud import (
    PointcloudParameter, PointcloudSensorNode,
)


def synth_frame(h=48, w=64, rng=None):
    """Synthetic depth+rgb camera frame: a tilted ground plane and a box."""
    rng = rng or np.random.default_rng(7)
    ys, xs = np.mgrid[0:h, 0:w]
    depth = 1.5 + 0.8 * (ys / h)                     # ground receding below
    depth[12:30, 22:42] = 1.2                        # a box in front
    depth += rng.normal(0, 0.005, (h, w))
    rgb = np.zeros((3, h, w), np.uint8)
    rgb[1] = 180                                     # grass-green world
    rgb[:, 12:30, 22:42] = np.array([160, 60, 40])[:, None, None]  # brick box
    return depth.astype(np.float32), rgb


def main() -> None:
    cfg = MapConfig(
        resolution=0.1, map_length=4.0, max_ray_length=1.0,
        pointcloud_channel_fusions=(("rgb", "color"), ("default", "class_average")),
        image_channel_fusions=(("rgb", "color"), ("default", "exponential")),
    )
    em = ElevationMap(cfg)
    R = np.eye(3, dtype=np.float32)
    t = np.array([0.0, 0.0, 0.8], np.float32)
    K = np.array([[40, 0, 32], [0, 40, 24], [0, 0, 1]], np.float32)

    # --- 1+2: sensor node -> multi-modal cloud -> fused map update
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        node = PointcloudSensorNode(
            PointcloudParameter(channels=("grass", "obstacle")),
            semantic_model="random_features",   # swap for a torchvision/DINO name
        )
    depth, rgb = synth_frame()
    # camera looks down: sensor z maps to world -z from the mast height
    cam_R = np.array([[1, 0, 0], [0, -1, 0], [0, 0, -1]], np.float32)
    cloud, channels = node(depth, K, rgb=rgb)  # channels names EVERY column
    print(f"sensor cloud: {cloud.shape}, channels: {channels}")
    em.input_pointcloud(cloud, channels, cam_R, t, 0.0, 0.0)

    # --- 3: image update through the projection/occlusion path
    grass_image = (rgb[1].astype(np.float32) / 255.0)  # fake class probability
    em.input_image([grass_image], ["grass"], cam_R, t, K, np.zeros(5, np.float32))

    # --- 4: exports (identical call shape to the reference)
    out = np.zeros((em.cell_n - 2, em.cell_n - 2), np.float32)
    for layer in ["elevation", "traversability", "rgb", "grass", "obstacle"]:
        assert em.exists_layer(layer), layer
        em.get_map_with_name_ref(layer, out)
        finite = int(np.isfinite(out).sum())
        print(f"layer {layer:16s} finite cells: {finite}")

    # decode the packed rgb layer back to channels for display
    em.get_map_with_name_ref("rgb", out)
    packed = out[np.isfinite(out)].view(np.uint32)
    if len(packed):
        r = (packed >> 16) & 255
        g = (packed >> 8) & 255
        print(f"rgb layer: mean R={r.mean():.0f} G={g.mean():.0f} "
              f"(green-dominant world: {bool(g.mean() > r.mean())})")


if __name__ == "__main__":
    main()
