"""Depth-image → structured semantic pointcloud (PointcloudNode equivalent).

Re-derivation of the reference sensor sidecar's pinhole back-projection
(semantic_sensor/pointcloud_node.py:205-250): depth (+rgb, +confidence,
+semantic channels) become an (N, 3 + C) cloud ready for
ElevationMap.input_pointcloud.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np



__all__ = ["PointcloudParameter", "create_pcl_from_image"]


@dataclasses.dataclass
class PointcloudParameter:
    """Mirrors semantic_sensor/pointcloud_parameters.py:5-47 (non-ROS parts)."""

    sensor_name: str = "camera"
    channels: Tuple[str, ...] = ()
    fusion: Tuple[str, ...] = ()
    confidence: bool = False
    confidence_threshold: float = 10.0
    depth_scale: float = 1.0


def create_pcl_from_image(
    depth: np.ndarray,              # (H, W) depth [m]; 0/NaN = invalid
    K: np.ndarray,                  # (3, 3) intrinsics
    channels: Dict[str, np.ndarray] = None,   # name -> (H, W) per-pixel values
    rgb: Optional[np.ndarray] = None,          # (3, H, W) uint8
    confidence: Optional[np.ndarray] = None,   # (H, W)
    confidence_threshold: float = 10.0,
    stride: int = 1,
) -> Tuple[np.ndarray, List[str]]:
    """Returns (cloud (N, 3+C) float32 in the camera frame, channel names).

    Camera convention: x right, y down, z forward (optical frame), like the
    reference's cv-style back-projection.
    """
    channels = channels or {}
    H, W = depth.shape
    v, u = np.mgrid[0:H:stride, 0:W:stride]
    z = depth[::stride, ::stride].astype(np.float32)
    valid = np.isfinite(z) & (z > 0)
    if confidence is not None:
        valid &= confidence[::stride, ::stride] >= confidence_threshold
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    x = (u - cx) * z / fx
    y = (v - cy) * z / fy

    cols = [x[valid], y[valid], z[valid]]
    names = ["x", "y", "z"]
    if rgb is not None:
        r = rgb[0, ::stride, ::stride][valid].astype(np.uint32)
        g = rgb[1, ::stride, ::stride][valid].astype(np.uint32)
        b = rgb[2, ::stride, ::stride][valid].astype(np.uint32)
        cols.append(((r << 16) | (g << 8) | b).view(np.float32))
        names.append("rgb")
    for name, img in channels.items():
        cols.append(img[::stride, ::stride][valid].astype(np.float32))
        names.append(name)
    cloud = np.stack(cols, axis=1).astype(np.float32)
    return cloud, names
