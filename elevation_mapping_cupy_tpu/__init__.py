"""TPU-native multi-modal elevation mapping engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
leggedrobotics/elevation_mapping_cupy: batched robot-centric 2.5D layered
grid maps fused from LiDAR/depth pointclouds and camera images, with Kalman
height fusion, drift compensation, ray-cast visibility cleanup, a learned
traversability filter, multi-modal (MEM) semantic layers, post-processing
plugins, polygon safety queries, and plane segmentation — all expressed as
pure functional state transforms compiled by XLA, batched with vmap, and
sharded over device meshes with shard_map.
"""

from .config import MapConfig, load_config
from .state import MapState, init_state

__version__ = "0.1.0"

__all__ = ["MapConfig", "load_config", "MapState", "init_state", "__version__"]
