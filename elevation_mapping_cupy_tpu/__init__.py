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

import os as _os

import jax as _jax

# Persistent compilation cache: the Pallas/Mosaic kernels (ops/pallas_scatter)
# compile in minutes on tunneled TPU backends but are stable across runs.
# TPU-only: caching XLA:CPU AOT results trips machine-feature mismatches.
if not _os.environ.get("JAX_COMPILATION_CACHE_DIR") and not _os.environ.get(
    "JAX_PLATFORMS", ""
).startswith("cpu"):
    try:
        _jax.config.update(
            "jax_compilation_cache_dir",
            _os.path.expanduser("~/.cache/elevation_mapping_tpu/jax"),
        )
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:  # very old jax
        pass

from .config import MapConfig, load_config, load_config_with_extras
from .state import MapState, init_state

__version__ = "0.1.0"

__all__ = ["MapConfig", "load_config", "load_config_with_extras", "MapState", "init_state", "__version__"]
