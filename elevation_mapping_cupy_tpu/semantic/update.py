"""Semantic layer update orchestration (SemanticMap equivalent).

Static-shape re-design of the reference SemanticMap.update_layers_pointcloud
(semantic_map.py:223-259): the channel list is a *static* argument, so the
channel→fusion resolution, layer grouping, and per-fusion dispatch all happen
at trace time — the compiled step contains exactly the fusions it needs, the
way the reference bakes kernels per configuration.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from ..config import MapConfig
from ..ops.geometry import PointAssociation
from .fusions import PERSISTENT_NEW, POINTCLOUD_FUSIONS, SemanticUpdate

__all__ = ["resolve_channels", "persistent_mask", "update_semantic_pointcloud"]


def resolve_channels(channels: Sequence[str], cfg: MapConfig, kind: str = "pointcloud"):
    """channel name -> (feature column, semantic layer index, fusion algo).

    Channels that resolve to no fusion are skipped with the same semantics as
    the reference's warning path (semantic_map.py:158-167). Channels must
    already exist in cfg.semantic_layers (the stateful wrapper grows the
    config and recompiles for unseen channels, mirroring dynamic add_layer).
    """
    resolved = []
    for col, ch in enumerate(channels):
        fusion = cfg.fusion_for_channel(ch, kind)
        if fusion is None:
            continue
        if ch not in cfg.semantic_layers:
            raise ValueError(
                f"channel {ch!r} not in cfg.semantic_layers; grow the config first"
            )
        resolved.append((col, cfg.semantic_layers.index(ch), fusion))
    return resolved


def persistent_mask(cfg: MapConfig) -> Tuple[bool, ...]:
    """Per-layer: does sem_new persist across updates (delete_new_layers=0)?

    Intentionally resolved through the POINTCLOUD fusion table for both
    paths: the reference's initialize_fusion flips delete_new_layers only
    from layer_specs_points (semantic_map.py:52-61), so image-path resets
    follow the pointcloud persistence decision there too."""
    out = []
    for name in cfg.semantic_layers:
        fusion = cfg.fusion_for_channel(name, "pointcloud")
        out.append(fusion in PERSISTENT_NEW)
    return tuple(out)


def update_semantic_pointcloud(
    semantic: jax.Array,
    sem_new: jax.Array,
    id_max: jax.Array,
    assoc: PointAssociation,
    features: jax.Array,          # (N, C) semantic channels (columns of the cloud)
    channels: Tuple[str, ...],    # static channel names, len C
    elev_cnt: jax.Array,          # (H, W) elevation newmap count
    cfg: MapConfig,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Apply every applicable fusion for one pointcloud; returns updated
    (semantic, sem_new, id_max)."""
    if semantic.shape[0] == 0 or len(channels) == 0:
        return semantic, sem_new, id_max

    # reset per-update accumulators except persistent (Dirichlet/class-max)
    keep = persistent_mask(cfg)
    reset = jnp.asarray([not k for k in keep], bool)
    sem_new = jnp.where(reset[:, None, None], 0.0, sem_new)

    up = SemanticUpdate(semantic=semantic, sem_new=sem_new, id_max=id_max)
    resolved = resolve_channels(channels, cfg, "pointcloud")
    for fusion in sorted({f for _, _, f in resolved}):
        cols = [c for c, _, f in resolved if f == fusion]
        lays = [l for _, l, f in resolved if f == fusion]
        feats = features[:, jnp.asarray(cols)] if cols else features[:, :0]
        fn = POINTCLOUD_FUSIONS.get(fusion)
        if fn is None:
            continue
        up = fn(up, assoc, feats, lays, elev_cnt, cfg)
    return up.semantic, up.sem_new, up.id_max
