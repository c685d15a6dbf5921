"""Multi-modal (MEM) fusion algorithms for semantic layers.

Functional re-derivations of the reference fusion plugins
(fusion/pointcloud_*.py, fusion/image_*.py) on top of the shared point→cell
association. All scatters go through ops/scatter (atomic-free segment sums).

Known reference quirks reproduced or documented:
  * the per-cell denominators of `average`/`class_average` use the *elevation*
    inlier count (new_elmap layer 2), not the semantic point count
    (pointcloud_average.py:72-76);
  * the sum kernels gate only on (valid, inside) — Mahalanobis outliers do
    contribute to semantic sums (custom_semantic_kernels.py:40-46);
  * `bayesian_inference` keeps its posterior variance in a per-update buffer
    that the reference zeroes every update, freezing the posterior
    (semantic_map.py:243 + pointcloud_bayesian_inference.py TODO at :100).
    We reproduce the same storage layout (sem_new) and its reset policy so
    behavior matches bit-for-bit; fixing it is a config knob away.
  * reference kernels launched with ``size=N`` instead of ``size=N*L``
    (sum_compact/alpha/add_color) silently drop (point, channel) pairs when a
    fusion owns more than one layer. We implement the mathematically intended
    all-pairs behavior; identical for the reference's shipped configs (L=1).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..config import MapConfig
from ..ops import scatter
from ..ops.geometry import PointAssociation

__all__ = [
    "SemanticUpdate",
    "fuse_average",
    "fuse_class_average",
    "fuse_bayesian_inference",
    "fuse_class_bayesian",
    "fuse_class_max",
    "fuse_color",
    "decode_max",
    "encode_max",
    "rgb_float_to_uint",
    "uint_to_rgb_float",
]


# ---------------------------------------------------------------------------
# float32 bit-packing helpers (semantic_map.py:311-327, test helpers)
# ---------------------------------------------------------------------------

def decode_max(mer: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """float32 → (prob float32, class id uint32): low 16 bits are a float16
    probability, high 16 bits the class id."""
    bits = jax.lax.bitcast_convert_type(mer.astype(jnp.float32), jnp.uint32)
    prob = jax.lax.bitcast_convert_type(
        (bits & 0xFFFF).astype(jnp.uint16), jnp.float16
    ).astype(jnp.float32)
    cls = bits >> 16
    return prob, cls


def encode_max(prob: jax.Array, cls: jax.Array) -> jax.Array:
    lo = jax.lax.bitcast_convert_type(prob.astype(jnp.float16), jnp.uint16).astype(jnp.uint32)
    bits = (cls.astype(jnp.uint32) << 16) | lo
    return jax.lax.bitcast_convert_type(bits, jnp.float32)


def rgb_float_to_uint(v: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
    bits = jax.lax.bitcast_convert_type(v.astype(jnp.float32), jnp.uint32)
    return (bits >> 16) & 0xFF, (bits >> 8) & 0xFF, bits & 0xFF


def uint_to_rgb_float(r: jax.Array, g: jax.Array, b: jax.Array) -> jax.Array:
    bits = (r.astype(jnp.uint32) << 16) | (g.astype(jnp.uint32) << 8) | b.astype(jnp.uint32)
    return jax.lax.bitcast_convert_type(bits, jnp.float32)


# ---------------------------------------------------------------------------

class SemanticUpdate(NamedTuple):
    semantic: jax.Array   # (S, H, W)
    sem_new: jax.Array    # (S, H, W)
    id_max: jax.Array     # (S, H, W) uint32


def _sum_features(
    n_cells: int,
    assoc: PointAssociation,
    feats: jax.Array,        # (N, L) feature columns for this fusion
) -> jax.Array:
    """Σ feature per cell for each layer (sum_kernel). Returns (L, n_cells)."""
    import math

    n = int(math.isqrt(n_cells))
    streams = [feats[:, k] for k in range(feats.shape[1])]
    mask = assoc.valid & assoc.inside
    return scatter.scatter_add_streams_2d(
        n, n, assoc.flat_idx, streams, mask, exact=(False,) * len(streams)
    ).reshape(len(streams), n_cells)


def fuse_average(
    up: SemanticUpdate,
    assoc: PointAssociation,
    feats: jax.Array,
    layer_ids: Sequence[int],
    elev_cnt: jax.Array,     # (H, W) elevation newmap count
    cfg: MapConfig,
) -> SemanticUpdate:
    """pointcloud_average (pointcloud_average.py:83-113)."""
    n = cfg.cell_n
    sums = _sum_features(n * n, assoc, feats).reshape(-1, n, n)
    cnt = elev_cnt
    has = cnt > 0
    sem = up.semantic
    new = up.sem_new
    for k, lay in enumerate(layer_ids):
        new = new.at[lay].add(sums[k])
        val = new[lay] / jnp.maximum(cnt, 1.0)
        sem = sem.at[lay].set(jnp.where(has, val, sem[lay]))
    return up._replace(semantic=sem, sem_new=new)


def fuse_class_average(
    up: SemanticUpdate,
    assoc: PointAssociation,
    feats: jax.Array,
    layer_ids: Sequence[int],
    elev_cnt: jax.Array,
    cfg: MapConfig,
) -> SemanticUpdate:
    """pointcloud_class_average: EMA with alpha=average_weight
    (pointcloud_class_average.py:94-126)."""
    n = cfg.cell_n
    a = cfg.average_weight
    sums = _sum_features(n * n, assoc, feats).reshape(-1, n, n)
    cnt = elev_cnt
    has = cnt > 0
    sem = up.semantic
    new = up.sem_new
    for k, lay in enumerate(layer_ids):
        new = new.at[lay].add(sums[k])
        mean = new[lay] / jnp.maximum(cnt, 1.0)
        prev = sem[lay]
        val = jnp.where(prev == 0, mean, a * prev + (1 - a) * mean)
        sem = sem.at[lay].set(jnp.where(has, val, prev))
    return up._replace(semantic=sem, sem_new=new)


def fuse_bayesian_inference(
    up: SemanticUpdate,
    assoc: PointAssociation,
    feats: jax.Array,
    layer_ids: Sequence[int],
    elev_cnt: jax.Array,
    cfg: MapConfig,
) -> SemanticUpdate:
    """pointcloud_bayesian_inference (pointcloud_bayesian_inference.py:83-122).

    Gaussian posterior per cell with measurement sigma=1; the posterior
    variance lives in sem_new[lay] (reference: new_map), subject to the same
    per-update reset policy as the reference.
    """
    n = cfg.cell_n
    sums = _sum_features(n * n, assoc, feats).reshape(-1, n, n)
    cnt = elev_cnt
    has = cnt > 0
    safe = jnp.maximum(cnt, 1.0)
    sem = up.semantic
    new = up.sem_new
    for k, lay in enumerate(layer_ids):
        feat_ml = sums[k] / safe
        feat_old = sem[lay]
        sigma_old = new[lay]
        sigma = 1.0
        denom = cnt * sigma_old + sigma
        feat_new = sigma * feat_old / denom + cnt * sigma_old * feat_ml / denom
        sigma_new = sigma * sigma_old / denom
        sem = sem.at[lay].set(jnp.where(has, feat_new, feat_old))
        new = new.at[lay].set(jnp.where(has, sigma_new, sigma_old))
    return up._replace(semantic=sem, sem_new=new)


def fuse_class_bayesian(
    up: SemanticUpdate,
    assoc: PointAssociation,
    feats: jax.Array,
    layer_ids: Sequence[int],
    elev_cnt: jax.Array,
    cfg: MapConfig,
) -> SemanticUpdate:
    """pointcloud_class_bayesian: Dirichlet alpha accumulation + normalization
    (pointcloud_class_bayesian.py:53-75). sem_new (alpha) persists across
    updates (delete_new_layers=0, semantic_map.py:54-56)."""
    n = cfg.cell_n
    # alpha_kernel: theta < 0 leaves (arg_max=0, theta_max=0) and adds 0 —
    # negative features contribute nothing (custom_semantic_kernels.py:150-157)
    f = jnp.maximum(feats, 0.0)
    sums = _sum_features(n * n, assoc, f).reshape(-1, n, n)
    new = up.sem_new
    for k, lay in enumerate(layer_ids):
        new = new.at[lay].add(sums[k])
    lays = jnp.asarray(list(layer_ids))
    alpha = new[lays]
    sum_alpha = jnp.sum(alpha, axis=0)
    sum_alpha = jnp.where(sum_alpha == 0, 1.0, sum_alpha)
    sem = up.semantic.at[lays].set(alpha / sum_alpha[None])
    return up._replace(semantic=sem, sem_new=new)


def fuse_class_max(
    up: SemanticUpdate,
    assoc: PointAssociation,
    feats: jax.Array,        # (N, L) bit-packed prob/class values
    layer_ids: Sequence[int],
    elev_cnt: jax.Array,
    cfg: MapConfig,
    max_classes: int = 32,
) -> SemanticUpdate:
    """pointcloud_class_max (pointcloud_class_max.py:49-123).

    The reference's dynamic `cp.unique` over present class ids becomes a
    static-size `jnp.unique(..., size=max_classes)` bucketing, then a
    per-(point, layer) scatter into (bucket, cell) probability sums and a
    per-layer arg-max sweep. Class ids beyond `max_classes` distinct values
    are dropped (masked, never mis-credited to another bucket).

    Note the overwrite semantics are reference-faithful: the reference also
    rebuilds new_map purely from the current cloud's prob_sum — its
    "add the previous alpha" merge is commented out as TODO
    (pointcloud_class_max.py:108-113); persistence of sem_new/id_max only
    affects id bucketing (unique over existing ids) and map shifting.
    """
    n = cfg.cell_n
    lays = jnp.asarray(list(layer_ids))
    prob, cls = decode_max(feats)            # (N, L) each
    mask = assoc.valid & assoc.inside

    existing = up.id_max[lays].reshape(-1)
    cand = jnp.concatenate([cls.reshape(-1), existing])
    uniq = jnp.unique(cand, size=max_classes, fill_value=jnp.uint32(0xFFFFFFFF))

    # bucket each (point, layer) class id; ids that fell off the static
    # unique (> max_classes distinct) would searchsorted onto a different
    # class's bucket — mask them out instead
    bucket = jnp.searchsorted(uniq, cls.reshape(-1))  # (N*L,)
    bucket = jnp.minimum(bucket, max_classes - 1)
    found = uniq[bucket] == cls.reshape(-1)
    cell = jnp.repeat(assoc.flat_idx, feats.shape[1])
    pmask = jnp.repeat(mask, feats.shape[1]) & found
    flat = bucket.astype(jnp.int32) * (n * n) + cell.astype(jnp.int32)
    prob_sum = scatter.scatter_add(
        max_classes * n * n, flat, prob.reshape(-1), pmask
    ).reshape(max_classes, n, n)

    sem = up.semantic
    new = up.sem_new
    idm = up.id_max
    for lay in layer_ids:
        arg = jnp.argmax(prob_sum, axis=0)                  # (H, W)
        best = jnp.max(prob_sum, axis=0)
        new = new.at[lay].set(best)
        idm = idm.at[lay].set(uniq[arg])
        # zero the winner so the next layer takes the runner-up
        prob_sum = prob_sum.at[
            arg, jnp.arange(n)[:, None], jnp.arange(n)[None, :]
        ].set(0.0)

    alpha = new[lays]
    sum_alpha = jnp.sum(alpha, axis=0)
    sum_alpha = jnp.where(sum_alpha == 0, 1.0, sum_alpha)
    sem = sem.at[lays].set(alpha / sum_alpha[None])
    return up._replace(semantic=sem, sem_new=new, id_max=idm)


def fuse_color(
    up: SemanticUpdate,
    assoc: PointAssociation,
    feats: jax.Array,        # (N, L) float-packed rgb
    layer_ids: Sequence[int],
    elev_cnt: jax.Array,
    cfg: MapConfig,
) -> SemanticUpdate:
    """pointcloud_color (pointcloud_color.py:120-152): unpack → mean → repack."""
    n = cfg.cell_n
    mask = assoc.valid & assoc.inside
    sem = up.semantic
    cnt = scatter.scatter_add(n * n, assoc.flat_idx, jnp.ones(feats.shape[0], jnp.float32), mask)
    has = (cnt > 0).reshape(n, n)
    safe = jnp.maximum(cnt, 1.0)
    for k, lay in enumerate(layer_ids):
        r, g, b = rgb_float_to_uint(feats[:, k])
        # uint8 components are bf16-exact -> MXU path stays integer-exact
        sums = scatter.scatter_add_streams_2d(
            n,
            n,
            assoc.flat_idx,
            [r.astype(jnp.float32), g.astype(jnp.float32), b.astype(jnp.float32)],
            mask,
            exact=(True, True, True),
        ).reshape(3, -1)
        # reference divides uint sums with integer division
        rm = jnp.floor(sums[0] / safe).reshape(n, n)
        gm = jnp.floor(sums[1] / safe).reshape(n, n)
        bm = jnp.floor(sums[2] / safe).reshape(n, n)
        packed = uint_to_rgb_float(rm.astype(jnp.uint32), gm.astype(jnp.uint32), bm.astype(jnp.uint32))
        sem = sem.at[lay].set(jnp.where(has, packed, sem[lay]))
    return up._replace(semantic=sem)


# registry: fusion algorithm name -> implementation
POINTCLOUD_FUSIONS = {
    "average": fuse_average,
    "class_average": fuse_class_average,
    "bayesian_inference": fuse_bayesian_inference,
    "class_bayesian": fuse_class_bayesian,
    "class_max": fuse_class_max,
    "color": fuse_color,
}

# fusions whose sem_new accumulation buffer persists across updates
# (semantic_map.py:51-63 delete_new_layers)
PERSISTENT_NEW = ("class_bayesian", "class_max")
