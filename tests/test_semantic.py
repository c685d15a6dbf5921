"""Numeric tests for the MEM fusion algorithms against vectorized NumPy
goldens (the reference has only print-based kernel tests — SURVEY §4)."""

import numpy as np
import jax.numpy as jnp
import pytest

from elevation_mapping_cupy_tpu import MapConfig, init_state
from elevation_mapping_cupy_tpu import core
from elevation_mapping_cupy_tpu.nn.traversability import default_weights
from elevation_mapping_cupy_tpu.semantic import fusions as F

from .golden import reference_numpy as gold


def np_encode_max(prob, cls):
    lo = prob.astype(np.float16).view(np.uint16).astype(np.uint32)
    return ((cls.astype(np.uint32) << 16) | lo).view(np.float32)


def np_decode_max(v):
    bits = v.astype(np.float32).view(np.uint32)
    prob = (bits & 0xFFFF).astype(np.uint16).view(np.float16).astype(np.float32)
    return prob, bits >> 16


def test_encode_decode_roundtrip(rng):
    prob = rng.uniform(0, 1, 100).astype(np.float32)
    cls = rng.integers(0, 30, 100).astype(np.uint32)
    enc = np_encode_max(prob, cls)
    p2, c2 = F.decode_max(jnp.asarray(enc))
    np.testing.assert_allclose(np.asarray(p2), prob.astype(np.float16).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(c2), cls)
    enc2 = F.encode_max(jnp.asarray(prob), jnp.asarray(cls))
    np.testing.assert_array_equal(np.asarray(enc2).view(np.uint32), enc.view(np.uint32))


CFG_BASE = dict(
    resolution=0.1, map_length=2.0, max_ray_length=0.5, max_points=1024,
    raycast_mode="exact",
)


def run_semantic(rng, fusions_table, channels, features, n_updates=2):
    cfg = MapConfig(
        pointcloud_channel_fusions=fusions_table,
        semantic_layers=tuple(channels),
        **CFG_BASE,
    )
    state = init_state(cfg)
    w = default_weights()
    R = np.eye(3, dtype=np.float32)
    t = np.array([0.0, 0.0, 0.5], np.float32)

    n = 600
    hist = []
    for u in range(n_updates):
        pts = rng.uniform(-0.9, 0.9, (n, 3)).astype(np.float32)
        pts[:, 2] = rng.uniform(-0.1, 0.3, n)
        feats = features(rng, n, u)
        cloud = np.concatenate([pts, feats], axis=1).astype(np.float32)
        padded = np.zeros((cfg.max_points, cloud.shape[1]), np.float32)
        padded[:n] = cloud
        mask = np.zeros(cfg.max_points, bool)
        mask[:n] = True
        state = core.update_pointcloud_semantic(
            state, jnp.asarray(padded), jnp.asarray(mask), jnp.asarray(R), jnp.asarray(t),
            jnp.float32(0), jnp.float32(0), w, cfg, tuple(channels),
        )
        hist.append((pts.copy(), feats.copy()))
    return cfg, state, hist, (R, t)


def golden_assoc_and_cnt(cfg, pts, R, t):
    world, noise, idx, valid, inside = gold.associate(pts, R, t, cfg)
    m0 = np.zeros((7, cfg.cell_n, cfg.cell_n), np.float32)
    m0[1] = cfg.initial_variance
    m0[3] = 1.0
    return world, idx, valid & inside


def scatter_sum(cfg, idx, mask, vals):
    out = np.zeros(cfg.cell_n * cfg.cell_n, np.float64)
    np.add.at(out, idx[mask], vals[mask])
    return out.reshape(cfg.cell_n, cfg.cell_n)


def elev_count(cfg, state_before, world, idx, mask):
    """Count of points fused into the elevation map (newmap[2])."""
    m = state_before
    h0 = m[0].reshape(-1)
    v0 = m[1].reshape(-1)
    z = world[:, 2]
    outlier = np.abs(h0[idx] - z) > v0[idx] * cfg.mahalanobis_thresh
    fuse = mask & ~outlier
    return scatter_sum(cfg, idx, fuse, np.ones(len(idx)))


def test_class_average(rng):
    channels = ["grass", "tree"]
    cfg, state, hist, (R, t) = run_semantic(
        rng, (("default", "class_average"),), channels,
        lambda r, n, u: r.uniform(0, 1, (n, 2)).astype(np.float32),
        n_updates=2,
    )
    # golden replay
    sem = np.zeros((2, cfg.cell_n, cfg.cell_n), np.float64)
    m = np.zeros((7, cfg.cell_n, cfg.cell_n), np.float32)
    m[1] = cfg.initial_variance
    m[3] = 1.0
    gst = gold.GoldenState(m=m, normal=np.zeros((3, cfg.cell_n, cfg.cell_n), np.float32))
    a = cfg.average_weight
    for pts, feats in hist:
        world, idx, mask = golden_assoc_and_cnt(cfg, pts, R, t)
        cnt = elev_count(cfg, gst.m, world, idx, mask)
        new = np.stack([scatter_sum(cfg, idx, mask, feats[:, k]) for k in range(2)])
        has = cnt > 0
        for k in range(2):
            mean = np.where(has, new[k] / np.maximum(cnt, 1), 0)
            prev = sem[k]
            val = np.where(prev == 0, mean, a * prev + (1 - a) * mean)
            sem[k] = np.where(has, val, prev)
        gst, _ = gold.update_pointcloud(gst, pts, R, t, 0, 0, cfg)
    np.testing.assert_allclose(np.asarray(state.semantic), sem, atol=1e-4)


def test_average(rng):
    channels = ["feat"]
    cfg, state, hist, (R, t) = run_semantic(
        rng, (("default", "average"),), channels,
        lambda r, n, u: r.uniform(0, 1, (n, 1)).astype(np.float32),
        n_updates=2,
    )
    sem = np.zeros((1, cfg.cell_n, cfg.cell_n), np.float64)
    m = np.zeros((7, cfg.cell_n, cfg.cell_n), np.float32)
    m[1] = cfg.initial_variance
    m[3] = 1.0
    gst = gold.GoldenState(m=m, normal=np.zeros((3, cfg.cell_n, cfg.cell_n), np.float32))
    for pts, feats in hist:
        world, idx, mask = golden_assoc_and_cnt(cfg, pts, R, t)
        cnt = elev_count(cfg, gst.m, world, idx, mask)
        new = scatter_sum(cfg, idx, mask, feats[:, 0])
        has = cnt > 0
        sem[0] = np.where(has, new / np.maximum(cnt, 1), sem[0])
        gst, _ = gold.update_pointcloud(gst, pts, R, t, 0, 0, cfg)
    np.testing.assert_allclose(np.asarray(state.semantic), sem, atol=1e-4)


def test_class_bayesian(rng):
    channels = ["a", "b", "c"]
    cfg, state, hist, (R, t) = run_semantic(
        rng, (("default", "class_bayesian"),), channels,
        lambda r, n, u: r.uniform(0, 1, (n, 3)).astype(np.float32),
        n_updates=2,
    )
    alpha = np.zeros((3, cfg.cell_n, cfg.cell_n), np.float64)
    for pts, feats in hist:
        world, idx, mask = golden_assoc_and_cnt(cfg, pts, R, t)
        for k in range(3):
            alpha[k] += scatter_sum(cfg, idx, mask, feats[:, k])
    s = alpha.sum(axis=0)
    s[s == 0] = 1.0
    np.testing.assert_allclose(np.asarray(state.semantic), alpha / s, atol=1e-4)
    np.testing.assert_allclose(np.asarray(state.sem_new), alpha, atol=1e-4)


def test_class_max(rng):
    channels = ["m1"]
    def feats(r, n, u):
        prob = r.uniform(0.2, 1, n).astype(np.float32)
        cls = r.integers(1, 5, n).astype(np.uint32)
        return np_encode_max(prob, cls)[:, None]
    cfg, state, hist, (R, t) = run_semantic(
        rng, (("default", "class_max"),), channels, feats, n_updates=1,
    )
    pts, fv = hist[0]
    world, idx, mask = golden_assoc_and_cnt(cfg, pts, R, t)
    prob, cls = np_decode_max(fv[:, 0])
    best = np.zeros((cfg.cell_n * cfg.cell_n,), np.float64)
    best_id = np.zeros((cfg.cell_n * cfg.cell_n,), np.uint32)
    sums = {}
    for c in np.unique(cls):
        sums[c] = np.zeros(cfg.cell_n * cfg.cell_n, np.float64)
        sel = mask & (cls == c)
        np.add.at(sums[c], idx[sel], prob[sel].astype(np.float64))
    for c in sorted(sums):
        upd = sums[c] > best
        best = np.where(upd, sums[c], best)
        best_id = np.where(upd, c, best_id)
    got_new = np.asarray(state.sem_new[0]).reshape(-1)
    np.testing.assert_allclose(got_new, best, atol=1e-3)
    got_id = np.asarray(state.id_max[0]).reshape(-1)
    nonzero = best > 0
    np.testing.assert_array_equal(got_id[nonzero], best_id[nonzero])
    # normalization: single layer → semantic = new/new = 1 where new>0
    got_sem = np.asarray(state.semantic[0]).reshape(-1)
    np.testing.assert_allclose(got_sem[nonzero], 1.0, atol=1e-5)


def test_color(rng):
    channels = ["rgb"]
    def feats(r, n, u):
        rgbs = r.integers(0, 255, (n, 3)).astype(np.uint32)
        packed = (rgbs[:, 0] << 16) | (rgbs[:, 1] << 8) | rgbs[:, 2]
        return packed.view(np.float32).reshape(n, 1)
    cfg, state, hist, (R, t) = run_semantic(
        rng, (("rgb", "color"),), channels, feats, n_updates=1,
    )
    pts, fv = hist[0]
    world, idx, mask = golden_assoc_and_cnt(cfg, pts, R, t)
    bits = fv[:, 0].view(np.uint32)
    r = (bits >> 16) & 0xFF
    g = (bits >> 8) & 0xFF
    b = bits & 0xFF
    cnt = scatter_sum(cfg, idx, mask, np.ones(len(idx))).reshape(-1)
    rs = scatter_sum(cfg, idx, mask, r.astype(np.float64)).reshape(-1)
    gs = scatter_sum(cfg, idx, mask, g.astype(np.float64)).reshape(-1)
    bs = scatter_sum(cfg, idx, mask, b.astype(np.float64)).reshape(-1)
    has = cnt > 0
    rm = (rs[has] // np.maximum(cnt[has], 1)).astype(np.uint32)
    gm = (gs[has] // np.maximum(cnt[has], 1)).astype(np.uint32)
    bm = (bs[has] // np.maximum(cnt[has], 1)).astype(np.uint32)
    want = ((rm << 16) | (gm << 8) | bm).view(np.float32)
    got = np.asarray(state.semantic[0]).reshape(-1)[has]
    np.testing.assert_array_equal(got.view(np.uint32), want.view(np.uint32))


def test_class_bayesian_drops_negative_features(rng):
    """alpha_kernel adds nothing for theta < 0 (custom_semantic_kernels.py:
    150-157: arg_max stays 0, theta_max stays 0)."""
    channels = ["a", "b"]
    def feats(r, n, u):
        f = r.uniform(-1, 1, (n, 2)).astype(np.float32)
        return f
    cfg, state, hist, (R, t) = run_semantic(
        rng, (("default", "class_bayesian"),), channels, feats, n_updates=2,
    )
    alpha = np.zeros((2, cfg.cell_n, cfg.cell_n), np.float64)
    for pts, fv in hist:
        world, idx, mask = golden_assoc_and_cnt(cfg, pts, R, t)
        for k in range(2):
            alpha[k] += scatter_sum(cfg, idx, mask, np.maximum(fv[:, k], 0.0))
    np.testing.assert_allclose(np.asarray(state.sem_new), alpha, atol=1e-4)
    assert (np.asarray(state.sem_new) >= 0).all()


def test_class_max_overflow_ids_are_dropped_not_miscredited(rng):
    """More distinct class ids than the static bucket count: overflow ids
    must be dropped, never credited to another class's bucket."""
    from elevation_mapping_cupy_tpu.semantic.fusions import fuse_class_max, SemanticUpdate
    from elevation_mapping_cupy_tpu.ops.geometry import associate_points

    cfg = MapConfig(
        pointcloud_channel_fusions=(("default", "class_max"),),
        semantic_layers=("m1",), **CFG_BASE,
    )
    n_pts = 400
    pts = rng.uniform(-0.9, 0.9, (n_pts, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(-0.1, 0.3, n_pts)
    prob = rng.uniform(0.2, 1, n_pts).astype(np.float32)
    cls = rng.integers(1, 40, n_pts).astype(np.uint32)   # 39 distinct ids
    enc = np_encode_max(prob, cls)[:, None]

    padded = np.zeros((cfg.max_points, 3), np.float32)
    padded[:n_pts] = pts
    mask = np.zeros(cfg.max_points, bool); mask[:n_pts] = True
    fpad = np.zeros((cfg.max_points, 1), np.float32); fpad[:n_pts] = enc
    assoc = associate_points(jnp.asarray(padded), jnp.asarray(mask),
                             jnp.eye(3), jnp.asarray([0, 0, 0.5], jnp.float32), cfg)
    up = SemanticUpdate(
        semantic=jnp.zeros((1, cfg.cell_n, cfg.cell_n)),
        sem_new=jnp.zeros((1, cfg.cell_n, cfg.cell_n)),
        id_max=jnp.zeros((1, cfg.cell_n, cfg.cell_n), jnp.uint32),
    )
    max_classes = 8
    out = fuse_class_max(up, assoc, jnp.asarray(fpad), [0],
                         jnp.zeros((cfg.cell_n, cfg.cell_n)), cfg,
                         max_classes=max_classes)

    # kept = smallest (max_classes) unique ids incl. 0 from the empty id_max
    kept = np.unique(np.concatenate([cls[:], np.zeros(1, np.uint32)]))[:max_classes]
    world, idx, pmask = golden_assoc_and_cnt(cfg, pts, np.eye(3, dtype=np.float32),
                                             np.array([0, 0, 0.5], np.float32))
    p16 = prob.astype(np.float16).astype(np.float64)
    best = np.zeros(cfg.cell_n * cfg.cell_n, np.float64)
    best_id = np.zeros(cfg.cell_n * cfg.cell_n, np.uint32)
    for c in kept:
        s = np.zeros(cfg.cell_n * cfg.cell_n, np.float64)
        sel = pmask & (cls == c)
        np.add.at(s, idx[sel], p16[sel])
        upd = s > best
        best = np.where(upd, s, best)
        best_id = np.where(upd, c, best_id)
    got = np.asarray(out.sem_new[0]).reshape(-1)
    np.testing.assert_allclose(got, best, atol=1e-3)
    nz = best > 0
    np.testing.assert_array_equal(np.asarray(out.id_max[0]).reshape(-1)[nz], best_id[nz])
