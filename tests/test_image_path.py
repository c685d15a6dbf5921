"""Image→map correspondence vs a loop-based golden (Bresenham occlusion)."""

import math

import numpy as np
import jax.numpy as jnp

from elevation_mapping_cupy_tpu import MapConfig, init_state
from elevation_mapping_cupy_tpu import core
from elevation_mapping_cupy_tpu.ops.image import image_to_map_correspondence


def golden_correspondence(layers, center, x1, y1, z1, P, K, D, ih, iw, cfg):
    """Direct transcription of the reference kernel semantics
    (custom_image_kernels.py:34-153) as Python loops."""
    n = cfg.cell_n
    uv = np.zeros((2, n, n), np.float32)
    valid = np.zeros((n, n), bool)
    hmap = np.asarray(layers[0])
    vmap = np.asarray(layers[2])
    for i in range(n * n):
        x0, y0 = i // n, i % n
        if vmap[x0, y0] != 1:
            continue
        p1 = (x0 - n / 2) * cfg.resolution + center[0]
        p2 = (y0 - n / 2) * cfg.resolution + center[1]
        p3 = hmap[x0, y0] + center[2]
        u = p1 * P[0, 0] + p2 * P[0, 1] + p3 * P[0, 2] + P[0, 3]
        v = p1 * P[1, 0] + p2 * P[1, 1] + p3 * P[1, 2] + P[1, 3]
        d = p1 * P[2, 0] + p2 * P[2, 1] + p3 * P[2, 2] + P[2, 3]
        if d <= 0:
            continue
        u, v = u / d, v / d
        if not (np.any(D != 0)):
            pass
        else:
            k1, k2, pp1, pp2, k3 = D
            fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
            xn, yn = (u - cx) / fx, (v - cy) / fy
            r2 = xn * xn + yn * yn
            rad = 1 + k1 * r2 + k2 * r2 * r2 + k3 * r2**3
            uc = xn * rad + 2 * pp1 * xn * yn + pp2 * (r2 + 2 * xn * xn)
            vc = yn * rad + 2 * pp2 * xn * yn + pp1 * (r2 + 2 * yn * yn)
            u, v = fx * uc + cx, fy * vc + cy
        if u < 0 or v < 0 or u >= iw or v >= ih:
            continue
        # bresenham toward the camera cell
        cx0, cy0 = x0, y0
        total = math.sqrt((x0 - x1) ** 2 + (y0 - y1) ** 2)
        z0 = hmap[x0, y0]
        dz = z1 - z0
        dx = abs(x1 - cx0)
        sx = 1 if cx0 < x1 else -1
        dy = -abs(y1 - cy0)
        sy = 1 if cy0 < y1 else -1
        err = dx + dy
        ok = True
        while True:
            if cx0 == x1 and cy0 == y1:
                break
            if 0 <= cx0 < n and 0 <= cy0 < n and vmap[cx0, cy0]:
                dis = math.sqrt((x0 - cx0) ** 2 + (y0 - cy0) ** 2)
                rayheight = z0 + (dis / total * dz if total > 0 else 0)
                if hmap[cx0, cy0] - cfg.tolerance_z_collision > rayheight:
                    ok = False
                    break
            e2 = 2 * err
            if e2 >= dy:
                if cx0 == x1:
                    break
                err += dy
                cx0 += sx
            if e2 <= dx:
                if cy0 == y1:
                    break
                err += dx
                cy0 += sy
        uv[0, x0, y0] = u
        uv[1, x0, y0] = v
        valid[x0, y0] = ok
    return uv, valid


def test_correspondence_matches_golden(rng):
    cfg = MapConfig(resolution=0.1, map_length=2.0, max_points=256,
                    image_occlusion_mode="bresenham")
    n = cfg.cell_n
    state = init_state(cfg)
    # random valid height field with an obstacle wall
    h = rng.uniform(-0.05, 0.05, (n, n)).astype(np.float32)
    h[8:10, :] = 0.8  # wall occluding cells behind it
    valid = (rng.uniform(0, 1, (n, n)) > 0.2).astype(np.float32)
    layers = state.layers.at[0].set(jnp.asarray(h)).at[2].set(jnp.asarray(valid))

    K = np.array([[50, 0, 32], [0, 50, 24], [0, 0, 1]], np.float32)
    Rm = np.eye(3, dtype=np.float32)
    t = np.array([0.0, 0.0, 0.7], np.float32)
    P = (K @ np.concatenate([Rm, t[:, None]], 1)).astype(np.float32)
    t_cam = -Rm.T @ t
    x1 = int(np.uint32(n / 2 + t_cam[0] / cfg.resolution))
    y1 = int(np.uint32(n / 2 + t_cam[1] / cfg.resolution))
    z1 = np.float32(t_cam[2])
    D = np.array([0.01, -0.005, 0.001, 0.0005, 0.0], np.float32)
    ih, iw = 48.0, 64.0

    uv, vmask = image_to_map_correspondence(
        layers, jnp.zeros(3), jnp.asarray([x1, y1]), jnp.float32(z1),
        jnp.asarray(P), jnp.asarray(K), jnp.asarray(D),
        jnp.float32(ih), jnp.float32(iw), cfg,
    )
    guv, gvalid = golden_correspondence(
        layers, np.zeros(3), x1, y1, z1, P, K, D, ih, iw, cfg
    )
    np.testing.assert_array_equal(np.asarray(vmask), gvalid)
    got_uv = np.asarray(uv)
    np.testing.assert_allclose(got_uv[:, gvalid], guv[:, gvalid], atol=2e-3)
    # the view actually covers part of the map
    assert gvalid.sum() > 10


def test_shadow_occlusion_matches_bresenham(rng):
    """Shadow-map occlusion (production) vs the exact Bresenham march: the
    visibility masks must agree except at quantization boundaries."""
    cfg_b = MapConfig(resolution=0.1, map_length=4.0, max_points=256,
                      image_occlusion_mode="bresenham")
    cfg_s = cfg_b.replace(image_occlusion_mode="shadow")
    n = cfg_b.cell_n
    state = init_state(cfg_b)
    h = rng.uniform(-0.05, 0.05, (n, n)).astype(np.float32)
    h[12:15, 5:35] = 0.9          # wall
    h[25:28, 10:30] = 0.5         # second lower wall
    valid = (rng.uniform(0, 1, (n, n)) > 0.1).astype(np.float32)
    layers = state.layers.at[0].set(jnp.asarray(h)).at[2].set(jnp.asarray(valid))

    K = np.array([[60, 0, 48], [0, 60, 36], [0, 0, 1]], np.float32)
    Rm = np.array([[1, 0, 0], [0, -1, 0], [0, 0, -1]], np.float32)
    t = np.array([0.2, -0.1, 1.2], np.float32)
    P = (K @ np.concatenate([Rm, t[:, None]], 1)).astype(np.float32)
    t_cam = -Rm.T @ t
    x1 = int(np.uint32(n / 2 + t_cam[0] / cfg_b.resolution))
    y1 = int(np.uint32(n / 2 + t_cam[1] / cfg_b.resolution))
    z1 = np.float32(t_cam[2])
    D = np.zeros(5, np.float32)
    args = (layers, jnp.zeros(3), jnp.asarray([x1, y1]), jnp.float32(z1),
            jnp.asarray(P), jnp.asarray(K), jnp.asarray(D),
            jnp.float32(72.0), jnp.float32(96.0))

    _, v_b = image_to_map_correspondence(*args, cfg_b)
    _, v_s = image_to_map_correspondence(*args, cfg_s)
    v_b, v_s = np.asarray(v_b), np.asarray(v_s)
    assert v_b.sum() > 50          # scene is non-trivial
    both = v_b | v_s
    disagree = (v_b != v_s).sum() / max(both.sum(), 1)
    assert disagree < 0.06, f"disagreement {disagree:.3f}"
    # occluded region behind the tall wall must be occluded in both
    iou = (v_b & v_s).sum() / max(both.sum(), 1)
    assert iou > 0.94


def test_input_image_mixed_color_and_mono_planes(rng):
    """'rgb' consumes THREE image planes (elevation_mapping_ros.cpp:428-441):
    a mono channel after a color one must read plane 3, not plane 1."""
    cfg = MapConfig(
        resolution=0.1, map_length=2.0, max_points=256,
        image_occlusion_mode="bresenham",
        semantic_layers=("rgb", "mask"),
        image_channel_fusions=(("rgb", "color"), ("mask", "exponential"),
                               ("default", "exponential")),
    )
    n = cfg.cell_n
    state = init_state(cfg)
    h = rng.uniform(-0.02, 0.02, (n, n)).astype(np.float32)
    layers = state.layers.at[0].set(jnp.asarray(h)).at[2].set(1.0)
    state = state._replace(layers=layers)

    K = np.array([[50, 0, 32], [0, 50, 24], [0, 0, 1]], np.float32)
    Rm = np.array([[1, 0, 0], [0, -1, 0], [0, 0, -1]], np.float32)
    t = np.array([0.0, 0.0, 1.0], np.float32)
    ih, iw = 48, 64
    # planes: R, G, B, mask — green differs from mask so misindexing is caught
    img = np.stack([
        np.full((ih, iw), 0.2, np.float32),
        np.full((ih, iw), 0.4, np.float32),
        np.full((ih, iw), 0.6, np.float32),
        np.full((ih, iw), 0.9, np.float32),
    ])
    out = core.input_image(
        state, jnp.asarray(img), jnp.asarray(Rm), jnp.asarray(t),
        jnp.asarray(K), jnp.zeros(5), cfg, ("rgb", "mask"),
    )
    sem = np.asarray(out.semantic)
    touched = sem[1] != 0
    assert touched.sum() > 10
    # exponential fusion from 0: new = (1-alpha)*old + alpha*img = alpha*img
    expect = cfg.image_exponential_alpha * 0.9
    np.testing.assert_allclose(sem[1][touched], expect, atol=1e-5)
