"""Numeric tests for the built-in post-processing plugins (plugins/builtin.py).

The reference's test_plugins.py only smoke-runs every configured plugin on
random maps (tests/test_plugins.py:36-69); here each plugin is additionally
pinned against hand-computed or scipy/numpy oracle values.
"""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy import ndimage

from elevation_mapping_cupy_tpu.plugins.builtin import REGISTRY
from elevation_mapping_cupy_tpu.semantic.fusions import rgb_float_to_uint


N = 12
CORE_NAMES = [
    "elevation", "variance", "is_valid", "traversability", "time",
    "upper_bound", "is_upper_bound",
]


def _core_map(rng):
    m = np.zeros((7, N, N), np.float32)
    m[0] = rng.uniform(-0.5, 0.5, (N, N)).astype(np.float32)
    m[1] = 0.01
    m[2] = 1.0
    m[3] = rng.uniform(0, 1, (N, N)).astype(np.float32)
    return m


def test_min_max_filter_fill_invalid(rng):
    m = _core_map(rng)
    m[2, 5, 5] = 0.0          # one invalid cell
    m[0, 5, 5] = 99.0         # garbage height there
    for name, red in (("min_filter", np.min), ("max_filter", np.max)):
        plug = REGISTRY[name](cell_n=N, dilation_size=1, iteration_n=1)
        out = np.asarray(plug(jnp.asarray(m), CORE_NAMES))
        # valid cells unchanged
        valid = m[2] > 0.5
        np.testing.assert_allclose(out[valid], m[0][valid], atol=0)
        # the invalid cell becomes the min/max of its valid 3x3 neighbors
        nb = [m[0][5 + dy, 5 + dx] for dy in (-1, 0, 1) for dx in (-1, 0, 1)
              if (dy, dx) != (0, 0)]
        np.testing.assert_allclose(out[5, 5], red(nb), rtol=1e-6)


def test_min_filter_propagates_through_original_invalids(rng):
    """min_filter re-fills *originally* invalid cells every iteration
    (reference quirk, min_filter.py:108-110), so values flood inward.
    Border cells are never fill *sources* (the reference's is_inside
    gate excludes the 1-cell border), so the seeds sit in row 1."""
    m = _core_map(rng)
    m[2, :, :] = 0.0
    m[2, 1, :] = 1.0          # only row 1 (interior) is known
    m[0] = np.broadcast_to(np.arange(N, dtype=np.float32)[None, :], (N, N)).copy()
    plug = REGISTRY["min_filter"](cell_n=N, dilation_size=1, iteration_n=N)
    out = np.asarray(plug(jnp.asarray(m), CORE_NAMES))
    assert np.isfinite(out).all()
    # row 1 (valid) unchanged; everything else filled from interior sources
    np.testing.assert_allclose(out[1], np.arange(N), atol=0)
    filled = np.ones((N, N), bool)
    filled[1] = False
    assert out[filled].min() >= 1.0   # border col 0 never a source
    assert out[filled].max() <= 10.0  # border col N-1 never a source


def test_smooth_filter_matches_scipy(rng):
    m = _core_map(rng)
    plug = REGISTRY["smooth_filter"](cell_n=N)
    out = np.asarray(plug(jnp.asarray(m), CORE_NAMES, jnp.zeros((0, N, N)), []))
    ref = m[0]
    for _ in range(2):
        ref = ndimage.uniform_filter(ref, size=3, mode="reflect")
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_inpainting_preserves_valid_and_fills(rng):
    m = _core_map(rng)
    m[2, 4:7, 4:7] = 0.0
    plug = REGISTRY["inpainting"](cell_n=N)
    out = np.asarray(plug(jnp.asarray(m), CORE_NAMES))
    assert np.isfinite(out).all()
    valid = m[2] > 0.5
    span = m[0][valid].max() - m[0][valid].min()
    # cv2 path quantizes to uint8 over the valid range
    np.testing.assert_allclose(out[valid], m[0][valid], atol=span / 255 + 1e-6)
    # filled values stay within the known range
    assert out[~valid].min() >= m[0][valid].min() - span / 255
    assert out[~valid].max() <= m[0][valid].max() + span / 255


def test_erosion_matches_minimum_filter(rng):
    m = _core_map(rng)
    plug = REGISTRY["erosion"](cell_n=N, input_layer_name="traversability",
                               kernel_size=3, iterations=1)
    out = np.asarray(plug(jnp.asarray(m), CORE_NAMES, jnp.zeros((0, N, N)), [],
                          jnp.zeros((0, N, N)), []))
    x = m[3]
    lo, hi = x.min(), x.max()
    x8 = ((x - lo) * 255 / (hi - lo)).astype(np.uint8)
    ref8 = ndimage.minimum_filter(x8, size=3, mode="nearest")
    ref = ref8.astype(np.float32) * (hi - lo) / 255 + lo
    np.testing.assert_allclose(out, ref, atol=(hi - lo) / 255 + 1e-6)


def test_semantic_filter_colors_argmax_class(rng):
    m = _core_map(rng)
    sem = np.zeros((2, N, N), np.float32)
    sem[0, : N // 2] = 1.0    # "person" wins in the top half
    sem[1, N // 2 :] = 1.0    # "grass" wins in the bottom half
    plug = REGISTRY["semantic_filter"](cell_n=N, classes=["person", "grass"])
    out = plug(jnp.asarray(m), CORE_NAMES, jnp.zeros((0, N, N)), [],
               jnp.asarray(sem), ["person", "grass"])
    r, g, b = (np.asarray(v) for v in rgb_float_to_uint(out))
    # reference colormap override: classes 1 and 2 are both [81, 113, 162]
    assert (r == 81).all() and (g == 113).all() and (b == 162).all()
    # distinct classes map to distinct colormap rows when not overridden
    plug2 = REGISTRY["semantic_filter"](cell_n=N, classes=["a", "b", "c", "d"])
    sem4 = np.zeros((4, N, N), np.float32)
    sem4[3] = 1.0
    out2 = plug2(jnp.asarray(m), CORE_NAMES, jnp.zeros((0, N, N)), [],
                 jnp.asarray(sem4), ["a", "b", "c", "d"])
    r2, g2, b2 = (np.asarray(v) for v in rgb_float_to_uint(out2))
    assert not ((r2 == 81).all() and (g2 == 113).all())


def test_semantic_traversability_votes(rng):
    m = _core_map(rng)
    m[3, :, :] = 1.0
    m[3, 2, 3] = 0.2          # below threshold -> vote untraversable
    plug = REGISTRY["semantic_traversability"](
        cell_n=N, layers=["traversability"], thresholds=[0.5],
        type=["traversability"],
    )
    out = np.asarray(plug(jnp.asarray(m), CORE_NAMES, jnp.zeros((0, N, N)), [],
                          jnp.zeros((0, N, N)), []))
    expect = np.full((N, N), 0.1, np.float32)
    expect[2, 3] = 1.0
    np.testing.assert_allclose(out, expect, atol=0)


def test_max_layer_filter_scale_reverse_threshold(rng):
    m = _core_map(rng)
    m[3] = 0.25
    sem = np.full((1, N, N), 0.8, np.float32)
    plug = REGISTRY["max_layer_filter"](
        cell_n=N, layers=["traversability", "obstacle"],
        reverse=[False, True], scales=[2.0, 1.0], thresholds=[False, False],
        min_or_max="max", default_value=0.0,
    )
    out = np.asarray(plug(jnp.asarray(m), CORE_NAMES, jnp.zeros((0, N, N)), [],
                          jnp.asarray(sem), ["obstacle"]))
    # max(0.25*2, 1-0.8) = 0.5 everywhere
    np.testing.assert_allclose(out, 0.5, atol=1e-6)
    plug_t = REGISTRY["max_layer_filter"](
        cell_n=N, layers=["traversability"], reverse=[False],
        scales=[1.0], thresholds=[0.2], min_or_max="max", default_value=0.0,
    )
    out_t = np.asarray(plug_t(jnp.asarray(m), CORE_NAMES, jnp.zeros((0, N, N)), [],
                              jnp.zeros((0, N, N)), []))
    np.testing.assert_allclose(out_t, 1.0, atol=0)  # 0.25 > 0.2 -> 1.0


def test_robot_centric_elevation_rotation(rng):
    m = _core_map(rng)
    m[2, 0, 0] = 0.0          # one invalid cell keeps its raw height
    res = 0.1
    # 90-degree roll about x: base z = -y_map... via R[2] = [0, -1, 0]
    R = np.array([[1, 0, 0], [0, 0, 1], [0, -1, 0]], np.float32)
    plug = REGISTRY["robot_centric_elevation"](cell_n=N, resolution=res)
    out = np.asarray(plug(jnp.asarray(m), CORE_NAMES, jnp.zeros((0, N, N)), [],
                          jnp.zeros((0, N, N)), [], jnp.asarray(R)))
    i = np.arange(N * N)
    ry = (i % N).astype(np.float32) * res
    expect = (-ry).reshape(N, N)  # R[2] . (rx, ry, rz) = -ry
    valid = m[2] > 0.5
    np.testing.assert_allclose(out[valid], expect[valid], atol=1e-6)
    np.testing.assert_allclose(out[~valid], m[0][~valid], atol=0)


def test_features_pca_deterministic_packing(rng):
    m = _core_map(rng)
    feats = rng.uniform(-1, 1, (4, N, N)).astype(np.float32)
    plug = REGISTRY["features_pca"](cell_n=N, process_layer_names=["feat_.*"])
    out = plug(jnp.asarray(m), CORE_NAMES, jnp.zeros((0, N, N)), [],
               jnp.asarray(feats), [f"feat_{i}" for i in range(4)])
    r, g, b = (np.asarray(v) for v in rgb_float_to_uint(out))
    for c in (r, g, b):
        assert c.min() >= 0 and c.max() <= 255
        assert c.max() == 255 and c.min() == 0  # min-max normalized projection
    # identical feature columns must get identical colors
    feats2 = np.broadcast_to(feats[:, :1, :1], feats.shape).copy()
    feats2[:, 0, 0] = 1.0     # one distinct cell so the PCA is nondegenerate
    out2 = plug(jnp.asarray(m), CORE_NAMES, jnp.zeros((0, N, N)), [],
                jnp.asarray(feats2), [f"feat_{i}" for i in range(4)])
    flat = np.asarray(out2).reshape(-1)
    assert (flat[1:] == flat[1]).all()
