"""Golden parity tests for plane-seg pre/postprocessing against a real-OpenCV
oracle (tests/golden/reference_planeseg_numpy.py — literal loop ports of
grid_map_filters_rsl plus actual cv2 calls for every cv:: the C++ makes).

Reference: plane_segmentation/convex_plane_decomposition/src/
Postprocessing.cpp:14-144, GridMapPreprocessing.cpp:14-39,
grid_map_filters_rsl/src/{inpainting,processing}.cpp.
"""

import cv2
import numpy as np
import jax.numpy as jnp
import pytest

from elevation_mapping_cupy_tpu.ops import gridmap_filters as gmf
from elevation_mapping_cupy_tpu.planeseg import postprocess as pp
from elevation_mapping_cupy_tpu.planeseg.extract import (
    PreprocessingParams,
    preprocess,
    resample_shape,
    true_resolution,
)
from elevation_mapping_cupy_tpu.planeseg.pipeline import PlaneDecompositionPipeline

from .golden import reference_planeseg_numpy as oracle


RES = 0.04


def make_terrain(n=40, seed=0, nan_frac=0.15):
    """Steps + ramp + noise + NaN holes."""
    rng = np.random.default_rng(seed)
    h = rng.normal(0.0, 0.01, (n, n)).astype(np.float32)
    h[: n // 2, : n // 2] += 0.3
    h[n // 2 :, n // 2 :] += np.linspace(0, 0.2, n // 2)[None, :]
    holes = rng.random((n, n)) < nan_frac
    holes[3:8, 3:8] = True  # one solid hole region
    h[holes] = np.nan
    return h


def make_mask(n=40, seed=1):
    rng = np.random.default_rng(seed)
    m = (rng.random((n, n)) < 0.7).astype(np.float32)
    m[10:20, 10:20] = 0.0  # one solid non-planar block
    m[25:35, 5:15] = 1.0
    return m


def test_ellipse_kernel_matches_opencv():
    for size in (3, 5, 7, 9, 11, 13):
        ours = pp.ellipse_kernel(size).astype(np.uint8)
        cv = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (size, size))
        np.testing.assert_array_equal(ours, cv, err_msg=f"size {size}")


def test_gaussian_kernel_matches_opencv():
    # sizes <=7 with sigma<=0 use OpenCV's fixed small-kernel tabs, stable
    # across versions (OpenCV 5 quantizes LARGER sigma<=0 kernels to /256
    # fixed point; the deployed smoothing_gauss_kernel_size → ksize 3)
    for size in (3, 5, 7):
        ours = pp.gaussian_kernel_cv(size, 0.0)
        cv = cv2.getGaussianKernel(size, 0)[:, 0]
        np.testing.assert_allclose(ours, cv, atol=1e-7, err_msg=f"size {size}")


def test_inpaint_min_values_matches_reference_fixed_point():
    h = make_terrain(32, seed=3, nan_frac=0.25)
    ours = np.asarray(gmf.inpaint_min_values(jnp.asarray(h)))
    ref = oracle.min_values_inpaint(h)
    np.testing.assert_allclose(ours, ref, atol=1e-6)
    # the defining property: a NaN-connected region takes the MIN along its
    # whole contour, not the nearest contour value
    h2 = np.full((9, 9), np.nan, np.float32)
    h2[0, :] = 1.0
    h2[-1, :] = 0.25
    ours2 = np.asarray(gmf.inpaint_min_values(jnp.asarray(h2)))
    assert np.allclose(ours2[1:-1], 0.25)


def test_shifted_window_ops_match_loops(rng):
    h = rng.normal(0, 0.2, (20, 20)).astype(np.float32)
    h[4:7, 9:12] = np.nan
    for size in (3, 5):
        ours = np.asarray(gmf.dilate(jnp.asarray(h), size))
        ref = oracle.apply_kernel_function(h, size, oracle._max_of_finites)
        ref = np.where(np.isnan(h), np.nan, np.where(np.isnan(ref), h, ref))
        np.testing.assert_allclose(ours, ref, atol=1e-6, equal_nan=True)


def test_preprocess_matches_oracle_no_resample():
    h = make_terrain(40)
    pre = PreprocessingParams(resolution=-1.0, kernel_size=3, number_of_repeats=2)
    ours = np.asarray(
        preprocess(jnp.asarray(h), kernel_size=3, median_passes=2)
    )
    ref, res = oracle.preprocess(
        h, RES, oracle.PreprocessingParams(-1.0, 3, 2)
    )
    assert res == RES
    np.testing.assert_allclose(ours, ref, atol=1e-5)


@pytest.mark.parametrize("target", [0.08, 0.05])
def test_preprocess_resample_matches_opencv(target):
    h = make_terrain(40)
    ref, ref_res = oracle.preprocess(
        h, RES, oracle.PreprocessingParams(target, 3, 1)
    )
    out_shape = resample_shape(h.shape, RES, target)
    assert ref.shape == out_shape
    ours_res = true_resolution(h.shape, RES, out_shape)
    assert abs(ours_res - ref_res) < 1e-9
    pre = np.asarray(preprocess(jnp.asarray(h), kernel_size=3, median_passes=1))
    ours = np.asarray(gmf.resample(jnp.asarray(pre), out_shape))
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_add_smooth_layer_matches_oracle():
    n = 40
    h = make_terrain(n)
    elev = oracle.min_values_inpaint(h)  # postprocess runs on inpainted maps
    mask = make_mask(n)
    params = pp.PostprocessingParams()
    ours = np.asarray(
        pp.add_smooth_layer(jnp.asarray(elev), jnp.asarray(mask), RES, params)
    )
    ref = oracle.add_smooth_layer(elev, mask, RES, oracle.PostprocessingParams())
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_postprocess_matches_oracle():
    n = 40
    h = make_terrain(n, seed=7)
    elev = oracle.min_values_inpaint(h)
    mask = make_mask(n, seed=8)
    for ours_p, ref_p in [
        (pp.PostprocessingParams(), oracle.PostprocessingParams()),
        (
            pp.PostprocessingParams(
                extracted_planes_height_offset=0.05,
                nonplanar_height_offset=0.03,
                nonplanar_horizontal_offset=2,
            ),
            oracle.PostprocessingParams(
                extracted_planes_height_offset=0.05,
                nonplanar_height_offset=0.03,
                nonplanar_horizontal_offset=2,
            ),
        ),
    ]:
        ours_e, ours_s = pp.postprocess(
            jnp.asarray(elev), jnp.asarray(mask), RES, ours_p
        )
        ref_e, ref_s = oracle.postprocess(elev, mask, RES, ref_p)
        np.testing.assert_allclose(np.asarray(ours_e), ref_e, atol=1e-4)
        np.testing.assert_allclose(np.asarray(ours_s), ref_s, atol=1e-4)


def test_pipeline_resamples_and_postprocesses():
    """End-to-end: 0.04 m map, 0.08 m target → grid halves, postprocessed
    layers match the oracle run at the pipeline's own mask."""
    n = 64
    rng = np.random.default_rng(5)
    h = rng.normal(0, 0.002, (n, n)).astype(np.float32)
    h[: n // 2] += 0.3
    h[10, 12] = np.nan
    pipe = PlaneDecompositionPipeline(
        resolution=RES,
        preprocessing=PreprocessingParams(resolution=0.08),
    )
    terrain = pipe.update(h)
    assert terrain.labels.shape == (n // 2, n // 2)
    assert abs(terrain.resolution - 0.08) < 1e-9
    assert len(terrain.regions) == 2
    assert np.isfinite(terrain.elevation).all()
    # elevation/smooth layers == oracle postprocess of (filtered_map, mask)
    ref_e, ref_s = oracle.postprocess(
        terrain.filtered_map, terrain.plane_classification, terrain.resolution,
        oracle.PostprocessingParams(),
    )
    np.testing.assert_allclose(terrain.elevation, ref_e, atol=1e-4)
    np.testing.assert_allclose(terrain.smooth_planar, ref_s, atol=1e-4)
    # non-planar cells got the +0.02 offset relative to planar neighbours
    nonplanar = terrain.plane_classification == 0.0
    assert nonplanar.any() and (~nonplanar).any()
    delta = terrain.elevation - terrain.filtered_map
    assert np.all(delta[nonplanar] >= 0.02 - 1e-5)
