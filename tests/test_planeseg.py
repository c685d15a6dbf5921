"""Plane segmentation: eigensolver, connected components, full pipeline on a
synthetic two-plane terrain (the reference validates on a terrain PNG +
brute-force equivalence, testPipeline.cpp / testConvexApproximation.cpp)."""

import numpy as np
import jax.numpy as jnp
import pytest

from elevation_mapping_cupy_tpu.planeseg import (
    PlaneSegParams,
    PlaneDecompositionPipeline,
    connected_components,
    eigh3_smallest,
    extract_planes,
    grow_convex_polygon,
)


def test_eigh3_matches_numpy(rng):
    A = rng.normal(0, 1, (64, 3, 3))
    A = (A + np.swapaxes(A, 1, 2)) / 2
    lam_min, lam_mid, v = eigh3_smallest(jnp.asarray(A, jnp.float32))
    w = np.linalg.eigvalsh(A)
    np.testing.assert_allclose(np.asarray(lam_min), w[:, 0], atol=2e-4)
    np.testing.assert_allclose(np.asarray(lam_mid), w[:, 1], atol=2e-4)
    # eigenvector check: A v = lambda v
    Av = np.einsum("bij,bj->bi", A, np.asarray(v, np.float64))
    lv = np.asarray(lam_min)[:, None] * np.asarray(v, np.float64)
    np.testing.assert_allclose(Av, lv, atol=5e-3)


def test_connected_components_two_blobs():
    mask = np.zeros((16, 16), bool)
    mask[2:6, 2:6] = True
    mask[10:14, 10:14] = True
    labels = np.asarray(connected_components(jnp.asarray(mask)))
    assert labels[3, 3] > 0 and labels[11, 11] > 0
    assert labels[3, 3] != labels[11, 11]
    assert (labels[~mask] == 0).all()
    assert len(np.unique(labels[2:6, 2:6])) == 1


@pytest.mark.parametrize("connectivity", [4, 8])
def test_connected_components_matches_scipy(rng, connectivity):
    """Random masks incl. snaky shapes: label partition must equal scipy's
    (pointer-jumping must not merge/split components)."""
    from scipy import ndimage

    struct = (np.array([[0, 1, 0], [1, 1, 1], [0, 1, 0]])
              if connectivity == 4 else np.ones((3, 3)))
    for density in (0.35, 0.55, 0.75):
        mask = rng.random((40, 40)) < density
        # carve a spiral-ish long path to stress propagation depth
        mask[1, 1:-1] = True
        mask[1:-1, -2] = True
        mask[-2, 1:-1] = True
        ours = np.asarray(connected_components(jnp.asarray(mask), connectivity))
        ref, n_ref = ndimage.label(mask, structure=struct)
        assert (ours[~mask] == 0).all()
        assert len(np.unique(ours[mask])) == n_ref
        # same partition: our label must be constant on each scipy component
        # and distinct across components
        mapping = {}
        for lab in np.unique(ref[mask]):
            vals = np.unique(ours[ref == lab])
            assert len(vals) == 1, f"component {lab} split"
            assert vals[0] not in mapping.values(), f"component {lab} merged"
            mapping[lab] = vals[0]


def two_plane_terrain(n=48):
    h = np.zeros((n, n), np.float32)
    h[:, n // 2 :] = 0.5
    return h


def test_extract_planes_two_levels():
    h = two_plane_terrain()
    params = PlaneSegParams()
    ext = extract_planes(jnp.asarray(h), 0.04, params)
    labels = np.asarray(ext.labels)
    valid = np.asarray(ext.plane_valid)
    present = [l for l in np.unique(labels) if l != 0 and valid[l]]
    assert len(present) == 2
    normals = np.asarray(ext.plane_normals)
    for l in present:
        assert normals[l][2] > 0.99  # flat planes → +Z normals
    # the step edge itself should not be planar
    edge_col = h.shape[1] // 2
    assert (labels[:, edge_col - 1 : edge_col + 1] == 0).any()


def test_pipeline_end_to_end():
    h = two_plane_terrain()
    h[5, 5] = np.nan  # hole → preprocess inpaints
    pipe = PlaneDecompositionPipeline(resolution=0.04)
    terrain = pipe.update(h)
    assert len(terrain.regions) == 2
    assert np.isfinite(terrain.filtered_map).all()
    assert terrain.smooth_planar.shape == h.shape
    assert "total" in terrain.timings
    report = pipe.timing_report()
    assert "sliding_window" in report


def test_convex_region_growing():
    boundary = np.array([[0, 0], [10.0, 0], [10, 10], [0, 10]])
    hole = np.array([[4, 4], [6.0, 4], [6, 6], [4, 6]])
    poly = grow_convex_polygon(boundary, [hole], np.array([2.0, 2.0]), n_vertices=12)
    assert poly is not None
    # grown polygon stays inside the boundary and outside the hole
    assert (poly >= -1e-6).all() and (poly <= 10 + 1e-6).all()
    for p in poly:
        assert not (4 < p[0] < 6 and 4 < p[1] < 6)


def test_pipeline_ransac_path():
    # a ramp plus noise fails the global planarity gate → RANSAC splits it
    n = 32
    rng = np.random.default_rng(0)
    h = np.zeros((n, n), np.float32)
    h[:, : n // 2] = np.linspace(0, 0.3, n // 2)[None, :]
    h[:, n // 2 :] = 0.8
    params = PlaneSegParams(include_ransac_refinement=True)
    pipe = PlaneDecompositionPipeline(resolution=0.04, params=params)
    terrain = pipe.update(h)
    assert len(terrain.regions) >= 2


def test_convex_approximation_prefers_region_over_hole():
    """A query above a raised platform sits inside the GROUND region's hole;
    convex_approximation must pick the platform region (hole-aware selection,
    SegmentedPlaneProjection.cpp:56-97) and grow a polygon there."""
    n = 80
    rng = np.random.default_rng(1)
    h = rng.normal(0, 0.001, (n, n)).astype(np.float32)
    h[24:56, 24:56] += 0.3
    pipe = PlaneDecompositionPipeline(resolution=0.04)
    terrain = pipe.update(h)
    assert len(terrain.regions) == 2
    # world frame: x = -row*res, y = -col*res; center of the box
    q = np.array([-40 * 0.04, -40 * 0.04], np.float32)
    poly = pipe.convex_approximation(terrain, q, n_vertices=12)
    assert poly is not None
    # grown polygon stays within the platform footprint (+1 cell slack)
    lo, hi = -(56 + 1) * 0.04, -(24 - 1) * 0.04
    assert (poly >= lo).all() and (poly <= hi).all()


def test_project_to_planar_region():
    from elevation_mapping_cupy_tpu.planeseg.contour import (
        BoundaryWithHoles, PlanarRegion, project_to_planar_region,
    )
    region = PlanarRegion(
        label=1,
        normal=np.array([0.0, 0.0, 1.0]),
        support=np.array([0.0, 0.0, 0.3]),
        boundary_with_holes=BoundaryWithHoles(
            boundary=np.array([[0, 0], [2.0, 0], [2, 2], [0, 2]]), holes=[]
        ),
        insets=[],
    )
    hit = project_to_planar_region(np.array([1.0, 1.0]), [region])
    assert hit is not None
    _, p = hit
    np.testing.assert_allclose(p, [1.0, 1.0, 0.3], atol=1e-9)
    # outside → projected to the boundary
    _, p2 = project_to_planar_region(np.array([3.0, 1.0]), [region])
    assert p2[0] <= 2.0 + 1e-9


def test_map_io_and_faults(tmp_path, rng):
    from elevation_mapping_cupy_tpu.utils.map_io import save_layer_as_image, load_heightmap_from_image
    from elevation_mapping_cupy_tpu.runtime.faults import add_map_noise, corrupt_cloud

    h = rng.uniform(0, 1, (16, 16)).astype(np.float32)
    path = str(tmp_path / "map.png")
    lo, hi = save_layer_as_image(h, path)
    h2 = load_heightmap_from_image(path, height_scale=hi - lo, offset=lo)
    np.testing.assert_allclose(h2, h, atol=(hi - lo) / 255 + 1e-6)

    noisy = add_map_noise(h, 0.01)
    assert noisy.shape == h.shape and not np.allclose(noisy, h)
    cloud = rng.uniform(-1, 1, (100, 3)).astype(np.float32)
    bad = corrupt_cloud(cloud, nan_frac=0.1, outlier_frac=0.05)
    assert np.isnan(bad[:, 0]).sum() == 10


def test_update_batch_matches_sequential():
    """update_batch (one vmapped dispatch for B maps) produces the same
    labels/regions/layers as per-map update(), including a map that takes
    the RANSAC refinement path and a non-zero world origin."""
    n = 32
    rng = np.random.default_rng(3)
    maps, origins = [], []
    h0 = two_plane_terrain().astype(np.float32)
    maps.append(h0)
    origins.append((0.0, 0.0))
    h1 = np.zeros((h0.shape[0], h0.shape[1]), np.float32)
    h1[:, : h0.shape[1] // 2] = np.linspace(0, 0.3, h0.shape[1] // 2)[None, :]
    h1[:, h0.shape[1] // 2:] = 0.8
    maps.append(h1)
    origins.append((1.5, -0.75))
    h2 = rng.normal(0, 0.001, h0.shape).astype(np.float32)
    h2[8:20, 8:20] += 0.3
    h2[5, 5] = np.nan
    maps.append(h2)
    origins.append((0.0, 0.4))

    from elevation_mapping_cupy_tpu.planeseg.extract import PlaneSegParams

    params = PlaneSegParams(include_ransac_refinement=True)
    pipe = PlaneDecompositionPipeline(resolution=0.04, params=params)
    seq = [pipe.update(m, o) for m, o in zip(maps, origins)]
    batch = pipe.update_batch(np.stack(maps), np.asarray(origins, np.float32))

    assert len(batch) == len(seq)
    for s, b in zip(seq, batch):
        np.testing.assert_array_equal(b.labels, s.labels)
        np.testing.assert_allclose(b.filtered_map, s.filtered_map, atol=1e-6)
        np.testing.assert_allclose(b.elevation, s.elevation, atol=1e-6)
        np.testing.assert_allclose(b.smooth_planar, s.smooth_planar, atol=1e-6)
        np.testing.assert_array_equal(b.plane_classification, s.plane_classification)
        assert b.resolution == s.resolution
        assert np.allclose(b.map_origin, s.map_origin)
        assert len(b.regions) == len(s.regions)
        for rb, rs in zip(b.regions, s.regions):
            np.testing.assert_allclose(rb.normal, rs.normal, atol=1e-6)
            np.testing.assert_allclose(rb.support, rs.support, atol=1e-6)
            np.testing.assert_allclose(
                rb.boundary_with_holes.boundary,
                rs.boundary_with_holes.boundary, atol=1e-6,
            )


def test_update_batch_with_resample():
    """Batch path honors the changeResolution stage (shared static
    out_shape, per-map origins)."""
    from elevation_mapping_cupy_tpu.planeseg.extract import PreprocessingParams

    h = two_plane_terrain().astype(np.float32)
    pipe = PlaneDecompositionPipeline(
        resolution=0.04, preprocessing=PreprocessingParams(resolution=0.08)
    )
    seq = pipe.update(h, (0.5, 0.0))
    batch = pipe.update_batch(h[None], np.asarray([(0.5, 0.0)], np.float32))[0]
    assert batch.labels.shape == seq.labels.shape
    np.testing.assert_array_equal(batch.labels, seq.labels)
    np.testing.assert_allclose(batch.smooth_planar, seq.smooth_planar, atol=1e-6)
    assert np.allclose(batch.map_origin, seq.map_origin)


def test_draw_rendering_golden():
    """Draw.cpp / RosVisualizations parity: vertex→pixel placement, hole
    handling, per-region palette colors, marker structure (DELETEALL lead,
    closed rings, plane-projected z)."""
    from elevation_mapping_cupy_tpu.planeseg.contour import (
        BoundaryWithHoles, PlanarRegion,
    )
    from elevation_mapping_cupy_tpu.planeseg import draw

    res = 0.1
    origin = (0.0, 0.0)

    def world(px_ring):
        px = np.asarray(px_ring, np.float64)
        return np.stack([origin[0] - px[:, 0] * res,
                         origin[1] - px[:, 1] * res], axis=1)

    boundary_px = [(2, 2), (2, 10), (10, 10), (10, 2)]
    hole_px = [(5, 5), (5, 7), (7, 7), (7, 5)]
    inset_px = [(4, 4), (4, 8), (8, 8), (8, 4)]
    reg = PlanarRegion(
        label=1,
        normal=np.array([0.0, 0.0, 1.0]),
        support=np.array([0.0, 0.0, 0.3]),
        boundary_with_holes=BoundaryWithHoles(
            boundary=world(boundary_px), holes=[world(hole_px)]),
        insets=[world(inset_px)],
    )
    reg2 = PlanarRegion(
        label=2, normal=np.array([0.0, 0.0, 1.0]),
        support=np.array([0.0, 0.0, 0.0]),
        boundary_with_holes=BoundaryWithHoles(
            boundary=world([(12, 12), (12, 14), (14, 14), (14, 12)]), holes=[]),
        insets=[],
    )

    elev = np.zeros((16, 16), np.float32)
    img = draw.render_boundaries(elev, [reg, reg2], res, origin)
    c0 = draw.region_color(0)
    c1 = draw.region_color(1)
    # vertices land on their exact pixels in the region color
    for r, c in boundary_px:
        np.testing.assert_array_equal(img[r, c], c0)
    np.testing.assert_array_equal(img[2, 6], c0)      # edge midpoint
    for r, c in hole_px:                              # holes share the color
        np.testing.assert_array_equal(img[r, c], c0)
    np.testing.assert_array_equal(img[12, 12], c1)    # 2nd region: next color
    # ring interior is untouched underlay (black for a flat-zero map)
    np.testing.assert_array_equal(img[3, 3], [0, 0, 0])
    # boundary rendering does NOT draw insets
    assert not np.array_equal(img[4, 6], c0)

    ins = draw.render_insets(elev, [reg], res, origin)
    for r, c in inset_px:
        np.testing.assert_array_equal(ins[r, c], c0)
    assert not np.array_equal(ins[2, 2], c0)          # and not boundaries

    # marker-level parity (RosVisualizations.cpp:113-160)
    mk = draw.boundary_markers([reg, reg2], line_width=0.01)
    assert mk[0]["type"] == "DELETEALL"
    assert [m["id"] for m in mk[1:]] == [1, 2, 3]     # buffer-position ids
    b = mk[1]
    assert b["type"] == "LINE_STRIP" and b["scale_x"] == 0.01
    np.testing.assert_allclose(b["points"][0], b["points"][-1])  # closed
    np.testing.assert_allclose(b["points"][:, 2], 0.3)           # plane z
    np.testing.assert_allclose(
        b["color"][:3], draw.REGION_COLORMAP[0], atol=1e-6)
    np.testing.assert_allclose(
        mk[3]["color"][:3], draw.REGION_COLORMAP[1], atol=1e-6)

    imk = draw.inset_markers([reg])
    assert imk[0]["type"] == "DELETEALL" and len(imk) == 2
    np.testing.assert_allclose(imk[1]["points"][:, 2], 0.3)

    # scaled rendering (Draw.cpp::scaleShape): vertices land at scale x px
    img3 = draw.render_boundaries(elev, [reg], res, origin, scale=3.0)
    assert img3.shape == (48, 48, 3)
    np.testing.assert_array_equal(img3[6, 6], c0)


def test_draw_overlay_roundtrip(tmp_path):
    """save_decomposition_overlay writes a loadable image of the right size."""
    from elevation_mapping_cupy_tpu.planeseg.contour import (
        BoundaryWithHoles, PlanarRegion,
    )
    from elevation_mapping_cupy_tpu.planeseg import draw

    reg = PlanarRegion(
        label=1, normal=np.array([0, 0, 1.0]), support=np.zeros(3),
        boundary_with_holes=BoundaryWithHoles(
            boundary=np.array([[-0.2, -0.2], [-0.2, -1.0], [-1.0, -1.0]]),
            holes=[]),
        insets=[],
    )
    path = str(tmp_path / "overlay.png")
    img = draw.save_decomposition_overlay(
        path, np.zeros((16, 16), np.float32), [reg], 0.1)
    assert img.shape == (16, 16, 3)
    import os
    assert os.path.exists(path) or os.path.exists(path + ".npy")
