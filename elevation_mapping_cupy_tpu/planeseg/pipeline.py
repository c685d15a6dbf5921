"""Plane decomposition pipeline (PlaneDecompositionPipeline equivalent).

Orchestrates: preprocess (inpaint + denoise + resample, on device) →
sliding-window plane extraction + connected components + plane fits (on
device, extract.py) → optional host RANSAC refinement for labels failing
the global planarity gate → contour extraction + insets + convex
approximation (host, contour.py) → full postprocessing (region height
offsets, non-planar dilation, smooth_planar layer — postprocess.py).

Reference: plane_segmentation/convex_plane_decomposition/src/
PlaneDecompositionPipeline.cpp:13-39, GridMapPreprocessing.cpp:14-39,
Postprocessing.cpp:14-31.
"""

from __future__ import annotations

import dataclasses
import math
import time
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .contour import PlanarRegion, extract_boundaries, grow_convex_polygon
from .extract import (
    PlaneSegParams,
    PreprocessingParams,
    preprocess_and_extract,
    resample_shape,
    true_resolution,
)
from .postprocess import PostprocessingParams, postprocess
from .ransac import RansacParams, detect_planes

__all__ = ["PlanarTerrain", "PlaneDecompositionPipeline"]


@dataclasses.dataclass
class PlanarTerrain:
    regions: List[PlanarRegion]
    labels: np.ndarray                # (H, W) final labels (post-resample grid)
    filtered_map: np.ndarray          # preprocessed height map ("elevation_before_postprocess")
    elevation: np.ndarray             # postprocessed elevation (non-planar dilation + offsets)
    plane_classification: np.ndarray  # (H, W) planar = 1.0 / non-planar = 0.0
    smooth_planar: np.ndarray         # postprocessed smooth layer
    resolution: float                 # post-resample resolution
    map_origin: Tuple[float, float]   # world position of cell (0,0) post-resample
    timings: Dict[str, float]


class PlaneDecompositionPipeline:
    """Stateful wrapper with per-stage timing stats (the reference prints a
    benchmark table at node destruction, ConvexPlaneDecompositionRos.cpp:28-48;
    here: .timing_report())."""

    def __init__(
        self,
        resolution: float,
        params: PlaneSegParams = PlaneSegParams(),
        ransac: RansacParams = RansacParams(),
        preprocessing: PreprocessingParams = PreprocessingParams(),
        postprocessing: PostprocessingParams = PostprocessingParams(),
    ):
        self.resolution = resolution
        self.params = params
        self.ransac = ransac
        self.preprocessing = preprocessing
        self.postprocessing = postprocessing
        self._stats: Dict[str, List[float]] = {}

    def _record(self, name: str, dt: float) -> None:
        self._stats.setdefault(name, []).append(dt)

    def timing_report(self) -> str:
        lines = ["stage            avg_ms    max_ms    n"]
        for k, v in self._stats.items():
            a = np.asarray(v) * 1e3
            lines.append(f"{k:<16} {a.mean():8.2f} {a.max():9.2f} {len(a):4d}")
        return "\n".join(lines)

    def _ransac_refine(
        self, labels, hnp, normals_np,
        plane_normals, plane_support, plane_valid,
        needs_refine, res, origin,
    ):
        """Host RANSAC re-segmentation of labels that failed the global
        planarity gate (Pipeline.cpp's RANSAC branch). Mutates the label
        image in place; may grow the plane tables. Shared by update() and
        update_batch()."""
        normals_np = np.moveaxis(normals_np, 0, -1)
        next_label = int(labels.max()) + 1
        rows, cols = np.indices(labels.shape)
        px = origin[0] - rows * res
        py = origin[1] - cols * res
        for lab in np.where(needs_refine)[0]:
            member = labels == lab
            labels[member] = 0
            pts = np.stack([px[member], py[member], hnp[member]], axis=-1)
            nrms = normals_np[member]
            planes = detect_planes(pts, nrms, self.ransac, seed=0)
            flat_member = np.where(member.reshape(-1))[0]
            reuse = True
            for normal, support, idxs in planes:
                if normal[2] <= self.params.plane_inclination_threshold:
                    continue
                newlab = lab if reuse else next_label
                if not reuse:
                    next_label += 1
                reuse = False
                if newlab >= len(plane_normals):
                    plane_normals = np.vstack([plane_normals, normal[None]])
                    plane_support = np.vstack([plane_support, support[None]])
                    plane_valid = np.append(plane_valid, True)
                else:
                    plane_normals[newlab] = normal
                    plane_support[newlab] = support
                    plane_valid[newlab] = True
                fl = flat_member[idxs]
                labels.reshape(-1)[fl] = newlab
        return labels, plane_normals, plane_support, plane_valid

    def _resample_target(self, shape, map_origin):
        """Resolve the (out_shape, true resolution, post-resample origin) of
        the optional changeResolution stage (GridMapPreprocessing.cpp:25-31;
        grid_map keeps the map CENTER fixed across resample)."""
        target = self.preprocessing.resolution
        res = self.resolution
        origin = (float(map_origin[0]), float(map_origin[1]))
        if target <= 0.0 or abs(self.resolution - target) < 1e-6:
            return None, res, origin
        out_shape = resample_shape(shape, self.resolution, target)
        res = true_resolution(shape, self.resolution, out_shape)
        origin = tuple(
            origin[a]
            - (shape[a] - 1) / 2.0 * self.resolution
            + (out_shape[a] - 1) / 2.0 * res
            for a in (0, 1)
        )
        return out_shape, res, origin

    def update(self, height: np.ndarray, map_origin=(0.0, 0.0)) -> PlanarTerrain:
        timings = {}
        height = np.asarray(height, np.float32)

        # resample target (GridMapPreprocessing::changeResolution,
        # GridMapPreprocessing.cpp:25-31): skip if negative or within 1e-6
        out_shape, res, origin = self._resample_target(height.shape, map_origin)

        # preprocess + sliding-window extraction run as ONE jitted dispatch,
        # and everything the host stages need comes back in a single batched
        # device_get: per-stage host syncs/fetches cost tens of ms on
        # tunneled backends, and the reference's separate timers map onto
        # one device program here
        t0 = time.perf_counter()
        h, ext = preprocess_and_extract(
            jnp.asarray(height, jnp.float32),
            res,
            self.params,
            jnp.asarray(origin, jnp.float32),
            kernel_size=self.preprocessing.kernel_size,
            median_passes=self.preprocessing.number_of_repeats,
            out_shape=out_shape,
        )
        labels, plane_normals, plane_support, plane_valid, needs_refine = (
            jax.device_get(
                (
                    # label ids fit int16 (≤ max_labels+1): halves the fetch
                    # on bandwidth-limited tunneled backends
                    ext.labels.astype(jnp.int16),
                    ext.plane_normals,
                    ext.plane_support,
                    ext.plane_valid,
                    ext.needs_refine,
                )
            )
        )
        labels = np.array(labels, dtype=np.int32)
        plane_normals = np.array(plane_normals)
        plane_support = np.array(plane_support)
        plane_valid = np.array(plane_valid)  # device_get arrays are read-only
        timings["preprocess"] = 0.0
        timings["sliding_window"] = time.perf_counter() - t0
        self._record("preprocess", timings["preprocess"])
        self._record("sliding_window", timings["sliding_window"])

        # host-side RANSAC refinement for non-globally-planar labels
        t0 = time.perf_counter()
        if self.params.include_ransac_refinement and needs_refine.any():
            hnp, normals_np = jax.device_get((h, ext.normals))
            labels, plane_normals, plane_support, plane_valid = self._ransac_refine(
                labels, np.asarray(hnp), np.asarray(normals_np),
                plane_normals, plane_support, plane_valid,
                needs_refine, res, origin,
            )
        timings["ransac"] = time.perf_counter() - t0
        self._record("ransac", timings["ransac"])

        # postprocess needs the FINAL labels (plane_classification =
        # labeledImage > 0, PlaneDecompositionPipeline.cpp:31-37) so it is
        # dispatched now and overlaps with the host contour stage below
        mask = (labels > 0).astype(np.float32)
        elev_dev, smooth_dev = postprocess(
            h, jnp.asarray(mask), res, self.postprocessing
        )

        t0 = time.perf_counter()
        regions = extract_boundaries(
            labels, plane_normals, plane_support, plane_valid,
            res, origin,
        )
        timings["contour_extraction"] = time.perf_counter() - t0
        self._record("contour_extraction", timings["contour_extraction"])

        # addHeightOffset on the planar regions (Postprocessing.cpp:65-71)
        t0 = time.perf_counter()
        z_off = self.postprocessing.extracted_planes_height_offset
        if z_off != 0.0:
            for r in regions:
                r.support[2] += z_off
        # the device postprocess has long finished (host RANSAC/contour ran
        # in between); the fetch below delivers the output layers
        filtered_np, elev_np, smooth_np = jax.device_get((h, elev_dev, smooth_dev))
        timings["postprocess"] = time.perf_counter() - t0
        self._record("postprocess", timings["postprocess"])

        timings["total"] = sum(timings.values())
        self._record("total", timings["total"])
        return PlanarTerrain(
            regions=regions,
            labels=labels,
            filtered_map=np.asarray(filtered_np),
            elevation=np.asarray(elev_np),
            plane_classification=mask,
            smooth_planar=np.asarray(smooth_np),
            resolution=res,
            map_origin=origin,
            timings=timings,
        )

    def update_batch(
        self, heights: np.ndarray, map_origins: Optional[np.ndarray] = None
    ) -> List[PlanarTerrain]:
        """Decompose B height maps in one device round-trip.

        The per-update cost of :meth:`update` on remote/tunneled TPU
        backends is dominated by the dispatch+fetch round-trip (~30-40 ms);
        batching runs ONE vmapped preprocess+extraction dispatch and ONE
        vmapped postprocess dispatch for all B maps, with the host stages
        (RANSAC refinement, contour extraction) looped per map while the
        device postprocess is in flight. This is the multi-env (simulation
        / fleet) operating mode; the reference runs one decomposition node
        per robot and has no analogue. Semantics per map are identical to
        :meth:`update` (tests/test_planeseg.py pins batch == sequential).
        """
        from .extract import batched_preprocess_and_extract

        heights = np.asarray(heights, np.float32)
        B = heights.shape[0]
        if map_origins is None:
            map_origins = np.zeros((B, 2), np.float32)

        out_shape, res, _ = self._resample_target(heights.shape[1:], (0.0, 0.0))
        origins = [
            self._resample_target(heights.shape[1:], map_origins[b])[2]
            for b in range(B)
        ]

        t0 = time.perf_counter()
        hs, ext = batched_preprocess_and_extract(
            jnp.asarray(heights),
            res,
            self.params,
            jnp.asarray(np.asarray(origins, np.float32)),
            kernel_size=self.preprocessing.kernel_size,
            median_passes=self.preprocessing.number_of_repeats,
            out_shape=out_shape,
        )
        labels, plane_normals, plane_support, plane_valid, needs_refine = (
            jax.device_get(
                (
                    ext.labels.astype(jnp.int16),
                    ext.plane_normals,
                    ext.plane_support,
                    ext.plane_valid,
                    ext.needs_refine,
                )
            )
        )
        labels = np.array(labels, dtype=np.int32)
        self._record("sliding_window_batch", time.perf_counter() - t0)

        t0 = time.perf_counter()
        refine_any = self.params.include_ransac_refinement and needs_refine.any()
        if refine_any:
            hnp_all, normals_all = map(np.asarray, jax.device_get((hs, ext.normals)))
        tables = []
        for b in range(B):
            pn = np.array(plane_normals[b])
            ps = np.array(plane_support[b])
            pv = np.array(plane_valid[b])
            if refine_any and needs_refine[b].any():
                labels[b], pn, ps, pv = self._ransac_refine(
                    labels[b], hnp_all[b], normals_all[b],
                    pn, ps, pv, needs_refine[b], res, origins[b],
                )
            tables.append((pn, ps, pv))
        self._record("ransac_batch", time.perf_counter() - t0)

        # one vmapped postprocess dispatch; host contours overlap it
        masks = (labels > 0).astype(np.float32)
        elev_dev, smooth_dev = jax.vmap(
            lambda h, m: postprocess(h, m, res, self.postprocessing)
        )(hs, jnp.asarray(masks))

        t0 = time.perf_counter()
        z_off = self.postprocessing.extracted_planes_height_offset
        regions_all = []
        for b in range(B):
            pn, ps, pv = tables[b]
            regions = extract_boundaries(labels[b], pn, ps, pv, res, origins[b])
            if z_off != 0.0:
                for r in regions:
                    r.support[2] += z_off
            regions_all.append(regions)
        self._record("contour_batch", time.perf_counter() - t0)

        t0 = time.perf_counter()
        filtered_np, elev_np, smooth_np = map(
            np.asarray, jax.device_get((hs, elev_dev, smooth_dev))
        )
        self._record("postprocess_batch", time.perf_counter() - t0)

        return [
            PlanarTerrain(
                regions=regions_all[b],
                labels=labels[b],
                filtered_map=filtered_np[b],
                elevation=elev_np[b],
                plane_classification=masks[b],
                smooth_planar=smooth_np[b],
                resolution=res,
                map_origin=origins[b],
                timings={},
            )
            for b in range(B)
        ]

    def convex_approximation(
        self, terrain: PlanarTerrain, query_xy: np.ndarray, n_vertices: int = 16
    ) -> Optional[np.ndarray]:
        """Grow a convex polygon inside the region containing/nearest the
        query (SegmentedPlaneProjection + ConvexRegionGrowing)."""
        from .contour import project_to_planar_region

        # hole-aware containing/nearest selection (a query over a raised
        # plane sits in the LOWER plane's hole — SegmentedPlaneProjection
        # .cpp:56-97); single source of truth with the projection helper
        hit = project_to_planar_region(np.asarray(query_xy, np.float64), terrain.regions)
        if hit is None:
            return None
        best, proj = hit
        # grow at the PROJECTED point (the reference demo does the same);
        # for a contained query the projection equals the query, otherwise
        # seeding at the raw query could start outside the polygon
        seed = np.asarray(proj[:2], np.float64)
        return grow_convex_polygon(
            best.boundary_with_holes.boundary,
            best.boundary_with_holes.holes,
            seed,
            n_vertices=n_vertices,
        )
