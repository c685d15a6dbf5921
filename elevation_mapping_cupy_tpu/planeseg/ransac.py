"""Host-side RANSAC plane refinement.

Deterministic (fixed-seed) replacement for the reference's CGAL
Efficient_RANSAC wrapper (RansacPlaneExtractor.cpp; seeded at
SlidingWindowPlaneExtractor.cpp:221-224). Labels whose global plane fit
fails are re-segmented into multiple planes here.
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import numpy as np

__all__ = ["RansacParams", "detect_planes"]


@dataclasses.dataclass(frozen=True)
class RansacParams:
    """Mirrors RansacPlaneExtractorParameters defaults."""

    probability: float = 0.001
    min_points: int = 4
    epsilon: float = 0.025          # max point-plane distance
    cluster_epsilon: float = 0.08   # (not used by this sampler)
    normal_threshold_deg: float = 25.0
    max_iterations: int = 200


def detect_planes(
    points: np.ndarray,       # (N, 3)
    normals: np.ndarray,      # (N, 3)
    params: RansacParams = RansacParams(),
    seed: int = 0,
) -> List[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Greedy RANSAC: repeatedly fit the best-supported plane, remove inliers.

    Returns list of (normal (3,), support (3,), member_indices).
    """
    rng = np.random.default_rng(seed)
    cos_thresh = np.cos(np.radians(params.normal_threshold_deg))
    remaining = np.arange(len(points))
    out = []
    while len(remaining) >= max(params.min_points, 3):
        pts = points[remaining]
        nrm = normals[remaining]
        best_inliers = None
        for _ in range(params.max_iterations):
            i = rng.integers(0, len(pts))
            n0 = nrm[i]
            nn = np.linalg.norm(n0)
            if nn < 1e-9:
                continue
            n0 = n0 / nn
            p0 = pts[i]
            dist = np.abs((pts - p0) @ n0)
            ndot = np.abs(nrm @ n0) / np.maximum(np.linalg.norm(nrm, axis=1), 1e-9)
            inl = (dist < params.epsilon) & (ndot > cos_thresh)
            if best_inliers is None or inl.sum() > best_inliers.sum():
                best_inliers = inl
        if best_inliers is None or best_inliers.sum() < max(params.min_points, 3):
            break
        member = remaining[best_inliers]
        mp = points[member]
        mean = mp.mean(axis=0)
        cov = np.cov((mp - mean).T)
        w, v = np.linalg.eigh(cov)
        normal = v[:, 0]
        if normal[2] < 0:
            normal = -normal
        out.append((normal, mean, member))
        remaining = remaining[~best_inliers]
    return out
