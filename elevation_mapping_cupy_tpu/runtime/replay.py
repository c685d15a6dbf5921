"""Log replay: re-run recorded sensor sequences through the engine.

The parity harness for BASELINE's "replayed turtlebot/ANYmal logs": a log is
an .npz of per-frame pointclouds + poses (writer below); replaying drives the
mapper exactly like the live runtime and returns per-frame layer snapshots
for comparison against reference outputs.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from ..config import MapConfig
from ..mapper import ElevationMap

__all__ = ["LogWriter", "read_log", "replay"]


class LogWriter:
    """Accumulates frames and writes a single .npz log."""

    def __init__(self, channels: Sequence[str] = ("x", "y", "z")):
        self.channels = list(channels)
        self.frames: List[Dict[str, np.ndarray]] = []

    def add(self, points: np.ndarray, R: np.ndarray, t: np.ndarray,
            position: Optional[np.ndarray] = None, stamp: float = 0.0) -> None:
        self.frames.append(
            dict(points=np.asarray(points, np.float32),
                 R=np.asarray(R, np.float32),
                 t=np.asarray(t, np.float32),
                 position=np.asarray(position if position is not None else t, np.float32),
                 stamp=np.float64(stamp))
        )

    def save(self, path: str) -> None:
        arrays = {"n_frames": np.int64(len(self.frames)),
                  "channels": np.array(self.channels, dtype=object)}
        for i, f in enumerate(self.frames):
            for k, v in f.items():
                arrays[f"f{i}_{k}"] = v
        np.savez_compressed(path, **arrays)


def read_log(path: str) -> Iterator[Dict[str, np.ndarray]]:
    z = np.load(path, allow_pickle=True)
    n = int(z["n_frames"])
    channels = list(z["channels"].tolist())
    for i in range(n):
        yield dict(
            points=z[f"f{i}_points"],
            R=z[f"f{i}_R"],
            t=z[f"f{i}_t"],
            position=z[f"f{i}_position"],
            stamp=float(z[f"f{i}_stamp"]),
            channels=channels,
        )


def replay(
    path: str,
    cfg: MapConfig,
    snapshot_layers: Sequence[str] = ("elevation", "traversability"),
    move_with_pose: bool = True,
    mapper: Optional[ElevationMap] = None,
    raycast_mode: Optional[str] = None,
) -> List[Dict[str, np.ndarray]]:
    """Run a log through the engine; returns per-frame layer snapshots.

    ``raycast_mode`` overrides ``cfg.raycast_mode`` per run ("exact" for
    reference-parity replays, "polar" for the production fast path). Parity
    runs should pass "exact": the polar backend's divergence is bounded but
    nonzero (see tests/test_raycast_modes.py trajectory bound).
    """
    if raycast_mode is not None:
        cfg = dataclasses.replace(cfg, raycast_mode=raycast_mode)
        if mapper is not None:
            raise ValueError("pass raycast_mode via the mapper's cfg when supplying a mapper")
    em = mapper or ElevationMap(cfg)
    out = []
    buf = np.zeros((em.cell_n - 2, em.cell_n - 2), np.float32)
    for frame in read_log(path):
        if move_with_pose:
            em.move_to(frame["position"], frame["R"])
        em.input_pointcloud(
            frame["points"], frame["channels"], frame["R"], frame["t"], 0.0, 0.0
        )
        em.update_variance()
        em.update_time()
        snap = {}
        for layer in snapshot_layers:
            em.get_map_with_name_ref(layer, buf)
            snap[layer] = buf.copy()
        out.append(snap)
    return out
