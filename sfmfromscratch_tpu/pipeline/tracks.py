"""Global map / track store for incremental SfM.

The reference deduplicates every added 3-D point against the whole map by L2
distance < 1e-6 (``add_points``/``is_new_point``/``find_existing_point``,
Runner.py:361-385) — an O(N^2) scan whose only real effect is re-linking
observations of coordinates already in the map (PnP-associated points are
passed back verbatim). Here track identity is explicit: callers add new tracks
and attach observations to known track ids, removing the reference's hot loop 7
(SURVEY.md §3.5) by construction.

The store is host-side numpy (append-heavy bookkeeping between device stages);
``as_ba_problem`` emits the fixed-shape device arrays for bundle adjustment.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np


class MapStore:
    """Tracks (3-D points) + observations (frame, track, 2-D pixel)."""

    def __init__(self):
        self._points: List[np.ndarray] = []       # per-track 3-D position
        self._obs_frame: List[int] = []
        self._obs_track: List[int] = []
        self._obs_xy: List[np.ndarray] = []

    # -- building ---------------------------------------------------------

    def add_tracks(self, points_3d: np.ndarray, points_2d: np.ndarray, frame_idx: int,
                   mask: Optional[np.ndarray] = None) -> np.ndarray:
        """Register new tracks with their first observation; returns track ids
        (-1 for masked-out rows)."""
        n = len(points_3d)
        ids = np.full(n, -1, dtype=np.int64)
        for i in range(n):
            if mask is not None and not mask[i]:
                continue
            ids[i] = len(self._points)
            self._points.append(np.asarray(points_3d[i], dtype=np.float64))
            self._obs_frame.append(frame_idx)
            self._obs_track.append(ids[i])
            self._obs_xy.append(np.asarray(points_2d[i], dtype=np.float64))
        return ids

    def add_observations(self, track_ids: np.ndarray, points_2d: np.ndarray,
                         frame_idx: int, mask: Optional[np.ndarray] = None) -> None:
        """Attach observations of existing tracks in a new frame."""
        for i, tid in enumerate(track_ids):
            if tid < 0 or (mask is not None and not mask[i]):
                continue
            self._obs_frame.append(frame_idx)
            self._obs_track.append(int(tid))
            self._obs_xy.append(np.asarray(points_2d[i], dtype=np.float64))

    def update_points(self, points_3d: np.ndarray) -> None:
        """Overwrite all track positions (e.g. after bundle adjustment)."""
        assert len(points_3d) == len(self._points)
        self._points = [np.asarray(p, dtype=np.float64) for p in points_3d]

    # -- views ------------------------------------------------------------

    @property
    def num_tracks(self) -> int:
        return len(self._points)

    @property
    def num_observations(self) -> int:
        return len(self._obs_track)

    def points(self) -> np.ndarray:
        return np.array(self._points) if self._points else np.zeros((0, 3))

    def observations(self) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(frame_indices, track_indices, xy) in insertion order — the layout
        the reference carries as global_points_2D / frame_indices /
        point_indices (Runner.py:160-165)."""
        return (
            np.asarray(self._obs_frame, dtype=np.int32),
            np.asarray(self._obs_track, dtype=np.int32),
            np.array(self._obs_xy) if self._obs_xy else np.zeros((0, 2)),
        )

    def nearest_track(self, p3d: np.ndarray, threshold: float = 1e-6) -> int:
        """Reference-parity lookup (``find_existing_point``, Runner.py:381-385):
        id of the track within ``threshold`` of p3d, else -1."""
        if not self._points:
            return -1
        pts = self.points()
        d = np.linalg.norm(pts - p3d[None, :], axis=1)
        i = int(np.argmin(d))
        return i if d[i] < threshold else -1
