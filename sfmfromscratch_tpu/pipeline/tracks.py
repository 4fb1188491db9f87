"""Global map / track store for incremental SfM.

The reference deduplicates every added 3-D point against the whole map by L2
distance < 1e-6 (``add_points``/``is_new_point``/``find_existing_point``,
Runner.py:361-385) — an O(N^2) scan whose only real effect is re-linking
observations of coordinates already in the map (PnP-associated points are
passed back verbatim). Here track identity is explicit: callers add new tracks
and attach observations to known track ids, removing the reference's hot loop 7
(SURVEY.md §3.5) by construction.

Storage is chunked numpy (O(1) amortized vectorized appends — no Python
per-row loops); ``observations()``/``points()`` materialize contiguous views.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np


class MapStore:
    """Tracks (3-D points) + observations (frame, track, 2-D pixel)."""

    def __init__(self):
        self._point_chunks: List[np.ndarray] = []
        self._obs_frame_chunks: List[np.ndarray] = []
        self._obs_track_chunks: List[np.ndarray] = []
        self._obs_xy_chunks: List[np.ndarray] = []
        self._num_tracks = 0
        self._num_obs = 0
        self._points_cache: Optional[np.ndarray] = None

    # -- building ---------------------------------------------------------

    def add_tracks(self, points_3d: np.ndarray, points_2d: np.ndarray, frame_idx: int,
                   mask: Optional[np.ndarray] = None) -> np.ndarray:
        """Register new tracks with their first observation; returns track ids
        (-1 for masked-out rows). Fully vectorized."""
        points_3d = np.asarray(points_3d, dtype=np.float64).reshape(-1, 3)
        points_2d = np.asarray(points_2d, dtype=np.float64).reshape(-1, 2)
        n = len(points_3d)
        sel = np.ones(n, bool) if mask is None else np.asarray(mask, bool)
        cnt = int(sel.sum())
        ids = np.full(n, -1, dtype=np.int64)
        if cnt == 0:
            return ids
        ids[sel] = self._num_tracks + np.arange(cnt)
        self._point_chunks.append(points_3d[sel])
        self._obs_frame_chunks.append(np.full(cnt, frame_idx, np.int32))
        self._obs_track_chunks.append(ids[sel].astype(np.int32))
        self._obs_xy_chunks.append(points_2d[sel])
        self._num_tracks += cnt
        self._num_obs += cnt
        self._points_cache = None
        return ids

    def append_points_raw(self, points_3d: np.ndarray) -> int:
        """Register tracks WITHOUT observations (the observation stream is
        appended separately — used by the on-device scan chain). Returns the
        first new track id."""
        points_3d = np.asarray(points_3d, dtype=np.float64).reshape(-1, 3)
        first = self._num_tracks
        if len(points_3d):
            self._point_chunks.append(points_3d)
            self._num_tracks += len(points_3d)
            self._points_cache = None
        return first

    def add_observations(self, track_ids: np.ndarray, points_2d: np.ndarray,
                         frame_idx: int, mask: Optional[np.ndarray] = None) -> None:
        """Attach observations of existing tracks in a new frame (vectorized;
        rows with track id < 0 or masked out are skipped)."""
        track_ids = np.asarray(track_ids, dtype=np.int64).reshape(-1)
        points_2d = np.asarray(points_2d, dtype=np.float64).reshape(-1, 2)
        sel = track_ids >= 0
        if mask is not None:
            sel = sel & np.asarray(mask, bool)
        cnt = int(sel.sum())
        if cnt == 0:
            return
        self._obs_frame_chunks.append(np.full(cnt, frame_idx, np.int32))
        self._obs_track_chunks.append(track_ids[sel].astype(np.int32))
        self._obs_xy_chunks.append(points_2d[sel])
        self._num_obs += cnt

    def update_points(self, points_3d: np.ndarray) -> None:
        """Overwrite all track positions (e.g. after bundle adjustment)."""
        points_3d = np.asarray(points_3d, dtype=np.float64).reshape(-1, 3)
        assert len(points_3d) == self._num_tracks
        self._point_chunks = [points_3d.copy()]
        self._points_cache = None

    # -- views ------------------------------------------------------------

    @property
    def num_tracks(self) -> int:
        return self._num_tracks

    @property
    def num_observations(self) -> int:
        return self._num_obs

    def points(self) -> np.ndarray:
        if self._points_cache is None:
            self._points_cache = (
                np.concatenate(self._point_chunks)
                if self._point_chunks else np.zeros((0, 3))
            )
        return self._points_cache

    def observations(self) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(frame_indices, track_indices, xy) in insertion order — the layout
        the reference carries as global_points_2D / frame_indices /
        point_indices (Runner.py:160-165)."""
        if not self._obs_track_chunks:
            return (np.zeros(0, np.int32), np.zeros(0, np.int32), np.zeros((0, 2)))
        return (
            np.concatenate(self._obs_frame_chunks),
            np.concatenate(self._obs_track_chunks),
            np.concatenate(self._obs_xy_chunks),
        )

    def nearest_track(self, p3d: np.ndarray, threshold: float = 1e-6) -> int:
        """Reference-parity lookup (``find_existing_point``, Runner.py:381-385):
        id of the track within ``threshold`` of p3d, else -1."""
        if self._num_tracks == 0:
            return -1
        pts = self.points()
        d = np.linalg.norm(pts - np.asarray(p3d)[None, :], axis=1)
        i = int(np.argmin(d))
        return i if d[i] < threshold else -1
