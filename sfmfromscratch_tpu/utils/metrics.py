"""Structured metrics: the observability the reference lacks (SURVEY.md §5.5 —
print-only logging). JSON-lines metrics plus the standard SfM accuracy
measures (reprojection RMSE, ATE with similarity alignment)."""

from __future__ import annotations

import json
import sys
import time
from typing import Dict, Optional, Tuple

import numpy as np


class MetricsLogger:
    """Append-only JSON-lines metrics sink (stderr or file)."""

    def __init__(self, path: Optional[str] = None):
        self._fh = open(path, "a") if path else sys.stderr
        self._owns = path is not None

    def log(self, event: str, **fields) -> None:
        rec = {"ts": time.time(), "event": event, **fields}
        self._fh.write(json.dumps(rec) + "\n")
        self._fh.flush()

    def close(self) -> None:
        if self._owns:
            self._fh.close()


def umeyama_alignment(
    src: np.ndarray, dst: np.ndarray, with_scale: bool = True
) -> Tuple[np.ndarray, np.ndarray, float]:
    """Similarity transform (R, t, s) minimizing ||dst - (s R src + t)||^2.

    Monocular reconstructions are defined only up to a 7-dof gauge, so every
    trajectory/structure comparison must align first (SURVEY.md §7.3 — metrics,
    not bitwise outputs).
    """
    mu_s = src.mean(axis=0)
    mu_d = dst.mean(axis=0)
    sc = src - mu_s
    dc = dst - mu_d
    cov = dc.T @ sc / len(src)
    U, D, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    var_s = (sc**2).sum() / len(src)
    s = float(np.trace(np.diag(D) @ S) / var_s) if with_scale else 1.0
    t = mu_d - s * R @ mu_s
    return R, t, s


def absolute_trajectory_error(
    est_centers: np.ndarray, gt_centers: np.ndarray
) -> float:
    """RMSE of camera centers after similarity alignment (the standard ATE)."""
    R, t, s = umeyama_alignment(est_centers, gt_centers)
    aligned = (s * (est_centers @ R.T)) + t
    return float(np.sqrt(np.mean(np.sum((aligned - gt_centers) ** 2, axis=1))))


def camera_centers(rvecs: np.ndarray, ts: np.ndarray) -> np.ndarray:
    """World-space camera centers C = -R^T t from world-to-camera poses."""
    from scipy.spatial.transform import Rotation

    Rs = Rotation.from_rotvec(rvecs).as_matrix()
    return np.einsum("nij,nj->ni", np.transpose(Rs, (0, 2, 1)), -ts)
