"""Full-state checkpoint / resume for the incremental engine.

The reference saves only (points, frame_idx, pt_idx) at the very end and can
only re-visualize, never resume (Runner.py:357-359, 403-416; SURVEY.md §5.3-5.4).
Here the complete reconstruction state — map, observations, poses, intrinsics,
per-image track assignments, RNG key, progress cursor — round-trips through one
npz, so a run can restart after any completed frame.
"""

from __future__ import annotations

import os
from typing import TYPE_CHECKING

import jax
import numpy as np

if TYPE_CHECKING:
    from sfmfromscratch_tpu.pipeline.incremental import SfmEngine


CHECKPOINT_VERSION = 1


def save_checkpoint(engine: "SfmEngine", path: str, next_frame: int) -> str:
    """Snapshot the engine after frame ``next_frame - 1`` is fully integrated."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    frames, tracks, xy = engine.map.observations()
    kp_imgs = sorted(engine._kp_tracks.keys())
    np.savez(
        path,
        version=CHECKPOINT_VERSION,
        next_frame=next_frame,
        points=engine.map.points(),
        obs_frame=frames,
        obs_track=tracks,
        obs_xy=xy,
        poses=np.array([np.hstack([rv, t]) for rv, t in engine.global_poses])
        if engine.global_poses else np.zeros((0, 6)),
        K=np.stack(engine.global_K) if engine.global_K else np.zeros((0, 3, 3)),
        kp_track_images=np.asarray(kp_imgs, dtype=np.int64),
        kp_tracks=np.stack([engine._kp_tracks[i] for i in kp_imgs])
        if kp_imgs else np.zeros((0, 0), np.int64),
        rng_key=jax.random.key_data(engine._rng_key),
    )
    return path


class AsyncCheckpointer:
    """Orbax-backed asynchronous checkpointing: saves overlap with ongoing
    reconstruction instead of blocking the chain (SURVEY.md §5.4 — the
    reference has one synchronous terminal save, Runner.py:357-359)."""

    def __init__(self, directory: str):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self._dir = os.path.abspath(directory)
        os.makedirs(self._dir, exist_ok=True)
        self._ckptr = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())

    def _state(self, engine: "SfmEngine", next_frame: int):
        frames, tracks, xy = engine.map.observations()
        kp_imgs = sorted(engine._kp_tracks.keys())
        return {
            "version": np.asarray(CHECKPOINT_VERSION),
            "next_frame": np.asarray(next_frame),
            "points": engine.map.points(),
            "obs_frame": frames,
            "obs_track": tracks,
            "obs_xy": xy,
            "poses": np.array([np.hstack([rv, t]) for rv, t in engine.global_poses])
            if engine.global_poses else np.zeros((0, 6)),
            "K": np.stack(engine.global_K) if engine.global_K else np.zeros((0, 3, 3)),
            "kp_track_images": np.asarray(kp_imgs, dtype=np.int64),
            "kp_tracks": np.stack([engine._kp_tracks[i] for i in kp_imgs])
            if kp_imgs else np.zeros((0, 0), np.int64),
            "rng_key": np.asarray(jax.random.key_data(engine._rng_key)),
        }

    def save(self, engine: "SfmEngine", next_frame: int, step: int) -> str:
        path = os.path.join(self._dir, f"step_{step}")
        self._ckptr.save(path, self._state(engine, next_frame), force=True)
        return path

    def restore(self, engine: "SfmEngine", step: int) -> int:
        from sfmfromscratch_tpu.pipeline.tracks import MapStore

        self.wait()
        z = self._ckptr.restore(os.path.join(self._dir, f"step_{step}"))
        m = MapStore()
        pts = np.asarray(z["points"], dtype=np.float64).reshape(-1, 3)
        if len(pts):
            m._point_chunks = [pts]
        m._num_tracks = len(pts)
        of = np.asarray(z["obs_frame"], np.int32)
        if len(of):
            m._obs_frame_chunks = [of]
            m._obs_track_chunks = [np.asarray(z["obs_track"], np.int32)]
            m._obs_xy_chunks = [np.asarray(z["obs_xy"], np.float64).reshape(-1, 2)]
        m._num_obs = len(of)
        engine.map = m
        engine.global_poses = [(p[:3].copy(), p[3:].copy()) for p in np.asarray(z["poses"])]
        engine.global_K = [k for k in np.asarray(z["K"])]
        engine._kp_tracks = {
            int(i): np.asarray(kt).copy()
            for i, kt in zip(z["kp_track_images"], z["kp_tracks"])
        }
        engine._rng_key = jax.random.wrap_key_data(jnp_asarray_u32(z["rng_key"]))
        return int(z["next_frame"])

    def wait(self) -> None:
        self._ckptr.wait_until_finished()


def jnp_asarray_u32(x):
    import jax.numpy as jnp

    return jnp.asarray(np.asarray(x), dtype=jnp.uint32)


def load_checkpoint(engine: "SfmEngine", path: str) -> int:
    """Restore engine state; returns the frame index to resume from."""
    from sfmfromscratch_tpu.pipeline.tracks import MapStore

    z = np.load(path)
    assert int(z["version"]) == CHECKPOINT_VERSION
    m = MapStore()
    pts = np.asarray(z["points"], dtype=np.float64).reshape(-1, 3)
    if len(pts):
        m._point_chunks = [pts]
    m._num_tracks = len(pts)
    of = np.asarray(z["obs_frame"], np.int32)
    if len(of):
        m._obs_frame_chunks = [of]
        m._obs_track_chunks = [np.asarray(z["obs_track"], np.int32)]
        m._obs_xy_chunks = [np.asarray(z["obs_xy"], np.float64).reshape(-1, 2)]
    m._num_obs = len(of)
    engine.map = m
    engine.global_poses = [(p[:3].copy(), p[3:].copy()) for p in z["poses"]]
    engine.global_K = [k for k in z["K"]]
    engine._kp_tracks = {
        int(i): kt.copy() for i, kt in zip(z["kp_track_images"], z["kp_tracks"])
    }
    engine._rng_key = jax.random.wrap_key_data(z["rng_key"])
    return int(z["next_frame"])
