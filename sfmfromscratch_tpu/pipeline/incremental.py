"""Incremental Structure-from-Motion engine — the reference's ``SFMRunner``
(Runner.py:128-416) rebuilt TPU-first.

Host Python drives the sequential keyframe chain (the one truly serial part);
every compute stage is a jitted batched device program:

* STAGE A  pairwise features+matching: features are extracted ONCE per image
  (the reference re-extracts per pair, Runner.py:344-346) and matched with the
  blocked top-2 kernel; non-bootstrap pairs get vectorized-RANSAC inlier
  filtering (reference ``find_inliers``, Runner.py:350-351).
* STAGE B  bootstrap: vectorized essential-matrix RANSAC + batched DLT +
  Gauss-Newton point refinement (reference Runner.py:194-218).
* STAGE C  PnP chain: track propagation + batched PnP RANSAC (reference
  Runner.py:221-287). Tracks link by shared keypoint index — an exact,
  index-preserving replacement for the reference's 5-px nearest-neighbor
  re-association (Runner.py:241-247) and its O(N^2) map dedup
  (add_points, Runner.py:361-385); set ``assoc_mode='distance'`` for the
  reference-faithful behavior.
* STAGE D  global LM bundle adjustment with Schur/CG (reference
  Runner.py:289-306).
* STAGE E  persistence: npz artifact compatible with the reference's
  ``save_data``/``load`` (Runner.py:357-359, 403-416) plus poses/K/errors —
  state the reference drops (SURVEY.md §5.4).
"""

from __future__ import annotations

import functools
import os
import time
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sfmfromscratch_tpu.config import PipelineConfig
from sfmfromscratch_tpu.geometry.camera import SensorType, intrinsics_from_exif, projection_matrix
from sfmfromscratch_tpu.geometry.pnp import pnp_ransac
from sfmfromscratch_tpu.geometry.ransac import (
    ransac_essential_pose,
    ransac_essential_pose_adaptive,
    ransac_fundamental,
    ransac_fundamental_adaptive_batch,
    ransac_fundamental_batch,
)
from sfmfromscratch_tpu.geometry.triangulation import refine_points_gn, triangulate_dlt
from sfmfromscratch_tpu.ba.problem import make_problem
from sfmfromscratch_tpu.ba.lm import bundle_adjust
from sfmfromscratch_tpu.ops.lie import so3_log
from sfmfromscratch_tpu.ops.matcher import match_ratio_test
from sfmfromscratch_tpu.ops.pallas.support import pallas_tpu_available
from sfmfromscratch_tpu.pipeline.frontend import extract_features, preprocess_image
from sfmfromscratch_tpu.pipeline.tracks import MapStore
from sfmfromscratch_tpu.types import Features, PairGeometry
from sfmfromscratch_tpu.ops.matcher import match_pairs_batch
from sfmfromscratch_tpu.utils.fetch import device_get_packed
from sfmfromscratch_tpu.utils.precision import mm_f32
from sfmfromscratch_tpu.io.images import load_image


def _pow2_bucket(n: int, cap: int) -> int:
    """Smallest power of two >= n, capped at ``cap`` (one compiled program
    per bucket size instead of one per pair count)."""
    b = 1
    while b < n:
        b <<= 1
    return min(b, cap)


@functools.partial(jax.jit, static_argnames=("num_hypotheses",))
@mm_f32
def _chain_step_device(
    key, X_known, sel, p1, p2, K2, P1,
    num_hypotheses: int, reproj_threshold, new_sel,
):
    """One chain iteration's device work fused into a single program:
    PnP RANSAC -> chained projection -> DLT -> Gauss-Newton refine ->
    cheirality gate -> pose log. One dispatch + one host fetch per frame
    (each separate np.asarray costs a full tunnel round trip)."""
    pose = pnp_ransac(
        key, X_known, p2, K2, mask=sel,
        num_hypotheses=num_hypotheses, reproj_threshold=reproj_threshold,
    )
    P2 = projection_matrix(pose.R, pose.t, K2)
    X_new = triangulate_dlt(p1, p2, P1, P2)
    X_new = refine_points_gn(X_new, p1, p2, P1, P2, mask=new_sel, num_iters=8)
    Xh = jnp.concatenate([X_new, jnp.ones_like(X_new[:, :1])], axis=1)
    z1 = (Xh @ P1.T)[:, 2]
    z2 = (Xh @ P2.T)[:, 2]
    ok_new = new_sel & (z1 > 1e-6) & (z2 > 1e-6)
    rvec = so3_log(pose.R)
    return pose.ok, pose.inliers, rvec, pose.t, P2, X_new, ok_new


@functools.partial(
    jax.jit, static_argnames=("num_hypotheses", "stage_size", "adaptive")
)
@mm_f32
def _bootstrap_device(
    key, p1, p2, K1, K2, mask, num_hypotheses: int, threshold,
    stage_size: int = 512, adaptive: bool = False,
):
    """Bootstrap stage fused into one device program (one host fetch)."""
    if adaptive:
        pose = ransac_essential_pose_adaptive(
            key, p1, p2, K1, K2, mask,
            max_hypotheses=num_hypotheses, stage_size=stage_size,
            threshold=threshold, min_cheirality_frac=0.75,
        )
    else:
        pose = ransac_essential_pose(
            key, p1, p2, K1, K2, mask,
            num_hypotheses=num_hypotheses, threshold=threshold,
            min_cheirality_frac=0.75,
        )
    P1 = projection_matrix(jnp.eye(3), jnp.zeros(3), K1)
    P2 = projection_matrix(pose.R, pose.t, K2)
    X = triangulate_dlt(p1, p2, P1, P2)
    X = refine_points_gn(X, p1, p2, P1, P2, mask=pose.inliers, num_iters=8)
    rvec = so3_log(pose.R)
    return pose.inliers, X, rvec, pose.t, P2




@functools.partial(jax.jit, static_argnames=("num_hypotheses", "max_points", "kp_capacity"))
@mm_f32
def _chain_scan_device(
    keys,            # (F,) PRNG keys
    p1_all,          # (F, M, 2)
    p2_all,          # (F, M, 2)
    idx1_all,        # (F, M) int32
    idx2_all,        # (F, M) int32
    mask_all,        # (F, M) bool
    K2_all,          # (F, 3, 3)
    frame_valid,     # (F,) bool — padding frames are pass-through
    kp_tracks0,      # (kp_capacity,) int32 — track per keypoint of image 2
    points0,         # (max_points, 3) f32 — bootstrap tracks at the front
    n_points0,       # () int32
    P2_0,            # (3, 4) bootstrap projection
    num_hypotheses: int,
    reproj_threshold,
    max_points: int,
    kp_capacity: int,
):
    """The WHOLE sequential PnP chain as one on-device ``lax.scan``.

    The host version pays one tunnel round trip per frame for bookkeeping
    (~0.25 s each over the tunneled chip); here the track table itself lives
    on device — keypoint->track linking, new-track id assignment (cumsum),
    and the map scatter are all fixed-shape array ops — so the entire chain
    is ONE dispatch and ONE result fetch regardless of sequence length.

    Per frame emits fixed-capacity observation records:
      slots [0, M)  re-observations of linked tracks (valid = PnP inlier)
      slots [M, 2M) first observations of freshly triangulated tracks
    """

    def step(carry, xs):
        kp_tracks_prev, points, n_points, P_prev = carry
        key, p1, p2, idx1, idx2, mask, K2, frame_valid = xs

        # Padding frames (scan length is bucketed so different sequence
        # lengths share one compiled program) carry state through unchanged.
        mask = mask & frame_valid
        linked = jnp.where(mask, kp_tracks_prev[idx1], -1)
        sel = linked >= 0
        X_known = points[jnp.clip(linked, 0, max_points - 1)]

        pose = pnp_ransac(
            key, X_known, p2, K2, mask=sel,
            num_hypotheses=num_hypotheses, reproj_threshold=reproj_threshold,
        )
        pnp_inl = pose.inliers & sel

        P2 = projection_matrix(pose.R, pose.t, K2)
        X_new = triangulate_dlt(p1, p2, P_prev, P2)
        new_sel = mask & jnp.logical_not(sel)
        X_new = refine_points_gn(X_new, p1, p2, P_prev, P2, mask=new_sel, num_iters=8)
        Xh_w = jnp.concatenate([X_new, jnp.ones_like(X_new[:, :1])], axis=1)
        z1 = (Xh_w @ P_prev.T)[:, 2]
        z2 = (Xh_w @ P2.T)[:, 2]
        ok_new = new_sel & (z1 > 1e-6) & (z2 > 1e-6)

        # Fresh track ids by prefix sum; capacity overflow drops silently.
        offs = jnp.cumsum(ok_new.astype(jnp.int32)) - 1
        new_id = n_points + offs
        in_cap = ok_new & (new_id < max_points)
        scatter_ids = jnp.where(in_cap, new_id, max_points)  # OOB => dropped
        points = points.at[scatter_ids].set(X_new, mode="drop")
        n_points = jnp.minimum(
            n_points + jnp.sum(ok_new.astype(jnp.int32)), max_points
        )

        # Keypoint->track table for the next frame's left image. Two masked
        # scatter passes (re-observations, then fresh tracks) — matching the
        # host loop's write order — and invalid rows are DROPPED, not written
        # as -1 (they must not clobber a valid duplicate keypoint row).
        kp_tracks_next = jnp.full((kp_capacity,), -1, jnp.int32)
        ids_l = jnp.where(pnp_inl, idx2, kp_capacity)
        kp_tracks_next = kp_tracks_next.at[ids_l].set(
            linked.astype(jnp.int32), mode="drop"
        )
        ids_n = jnp.where(in_cap, idx2, kp_capacity)
        kp_tracks_next = kp_tracks_next.at[ids_n].set(
            new_id.astype(jnp.int32), mode="drop"
        )

        obs_track = jnp.concatenate([
            jnp.where(pnp_inl, linked, -1), jnp.where(in_cap, new_id, -1)
        ]).astype(jnp.int32)
        obs_xy = jnp.concatenate([p2, p2], axis=0)
        rvec = so3_log(pose.R)
        # Freeze carry on padding frames.
        P2 = jnp.where(frame_valid, P2, P_prev)
        kp_tracks_next = jnp.where(frame_valid, kp_tracks_next, kp_tracks_prev)
        ok = jnp.where(frame_valid, pose.ok, True)
        out = (rvec, pose.t, ok, pose.num_inliers, obs_track, obs_xy)
        return (kp_tracks_next, points, n_points, P2), out

    xs = (keys, p1_all, p2_all, idx1_all, idx2_all, mask_all, K2_all, frame_valid)
    carry0 = (kp_tracks0, points0, n_points0, P2_0)
    (kp_last, points, n_points, P_last), outs = jax.lax.scan(step, carry0, xs)
    rvecs, ts, oks, ninl, obs_track, obs_xy = outs
    return rvecs, ts, oks, ninl, obs_track, obs_xy, points, n_points


@functools.partial(jax.jit, static_argnames=(
    "boot_hyp", "stage_size", "adaptive", "pnp_hyp", "max_points",
    "kp_capacity",
))
@mm_f32
def _front_half_device(
    boot_key, keys,
    p1_all, p2_all, idx1_all, idx2_all,   # (1+Fp, M, ...) row 0 = pair (1,2)
    mask12, mask_chain,                   # (M,), (Fp, M)
    K1_0, K2_0, K2_chain, frame_valid,
    threshold, reproj_threshold,
    boot_hyp: int, stage_size: int, adaptive: bool,
    pnp_hyp: int, max_points: int, kp_capacity: int,
):
    """STAGES B+C chained on device-resident STAGE-A outputs: bootstrap, the
    bootstrap's track-table bookkeeping (the host work of
    SfmEngine._bootstrap as fixed-shape array ops), then the whole PnP scan
    chain — so the engine dispatches matching, bootstrap and chain back to
    back and fetches ONCE (VERDICT round-1 item 5: stage overlap; kills the
    bootstrap-fetch serialization of docs/PERFORMANCE.md round 1)."""
    inl, X, rvec0, tvec0, P2_0 = _bootstrap_device(
        boot_key, p1_all[0], p2_all[0], K1_0, K2_0, mask12,
        boot_hyp, threshold, stage_size=stage_size, adaptive=adaptive,
    )
    # Device-side equivalent of MapStore.add_tracks id assignment (sequential
    # over masked rows) + the kp->track table for image 2.
    tid = jnp.cumsum(inl.astype(jnp.int32)) - 1
    in_cap = inl & (tid < max_points)
    points0 = jnp.zeros((max_points, 3), jnp.float32).at[
        jnp.where(in_cap, tid, max_points)
    ].set(X.astype(jnp.float32), mode="drop")
    n0 = jnp.minimum(jnp.sum(inl.astype(jnp.int32)), max_points)
    kp_tracks0 = jnp.full((kp_capacity,), -1, jnp.int32).at[
        jnp.where(in_cap, idx2_all[0], kp_capacity)
    ].set(tid, mode="drop")

    scan_out = _chain_scan_device(
        keys, p1_all[1:], p2_all[1:], idx1_all[1:], idx2_all[1:],
        mask_chain, K2_chain, frame_valid,
        kp_tracks0, points0, n0, P2_0,
        pnp_hyp, reproj_threshold, max_points, kp_capacity,
    )
    return (inl, X, rvec0, tvec0) + scan_out


@jax.jit
def _combine_feature_chunks(sel, *chunks):
    """Concatenate per-chunk Features and drop bucket-padding rows as ONE
    device program (per-leaf eager concat+gather costs ~12 tunnel dispatches)."""
    feats = jax.tree.map(
        lambda *xs: jnp.concatenate(xs) if len(xs) > 1 else xs[0], *chunks
    )
    return jax.tree.map(lambda a: jnp.take(a, sel, axis=0), feats)


@functools.partial(jax.jit, static_argnames=(
    "max_matches", "use_pallas", "filter_on", "filter_adaptive",
    "filter_hyp", "stage_size", "boot_hyp", "boot_adaptive", "pnp_hyp",
    "max_points", "kp_capacity", "p_fetch",
))
@mm_f32
def _front_full_device(
    descriptors, kp_mask, xf, yf,          # device-resident per-image features
    pair_i, pair_j,                        # (B,) match-graph pair indices
    filter_keys, boot_key, chain_keys,     # RNG (same stream order as staged)
    sel,                                   # (1+Fp,) bucket-row per chain slot
    mask12_from_filt,                      # () bool — filter_all as a traced flag
    K1_0, K2_0, K2_chain, frame_valid,
    ratio_threshold, epi_threshold, reproj_threshold, confidence,
    max_matches: int, use_pallas: bool,
    filter_on: bool, filter_adaptive: bool, filter_hyp: int, stage_size: int,
    boot_hyp: int, boot_adaptive: bool, pnp_hyp: int,
    max_points: int, kp_capacity: int, p_fetch: int,
):
    """STAGES A+B+C — matching, pair filtering, bootstrap, and the whole PnP
    chain — as ONE compiled program.

    Round-3 profiling: the per-program work is small (matcher 28 ms, filter
    71 ms, bootstrap+chain ~50 ms on a v5e) but the staged dispatch path ran
    them as ~15 separate programs with ~10 eager concat/take ops in between,
    and over the tunneled chip every eager dispatch costs ~8-25 ms — ~0.4 s of
    the 1.08 s round-2 wall was dispatch overhead, not compute.  One program
    = one launch; the ``points`` buffer is sliced to ``p_fetch`` on device so
    the fetch ships live tracks only (VERDICT round-2 item 1)."""
    res, p1, p2 = match_pairs_batch(
        descriptors, kp_mask, xf, yf, pair_i, pair_j,
        ratio_threshold=ratio_threshold, max_matches=max_matches,
        use_pallas=use_pallas,
    )
    if filter_on:
        if filter_adaptive:
            fres = ransac_fundamental_adaptive_batch(
                filter_keys, p1, p2, res.mask,
                max_hypotheses=filter_hyp, stage_size=stage_size,
                threshold=epi_threshold, confidence=confidence,
            )
        else:
            fres = ransac_fundamental_batch(
                filter_keys, p1, p2, res.mask,
                num_hypotheses=filter_hyp, threshold=epi_threshold,
            )
        filt = fres.inliers
    else:
        filt = res.mask

    p1_all = jnp.take(p1, sel, axis=0)
    p2_all = jnp.take(p2, sel, axis=0)
    idx_all = jnp.take(res.indices, sel, axis=0)
    mask12 = jnp.where(mask12_from_filt, filt[0], res.mask[0])
    chain_src = filt if filter_on else res.mask
    mask_chain = jnp.take(chain_src, sel[1:], axis=0)

    out = _front_half_device(
        boot_key, chain_keys,
        p1_all, p2_all, idx_all[:, :, 0], idx_all[:, :, 1],
        mask12, mask_chain, K1_0, K2_0, K2_chain, frame_valid,
        epi_threshold, reproj_threshold,
        boot_hyp=boot_hyp, stage_size=stage_size, adaptive=boot_adaptive,
        pnp_hyp=pnp_hyp, max_points=max_points, kp_capacity=kp_capacity,
    )
    points_sliced = out[-2][:p_fetch]
    return (res.indices, res.mask, p1, p2, filt) + out[:-2] + (
        points_sliced, out[-1],
    )


class SfmEngine:
    """Incremental SfM over an ordered image sequence.

    Mirrors the reference CLI contract: images named ``<idx>.jpg`` with idx in
    1..max_img under ``img_path`` (Runner.py:134-141, 340-346).
    """

    def __init__(
        self,
        img_path: str,
        max_img: int,
        config: Optional[PipelineConfig] = None,
        single_K: Optional[np.ndarray] = None,
        camera_sensor: Optional[SensorType] = None,
        model_name: Optional[str] = None,
        output_dir: str = "output",
        assoc_mode: str = "index",
        on_pose_failure: str = "raise",
        checkpoint_every: Optional[int] = None,
        checkpoint_path: Optional[str] = None,
        mesh=None,
        chain_mode: str = "auto",
        pair_window: int = 1,
        local_ba_every: Optional[int] = None,
        local_ba_window: int = 5,
        feature_extractor=None,
        pair_cache_dir: Optional[str] = None,
        refine_focal: bool = False,
        chain_refresh: Optional[str] = None,
        auto_run: bool = True,
    ):
        self.img_path = img_path
        self.max_img = max_img
        self.config = config or PipelineConfig()
        self.single_K = single_K
        self.camera_sensor = camera_sensor
        self.model_name = model_name
        self.output_dir = output_dir
        assert assoc_mode in ("index", "distance")
        self.assoc_mode = assoc_mode
        assert on_pose_failure in ("raise", "recover")
        self.on_pose_failure = on_pose_failure
        self.checkpoint_every = checkpoint_every
        self.checkpoint_path = checkpoint_path
        self.mesh = mesh  # jax.sharding.Mesh => multi-device execution
        # pair_window=1 reproduces the reference's consecutive-only match graph
        # (Runner.py:183-184); w>1 also matches (i, i+2..i+w) and links their
        # observations into existing tracks (multi-view constraints the
        # reference never forms).
        assert chain_mode in ("auto", "host", "scan")
        self.chain_mode = chain_mode
        self.pair_window = max(1, int(pair_window))
        # Windowed bundle adjustment cadence: every k chain frames, re-optimize
        # the trailing `local_ba_window` cameras + the whole point set with
        # earlier cameras frozen (SURVEY.md §7.3 — periodic windowed BA instead
        # of one monolithic end-of-run solve).
        self.local_ba_every = local_ba_every
        self.local_ba_window = local_ba_window
        # Post-chain pose refresh before the final BA. "averaging" re-derives
        # rotations/centers by motion averaging over the map's own track
        # correspondences (pipeline/chain_refresh.py) — the measured fix for
        # chain drift on low-parallax orbits, where the bent chain is a
        # CONVERGED local minimum that neither windowed local BA nor more LM
        # iterations can escape (round-5 experiments, docs/PERFORMANCE.md).
        if chain_refresh not in (None, "averaging"):
            raise ValueError(
                f"chain_refresh must be None or 'averaging', got {chain_refresh!r}"
            )
        self.chain_refresh = chain_refresh
        # Extractor strategy slot (reference feature_extractor_class,
        # Runner.py:129-130): any callable (image_bw) -> Features with the
        # fixed-capacity contract — e.g. ops.superpoint.SuperPointExtractor
        # or ops.dog's detector. None = the built-in batched SIFT frontend.
        self.feature_extractor = feature_extractor
        # Restartable match graph (SURVEY.md §5.3): every completed pair's
        # geometry is persisted to this directory, so a killed run resumes
        # STAGE A at the first uncomputed pair instead of from scratch. Shard
        # -safe: each pair is its own file, keyed by a config fingerprint.
        self.pair_cache_dir = pair_cache_dir
        # Focal self-calibration (ba/selfcal.py): alternate BA with a Newton
        # refit of a shared focal scale — EXIF focals are nominal and the
        # reference never questions them (SFM.py:311-374).
        self.refine_focal = refine_focal
        self.focal_scale: float = 1.0
        # Host-sharded match graph (north star: "sharding the pairwise
        # matching graph across hosts"): (shard, num_shards) restricts THIS
        # process to every num_shards-th candidate pair; combined with
        # pair_cache_dir, N hosts each persist their shard and any later run
        # resumes with the full graph (see match_graph_shard()).
        self._pair_shard: Optional[Tuple[int, int]] = None
        self._track_seen_frame: np.ndarray = np.full(0, -1, dtype=np.int64)
        self.warnings: List[str] = []

        self.map = MapStore()
        self.global_poses: List[Tuple[np.ndarray, np.ndarray]] = []  # (rvec, t) per BA camera
        self.global_K: List[np.ndarray] = []
        self.pair_geometry: Dict[Tuple[int, int], PairGeometry] = {}
        # track id per keypoint slot, per image (index association mode)
        self._kp_tracks: Dict[int, np.ndarray] = {}
        self.errors_before_after_ba: Tuple[float, float] = (np.nan, np.nan)
        self.stage_times: Dict[str, float] = {}

        from sfmfromscratch_tpu.utils.cache import maybe_enable_compile_cache

        maybe_enable_compile_cache()   # no-op unless the backend is a TPU
        self._rng_key = jax.random.key(self.config.seed)
        self._num_hyp = self.config.ransac.num_iterations()
        self._pnp_hyp = self.config.ransac.pnp_num_iterations()

        if auto_run:
            self.run()

    # ------------------------------------------------------------------ utils

    def _next_key(self) -> jax.Array:
        self._rng_key, sub = jax.random.split(self._rng_key)
        return sub

    def _image_file(self, idx: int) -> str:
        return os.path.join(self.img_path, f"{idx}.jpg")

    def _intrinsics(self, idx: int) -> np.ndarray:
        if self.single_K is not None:
            return np.asarray(self.single_K, dtype=np.float64)
        K = intrinsics_from_exif(self._image_file(idx), self.camera_sensor)
        # Features live on images prescaled by scale_factor, so K must be
        # scaled to match (the reference derives K at file resolution but
        # detects at half scale — a consistency bug we do not reproduce).
        s = self.config.scale_factor
        return np.diag([s, s, 1.0]) @ K

    # ------------------------------------------------------------------ stages

    def _extract_all_features(self) -> Features:
        """Feature extraction, each image exactly once; returns Features with
        a leading (C,) image axis, kept device-resident (downstream stages —
        batched matching, retrieval, track building — all consume the stacked
        form, so per-image unstack/restack round trips never happen).

        Same-shape images run as chunked batched programs that fuse
        preprocessing (gray + resize) with the pyramid frontend; mixed shapes
        fall back to per-image extraction then one stack."""
        t0 = time.time()
        # Batchability is decided from image HEADERS (PIL reads size without
        # decoding): raw frames stream one chunk at a time instead of pinning
        # the whole collection's decoded pixels on the host, and equal
        # resolutions batch together regardless of storage mode (an RGB and a
        # grayscale file of the same size preprocess to the same gray shape).
        from PIL import Image as _Image

        sizes = set()
        for idx in range(1, self.max_img + 1):
            with _Image.open(self._image_file(idx)) as im:
                sizes.add(im.size)

        def _gray(idx: int) -> jax.Array:
            return preprocess_image(
                load_image(self._image_file(idx)), self.config.scale_factor
            )

        stack_leaves = lambda *xs: (
            jnp.concatenate(xs) if len(xs) > 1 else xs[0]
        )
        if self.feature_extractor is not None:
            per = [
                jax.tree.map(lambda a: a[None], self.feature_extractor(_gray(i)))
                for i in range(1, self.max_img + 1)
            ]
            feats = jax.tree.map(stack_leaves, *per)
        elif len(sizes) == 1 and self.max_img > 1:
            from sfmfromscratch_tpu.pipeline.frontend import (
                extract_features_batch,
                preprocess_image_batch,
            )

            # Decode every image on the host, stack, and upload ONE array per
            # chunk; gray+resize run as one batched device program per chunk
            # (the per-image eager path paid an upload + 1-2 program launches
            # per image — the features stage's real cost at round 3).  The
            # last chunk is BUCKETED to the next power of two instead of
            # padded to CHUNK (10 images cost 8+2 images of compute, not 8+8).
            # NOTE: preprocessing stays a separate program rather than fusing
            # into the extract jit: a different fusion boundary changes float
            # reassociation enough to flip dominant-orientation ties in a few
            # SIFT descriptors, which knife-edge scenes notice.
            from sfmfromscratch_tpu.io.images import load_image_u8

            CHUNK = 8
            # Mesh runs shard the chunk's batch axis over the 'data' axis, so
            # every bucket (including the remainder) must be a multiple of it.
            data_ax = (
                self.mesh.shape["data"]
                if self.mesh is not None and "data" in self.mesh.shape
                else 1
            )

            def bucket(n: int) -> int:
                b = _pow2_bucket(n, max(CHUNK, data_ax))
                return ((b + data_ax - 1) // data_ax) * data_ax

            raws = [load_image_u8(self._image_file(i)) for i in range(1, self.max_img + 1)]
            same_shape = len({r.shape for r in raws}) == 1
            chunks = []
            start = 0
            while start < self.max_img:
                n = min(CHUNK, self.max_img - start)
                B = bucket(n)
                idxs = list(range(start, start + n)) + [start] * (B - n)
                if same_shape:
                    # uint8 upload: 4x less tunnel traffic; /255 runs on device
                    # (bit-identical to the host conversion, io/images.py).
                    stacked_raw = jnp.asarray(np.stack([raws[i] for i in idxs]))
                    stacked = preprocess_image_batch(
                        stacked_raw, self.config.scale_factor
                    )
                else:
                    stacked = jnp.stack([
                        preprocess_image(
                            raws[i].astype(np.float32) / 255.0,
                            self.config.scale_factor,
                        )
                        for i in idxs
                    ])
                if self.mesh is not None and "data" in self.mesh.shape:
                    from jax.sharding import NamedSharding, PartitionSpec as P

                    stacked = jax.device_put(
                        stacked, NamedSharding(self.mesh, P("data", None, None))
                    )
                chunks.append(
                    extract_features_batch(
                        stacked, self.config.extractor,
                        # lax.map beats vmap 1.75x on one chip; vmap only
                        # when the batch axis is sharded (see frontend.py).
                        serial=not (
                            self.mesh is not None
                            and "data" in self.mesh.shape
                        ),
                    )
                )
                start += n
            # Combine chunks + drop bucket-padding rows as ONE jitted program
            # (a per-leaf eager concatenate + gather costs ~12 dispatches at
            # ~8-25 ms each over the tunnel — round-3 profiling).
            keep = []
            row = 0
            start = 0
            while start < self.max_img:
                n = min(CHUNK, self.max_img - start)
                B = bucket(n)
                keep.extend(range(row, row + n))
                row += B
                start += n
            if len(chunks) == 1 and len(keep) == chunks[0].descriptors.shape[0]:
                feats = chunks[0]
            else:
                feats = _combine_feature_chunks(
                    jnp.asarray(keep, jnp.int32), *chunks
                )
        else:
            per = [
                jax.tree.map(
                    lambda a: a[None],
                    extract_features(_gray(i), self.config.extractor),
                )
                for i in range(1, self.max_img + 1)
            ]
            feats = jax.tree.map(stack_leaves, *per)
        cap = feats.keypoints.capacity
        for idx in range(1, self.max_img + 1):
            self._kp_tracks[idx] = np.full(cap, -1, dtype=np.int64)
        if os.environ.get("SFM_STAGE_SYNC"):
            from sfmfromscratch_tpu.utils.fetch import sync_device

            sync_device(feats.descriptors)
            self.stage_times["features.compute"] = time.time() - t0
        self.stage_times["features"] = time.time() - t0
        return feats

    def _prepare_pair_selection(self, feats: Features) -> None:
        """Hook before pair selection (no-op here); GlobalSfmEngine's
        flow-adaptive keyframe selection runs here so BOTH run() and
        match_graph_shard() agree on the candidate-pair set — shard hosts
        must cache exactly the pairs the final run will resume."""

    def _candidate_pairs(self, feats: Features):
        """Image pairs to match: the sequential window (reference
        Runner.py:183-184 is the w=1 case). Engines for unordered collections
        override this (e.g. retrieval-based selection in GlobalSfmEngine)."""
        return [
            (i1, i2)
            for i1 in range(1, self.max_img)
            for i2 in range(i1 + 1, min(i1 + self.pair_window, self.max_img) + 1)
        ]

    def _pair_cache_tag(self) -> str:
        """Fingerprint of everything that determines a pair's staged geometry;
        cache entries written under a different configuration are invisible."""
        import hashlib

        c = self.config
        sig = repr((
            c.extractor, c.matcher, c.ransac, c.scale_factor, c.seed,
            bool(getattr(self, "_filter_all_pairs", False)),
            bool(getattr(self, "_filter_pairs", True)),
        ))
        return hashlib.sha1(sig.encode()).hexdigest()[:16]

    def _pair_cache_file(self, i1: int, i2: int) -> str:
        return os.path.join(self.pair_cache_dir, f"pair_{i1}_{i2}.npz")

    def _match_dispatch(self, todo, feats: Features):
        """Dispatch the bucketed match+filter device programs for ``todo``
        pairs WITHOUT fetching; returns the bucket list
        [(chunk_keys, MatchResult, mask_filt_or_None, p1, p2), ...]."""
        from sfmfromscratch_tpu.ops.pallas.support import pallas_tpu_available

        mcfg = self.config.matcher
        rcfg = self.config.ransac
        filter_on = getattr(self, "_filter_pairs", True)
        use_pallas = pallas_tpu_available()

        buckets = []
        if todo:
            D_all = feats.descriptors
            M_all = feats.keypoints.mask
            XF = feats.keypoints.xf
            YF = feats.keypoints.yf
            Kcap = int(D_all.shape[1])
            if use_pallas:
                # Fused kernel: no (B, K, K) HBM tensor; VMEM holds one
                # database (K, D) per grid step, so the batch can be large.
                maxb = 128
            else:
                # HBM guard: the XLA path materializes (B, K, K) distances.
                maxb = int(max(8, min(128, (384 << 20) // max(Kcap * Kcap * 4, 1))))
            for c0 in range(0, len(todo), maxb):
                chunk = todo[c0 : c0 + maxb]
                B = _pow2_bucket(len(chunk), maxb)
                pad = chunk + [chunk[-1]] * (B - len(chunk))
                pi = jnp.asarray([k[0] - 1 for k in pad], jnp.int32)
                pj = jnp.asarray([k[1] - 1 for k in pad], jnp.int32)
                res, p1, p2 = match_pairs_batch(
                    D_all, M_all, XF, YF, pi, pj,
                    ratio_threshold=mcfg.ratio_threshold,
                    max_matches=mcfg.max_matches,
                    use_pallas=use_pallas,
                )
                mask_filt = None
                if filter_on:
                    keys = jax.random.split(self._next_key(), B)
                    if rcfg.adaptive:
                        # Early-terminating stages: a bucket costs its worst
                        # pair's stage count (typically 1-2 of 12) instead of
                        # the full 5,967-hypothesis program.
                        fres = ransac_fundamental_adaptive_batch(
                            keys, p1, p2, res.mask,
                            max_hypotheses=rcfg.max_hypotheses(),
                            stage_size=rcfg.stage_size,
                            threshold=rcfg.epipolar_threshold,
                            confidence=rcfg.prob_success,
                        )
                    else:
                        fres = ransac_fundamental_batch(
                            keys, p1, p2, res.mask,
                            num_hypotheses=self._num_hyp,
                            threshold=rcfg.epipolar_threshold,
                        )
                    mask_filt = fres.inliers
                buckets.append((chunk, res, mask_filt, p1, p2))
        return buckets

    def _match_pairs(self, feats: Features) -> None:
        """Pairwise matching + inlier filtering (STAGE A), fully batched.

        Per-pair dispatches cost a host<->device round trip each (~25 ms on a
        tunneled chip; 14 s of a 200-view run was per-pair matcher calls), so
        the whole stage runs as a handful of device programs: per-image
        features stay device-resident, each bucket of pairs is matched +
        coordinate-gathered by ops.matcher.match_pairs_batch, the robust
        F-RANSAC filter consumes those batch outputs directly, and ONE
        stacked fetch per field brings the results to host numpy.
        ``pair_geometry`` holds NUMPY arrays: downstream host bookkeeping
        indexes them for free, and device stages re-upload them in one
        stacked transfer per stage.
        """
        t0 = time.time()
        filter_all = getattr(self, "_filter_all_pairs", False)
        pairs = self._candidate_pairs(feats)
        if self._pair_shard is not None:
            s, n = self._pair_shard
            pairs = [k for e, k in enumerate(sorted(pairs)) if e % n == s]

        # Resume: pairs already persisted by a previous (killed) run skip
        # matching AND filtering. The RNG stream the filter consumes depends
        # on how many pairs remain, so a resumed run is deterministic given
        # its restart point but not bitwise-equal to an uninterrupted one.
        cached: Dict[Tuple[int, int], dict] = {}
        if self.pair_cache_dir:
            os.makedirs(self.pair_cache_dir, exist_ok=True)
            tag = self._pair_cache_tag()
            for k in pairs:
                f = self._pair_cache_file(*k)
                if os.path.exists(f):
                    try:
                        z = np.load(f)
                        if str(z["tag"]) == tag:
                            cached[k] = {
                                n: z[n] for n in ("p1", "p2", "idx1", "idx2", "mask")
                            }
                    except Exception:
                        pass  # unreadable/partial file => recompute
            if cached:
                self.warnings.append(
                    f"pair cache: resumed {len(cached)}/{len(pairs)} pairs"
                )

        todo = [k for k in pairs if k not in cached]
        self._last_match_computed = len(todo)
        buckets = self._match_dispatch(todo, feats)
        self.stage_times["matching.dispatch"] = time.time() - t0
        t1 = time.time()
        # ONE stacked fetch per field across all buckets (each device_get
        # array costs a tunnel round trip).
        results: Dict[Tuple[int, int], tuple] = {}
        if buckets:
            fetch = [
                jnp.concatenate([b[1].indices for b in buckets]),
                jnp.concatenate([b[1].mask for b in buckets]),
                jnp.concatenate([b[3] for b in buckets]),
                jnp.concatenate([b[4] for b in buckets]),
            ]
            has_filt = any(b[2] is not None for b in buckets)
            if has_filt:
                fetch.append(jnp.concatenate([b[2] for b in buckets]))
            got = device_get_packed(*fetch)
            idx_np, raw_np, p1_np, p2_np = got[:4]
            filt_np = got[4] if has_filt else None
            g = 0
            for chunk, res, _mf, _p1, _p2 in buckets:
                B = res.mask.shape[0]
                for ci, k in enumerate(chunk):
                    row = g + ci
                    mask = raw_np[row]
                    if filt_np is not None and (
                        k != (1, 2) or filter_all
                    ):
                        mask = filt_np[row]
                    results[k] = (
                        np.asarray(p1_np[row], np.float32),
                        np.asarray(p2_np[row], np.float32),
                        np.asarray(idx_np[row, :, 0], np.int32),
                        np.asarray(idx_np[row, :, 1], np.int32),
                        np.asarray(mask, bool),
                    )
                g += B
        self.stage_times["matching.fetch"] = time.time() - t1

        for key in pairs:
            i1, i2 = key
            if key in cached:
                z = cached[key]
                p1 = np.asarray(z["p1"], np.float32)
                p2 = np.asarray(z["p2"], np.float32)
                idx1 = np.asarray(z["idx1"], np.int32)
                idx2 = np.asarray(z["idx2"], np.int32)
                mask = np.asarray(z["mask"], bool)
            else:
                p1, p2, idx1, idx2, mask = results[key]
            K1 = np.asarray(self._intrinsics(i1), np.float32)
            K2 = np.asarray(self._intrinsics(i2), np.float32)
            self.pair_geometry[(i1, i2)] = PairGeometry(
                p1=p1, p2=p2, idx1=idx1, idx2=idx2, mask=mask, K1=K1, K2=K2
            )
            self.pair_geometry[(i2, i1)] = PairGeometry(
                p1=p2, p2=p1, idx1=idx2, idx2=idx1, mask=mask, K1=K2, K2=K1
            )
        if self.pair_cache_dir and results:
            # One atomic-rename write per pair so a kill mid-write never
            # leaves a truncated entry to trip the next resume.
            for k, (p1n, p2n, i1n, i2n, mn) in results.items():
                f = self._pair_cache_file(*k)
                tmp = f + ".tmp.npz"   # savez keeps names already ending .npz
                np.savez(tmp, tag=tag, p1=p1n, p2=p2n, idx1=i1n, idx2=i2n, mask=mn)
                os.replace(tmp, f)
        self.stage_times["matching"] = time.time() - t0

    def _try_run_front_fused(self, feats: Features) -> bool:
        """STAGES A+B+C dispatched back to back on device-resident arrays
        with ONE final fetch (pipeline stage overlap, VERDICT round-1 item 5).

        The staged path serializes on the tunnel three times — matching
        fetch, bootstrap fetch, chain upload+fetch — and re-uploads STAGE-A
        outputs the device already holds. Here the bootstrap and the whole
        PnP scan chain consume the matching buckets' device arrays directly
        (_front_half_device), so host bookkeeping overlaps device compute and
        per-stage round trips collapse into one fetch. RNG consumption order
        matches the staged path exactly (bucket keys, bootstrap key, chain
        keys), so results are identical.

        Eligible for the default sequential configuration (scan chain,
        window-1 consecutive pairs, no pair shard, no resume cache); anything
        fancier falls back to the staged path. Returns False when not taken.
        """
        if os.environ.get("SFM_NO_FUSED_FRONT"):
            return False  # diagnostics: force the staged multi-program path
        if self._pair_shard is not None or self.pair_cache_dir:
            return False
        if not self._use_scan_chain() or self.max_img < 3:
            return False
        pairs = self._candidate_pairs(feats)
        if pairs != [(i, i + 1) for i in range(1, self.max_img)]:
            return False

        t0 = time.time()
        rcfg = self.config.ransac
        mcfg = self.config.matcher
        filter_on = getattr(self, "_filter_pairs", True)
        filter_all = getattr(self, "_filter_all_pairs", False)
        self._last_match_computed = len(pairs)

        # Single-bucket sequences (<= one match chunk) run matching + filter +
        # bootstrap + chain as ONE compiled program (_front_full_device): over
        # the tunneled chip the staged dispatch's ~15 programs + ~10 eager ops
        # cost ~0.4 s in launch overhead alone (round-3 profiling). Longer
        # sequences keep the bucketed multi-program path.
        from sfmfromscratch_tpu.ops.pallas.support import pallas_tpu_available

        use_pallas = pallas_tpu_available()
        Kcap = int(feats.descriptors.shape[1])
        maxb = 128 if use_pallas else int(
            max(8, min(128, (384 << 20) // max(Kcap * Kcap * 4, 1)))
        )
        if len(pairs) > maxb:
            return self._run_front_fused_bucketed(pairs, feats, t0)

        F = self.max_img - 2
        Fp = ((F + 7) // 8) * 8
        B = _pow2_bucket(len(pairs), maxb)
        pad = pairs + [pairs[-1]] * (B - len(pairs))
        pair_i = jnp.asarray([k[0] - 1 for k in pad], jnp.int32)
        pair_j = jnp.asarray([k[1] - 1 for k in pad], jnp.int32)
        rows = np.minimum(1 + np.arange(Fp), len(pairs) - 1)
        sel = jnp.asarray(np.concatenate([[0], rows]), jnp.int32)
        frame_valid = jnp.arange(Fp) < F
        K_host = [self._intrinsics(i) for i in range(1, self.max_img + 1)]
        K2_chain = np.stack(
            [K_host[min(2 + f, self.max_img - 1)] for f in range(Fp)]
        ).astype(np.float32)

        # RNG stream order matches the staged path exactly: per-bucket filter
        # keys (only when filtering), bootstrap key, chain keys.
        if filter_on:
            filter_keys = jax.random.split(self._next_key(), B)
        else:
            filter_keys = jax.random.split(jax.random.key(0), B)
        boot_key = self._next_key()
        chain_keys = jax.random.split(self._next_key(), Fp)
        kp_capacity = int(feats.keypoints.capacity)
        max_points = self.config.max_points
        M = min(mcfg.max_matches, kp_capacity)
        p_fetch = min(max_points, (Fp + 1) * M)
        hyp = rcfg.max_hypotheses() if rcfg.adaptive else self._num_hyp

        out = _front_full_device(
            feats.descriptors, feats.keypoints.mask,
            feats.keypoints.xf, feats.keypoints.yf,
            pair_i, pair_j, filter_keys, boot_key, chain_keys,
            sel, jnp.asarray(bool(filter_on and filter_all)),
            jnp.asarray(K_host[0], jnp.float32),
            jnp.asarray(K_host[1], jnp.float32),
            jnp.asarray(K2_chain), frame_valid,
            mcfg.ratio_threshold, rcfg.epipolar_threshold,
            rcfg.pnp_reproj_threshold, rcfg.prob_success,
            max_matches=mcfg.max_matches, use_pallas=use_pallas,
            filter_on=filter_on, filter_adaptive=rcfg.adaptive,
            filter_hyp=hyp, stage_size=rcfg.stage_size,
            boot_hyp=hyp, boot_adaptive=rcfg.adaptive,
            pnp_hyp=self._pnp_hyp, max_points=max_points,
            kp_capacity=kp_capacity, p_fetch=p_fetch,
        )
        self.stage_times["front.dispatch"] = time.time() - t0
        (conc_idx, conc_raw, conc_p1, conc_p2, conc_filt,
         inl_d, X_d, rvec0_d, tvec0_d, rvecs_d, ts_d, oks_d, _ninl_d,
         obs_track_d, obs_xy_d, points_d, n_points_d) = out
        if os.environ.get("SFM_STAGE_SYNC"):
            from sfmfromscratch_tpu.utils.fetch import sync_device

            sync_device(out[-1])
            self.stage_times["front.compute"] = time.time() - t0

        t1 = time.time()
        fetched = device_get_packed(
            conc_idx, conc_raw, conc_p1, conc_p2, conc_filt,
            inl_d, X_d, rvec0_d, tvec0_d,
            rvecs_d, ts_d, oks_d, obs_track_d, obs_xy_d,
            points_d, n_points_d,
        )
        self.stage_times["front.fetch"] = time.time() - t1
        self._front_finish(pairs, K_host, F, filter_on, filter_all, *fetched)
        self.stage_times["front(fused A+B+C)"] = time.time() - t0
        return True

    def _run_front_fused_bucketed(self, pairs, feats: Features, t0) -> bool:
        """Multi-bucket fused front (sequences longer than one match chunk):
        the bucketed match+filter programs, eager bucket concatenation, and
        the _front_half_device bootstrap+chain program, with one packed fetch."""
        rcfg = self.config.ransac
        filter_on = getattr(self, "_filter_pairs", True)
        filter_all = getattr(self, "_filter_all_pairs", False)
        buckets = self._match_dispatch(pairs, feats)

        conc_idx = jnp.concatenate([b[1].indices for b in buckets])
        conc_raw = jnp.concatenate([b[1].mask for b in buckets])
        conc_p1 = jnp.concatenate([b[3] for b in buckets])
        conc_p2 = jnp.concatenate([b[4] for b in buckets])
        conc_filt = (
            jnp.concatenate([b[2] for b in buckets]) if filter_on else None
        )

        F = self.max_img - 2
        Fp = ((F + 7) // 8) * 8
        # Bucket-global row of pair (i, i+1) is i-1 (chunks are full except
        # the last, whose padding rows sit past all valid ones); the scan
        # consumes rows 1..F padded by repeating the last valid row
        # (frame_valid gates padding off).
        rows = np.minimum(1 + np.arange(Fp), len(pairs) - 1)
        sel = jnp.asarray(np.concatenate([[0], rows]), jnp.int32)
        p1_all = jnp.take(conc_p1, sel, axis=0)
        p2_all = jnp.take(conc_p2, sel, axis=0)
        idx_all = jnp.take(conc_idx, sel, axis=0)
        mask12 = (
            conc_filt[0] if (filter_on and filter_all) else conc_raw[0]
        )
        chain_src = conc_filt if filter_on else conc_raw
        mask_chain = jnp.take(chain_src, sel[1:], axis=0)
        frame_valid = jnp.arange(Fp) < F

        K_host = [self._intrinsics(i) for i in range(1, self.max_img + 1)]
        K2_chain = np.stack(
            [K_host[min(2 + f, self.max_img - 1)] for f in range(Fp)]
        ).astype(np.float32)

        boot_key = self._next_key()
        keys = jax.random.split(self._next_key(), Fp)
        kp_capacity = int(feats.keypoints.capacity)
        max_points = self.config.max_points

        out = _front_half_device(
            boot_key, keys,
            p1_all, p2_all, idx_all[:, :, 0], idx_all[:, :, 1],
            mask12, mask_chain,
            jnp.asarray(K_host[0], jnp.float32),
            jnp.asarray(K_host[1], jnp.float32),
            jnp.asarray(K2_chain), frame_valid,
            rcfg.epipolar_threshold, rcfg.pnp_reproj_threshold,
            boot_hyp=rcfg.max_hypotheses() if rcfg.adaptive else self._num_hyp,
            stage_size=rcfg.stage_size, adaptive=rcfg.adaptive,
            pnp_hyp=self._pnp_hyp, max_points=max_points,
            kp_capacity=kp_capacity,
        )
        self.stage_times["front.dispatch"] = time.time() - t0
        if os.environ.get("SFM_STAGE_SYNC"):
            # Diagnostics only: split device compute from transfer (the fetch
            # below blocks on both; each sync costs one extra round trip).
            from sfmfromscratch_tpu.utils.fetch import sync_device

            tm = time.time()
            sync_device(conc_raw)
            self.stage_times["front.match.compute"] = time.time() - tm
            if conc_filt is not None:
                sync_device(conc_filt)
                self.stage_times["front.filter.compute"] = time.time() - tm
            sync_device(out[1])   # bootstrap X
            self.stage_times["front.boot.compute"] = time.time() - tm
            sync_device(out[-1])
            self.stage_times["front.chain.compute"] = time.time() - tm
            self.stage_times["front.compute"] = time.time() - t0

        # ONE packed fetch (two flat buffers, utils/fetch.py) for matching +
        # bootstrap + chain: each fetched leaf costs a tunnel round trip, so
        # round 2's 17-leaf tuple paid ~0.85 s in latency alone.  The global
        # points buffer is sliced to the static maximum of live tracks
        # (bootstrap adds <= M, each chain frame <= M) instead of shipping
        # the full max_points capacity.
        t1 = time.time()
        filt_or_raw = conc_filt if filter_on else conc_raw
        (inl_d, X_d, rvec0_d, tvec0_d,
         rvecs_d, ts_d, oks_d, _ninl_d, obs_track_d, obs_xy_d,
         points_d, n_points_d) = out
        M = int(p1_all.shape[1])
        P_fetch = min(max_points, (Fp + 1) * M)
        fetched = device_get_packed(
            conc_idx, conc_raw, conc_p1, conc_p2, filt_or_raw,
            inl_d, X_d, rvec0_d, tvec0_d,
            rvecs_d, ts_d, oks_d, obs_track_d, obs_xy_d,
            points_d[:P_fetch], n_points_d,
        )
        self.stage_times["front.fetch"] = time.time() - t1
        self._front_finish(pairs, K_host, F, filter_on, filter_all, *fetched)
        self.stage_times["front(fused A+B+C)"] = time.time() - t0
        return True

    def _front_finish(
        self, pairs, K_host, F, filter_on, filter_all,
        idx_np, raw_np, p1_np, p2_np, filt_np,
        inl_np, X_np, rvec0, tvec0,
        rvecs, ts, oks, obs_track, obs_xy, points, n_points,
    ) -> None:
        """Host bookkeeping shared by both fused-front paths: pair geometry
        (STAGE A tail), bootstrap map/pose state (STAGE B tail), and the chain
        map/pose state (STAGE C tail)."""
        # --- STAGE A host bookkeeping (mirrors _match_pairs' tail).
        for e, key in enumerate(pairs):
            i1, i2 = key
            mask = raw_np[e]
            if filter_on and (key != (1, 2) or filter_all):
                mask = filt_np[e]
            p1 = np.asarray(p1_np[e], np.float32)
            p2 = np.asarray(p2_np[e], np.float32)
            idx1 = np.asarray(idx_np[e, :, 0], np.int32)
            idx2 = np.asarray(idx_np[e, :, 1], np.int32)
            mask = np.asarray(mask, bool)
            K1 = np.asarray(K_host[i1 - 1], np.float32)
            K2 = np.asarray(K_host[i2 - 1], np.float32)
            self.pair_geometry[(i1, i2)] = PairGeometry(
                p1=p1, p2=p2, idx1=idx1, idx2=idx2, mask=mask, K1=K1, K2=K2
            )
            self.pair_geometry[(i2, i1)] = PairGeometry(
                p1=p2, p2=p1, idx1=idx2, idx2=idx1, mask=mask, K1=K2, K2=K1
            )

        # --- STAGE B host bookkeeping (mirrors _bootstrap's tail).
        inl_np = np.asarray(inl_np, bool)
        p2_0 = np.asarray(p2_np[0], np.float64)
        idx2_0 = np.asarray(idx_np[0, :, 1])
        track_ids = self.map.add_tracks(
            np.asarray(X_np, np.float64), p2_0, frame_idx=0, mask=inl_np
        )
        self._kp_tracks[2][idx2_0[inl_np]] = track_ids[inl_np]
        self.global_poses.append((
            np.asarray(rvec0, np.float64), np.asarray(tvec0, np.float64)
        ))
        self.global_K.append(np.asarray(K_host[1], np.float64))
        n0 = self.map.num_tracks

        # --- STAGE C host bookkeeping (mirrors _chain_scan's tail).
        bad = np.nonzero(~np.asarray(oks))[0]
        if len(bad):
            raise RuntimeError(
                f"Cannot determine pose for pair ({int(bad[0]) + 2}, {int(bad[0]) + 3})"
            )
        n_points = int(n_points)
        self.map.append_points_raw(points[n0:n_points])
        for f in range(F):
            current_frame = len(self.global_poses)
            tr = obs_track[f]
            valid = tr >= 0
            self.map.add_observations(
                np.where(valid, tr, -1), obs_xy[f], current_frame
            )
            self.global_poses.append((
                np.asarray(rvecs[f], np.float64), np.asarray(ts[f], np.float64)
            ))
            self.global_K.append(np.asarray(K_host[min(f + 2, self.max_img - 1)], np.float64))

    def _bootstrap(self):
        """Initial pair (1,2): pose + triangulation (STAGE B)."""
        t0 = time.time()
        pg = self.pair_geometry[(1, 2)]
        rcfg = self.config.ransac
        out = _bootstrap_device(
            self._next_key(), pg.p1, pg.p2, pg.K1, pg.K2, pg.mask,
            rcfg.max_hypotheses() if rcfg.adaptive else self._num_hyp,
            rcfg.epipolar_threshold,
            stage_size=rcfg.stage_size, adaptive=rcfg.adaptive,
        )
        # ONE packed fetch for the whole stage (every fetched array costs a
        # full tunnel round trip regardless of payload size; utils/fetch.py).
        inl_np, p3d_np, rvec, tvec = device_get_packed(
            out[0], out[1], out[2], out[3]
        )
        p2_np, idx2_np = jax.device_get((pg.p2, pg.idx2))
        P2 = out[4]
        p3d_np = np.asarray(p3d_np, dtype=np.float64)
        p2_np = np.asarray(p2_np, dtype=np.float64)
        idx2_np = np.asarray(idx2_np)

        # Frame 0 of the BA problem observes through the second physical image
        # (the identity base camera never enters BA — reference Runner.py:212-218).
        track_ids = self.map.add_tracks(p3d_np, p2_np, frame_idx=0, mask=inl_np)
        self._kp_tracks[2][idx2_np[inl_np]] = track_ids[inl_np]

        self.global_poses.append((
            np.asarray(rvec, dtype=np.float64), np.asarray(tvec, dtype=np.float64)
        ))
        self.global_K.append(np.asarray(pg.K2, dtype=np.float64))
        self.stage_times["bootstrap"] = time.time() - t0
        return p3d_np[inl_np], p2_np[inl_np], track_ids[inl_np], P2

    @staticmethod
    def _associate_by_distance(prev_obs_2d: np.ndarray, pair_p1: np.ndarray, dist_threshold: float):
        """Reference-faithful association: nearest established observation in
        the shared frame within the gate (Runner.py:241-247), vectorized."""
        if len(prev_obs_2d) == 0 or len(pair_p1) == 0:
            return np.full(len(pair_p1), -1, np.int64)
        d = np.linalg.norm(pair_p1[:, None, :] - prev_obs_2d[None, :, :], axis=2)
        nearest = np.argmin(d, axis=1)
        ok = d[np.arange(len(pair_p1)), nearest] < dist_threshold
        return np.where(ok, nearest, -1)

    def _chain(self, p3d, p2_obs, track_ids, P2) -> None:
        """Sequential PnP chain over frames 3..max_img (STAGE C).

        Every device call runs at the fixed match capacity with masks, so the
        whole chain reuses ONE compiled program per stage regardless of how
        many matches/associations each pair produced (XLA static shapes;
        SURVEY.md §7.3)."""
        t0 = time.time()
        # One bulk device->host fetch for every pair's match data (each
        # separate np.asarray would be a full tunnel round trip).
        pair_host = jax.device_get({
            key: (pg.mask, pg.p1, pg.p2, pg.idx1, pg.idx2)
            for key, pg in self.pair_geometry.items()
            if key[0] < key[1] and key[1] >= 3
        })
        self._pair_host = pair_host
        for i in range(2, self.max_img):
            j = i + 1
            pg = self.pair_geometry[(i, j)]
            mask_np, p1_h, p2_h, idx1_np, idx2_np = pair_host[(i, j)]
            p1_np = np.asarray(p1_h, dtype=np.float64)
            p2_np = np.asarray(p2_h, dtype=np.float64)

            if self.assoc_mode == "index":
                # A match whose image-i keypoint already carries a track links
                # the new frame to the existing 3-D point.
                linked = np.where(mask_np, self._kp_tracks[i][idx1_np], -1)
                sel = linked >= 0
                known_tracks = np.where(sel, linked, 0)
                X_known = self.map.points()[known_tracks]
            else:
                assoc = self._associate_by_distance(p2_obs, p1_np, self.config.dist_threshold)
                assoc = np.where(mask_np, assoc, -1)
                sel = assoc >= 0
                known_tracks = np.where(sel, track_ids[np.where(sel, assoc, 0)], 0)
                X_known = p3d[np.where(sel, assoc, 0)]

            if sel.sum() < 6:
                if self.on_pose_failure == "raise":
                    # Reference behavior: a failed pose kills the run
                    # (Runner.py:263-264).
                    raise RuntimeError(
                        f"Cannot determine pose for pair ({i}, {j}): "
                        f"only {int(sel.sum())} 2D-3D associations"
                    )

            new_sel = mask_np & ~sel if self.assoc_mode == "index" else mask_np
            out = _chain_step_device(
                self._next_key(),
                jnp.asarray(X_known, dtype=jnp.float32),
                jnp.asarray(sel),
                jnp.asarray(p1_np, dtype=jnp.float32),
                jnp.asarray(p2_np, dtype=jnp.float32),
                pg.K2,
                P2,  # previous frame's projection becomes P1
                self._pnp_hyp,
                self.config.ransac.pnp_reproj_threshold,
                jnp.asarray(new_sel),
            )
            # ONE packed fetch for the frame (utils/fetch.py).
            ok, inliers, rvec, tvec, P2_new, X_new_np, ok_new = device_get_packed(*out)

            if not bool(ok) or sel.sum() < 6:
                if self.on_pose_failure == "raise":
                    raise RuntimeError(f"Cannot determine pose for pair ({i}, {j})")
                pose = self._recover_pose(pg, i, j)
                sel = np.zeros(len(p1_np), bool)
                inliers = np.zeros(len(p1_np), bool)
                rvec = np.asarray(so3_log(pose.R))
                tvec = np.asarray(pose.t)
                P1_dev = P2
                P2 = projection_matrix(pose.R, pose.t, pg.K2)
                X_new_j = triangulate_dlt(
                    jnp.asarray(p1_np, jnp.float32), jnp.asarray(p2_np, jnp.float32),
                    P1_dev, P2,
                )
                X_new_np = np.asarray(X_new_j, dtype=np.float64)
                ok_new = new_sel & self._cheirality_np(X_new_np, P1_dev, P2)
            else:
                P2 = P2_new

            current_frame = len(self.global_poses)  # next BA camera index

            # Re-observe known tracks in the new frame (reference
            # add_points(result_prev, result_next, current_frame)).
            pnp_inl = inliers & sel
            self.map.add_observations(
                np.where(pnp_inl, known_tracks, -1), p2_np, current_frame
            )
            self._kp_tracks[j][idx2_np[pnp_inl]] = known_tracks[pnp_inl]

            X_new_np = np.asarray(X_new_np, dtype=np.float64)
            new_ids = self.map.add_tracks(X_new_np, p2_np, current_frame, mask=ok_new)
            self._kp_tracks[j][idx2_np[ok_new]] = new_ids[ok_new]

            self._grow_seen()
            self._track_seen_frame[known_tracks[pnp_inl]] = current_frame
            self._track_seen_frame[new_ids[ok_new]] = current_frame
            if self.pair_window > 1:
                self._link_window_pairs(j, current_frame, pair_host)

            p3d = X_new_np[ok_new]
            p2_obs = p2_np[ok_new]
            track_ids = new_ids[ok_new]

            self.global_poses.append((
                np.asarray(rvec, dtype=np.float64),
                np.asarray(tvec, dtype=np.float64),
            ))
            self.global_K.append(np.asarray(pg.K2, dtype=np.float64))

            if (
                self.local_ba_every
                and len(self.global_poses) % self.local_ba_every == 0
            ):
                # Windowed BA AFTER the frame's camera is registered (its
                # observations must reference an existing BA camera).
                freeze = max(0, len(self.global_poses) - self.local_ba_window)
                self._global_ba(freeze_before=freeze, stage="local_ba")
                # Chained projection must follow the re-optimized latest pose.
                rv_l, t_l = self.global_poses[-1]
                from sfmfromscratch_tpu.ops.lie import so3_exp as _exp

                P2 = projection_matrix(
                    _exp(jnp.asarray(rv_l, jnp.float32)),
                    jnp.asarray(t_l, jnp.float32), pg.K2,
                )

            if self.checkpoint_every and (j % self.checkpoint_every == 0):
                from sfmfromscratch_tpu.pipeline.checkpoint import save_checkpoint

                path = self.checkpoint_path or os.path.join(
                    self.output_dir, "checkpoint.npz"
                )
                save_checkpoint(self, path, next_frame=j + 1)
        self.stage_times["chain"] = time.time() - t0

    def _recover_pose(self, pg: PairGeometry, i: int, j: int):
        """Elastic recovery when PnP fails (SURVEY.md §5.3 — the reference
        raises and dies, Runner.py:263-264): estimate the relative pose from
        the pair's own epipolar geometry and chain it onto the previous
        absolute pose, rescaling the unit translation to the previous step
        length so the trajectory scale stays continuous."""
        from sfmfromscratch_tpu.geometry.pnp import PnPResult
        from sfmfromscratch_tpu.ops.lie import so3_exp

        self.warnings.append(f"pose recovery engaged for pair ({i}, {j})")
        rel = ransac_essential_pose(
            self._next_key(), pg.p1, pg.p2, pg.K1, pg.K2, pg.mask,
            num_hypotheses=self._num_hyp,
            threshold=self.config.ransac.epipolar_threshold,
            min_cheirality_frac=0.5,
        )
        rv_prev, t_prev = self.global_poses[-1]
        R_prev = np.asarray(so3_exp(jnp.asarray(rv_prev, jnp.float32)), np.float64)
        if len(self.global_poses) >= 2:
            rv_pp, t_pp = self.global_poses[-2]
            R_pp = np.asarray(so3_exp(jnp.asarray(rv_pp, jnp.float32)), np.float64)
            c_prev = -R_prev.T @ np.asarray(t_prev)
            c_pp = -R_pp.T @ np.asarray(t_pp)
            step = float(np.linalg.norm(c_prev - c_pp))
        else:
            step = 1.0
        R_rel = np.asarray(rel.R, np.float64)
        t_rel = np.asarray(rel.t, np.float64) * max(step, 1e-6)
        R_new = R_rel @ R_prev
        t_new = R_rel @ np.asarray(t_prev) + t_rel
        n = pg.p1.shape[0]
        return PnPResult(
            R=jnp.asarray(R_new, jnp.float32),
            t=jnp.asarray(t_new, jnp.float32),
            inliers=jnp.zeros((n,), dtype=bool),
            num_inliers=jnp.asarray(0),
            ok=jnp.asarray(True),
        )

    def _grow_seen(self) -> None:
        n = self.map.num_tracks
        if len(self._track_seen_frame) < n:
            grown = np.full(n, -1, dtype=np.int64)
            grown[: len(self._track_seen_frame)] = self._track_seen_frame
            self._track_seen_frame = grown

    def _link_window_pairs(self, j: int, current_frame: int, pair_host) -> None:
        """Attach observations of already-mapped tracks seen again through the
        non-consecutive pairs (i, j), i < j-1 — multi-view constraints the
        consecutive-only reference graph cannot express."""
        for i in range(max(1, j - self.pair_window), j - 1):
            key = (i, j)
            if key not in pair_host:
                continue
            mask_np, _p1h, p2h, idx1_np, idx2_np = pair_host[key]
            linked = np.where(mask_np, self._kp_tracks[i][idx1_np], -1)
            sel = linked >= 0
            if not sel.any():
                continue
            tids = linked[sel]
            self._grow_seen()
            fresh = self._track_seen_frame[tids] != current_frame
            if not fresh.any():
                continue
            tids_f = tids[fresh]
            xy = np.asarray(p2h, dtype=np.float64)[sel][fresh]
            self.map.add_observations(tids_f, xy, current_frame)
            self._kp_tracks[j][idx2_np[sel][fresh]] = tids_f
            self._track_seen_frame[tids_f] = current_frame

    @staticmethod
    def _cheirality_np(X: np.ndarray, P1, P2) -> np.ndarray:
        P1n, P2n = np.asarray(P1, np.float64), np.asarray(P2, np.float64)
        Xh = np.concatenate([X, np.ones((len(X), 1))], axis=1)
        z1 = (Xh @ P1n.T)[:, 2]
        z2 = (Xh @ P2n.T)[:, 2]
        return (z1 > 1e-6) & (z2 > 1e-6)

    def _global_ba(self, freeze_before: int = 0, stage: str = "ba") -> None:
        """Bundle adjustment (STAGE D). ``freeze_before`` fixes cameras
        [0, freeze_before) — 0 means full global BA, >0 the windowed variant."""
        t0 = time.time()
        frames, tracks, xy = self.map.observations()
        cam_params = np.array([np.hstack([rv, t]) for rv, t in self.global_poses])
        num_cams = len(cam_params)
        num_pts = self.map.num_tracks
        cam_fixed = np.arange(num_cams) < freeze_before
        problem = make_problem(
            cam_params, self.map.points(), frames, tracks, xy,
            np.stack(self.global_K), cam_fixed=cam_fixed,
        )
        # Bucketed padding => repeated solves share one compiled program as the
        # reconstruction grows (ba/problem.py pad_problem).
        from sfmfromscratch_tpu.ba.problem import pad_problem

        problem = pad_problem(problem)
        sync = bool(os.environ.get("SFM_STAGE_SYNC"))
        if sync:
            self.stage_times[f"{stage}.assemble"] = time.time() - t0
        ba_cfg = self.config.ba
        kw = dict(
            max_iters=ba_cfg.max_lm_iters,
            cg_iters=60,
            init_damping=ba_cfg.init_damping,
            damping_up=ba_cfg.damping_up,
            damping_down=ba_cfg.damping_down,
            ftol=ba_cfg.ftol,
            huber_delta=ba_cfg.huber_delta,
        )
        on_mesh = self.mesh is not None and "data" in self.mesh.shape
        # Full global BA only: scaling K mid-chain (windowed/local BA)
        # would leave _intrinsics() registering later frames with the
        # UNSCALED EXIF K against structure optimized at the scaled one.
        # Self-calibrating BA: shared focal scale optimized JOINTLY via
        # the bordered Schur system (ba/selfcal.py) — alternating a 1-D
        # refit with fixed-K BA cannot work (the converged poses absorb
        # the focal error and its gradient vanishes). On a mesh the same
        # border rides the psum-reduced sharded solver.
        do_selfcal = self.refine_focal and stage == "ba"
        if on_mesh:
            from sfmfromscratch_tpu.parallel.sharded_ba import bundle_adjust_sharded

            out = bundle_adjust_sharded(
                problem, self.mesh, selfcal=do_selfcal, **kw
            )
            res, s_jax = out if do_selfcal else (out, None)
        elif do_selfcal:
            from sfmfromscratch_tpu.ba.selfcal import bundle_adjust_selfcal

            res, s_jax = bundle_adjust_selfcal(problem, **kw)
        else:
            res = bundle_adjust(problem, **kw)
            s_jax = None
        if do_selfcal and s_jax is not None:
            s = float(jax.device_get(s_jax))
            self.focal_scale *= s
            for i in range(len(self.global_K)):
                Kn = np.asarray(self.global_K[i], np.float64).copy()
                Kn[0, 0] *= s
                Kn[1, 1] *= s
                self.global_K[i] = Kn
            self.warnings.append(
                f"focal self-calibration: cumulative scale {self.focal_scale:.4f}"
            )
        if sync:
            from sfmfromscratch_tpu.utils.fetch import sync_device

            sync_device(res.points)
            self.stage_times[f"{stage}.solve.compute"] = (
                time.time() - t0 - self.stage_times[f"{stage}.assemble"]
            )
            t_fetch = time.time()
        # Packed result fetch: points + cameras + both error scalars in two
        # transfers instead of four round trips (utils/fetch.py).
        pts_np, cams_np, e0, e1 = device_get_packed(
            res.points[:num_pts], res.cam_params[:num_cams],
            res.initial_mean_error, res.final_mean_error,
        )
        if sync:
            self.stage_times[f"{stage}.fetch"] = time.time() - t_fetch
        self.errors_before_after_ba = (float(e0), float(e1))
        self.map.update_points(np.asarray(pts_np, dtype=np.float64))
        self.global_poses = [
            (np.asarray(c[:3], np.float64), np.asarray(c[3:], np.float64))
            for c in cams_np
        ]
        self.stage_times[stage] = self.stage_times.get(stage, 0.0) + time.time() - t0

    def _use_scan_chain(self) -> bool:
        if self.chain_mode == "scan":
            return True
        if self.chain_mode == "host":
            return False
        # auto: the scan path covers the default configuration; host features
        # (recovery, windowed pairs/BA, checkpoints, distance assoc) need the
        # per-frame host loop.
        return (
            self.assoc_mode == "index"
            and self.pair_window == 1
            and self.local_ba_every is None
            and self.checkpoint_every is None
            and self.on_pose_failure == "raise"
        )

    def _chain_scan(self, P2) -> None:
        """STAGE C as one on-device scan: single dispatch + single fetch for
        the whole sequence (see _chain_scan_device)."""
        t0 = time.time()
        F = self.max_img - 2
        if F <= 0:
            self.stage_times["chain"] = time.time() - t0
            return
        pairs = [self.pair_geometry[(i, i + 1)] for i in range(2, self.max_img)]
        # Bucket the scan length so different sequence lengths reuse one
        # compiled program (scan compiles per length).
        Fp = ((F + 7) // 8) * 8
        pad = Fp - F
        pairs_p = pairs + [pairs[-1]] * pad
        # ONE host-side stack + ONE device transfer per field (stacking
        # jnp-converted elements would device_put every pair separately).
        p1_all = jnp.asarray(np.stack([pg.p1 for pg in pairs_p]))
        p2_all = jnp.asarray(np.stack([pg.p2 for pg in pairs_p]))
        idx1_all = jnp.asarray(np.stack([pg.idx1 for pg in pairs_p]).astype(np.int32))
        idx2_all = jnp.asarray(np.stack([pg.idx2 for pg in pairs_p]).astype(np.int32))
        mask_all = jnp.asarray(np.stack([pg.mask for pg in pairs_p]))
        K2_all = jnp.asarray(np.stack([pg.K2 for pg in pairs_p]))
        frame_valid = jnp.arange(Fp) < F
        keys = jax.random.split(self._next_key(), Fp)

        kp_capacity = len(self._kp_tracks[2])
        max_points = self.config.max_points
        n0 = self.map.num_tracks
        points0 = jnp.zeros((max_points, 3), jnp.float32)
        points0 = points0.at[:n0].set(
            jnp.asarray(self.map.points(), jnp.float32)
        )
        kp_tracks0 = jnp.asarray(self._kp_tracks[2], jnp.int32)

        out = _chain_scan_device(
            keys, p1_all, p2_all, idx1_all, idx2_all, mask_all, K2_all,
            frame_valid,
            kp_tracks0, points0, jnp.asarray(n0, jnp.int32), P2,
            self._pnp_hyp, self.config.ransac.pnp_reproj_threshold,
            max_points, kp_capacity,
        )
        # ONE packed fetch for the whole chain (utils/fetch.py); the points
        # buffer is sliced to its static live maximum before transfer.
        M = int(p1_all.shape[1])
        P_fetch = min(max_points, n0 + Fp * M)
        (rvecs, ts, oks, _ninl, obs_track, obs_xy, points, n_points
         ) = device_get_packed(
            out[0], out[1], out[2], out[3], out[4], out[5],
            out[6][:P_fetch], out[7],
        )

        bad = np.nonzero(~np.asarray(oks))[0]
        if len(bad):
            raise RuntimeError(
                f"Cannot determine pose for pair ({int(bad[0]) + 2}, {int(bad[0]) + 3})"
            )

        n_points = int(n_points)
        self.map.append_points_raw(points[n0:n_points])
        for f in range(F):
            current_frame = len(self.global_poses)
            tr = obs_track[f]
            valid = tr >= 0
            self.map.add_observations(
                np.where(valid, tr, -1), obs_xy[f], current_frame
            )
            self.global_poses.append((
                np.asarray(rvecs[f], np.float64), np.asarray(ts[f], np.float64)
            ))
            self.global_K.append(np.asarray(pairs[f].K2, np.float64))
        self.stage_times["chain"] = time.time() - t0

    # ------------------------------------------------------------------ driver

    def run(self) -> "SfmEngine":
        feats = self._extract_all_features()
        if not self._try_run_front_fused(feats):
            self._match_pairs(feats)
            p3d, p2_obs, track_ids, P2 = self._bootstrap()
            if self._use_scan_chain():
                self._chain_scan(P2)
            else:
                self._chain(p3d, p2_obs, track_ids, P2)
        if self.chain_refresh == "averaging":
            from sfmfromscratch_tpu.pipeline.chain_refresh import (
                averaging_refresh,
            )

            averaging_refresh(self)
        self._global_ba()
        if self.model_name is not None:
            self.save_data()
        return self

    # ------------------------------------------------------------------ persistence

    def save_data(self) -> str:
        """Persist the reconstruction. Superset of the reference npz layout
        (p3d / frame_idx / pt_idx, Runner.py:357-359) plus poses, K and errors —
        full state the reference loses (SURVEY.md §5.4)."""
        os.makedirs(self.output_dir, exist_ok=True)
        frames, tracks, xy = self.map.observations()
        path = os.path.join(self.output_dir, f"{self.model_name}.npz")
        np.savez(
            path,
            p3d=self.map.points(),
            frame_idx=frames,
            pt_idx=tracks,
            obs_xy=xy,
            poses=np.array([np.hstack([rv, t]) for rv, t in self.global_poses]),
            K=np.stack(self.global_K) if self.global_K else np.zeros((0, 3, 3)),
            errors_ba=np.array(self.errors_before_after_ba),
        )
        return path

    @classmethod
    def match_graph_shard(
        cls,
        img_path: str,
        max_img: int,
        shard: int,
        num_shards: int,
        pair_cache_dir: str,
        **kwargs,
    ) -> int:
        """Compute and persist THIS host's shard of the pairwise match graph.

        The north star's "sharding the pairwise matching graph across hosts":
        N hosts each call this with their ``shard`` index and a shared
        ``pair_cache_dir``; every num_shards-th candidate pair (deterministic
        round-robin over the sorted pair list) is matched, inlier-filtered and
        persisted. Any later engine run with the same configuration and
        ``pair_cache_dir`` resumes with the full graph — the expensive O(pairs)
        stage parallelizes across hosts with no coordinator (the filesystem is
        the join point, one atomic file per pair). Returns the number of pairs
        this run actually computed (0 when the shard was already complete in
        the cache). Works on any engine class (GlobalSfmEngine's
        retrieval-proposed pairs shard the same way).
        """
        eng = cls(
            img_path, max_img, pair_cache_dir=pair_cache_dir,
            auto_run=False, **kwargs,
        )
        eng._pair_shard = (shard, num_shards)
        feats = eng._extract_all_features()
        eng._prepare_pair_selection(feats)
        eng._match_pairs(feats)
        # Pairs actually matched by THIS run (cache-resumed pairs excluded).
        return eng._last_match_computed

    def save_ply(self, path: str) -> str:
        """Export the reconstruction as a colored ASCII PLY (io/export.py)."""
        from sfmfromscratch_tpu.io.export import save_ply

        return save_ply(self, path)

    def save_colmap(self, out_dir: str) -> str:
        """Export a COLMAP sparse text model (io/export.py)."""
        from sfmfromscratch_tpu.io.export import save_colmap

        return save_colmap(self, out_dir)

    @staticmethod
    def load(model_name: str, output_dir: str = "output", show: bool = True):
        """Load a saved model; optionally open the 3-D viewer
        (reference Runner.py:403-416)."""
        npz = np.load(os.path.join(output_dir, f"{model_name}.npz"))
        if show:
            from sfmfromscratch_tpu.viz.scatter3d import V3D

            return V3D(npz["p3d"], npz["frame_idx"], npz["pt_idx"])
        return dict(npz)
