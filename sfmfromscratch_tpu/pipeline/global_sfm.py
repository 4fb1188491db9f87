"""Global Structure-from-Motion engine: motion averaging instead of a chain.

The reference can only reconstruct *sequentially* — each frame's pose depends
on the previous frame's via PnP (Runner.py:221-287) — which caps parallelism
no matter how fast each step is. This engine is the TPU-native *global SfM*
alternative (the 1DSfM / rotation-averaging method family) where every stage
is embarrassingly parallel over the whole sequence:

1. features + pairwise matching over a window (shared with SfmEngine: one
   batched frontend program + one vmapped fundamental-RANSAC program),
2. relative pose of EVERY pair as one vmapped essential-RANSAC program
   (geometry.ransac.ransac_essential_pose_batch),
3. robust rotation averaging + translation averaging on the view graph
   (geometry.averaging — IRLS segment-sum sweeps, matrix-free CG),
4. union-find track building over all match edges (native C++ with numpy
   fallback: native.bindings.build_tracks),
5. batched multiview triangulation of all tracks at once
   (geometry.triangulation.triangulate_multiview),
6. global Schur/CG bundle adjustment (shared with SfmEngine).

No stage loops over frames on the host; sequence length only grows batch
dimensions. This is the intended scaling path for the "1000+ image" regime
(BASELINE.json config 5, SURVEY.md §2.3): pairs shard over the data mesh axis
and the averaging/BA segment-sums shard over observations.

Camera indexing: camera c observes through physical image c+1; camera 0 is
the gauge anchor (R=I, c=0), unlike the incremental engine whose BA camera 0
is physical image 2 (the identity base camera never enters its BA).
"""

from __future__ import annotations

import os
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp

from sfmfromscratch_tpu.utils.precision import mm_f32
import numpy as np

from sfmfromscratch_tpu.geometry.averaging import (
    chain_initial_centers,
    chain_initial_rotations,
    relative_translations_known_rotations,
    chordal_rotation_init,
    rotation_averaging,
    translation_averaging,
)
from sfmfromscratch_tpu.geometry.pnp import pnp_ransac
from sfmfromscratch_tpu.geometry.ransac import (
    ransac_essential_pose_adaptive_batch,
    ransac_essential_pose_batch,
    ransac_fundamental_adaptive_batch,
)
from sfmfromscratch_tpu.geometry.triangulation import (
    triangulate_multiview,
    two_view_depths,
)
from sfmfromscratch_tpu.native.bindings import build_tracks
from sfmfromscratch_tpu.ops.lie import so3_log
from sfmfromscratch_tpu.ops.matcher import match_pairs_batch
from sfmfromscratch_tpu.pipeline.incremental import SfmEngine, _pow2_bucket
from sfmfromscratch_tpu.types import Features


def _bucket(n: int, q: int = 1024) -> int:
    return max(q, ((n + q - 1) // q) * q)


def _pad_edges(a, num_padded: int, template=0.0):
    """Pad an (E, ...)-leading array to ``num_padded`` rows of ``template``.

    Every E-shaped device program (Sampson refinement, rotation/translation
    averaging, known-rotation translation refit) runs on edge counts padded
    to a bucket so one compiled program serves any view-graph size — padding
    edges carry zero weight / all-false masks / identity rotations and cannot
    influence the result."""
    a = jnp.asarray(a)
    pad = num_padded - a.shape[0]
    if pad <= 0:
        return a
    t = jnp.broadcast_to(
        jnp.asarray(template, a.dtype), (pad,) + a.shape[1:]
    )
    return jnp.concatenate([a, t], axis=0)


# Batched Lie conversions: the engine previously called so3_log/so3_exp
# EAGERLY once per camera in host loops; each eager call traces + lowers a
# lax.switch and pays a tunnel fetch (~60-130 ms) — 585 calls = ~38 s of the
# warm 300-view config-5 wall (round-5 cProfile). One vmapped jitted call
# per batch removes the whole class.
_so3_log_batch = jax.jit(jax.vmap(so3_log))


_triangulate_multiview_jit = jax.jit(
    mm_f32(triangulate_multiview), static_argnames=("num_points", "gn_iters")
)


class GlobalSfmEngine(SfmEngine):
    """Global SfM over an image sequence; drop-in result contract of
    :class:`SfmEngine` (map / global_poses / global_K / errors / save_data)."""

    # STAGE-A epipolar pre-filter stays ON for every pair (including (1,2)):
    # the relative-pose RANSAC below does re-derive inliers, but feeding it
    # PRE-FILTERED support measurably improves the recovered rotations — two
    # independent robust rounds (F-RANSAC with LO refit, then pose RANSAC with
    # LO refit + Sampson refinement) land in a better basin than one round on
    # raw ratio-test matches, which matters on small-baseline edges where
    # 8-point noise is comparable to the parallax. (Measured on the 6-view
    # orbit fixture: max rotation error 3.3 deg filtered vs 6.0 deg raw.)
    _filter_all_pairs = True

    def __init__(
        self,
        img_path: str,
        max_img: int,
        pair_window: int = 3,
        rel_num_hypotheses: int = 1024,
        min_edge_inliers: int = 15,
        obs_gate_px: float = 8.0,
        rot_avg_iters: int = 64,
        trans_avg_iters: int = 12,
        ba_rounds: int = 2,
        regate_px: float = 3.0,
        pair_mode: str = "window",
        retrieval_k: int = 6,
        keyframe_step: int = 1,
        keyframe_flow_px: Optional[float] = None,
        stream_ba_window: Optional[int] = None,
        stream_ba_block_cams: int = 32,
        **kwargs,
    ):
        # Advancing-window map-block streaming (SURVEY.md §5.7): with
        # ``stream_ba_window`` set, the final BA runs out-of-core through
        # pipeline/streaming.py — the map spills to a block store and only a
        # ``stream_ba_window``-block window (``stream_ba_block_cams`` cameras
        # per block) is resident per solve, boundary cameras/tracks frozen.
        # The reference's only answer at scale is the monolithic dense solve
        # (Runner.py:289-303). See docs/MULTIHOST.md.
        self.stream_ba_window = stream_ba_window
        self.stream_ba_block_cams = stream_ba_block_cams
        # Keyframing for densely-sampled sequences (video): with step s > 1,
        # the view graph / averaging / triangulation run on every s-th image
        # only, and the remaining frames register afterwards by batched PnP
        # against the keyframe map (then joint BA polishes everything).
        # Rationale: tiny inter-frame baselines make relative poses noisy and
        # drift compounds over the frame count — measured on a 1000-view
        # 0.36 deg/view orbit, full-graph ATE was ~13% vs 3.9% keyframed.
        # ``keyframe_step="auto"`` selects keyframes adaptively from measured
        # inter-frame feature flow (``keyframe_flow_px`` target, default 5% of
        # the image diagonal) — non-uniform camera speeds get non-uniform
        # keyframes, with no manual tuning.
        if keyframe_step == "auto":
            self.keyframe_step = "auto"
        else:
            self.keyframe_step = max(1, int(keyframe_step))
        self.keyframe_flow_px = keyframe_flow_px
        self._auto_kfs: Optional[List[int]] = None
        # Pair selection: "window" assumes an ordered sequence (reference
        # contract); "retrieval" proposes each image's top-k most similar
        # images by pooled-descriptor similarity (unordered landmark
        # collections, BASELINE config 5); "both" unions them (ordered
        # sequences with loop closures).
        assert pair_mode in ("window", "retrieval", "both")
        self.pair_mode = pair_mode
        self.retrieval_k = retrieval_k
        self.rel_num_hypotheses = rel_num_hypotheses
        self.min_edge_inliers = min_edge_inliers
        self.obs_gate_px = obs_gate_px
        self.rot_avg_iters = rot_avg_iters
        self.trans_avg_iters = trans_avg_iters
        # BA -> drop observations with residual > regate_px -> BA again:
        # averaging inits carry outlier observations (wrong matches that
        # passed the first gate under a drifty init) which a single
        # least-squares BA chases instead of the structure.
        self.ba_rounds = max(1, ba_rounds)
        self.regate_px = regate_px
        # view-graph state filled by the stages
        self._edges: List[tuple] = []          # (i, j) 1-based image ids, i < j
        self._edge_R: Optional[np.ndarray] = None
        self._edge_t: Optional[np.ndarray] = None
        self._edge_w: Optional[np.ndarray] = None
        self._edge_inl: Dict[tuple, np.ndarray] = {}
        self._kp_xy: Dict[int, np.ndarray] = {}
        self.R_cams: Optional[np.ndarray] = None   # (C, 3, 3)
        self.c_cams: Optional[np.ndarray] = None   # (C, 3) centers
        # Robust BA by default: averaging inits carry heavier-tailed errors
        # than the incremental chain's, so plain least squares lets outlier
        # observations steer. Only applied when the caller left the config's
        # huber_delta at its reference-faithful 0.
        import dataclasses

        from sfmfromscratch_tpu.config import PipelineConfig

        cfg = kwargs.get("config") or PipelineConfig()
        if cfg.ba.huber_delta == 0.0:
            cfg = dataclasses.replace(
                cfg, ba=dataclasses.replace(cfg.ba, huber_delta=3.0)
            )
        kwargs["config"] = cfg
        super().__init__(
            img_path, max_img, pair_window=max(2, pair_window), **kwargs
        )

    # ------------------------------------------------------------------ stages

    @property
    def keyframed(self) -> bool:
        return self.keyframe_step == "auto" or self.keyframe_step > 1

    @property
    def keyframes(self):
        """1-based keyframe image ids (all images when keyframe_step == 1;
        flow-selected when "auto" — available after feature extraction)."""
        if self.keyframe_step == "auto":
            return self._auto_kfs or list(range(1, self.max_img + 1))
        kfs = list(range(1, self.max_img + 1, self.keyframe_step))
        if kfs[-1] != self.max_img:
            kfs.append(self.max_img)
        return kfs

    def _match_pair_chunks(self, feats: Features, pair_list):
        """Yield ``(chunk, match_result, p1, p2)`` over ``pair_list`` in
        VMEM-budgeted pow2 buckets — the one chunked-matching loop shared by
        flow keyframe selection and PnP registration (``_match_pairs`` keeps
        its own loop: it persists per-pair cache entries and interleaves the
        F-RANSAC filter per bucket)."""
        mcfg = self.config.matcher
        D_all = feats.descriptors
        M_all = feats.keypoints.mask
        XF = feats.keypoints.xf
        YF = feats.keypoints.yf
        Kcap = int(D_all.shape[1])
        maxb = int(max(8, min(128, (384 << 20) // max(Kcap * Kcap * 4, 1))))
        for c0 in range(0, len(pair_list), maxb):
            chunk = pair_list[c0 : c0 + maxb]
            B = _pow2_bucket(len(chunk), maxb)
            pad = chunk + [chunk[-1]] * (B - len(chunk))
            pi = jnp.asarray([p[0] - 1 for p in pad], jnp.int32)
            pj = jnp.asarray([p[1] - 1 for p in pad], jnp.int32)
            res, p1, p2 = match_pairs_batch(
                D_all, M_all, XF, YF, pi, pj,
                ratio_threshold=mcfg.ratio_threshold,
                max_matches=mcfg.max_matches,
            )
            yield chunk, res, p1, p2

    def _select_keyframes(self, feats: Features) -> None:
        """Flow-adaptive keyframe selection: match every consecutive pair
        (one batched program), measure the median matched-keypoint
        displacement, and start a new keyframe whenever accumulated flow
        since the last one reaches the target (default 5% of the image
        diagonal) — non-uniform camera speeds get non-uniform keyframes."""
        C = self.max_img
        consec = [(i, i + 1) for i in range(1, C)]
        flows = np.zeros(len(consec))
        pend = []
        for chunk, res, p1, p2 in self._match_pair_chunks(feats, consec):
            # Median displacement of masked matches, on device.
            d = jnp.linalg.norm(p2 - p1, axis=-1)
            d = jnp.where(res.mask, d, jnp.nan)
            pend.append((len(chunk), jnp.nanmedian(d, axis=1)))
        g = 0
        for n, med in pend:
            flows[g : g + n] = np.asarray(jax.device_get(med))[:n]
            g += n
        flows = np.nan_to_num(flows, nan=0.0)

        tau = self.keyframe_flow_px
        if tau is None:
            K1 = self._intrinsics(1)
            tau = 0.05 * 2.0 * float(np.hypot(K1[0, 2], K1[1, 2]))
        kfs = [1]
        acc = 0.0
        for f in range(2, C + 1):
            acc += flows[f - 2]
            if acc >= tau:
                kfs.append(f)
                acc = 0.0
        if kfs[-1] != C:
            kfs.append(C)
        self._auto_kfs = kfs
        self.warnings.append(
            f"auto keyframes: {len(kfs)}/{C} at flow target {tau:.1f} px"
        )

    def _candidate_pairs(self, feats: Features):
        if self.keyframed:
            # Window pairs over the KEYFRAME subsequence (baseline spacing is
            # what the window is for, and keyframes are the new unit of
            # baseline); retrieval below restricts itself to keyframes.
            kfs = self.keyframes
            pairs = set()
            if self.pair_mode in ("window", "both"):
                for a in range(len(kfs) - 1):
                    for d in range(1, self.pair_window + 1):
                        if a + d < len(kfs):
                            pairs.add((kfs[a], kfs[a + d]))
        else:
            pairs = set(super()._candidate_pairs(feats)) if self.pair_mode in (
                "window", "both"
            ) else set()
        if self.pair_mode in ("retrieval", "both"):
            # VLAD image retrieval (ops/retrieval.py): k-means vocabulary over
            # all descriptors, per-image residual aggregation, cosine ranking
            # — one batched device program; the mean-descriptor embedding this
            # replaces ranked neighbors near-randomly (13/128 true-neighbor
            # proposals on a shuffled 36-view orbit; VLAD recovers them).
            from sfmfromscratch_tpu.ops.retrieval import retrieval_similarity

            C = self.max_img
            S = retrieval_similarity(
                self._next_key(), feats.descriptors, feats.keypoints.mask
            )
            if self.keyframed:
                # Keyframed runs: retrieval proposes keyframe-keyframe edges
                # only (non-keyframes register by PnP afterwards).
                kf_mask = np.zeros(C, bool)
                kf_mask[[k - 1 for k in self.keyframes]] = True
                S = jnp.where(jnp.asarray(kf_mask)[None, :], S, -2.0)
                S = jnp.where(jnp.asarray(kf_mask)[:, None], S, -2.0)
            k = min(self.retrieval_k, C - 1)
            _, nbr = jax.lax.top_k(S, k)                   # (C, k)
            nbr = np.asarray(jax.device_get(nbr))
            Svals = np.asarray(jax.device_get(jnp.take_along_axis(S, jnp.asarray(nbr), 1)))
            for i in range(C):
                for col, j in enumerate(nbr[i]):
                    if int(j) == i or Svals[i, col] <= -1.5:  # self/masked
                        continue
                    a, b = i + 1, int(j) + 1
                    pairs.add((min(a, b), max(a, b)))
        return sorted(pairs)

    def _relative_poses(self) -> None:
        """Relative pose of every matched pair — chunks of pairs vmapped into
        one device program each (fixed chunk => one compiled program for any
        sequence length; modest hypothesis count because the pair masks are
        already epipolar-RANSAC inliers from STAGE A)."""
        t0 = time.time()
        pairs = sorted(
            [k for k in self.pair_geometry if k[0] < k[1]],
            key=lambda k: (k[1] - k[0], k[0]),   # consecutive edges first
        )
        # Big pow2 pair buckets: RANSAC cost is ~26 us per hypothesis-lane on
        # a v5e chip and each extra dispatch costs a tunnel round trip, so a
        # few large programs beat many small ones; pow2 bucketing keeps the
        # compiled-program count logarithmic in sequence length.
        CAP = 256
        if self.mesh is not None and "data" in self.mesh.shape:
            # DP over the pair axis: each device owns CAP/data_n pairs.
            CAP = max(CAP, self.mesh.shape["data"])
        pending = []
        for c0 in range(0, len(pairs), CAP):
            chunk = pairs[c0 : c0 + CAP]
            B = 1
            while B < len(chunk):
                B <<= 1
            B = min(B, CAP)
            if self.mesh is not None and "data" in self.mesh.shape:
                B = max(B, self.mesh.shape["data"])
            pad_keys = chunk + [chunk[-1]] * (B - len(chunk))
            keys = jax.random.split(self._next_key(), B)
            pgs = [self.pair_geometry[k] for k in pad_keys]
            # ONE host-side stack + ONE device transfer per field: stacking
            # jnp-converted elements would device_put every pair separately
            # (hundreds of tunnel round trips per chunk).
            batch = [
                jnp.asarray(np.stack([pg.p1 for pg in pgs])),
                jnp.asarray(np.stack([pg.p2 for pg in pgs])),
                jnp.asarray(np.stack([pg.K1 for pg in pgs])),
                jnp.asarray(np.stack([pg.K2 for pg in pgs])),
                jnp.asarray(np.stack([pg.mask for pg in pgs])),
            ]
            if self.mesh is not None and "data" in self.mesh.shape:
                from jax.sharding import NamedSharding, PartitionSpec as P

                spec = lambda a: P(*(("data",) + (None,) * (a.ndim - 1)))
                batch = [
                    jax.device_put(a, NamedSharding(self.mesh, spec(a)))
                    for a in batch
                ]
                keys = jax.device_put(keys, NamedSharding(self.mesh, P("data")))
            if self.config.ransac.adaptive:
                # Early-terminating stages; these pair masks are already
                # epipolar-RANSAC inliers, so almost every lane stops after
                # the first stage.
                res = ransac_essential_pose_adaptive_batch(
                    keys, *batch,
                    max_hypotheses=self.rel_num_hypotheses,
                    stage_size=min(128, self.rel_num_hypotheses),
                    threshold=self.config.ransac.epipolar_threshold,
                    confidence=self.config.ransac.prob_success,
                    min_cheirality_frac=0.75,
                )
            else:
                res = ransac_essential_pose_batch(
                    keys, *batch,
                    num_hypotheses=self.rel_num_hypotheses,
                    threshold=self.config.ransac.epipolar_threshold,
                    min_cheirality_frac=0.75,
                )
            pending.append((chunk, res))
        self.stage_times["relpose_dispatch"] = time.time() - t0
        # ONE device concatenate per field + one 5-array fetch: fetching the
        # 5 result arrays of every chunk separately costs a tunnel round trip
        # PER ARRAY (plus a one-time transfer-program setup per shape).
        R_np, t_np, inl_np, ninl_np, che_np = jax.device_get((
            jnp.concatenate([res.R for _, res in pending]),
            jnp.concatenate([res.t for _, res in pending]),
            jnp.concatenate([res.inliers for _, res in pending]),
            jnp.concatenate([res.num_inliers for _, res in pending]),
            jnp.concatenate([res.cheirality_ok for _, res in pending]),
        )) if pending else (np.zeros((0, 3, 3)),) * 5
        self.stage_times["relpose_ransac"] = time.time() - t0
        R_list, t_list, ninl_list, che_list, inl_masks = [], [], [], [], []
        g0 = 0
        for chunk, res in pending:
            for ci, k in enumerate(chunk):
                g = g0 + ci
                R_list.append(R_np[g])
                t_list.append(t_np[g])
                ninl_list.append(int(ninl_np[g]))
                che_list.append(bool(che_np[g]))
                inl_masks.append(inl_np[g])
            g0 += res.R.shape[0]

        self._edges = pairs
        self._edge_R = np.stack(R_list) if pairs else np.zeros((0, 3, 3))
        self._edge_t = np.stack(t_list) if pairs else np.zeros((0, 3))
        ninl = np.asarray(ninl_list, np.float64)
        che = np.asarray(che_list, bool)

        # Batched Sampson GN refinement of every edge over its full inlier
        # set — RANSAC's minimal-sample winner carries 1-5 deg of rotation
        # noise on small-baseline pairs; the two-view MLE is ~10x tighter and
        # rotation averaging inherits the improvement directly.
        if pairs:
            from sfmfromscratch_tpu.geometry.two_view import refine_relative_pose

            E = len(pairs)
            Eb = _bucket(E, 128)   # one compiled program per edge-count bucket
            eye = np.eye(3, dtype=np.float32)
            pgs_all = [self.pair_geometry[k] for k in pairs]
            R_ref, t_ref, rms = refine_relative_pose(
                _pad_edges(jnp.asarray(self._edge_R, jnp.float32), Eb, eye),
                _pad_edges(jnp.asarray(self._edge_t, jnp.float32), Eb,
                           np.asarray([0, 0, 1], np.float32)),
                _pad_edges(jnp.asarray(np.stack([pg.p1 for pg in pgs_all])), Eb),
                _pad_edges(jnp.asarray(np.stack([pg.p2 for pg in pgs_all])), Eb),
                _pad_edges(jnp.asarray(np.stack([pg.K1 for pg in pgs_all])), Eb, eye),
                _pad_edges(jnp.asarray(np.stack([pg.K2 for pg in pgs_all])), Eb, eye),
                _pad_edges(jnp.stack(inl_masks).astype(jnp.float32), Eb),
            )
            self._edge_R, self._edge_t, rms_np = jax.device_get(
                (R_ref[:E], t_ref[:E], rms[:E])
            )
            self._edge_R = np.asarray(self._edge_R, np.float64)
            self._edge_t = np.asarray(self._edge_t, np.float64)
            # High residual after refinement = contaminated support.
            che = che & (np.asarray(rms_np) < 4.0)
            self.stage_times["relpose_refine"] = (
                time.time() - t0 - self.stage_times["relpose_ransac"]
            )
            self._fix_planar_degenerate_edges(pairs, pgs_all, inl_masks, ninl, Eb)
        good = (ninl >= self.min_edge_inliers) & che
        if not good.any() and len(pairs):
            # keep the strongest edges even if cheirality was noisy
            good = ninl >= max(self.min_edge_inliers, 1)
        self._edge_w = np.where(good, ninl, 0.0)
        for e, k in enumerate(pairs):
            self._edge_inl[k] = inl_masks[e] if good[e] else np.zeros_like(inl_masks[e])
        self.stage_times["relative_poses"] = time.time() - t0

    def _fix_planar_degenerate_edges(
        self, pairs, pgs_all, inl_masks, ninl, Eb
    ) -> None:
        """Detect H-degenerate edges and replace their poses with the
        homography decomposition (geometry/homography.py).

        A plane-dominant match set under-determines the essential matrix — the
        8-point/Sampson pipeline (and cv2's recoverPose, measured 14 deg off
        on the plane renderer) can return a confidently-supported wrong
        rotation. For edges whose epipolar inliers are >= ``0.8x`` explained
        by one homography, the pose is recomputed by Faugeras decomposition:
        off-plane points pick between the two valid interpretations when
        available; otherwise candidate 0 is used and the runner-up is stashed
        in ``self._edge_alt`` for the averaging loop's graph-consistency swap.
        One batched device program for the whole edge set."""
        from sfmfromscratch_tpu.geometry.homography import (
            _transfer_err2,
            candidate_epipolar_rms_batch,
            fit_homography,
            pose_from_homography_batch,
        )

        E = len(pairs)
        self._edge_alt: Dict[int, tuple] = {}
        if E == 0:
            return
        eye = np.eye(3, dtype=np.float32)
        p1s = _pad_edges(jnp.asarray(np.stack([pg.p1 for pg in pgs_all])), Eb)
        p2s = _pad_edges(jnp.asarray(np.stack([pg.p2 for pg in pgs_all])), Eb)
        K1s = _pad_edges(jnp.asarray(np.stack([pg.K1 for pg in pgs_all])), Eb, eye)
        K2s = _pad_edges(jnp.asarray(np.stack([pg.K2 for pg in pgs_all])), Eb, eye)
        inls = _pad_edges(jnp.asarray(np.stack(inl_masks)), Eb, False)

        hfit = fit_homography(p1s, p2s, inls, threshold=2.0)
        hp = pose_from_homography_batch(hfit.H, K1s, K2s, p1s, p2s, inls)
        e2 = jax.vmap(_transfer_err2)(hfit.H, p1s, p2s)
        off = inls & (e2 > 4.0)
        rms2, off_cnt = candidate_epipolar_rms_batch(
            hp.R, hp.t, K1s, K2s, p1s, p2s, off
        )
        (h_num, h_ok, R2, t2, votes, rms2_np, cnt_np) = jax.device_get((
            hfit.num_inliers[:E], hp.ok[:E], hp.R[:E], hp.t[:E],
            hp.num_pos[:E], rms2[:E], off_cnt[:E],
        ))
        h_num = np.asarray(h_num, np.float64)
        degen = (
            np.asarray(h_ok, bool)
            & (h_num >= 0.8 * np.maximum(ninl, 1))
            & (ninl >= 12)
        )
        replaced, deferred = [], []
        for e in np.nonzero(degen)[0]:
            r = np.asarray(rms2_np[e], np.float64)
            if cnt_np[e] >= 6 and (r.min() < 2.0) and (r.max() > 2.0 * r.min() + 1.0):
                c = int(np.argmin(r))          # off-plane points separate
            elif votes[e][0] > 1.05 * max(votes[e][1], 1):
                c = 0                          # cheirality vote separates
            else:
                c = 0                          # ambiguous: stash the runner-up
                self._edge_alt[e] = (
                    np.asarray(R2[e][1], np.float64),
                    np.asarray(t2[e][1], np.float64),
                )
                deferred.append(self._edges[e])
            self._edge_R[e] = np.asarray(R2[e][c], np.float64)
            self._edge_t[e] = np.asarray(t2[e][c], np.float64)
            replaced.append(self._edges[e])
        if replaced:
            self.warnings.append(
                f"planar-degenerate pose-from-H on {len(replaced)} edges"
                + (f" ({len(deferred)} twofold-ambiguous)" if deferred else "")
            )

    def _filter_edges_by_cycles(self, tau_deg: float = 3.0) -> None:
        """Triangle (cycle) consistency filter on relative rotations.

        ``R_ik ~= R_jk R_ij`` must hold around every triangle; a violated
        triangle contains at least one wrong edge. Unlike residual-vs-average
        rejection this needs NO global estimate, so a polluted first average
        cannot misdirect it (Zach et al., loop-constraint outlier removal).
        Greedy eviction: repeatedly drop the edge appearing in the most bad
        and no good triangles; afterwards, edges left with no good triangle
        are unverifiable and dropped too — unless removing one would
        disconnect the view graph (bridge edges, e.g. the consecutive chain,
        are kept: losing connectivity is worse than risking one edge)."""
        E = len(self._edges)
        if E == 0:
            return
        idx = {k: e for e, k in enumerate(self._edges)}
        alive = self._edge_w > 0

        def rel(e, a, b):
            # rotation mapping frame a -> frame b along edge e=(i,j)
            i, j = self._edges[e]
            R = self._edge_R[e]
            return R if (a, b) == (i, j) else R.T

        # Enumerate triangles (i<j<k with all three edges present) from the
        # adjacency — no sequential-window assumption, so retrieval-selected
        # long-range pairs participate too.
        succ: Dict[int, list] = {}
        for (i, j) in idx:
            succ.setdefault(i, []).append(j)
        tris = []
        for (i, j), e1 in idx.items():
            for k in succ.get(j, ()):
                e3 = idx.get((i, k))
                if e3 is None:
                    continue
                tris.append((e1, idx[(j, k)], e3))

        def tri_angle(t):
            e1, e2, e3 = t   # (i,j), (j,k), (i,k)
            i, j = self._edges[e1]
            _, k = self._edges[e2]
            M = rel(e3, i, k).T @ (rel(e2, j, k) @ rel(e1, i, j))
            return np.degrees(np.arccos(np.clip((np.trace(M) - 1) / 2, -1, 1)))

        def live_residuals():
            return [
                (t, tri_angle(t)) for t in tris if all(alive[e] for e in t)
            ]

        # Noise-adaptive threshold: a triangle accumulates ~sqrt(3)x the
        # per-edge rotation noise, so on a uniformly noisy graph a fixed tau
        # marks MOST triangles bad and greedy eviction shreds good edges
        # (the accusers die, the culprit survives). Scale tau by the median
        # triangle residual — on a clean graph it stays at tau_deg.
        rr = [a for _, a in live_residuals()]
        # Strictness scales with graph REDUNDANCY. On a redundant graph
        # (several triangles per edge — retrieval/landmark graphs), anchor the
        # noise-adaptive threshold to a LOW quantile: the quantile tracks the
        # good-triangle noise floor even when wrong edges contaminate most
        # triangles, where the median would balloon tau until the filter
        # self-disables (observed on a doppelganger-heavy retrieval graph:
        # median triangle residual 30+ deg, zero evictions, averaging
        # wrecked). On a SPARSE graph (short windows, few views) the same
        # strictness shreds noisy-but-usable edges the solution cannot spare,
        # so keep the lenient median anchor there.
        tpe: Dict[int, int] = {}
        for t in tris:
            if all(alive[e] for e in t):
                for e in t:
                    tpe[e] = tpe.get(e, 0) + 1
        n_alive = int(alive.sum())
        redundant = (
            n_alive >= 24
            and len(tpe) >= 0.6 * n_alive
            and float(np.median(list(tpe.values()) or [0])) >= 3
        )
        if not rr:
            tau_eff = tau_deg
        elif redundant:
            tau_eff = max(tau_deg, 2.0 * float(np.percentile(rr, 25)))
        else:
            tau_eff = max(tau_deg, 1.5 * float(np.median(rr)))

        removed = []
        removed_idx: set = set()
        accused: set = set()      # ever sat in a violated triangle
        while True:
            live = live_residuals()
            if not any(a >= tau_eff for _, a in live):
                break
            # Evict the edge with the highest SUPPORT-NORMALIZED median
            # residual over its live triangles: a wrong edge poisons every
            # triangle it touches, while an accused good edge is only high in
            # triangles shared with the culprit. The median alone still falls
            # into the cancellation trap (two bad edges at one node whose
            # errors cancel in their shared triangle make the good middle
            # edge look worst), so the residual is scaled by sqrt(support):
            # an edge's expected rotation noise goes as 1/sqrt(inliers), so
            # a given residual is far more damning on a 15-inlier edge than
            # on a 60-inlier one.
            per_edge: Dict[int, list] = {}
            for t, a in live:
                for e in t:
                    per_edge.setdefault(e, []).append(a)
            in_bad = set()
            for t, a in live:
                if a >= tau_eff:
                    in_bad.update(t)
            accused |= in_bad

            def score(e):
                return float(np.median(per_edge[e])) * np.sqrt(
                    1.0 / max(self._edge_w[e], 1.0)
                )

            worst = min(in_bad, key=lambda e: (-score(e), self._edge_w[e]))
            alive[worst] = False
            removed.append(self._edges[worst])
            removed_idx.add(worst)

        # Edges left in no surviving triangle are UNVERIFIABLE. Keep one only
        # when it bridges components of the verified subgraph (a chain-like
        # graph has no triangles at all — every consecutive edge bridges, so
        # nothing changes there), damped to fractional weight; every other
        # unverifiable edge is dropped outright. Redundant unverifiable edges
        # are exactly where doppelganger geometry hides (repeated structure
        # yields high-inlier wrong edges that join no consistent triangle);
        # merely damping them measurably poisoned averaging AND track building
        # on a doppelganger-heavy retrieval graph.
        in_tri = np.zeros(E, bool)
        for t in tris:
            if all(alive[e] for e in t):
                for e in t:
                    in_tri[e] = True
        unverifiable = alive & ~in_tri & (self._edge_w > 0)

        # Unverifiable edges are QUARANTINED unless they bridge components of
        # the verified subgraph (a chain-like graph has no triangles at all —
        # every consecutive edge bridges, so nothing changes there; bridges
        # are kept at damped weight).  Non-bridge unverifiables are exactly
        # where doppelganger geometry hides (repeated structure yields
        # high-inlier wrong edges that join no consistent triangle; round 3:
        # one 57-inlier 20-deg-wrong edge damped into a sparse graph moved
        # ATE 0.04 -> 0.17 of extent).  Quarantine is NOT final: the
        # averaging loop's redemption pass re-admits any quarantined edge
        # whose relative rotation agrees with the average built from
        # verified edges — so a good-but-unverifiable edge costs one
        # averaging round, while a doppelganger edge stays out.
        parent = np.arange(self.max_img)

        def _find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for e in np.nonzero(alive & in_tri)[0]:
            i, j = self._edges[e]
            parent[_find(i - 1)] = _find(j - 1)
        damped = np.zeros(E, bool)
        # Strongest-first so the kept bridge is the best-supported one.
        for e in sorted(np.nonzero(unverifiable)[0],
                        key=lambda e: -self._edge_w[e]):
            i, j = self._edges[e]
            ri, rj = _find(i - 1), _find(j - 1)
            if ri != rj:
                parent[ri] = rj
                damped[e] = True
            else:
                alive[e] = False
                removed.append(self._edges[e])
                removed_idx.add(e)

        # Bridge-vs-casualties hypothesis test. A heavy WRONG edge can outlive
        # the greedy eviction (support-normalized score favors high-inlier
        # edges), shredding every good edge it shares triangles with until it
        # survives as the sole damped bridge between components — at which
        # point the rotation average has no choice but to follow it, and the
        # averaging-loop redemption can never fire (measured: a window-3
        # 10-view graph with one 200-inlier 40-deg edge ends with 5 good
        # edges dead and every downstream rotation 40 deg off). For each
        # damped bridge that sat in violated triangles, test the counter
        # -hypothesis: restore the eviction casualties, drop the bridge. If
        # that graph is still connected and the casualties certify each other
        # (clean triangles among casualties + alive edges) while the bridge
        # certifies nothing, the casualty set wins — majority evidence beats
        # per-edge support.
        for b in np.nonzero(damped)[0]:
            if b not in accused or not removed_idx:
                continue
            alive2 = alive.copy()
            alive2[list(removed_idx)] = True
            alive2[b] = False
            clean_restored, bridge_clean = 0, 0
            for t in tris:
                a_ok = all(alive2[e] for e in t)
                if a_ok and any(e in removed_idx for e in t):
                    if tri_angle(t) < tau_eff:
                        clean_restored += 1
                if b in t and all(alive2[e] or e == b for e in t):
                    if tri_angle(t) < tau_eff:
                        bridge_clean += 1
            if clean_restored >= 2 and bridge_clean == 0:
                # connectivity without the bridge, with casualties restored
                p2 = np.arange(self.max_img)

                def _f2(x):
                    while p2[x] != x:
                        p2[x] = p2[p2[x]]
                        x = p2[x]
                    return x

                for e in np.nonzero(alive2 | damped)[0]:
                    if e == b:
                        continue
                    i, j = self._edges[e]
                    p2[_f2(i - 1)] = _f2(j - 1)
                if len({_f2(c) for c in range(self.max_img)}) == 1:
                    restored = []
                    for e in sorted(removed_idx):
                        in_clean = any(
                            e in t and all(alive2[x] for x in t)
                            and tri_angle(t) < tau_eff
                            for t in tris
                        )
                        if in_clean:
                            alive[e] = True
                            restored.append(self._edges[e])
                    if restored:
                        for k in restored:
                            removed.remove(k)
                        removed_idx -= {x for x in removed_idx if alive[x]}
                        alive[b] = False
                        damped[b] = False
                        removed.append(self._edges[b])
                        self.warnings.append(
                            "bridge-vs-casualties flip: dropped "
                            f"{self._edges[b]}, restored "
                            + ", ".join(map(str, restored))
                        )

        if removed:
            self.warnings.append(
                f"cycle filter dropped {len(removed)} edges: "
                + ", ".join(map(str, removed))
            )
            for e in range(E):
                if self._edge_w[e] > 0 and not alive[e]:
                    self._edge_inl[self._edges[e]] = np.zeros_like(
                        self._edge_inl[self._edges[e]]
                    )
            self._edge_w = np.where(alive, self._edge_w, 0.0)
        self._edge_w = np.where(damped, 0.25 * self._edge_w, self._edge_w)

    def _connected(self, alive: np.ndarray) -> bool:
        C = self.max_img
        parent = np.arange(C)

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for e in np.nonzero(alive)[0]:
            i, j = self._edges[e]
            parent[find(i - 1)] = find(j - 1)
        return len({find(c) for c in range(C)}) == 1

    def _repair_connectivity(self, w_prev: np.ndarray, inl_prev, context: str) -> None:
        """Edge dropping must NEVER disconnect the view graph: a component
        cut off from camera 0 keeps identity poses (measured: the 47-view
        4deg sprite orbit lands at 34% ATE when the cycle filter + rotation
        gate between them sever the graph — worse than averaging over any
        suspicious edge). Greedy spanning repair: restore the
        highest-prior-weight zeroed edges that bridge components, at damped
        weight (0.25x) so the robust IRLS stays skeptical of them."""
        alive = np.asarray(self._edge_w) > 0
        if self._connected(alive):
            return
        C = self.max_img
        parent = np.arange(C)

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for e in np.nonzero(alive)[0]:
            i, j = self._edges[e]
            parent[find(i - 1)] = find(j - 1)
        cand = np.nonzero(~alive & (np.asarray(w_prev) > 0))[0]
        cand = cand[np.argsort(-np.asarray(w_prev)[cand])]
        restored = []
        for e in cand:
            i, j = self._edges[e]
            ri, rj = find(i - 1), find(j - 1)
            if ri != rj:
                parent[ri] = rj
                self._edge_w[e] = 0.25 * w_prev[e]
                if inl_prev is not None:
                    self._edge_inl[self._edges[e]] = inl_prev[self._edges[e]].copy()
                restored.append(self._edges[e])
        if restored:
            self.warnings.append(
                f"connectivity repair ({context}): restored damped edges "
                + ", ".join(map(str, restored))
            )

    @mm_f32
    def _motion_averaging(self) -> None:
        """Absolute rotations + camera centers from the view graph (both IRLS
        solvers run fully on device; chain inits are O(E) host walks)."""
        t0 = time.time()
        C = self.max_img
        # Cycle-consistency outlier removal BEFORE any averaging: it needs no
        # global estimate, so it cannot be misdirected the way
        # residual-vs-average rejection can when the average is polluted.
        # Pre-filter weights + inlier sets are kept for the redemption pass
        # below (the greedy eviction can convict a good edge when the real
        # culprit shares all its triangles).
        w_pre = np.asarray(self._edge_w, np.float64).copy()
        inl_pre = {k: self._edge_inl[k].copy() for k in self._edges}
        self._filter_edges_by_cycles()
        self._repair_connectivity(w_pre, inl_pre, "cycle filter")
        ei = np.asarray([i - 1 for i, _ in self._edges], np.int32)
        ej = np.asarray([j - 1 for _, j in self._edges], np.int32)
        w = np.asarray(self._edge_w, np.float32)
        nz = w > 0

        # Connectivity check over usable edges (warn + identity-fill otherwise).
        parent = np.arange(C)

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in zip(ei[nz], ej[nz]):
            parent[find(a)] = find(b)
        roots = {find(c) for c in range(C)}
        if len(roots) > 1:
            self.warnings.append(
                f"view graph has {len(roots)} components; "
                "unreached cameras keep identity poses"
            )

        # Edge axis padded to a bucket: padding edges are zero-weight self
        # -loops on camera 0 with identity rotations, so every E-shaped device
        # program below compiles once per bucket instead of once per dataset.
        E = len(self._edges)
        Eb = _bucket(E, 128) if E else 0
        eye = np.eye(3, dtype=np.float32)
        ei_j = _pad_edges(jnp.asarray(ei), Eb)
        ej_j = _pad_edges(jnp.asarray(ej), Eb)
        w_j = _pad_edges(jnp.asarray((w / max(w.max(), 1e-9)).astype(np.float32)), Eb)
        R_rel = _pad_edges(jnp.asarray(self._edge_R, jnp.float32), Eb, eye)

        R0 = chain_initial_rotations(
            jnp.asarray(self._edge_R[nz], jnp.float32),
            jnp.asarray(ei[nz]), jnp.asarray(ej[nz]), C,
        )
        # Global chordal solve on top of the chain walk: the Jacobi IRLS
        # sweeps below only propagate corrections one hop per sweep, so on
        # large-diameter graphs (hundreds of views) the chain init's
        # accumulated drift would survive them (measured: 9.3 deg median at
        # C=1000 still 1.6 deg after 2048 sweeps; chordal CG reaches the
        # linear-optimum 1.5 deg in under a second). CG cost scales with
        # sqrt(condition); cap iterations generously — it early-exits on tol.
        R0 = chordal_rotation_init(
            R_rel, ei_j, ej_j, R0, edge_w=w_j,
            num_cameras=C, cg_iters=min(max(128, 2 * C), 4096),
        )

        # Average -> reject -> re-average. An edge whose relative rotation
        # disagrees with the averaged absolute rotations carries a wrong
        # two-view geometry — and therefore a CONTAMINATED inlier set (RANSAC
        # support of a wrong model). Such edges are removed from the second
        # averaging round, from translation averaging, AND from track
        # building. Two rounds: gross outliers distort the first average
        # enough to hide moderate ones.
        R = R0
        banned = np.zeros(E, bool)   # dropped by residual => never restored
        for _round in range(4):
            R = rotation_averaging(
                R_rel, ei_j, ej_j, R, edge_w=w_j,
                num_cameras=C, num_iters=self.rot_avg_iters,
                # Sampson-refined edges are ~0.3-1 deg; finish the Weiszfeld
                # anneal well below the good-edge noise so near-L1 rejection
                # actually discriminates.
                eps_final=0.02,
            )
            R_np = np.asarray(jax.device_get(R), np.float64)
            r_edge = np.linalg.norm(
                np.einsum("eij,ejk->eik", self._edge_R, R_np[ei]) - R_np[ej],
                axis=(1, 2),
            )   # chordal residual, ||dR||_F = 2*sqrt(2)*sin(theta/2)
            if not nz.any():
                break
            # Twofold-homography disambiguation by graph consistency: a
            # planar-degenerate edge with no off-plane points carries two
            # equally-supported pose interpretations (_edge_alt); the rest of
            # the view graph now votes. One-shot swap when the runner-up fits
            # the average distinctly better.
            swapped = []
            for e, (R_a, t_a) in list(getattr(self, "_edge_alt", {}).items()):
                r_alt = np.linalg.norm(R_a @ R_np[ei[e]] - R_np[ej[e]])
                if r_alt < 0.7 * r_edge[e]:
                    self._edge_R[e] = R_a
                    self._edge_t[e] = t_a
                    r_edge[e] = r_alt
                    del self._edge_alt[e]
                    swapped.append(self._edges[e])
            if swapped:
                R_rel = _pad_edges(
                    jnp.asarray(self._edge_R, jnp.float32), Eb, eye
                )
                self.warnings.append(
                    "homography-ambiguity swap on edges: "
                    + ", ".join(map(str, swapped))
                )
            med = np.median(r_edge[nz])
            gate = max(4.0 * med, 0.15)
            # Redemption: the greedy cycle eviction convicts a GOOD edge when
            # the culprit shares all its triangles (observed: a 1-deg edge
            # evicted while the 20-deg edge it exposed survived damped as a
            # bridge). An averaged estimate now exists, so a cycle-filter
            # casualty whose relative rotation AGREES with it gets its weight
            # and inlier set back; truly wrong edges fail this test by
            # construction. One-way: an edge dropped by the residual gate
            # below is banned from restoration (no oscillation).
            cand = (~nz) & (w_pre > 0) & (r_edge < 0.5 * gate) & ~banned
            bad = nz & (r_edge > gate)
            if not bad.any() and not cand.any():
                break
            if cand.any():
                self.warnings.append(
                    f"restored {int(cand.sum())} cycle-filter casualties: "
                    + ", ".join(str(self._edges[e]) for e in np.nonzero(cand)[0])
                )
                w = np.where(cand, w_pre, w)
                for e in np.nonzero(cand)[0]:
                    k = self._edges[e]
                    self._edge_inl[k] = inl_pre[k]
                self._edge_w = np.where(cand, w_pre, self._edge_w)
            if bad.any():
                self.warnings.append(
                    f"dropped {int(bad.sum())} rotation-inconsistent edges: "
                    + ", ".join(str(self._edges[e]) for e in np.nonzero(bad)[0])
                )
                banned |= bad
                w = np.where(bad, 0.0, w)
                for e in np.nonzero(bad)[0]:
                    k = self._edges[e]
                    self._edge_inl[k] = np.zeros_like(self._edge_inl[k])
                self._edge_w = np.where(bad, 0.0, self._edge_w)
            nz = w > 0
            w_j = _pad_edges(
                jnp.asarray((w / max(w.max(), 1e-9)).astype(np.float32)), Eb
            )

        # The rotation-inconsistency gate above may have severed the graph
        # (absolute rotations exist for every camera by now, but a cut
        # component loses ALL translation + track constraints): restore the
        # best banned edges, damped, until connectivity holds.
        self._repair_connectivity(w_pre, inl_pre, "rotation gate")
        w = np.asarray(self._edge_w, np.float64)
        nz = w > 0
        w_j = _pad_edges(
            jnp.asarray((w / max(w.max(), 1e-9)).astype(np.float32)), Eb
        )

        # Re-estimate every edge's translation direction with the averaged
        # rotations held fixed — one batched eigh over all inlier constraint
        # normals (the minimal-sample E decomposition is noisy on small
        # baselines; this is the standard global-SfM refinement). Low-eigengap
        # (direction-degenerate) edges get their weight damped.
        if E:
            R_ij_avg = R[ej_j] @ jnp.swapaxes(R[ei_j], -1, -2)   # (Eb, 3, 3)
            pgs = [self.pair_geometry[k] for k in self._edges]
            p1s = _pad_edges(jnp.asarray(np.stack([pg.p1 for pg in pgs])), Eb)
            p2s = _pad_edges(jnp.asarray(np.stack([pg.p2 for pg in pgs])), Eb)
            K1s = _pad_edges(jnp.asarray(np.stack([pg.K1 for pg in pgs])), Eb, eye)
            K2s = _pad_edges(jnp.asarray(np.stack([pg.K2 for pg in pgs])), Eb, eye)
            inls = _pad_edges(
                jnp.asarray(np.stack([self._edge_inl[k] for k in self._edges])),
                Eb, False,
            )
            t_new, conf = relative_translations_known_rotations(
                R_ij_avg, p1s, p2s, K1s, K2s, inls,
            )
            self._edge_t, conf_np = jax.device_get((t_new[:E], conf[:E]))
            w = w * np.clip(np.asarray(conf_np, np.float64), 0.0, 1.0)
            nz = w > 0
            w_j = _pad_edges(
                jnp.asarray((w / max(w.max(), 1e-9)).astype(np.float32)), Eb
            )

        # World direction of (c_i - c_j) from the averaged R_j: t_ij ~ R_j (c_i - c_j).
        Rj = R[ej_j]                                          # (Eb, 3, 3)
        t_pad = _pad_edges(jnp.asarray(self._edge_t, jnp.float32), Eb,
                           np.asarray([0, 0, 1], np.float32))
        u = jnp.einsum("eji,ej->ei", Rj, t_pad)
        u = u / jnp.maximum(jnp.linalg.norm(u, axis=-1, keepdims=True), 1e-9)
        u_np = np.asarray(jax.device_get(u))[:E]

        # Per-edge BASELINE SCALES from structure: directions alone leave a
        # near-chain graph degenerate (a subchain can collapse while one
        # stretched edge absorbs the gauge — parallel rigidity fails), but
        # two-view depths along shared tracks observe the missing length
        # ratios directly: lam_e1 * z_m^(e1) = lam_e2 * z_m^(e2) for a point
        # seen by both edges through camera m.
        if E:
            z1, z2 = jax.device_get(
                jax.vmap(two_view_depths)(R_ij_avg, t_pad, p1s, p2s, K1s, K2s)
            )
            lam = self._edge_scales(
                np.asarray(z1)[:E], np.asarray(z2)[:E], nz
            )
        else:
            lam = np.ones(0)

        su = u_np * lam[:, None]
        c0 = chain_initial_centers(
            jnp.asarray(su[nz], jnp.float32),
            jnp.asarray(ei[nz]), jnp.asarray(ej[nz]), C,
        )
        c = translation_averaging(
            u, ei_j, ej_j, c0, edge_w=w_j,
            num_cameras=C, num_iters=self.trans_avg_iters,
            edge_s=_pad_edges(jnp.asarray(lam, jnp.float32), Eb, 1.0),
        )
        self._dbg_u = u_np
        self._dbg_lam = lam
        self._dbg_c0 = np.asarray(jax.device_get(c0))
        self._dbg_w = np.asarray(w)
        self.R_cams, self.c_cams = jax.device_get((R, c))
        self.stage_times["averaging"] = time.time() - t0

    def _edge_scales(self, z1: np.ndarray, z2: np.ndarray, nz: np.ndarray) -> np.ndarray:
        """Relative baseline length per edge from two-view depth ratios.

        ``z1[e], z2[e]`` are unit-baseline depths of edge e's matches in its
        two cameras. For edges e1, e2 sharing camera m, every common keypoint
        gives ``lam_e2 / lam_e1 = z_m^(e1) / z_m^(e2)``; the median log-ratio
        per edge pair feeds a spanning-tree propagation + Gauss-Seidel
        smoothing over the ratio graph. Normalized to weighted mean 1."""
        E = len(self._edges)
        pair_idx = jax.device_get({
            k: (self.pair_geometry[k].idx1, self.pair_geometry[k].idx2)
            for k in self._edges
        })
        incident: Dict[int, list] = {}
        for e, k in enumerate(self._edges):
            if not nz[e]:
                continue
            inl = self._edge_inl[k]
            if not inl.any():
                continue
            i, j = k
            idx1, idx2 = pair_idx[k]
            incident.setdefault(i, []).append((e, np.asarray(idx1)[inl], z1[e][inl]))
            incident.setdefault(j, []).append((e, np.asarray(idx2)[inl], z2[e][inl]))

        ratios: list = []          # (e1, e2, median log(z_e1 / z_e2), support)
        for m, lst in incident.items():
            for a in range(len(lst)):
                ea, kpa, za = lst[a]
                for b in range(a + 1, len(lst)):
                    eb, kpb, zb = lst[b]
                    common, ia, ib = np.intersect1d(kpa, kpb, return_indices=True)
                    if len(common) < 5:
                        continue
                    r = za[ia] / np.where(np.abs(zb[ib]) < 1e-9, 1e-9, zb[ib])
                    r = r[np.isfinite(r) & (r > 0)]
                    if len(r) < 5:
                        continue
                    ratios.append((ea, eb, float(np.median(np.log(r))), len(r)))

        log_lam = np.zeros(E)
        if ratios:
            # Spanning-tree BFS from the best-supported edge, then smooth.
            adj: Dict[int, list] = {}
            for ea, eb, lr, wgt in ratios:
                adj.setdefault(ea, []).append((eb, lr, wgt))
                adj.setdefault(eb, []).append((ea, -lr, wgt))
            seen = set()
            order = sorted(adj, key=lambda e: -self._edge_w[e])
            for root in order:
                if root in seen:
                    continue
                seen.add(root)
                queue = [root]
                while queue:
                    cur = queue.pop()
                    for nxt, lr, _ in adj[cur]:
                        if nxt not in seen:
                            # lam_e2 = lam_e1 * exp(lr) for (e1=cur, e2=nxt)
                            log_lam[nxt] = log_lam[cur] + lr
                            seen.add(nxt)
                            queue.append(nxt)
            for _sweep in range(10):   # weighted Gauss-Seidel on the ratio graph
                acc = np.zeros(E)
                wacc = np.zeros(E)
                for ea, eb, lr, wgt in ratios:
                    acc[eb] += wgt * (log_lam[ea] + lr)
                    wacc[eb] += wgt
                    acc[ea] += wgt * (log_lam[eb] - lr)
                    wacc[ea] += wgt
                upd = wacc > 0
                log_lam[upd] = acc[upd] / wacc[upd]

        lam = np.exp(np.clip(log_lam, -6.0, 6.0))
        wsum = self._edge_w[nz].sum()
        if wsum > 0:
            lam /= max((lam[nz] * self._edge_w[nz]).sum() / wsum, 1e-9)
        return lam

    def _build_tracks(self, feats: Features) -> None:
        """Union-find tracks over ALL pairs' inlier match edges (native C++
        path), then flat observation lists from the per-image keypoint table."""
        t0 = time.time()
        C = self.max_img
        cap = feats.keypoints.capacity
        # ONE bulk fetch of every image's (refined) keypoint coordinates.
        xf_np, yf_np = jax.device_get((feats.keypoints.xf, feats.keypoints.yf))
        self._kp_xy = {
            i: np.stack(
                [np.asarray(xf_np[i - 1]), np.asarray(yf_np[i - 1])], axis=1
            ).astype(np.float64)
            for i in range(1, C + 1)
        }

        # Flattened (image, keypoint) node ids, image-major.
        ea, eb = [], []
        pair_idx = jax.device_get({
            k: (self.pair_geometry[k].idx1, self.pair_geometry[k].idx2)
            for k in self._edges
        })
        for k in self._edges:
            inl = self._edge_inl[k]
            if not inl.any():
                continue
            i, j = k
            idx1, idx2 = pair_idx[k]
            idx1 = np.asarray(idx1)[inl]
            idx2 = np.asarray(idx2)[inl]
            ea.append((i - 1) * cap + idx1)
            eb.append((j - 1) * cap + idx2)
        ea = np.concatenate(ea) if ea else np.zeros(0, np.int64)
        eb = np.concatenate(eb) if eb else np.zeros(0, np.int64)

        node_image = np.repeat(np.arange(C, dtype=np.int64), cap)
        track_per_node, num_tracks, valid = build_tracks(
            ea, eb, C * cap, node_image=node_image
        )

        # Observations: every node touched by an edge observes its track.
        touched = np.zeros(C * cap, bool)
        touched[ea] = True
        touched[eb] = True
        nodes = np.nonzero(touched)[0]
        tids = track_per_node[nodes]
        keep = valid[tids] if valid is not None else np.ones(len(nodes), bool)
        # Tracks need >= 2 observations.
        counts = np.bincount(tids[keep], minlength=num_tracks)
        keep &= counts[tids] >= 2
        nodes, tids = nodes[keep], tids[keep]

        # Compact track ids.
        uniq, tids_c = np.unique(tids, return_inverse=True)
        self._num_points = len(uniq)
        self._obs_cam = (nodes // cap).astype(np.int32)
        self._obs_kp = (nodes % cap).astype(np.int32)
        self._obs_pt = tids_c.astype(np.int32)
        xy = np.empty((len(nodes), 2), np.float64)
        for i in range(1, C + 1):
            m = self._obs_cam == (i - 1)
            xy[m] = self._kp_xy[i][self._obs_kp[m]]
        self._obs_xy = xy
        self.stage_times["tracks"] = time.time() - t0

    @mm_f32
    def _triangulate(self) -> None:
        """All tracks triangulated as one batched multiview DLT + GN program,
        then observation gating (cheirality + reprojection error) on host."""
        t0 = time.time()
        C = self.max_img
        K = np.stack([self._intrinsics(i) for i in range(1, C + 1)])
        R = np.asarray(self.R_cams, np.float64)
        tvec = -np.einsum("cij,cj->ci", R, np.asarray(self.c_cams, np.float64))
        P = K @ np.concatenate([R, tvec[:, :, None]], axis=2)   # (C, 3, 4)
        self._P_all = P
        self._K_all = K
        self._t_cams = tvec

        O = len(self._obs_pt)
        T = self._num_points
        if T == 0:
            self._X = np.zeros((0, 3))
            self.stage_times["triangulate"] = time.time() - t0
            return
        # Bucketed padding => repeated solves reuse one compiled program.
        Ob, Tb = _bucket(O), _bucket(T)
        obs_cam = np.zeros(Ob, np.int32); obs_cam[:O] = self._obs_cam
        obs_pt = np.full(Ob, Tb - 1, np.int32); obs_pt[:O] = self._obs_pt
        obs_xy = np.zeros((Ob, 2), np.float32); obs_xy[:O] = self._obs_xy
        w = np.zeros(Ob, np.float32); w[:O] = 1.0

        X, _nobs = _triangulate_multiview_jit(
            jnp.asarray(P, jnp.float32), jnp.asarray(obs_cam),
            jnp.asarray(obs_pt), jnp.asarray(obs_xy),
            num_points=Tb, obs_w=jnp.asarray(w), gn_iters=8,
        )
        X = np.asarray(jax.device_get(X), np.float64)[:T]

        # Host gating: positive depth + reprojection error within the gate.
        Xo = X[self._obs_pt]
        Ph = P[self._obs_cam]
        h = np.einsum("oij,oj->oi", Ph[:, :, :3], Xo) + Ph[:, :, 3]
        z = h[:, 2]
        uv = h[:, :2] / np.where(np.abs(z[:, None]) < 1e-12, 1e-12, z[:, None])
        err = np.linalg.norm(uv - self._obs_xy, axis=1)
        ok = (z > 1e-6) & (err < self.obs_gate_px)
        cnt = np.bincount(self._obs_pt[ok], minlength=T)
        ok &= cnt[self._obs_pt] >= 2

        uniq, pt_c = np.unique(self._obs_pt[ok], return_inverse=True)
        self._obs_cam = self._obs_cam[ok]
        self._obs_kp = self._obs_kp[ok]
        self._obs_pt = pt_c.astype(np.int32)
        self._obs_xy = self._obs_xy[ok]
        self._X = X[uniq]
        self._num_points = len(uniq)
        self.stage_times["triangulate"] = time.time() - t0

    def _populate_map(self) -> None:
        """Fill the shared MapStore / pose lists so BA, persistence and the
        compat layer see the same contract as the incremental engine."""
        C = self.max_img
        self.map.append_points_raw(self._X)
        for c in range(C):
            m = self._obs_cam == c
            if m.any():
                self.map.add_observations(
                    self._obs_pt[m].astype(np.int64), self._obs_xy[m], c
                )
        R = np.asarray(self.R_cams, np.float64)
        rvecs = np.asarray(
            jax.device_get(_so3_log_batch(jnp.asarray(R, jnp.float32))),
            np.float64,
        )
        for c in range(C):
            self.global_poses.append((rvecs[c], self._t_cams[c]))
            self.global_K.append(self._K_all[c])

    def _register_nonkeyframes(self, feats: Features) -> None:
        """Register every non-keyframe against the keyframe map: match each
        frame to its two nearest keyframes (batched), link matches to the
        keyframes' triangulated tracks, and solve ALL frames' poses as one
        vmapped PnP-RANSAC program — the registration stage is embarrassingly
        parallel, unlike the reference's sequential chain. Inlier observations
        join the map so the final BA optimizes keyframes and registered
        frames jointly."""
        t0 = time.time()
        kfs = self.keyframes
        kf_set = set(kfs)
        non_kf = [f for f in range(1, self.max_img + 1) if f not in kf_set]
        if not non_kf:
            return
        # slot -> compacted track id per keyframe image (from the gated
        # observation table; -1 where the slot has no surviving track).
        cap = feats.keypoints.capacity
        slot_track = {k: np.full(cap, -1, np.int64) for k in kfs}
        obs_img = np.asarray(self._obs_cam, np.int64) + 1
        for k in kfs:
            m = obs_img == k
            if m.any():
                slot_track[k][np.asarray(self._obs_kp)[m]] = (
                    np.asarray(self._obs_pt, np.int64)[m]
                )

        # Registration pairs: (keyframe, frame) with the two nearest keyframes.
        reg_pairs = []
        for f in non_kf:
            below = max((k for k in kfs if k < f), default=None)
            above = min((k for k in kfs if k > f), default=None)
            for k in (below, above):
                if k is not None:
                    reg_pairs.append((k, f))

        rcfg = self.config.ransac
        results = {}
        pend = []
        for chunk, res, p1, p2 in self._match_pair_chunks(feats, reg_pairs):
            keys = jax.random.split(self._next_key(), res.mask.shape[0])
            fres = ransac_fundamental_adaptive_batch(
                keys, p1, p2, res.mask,
                max_hypotheses=rcfg.max_hypotheses(),
                stage_size=rcfg.stage_size,
                threshold=rcfg.epipolar_threshold,
                confidence=rcfg.prob_success,
            )
            pend.append((chunk, res, fres, p2))
        idx_np, filt_np, p2_np = jax.device_get((
            jnp.concatenate([p[1].indices for p in pend]),
            jnp.concatenate([p[2].inliers for p in pend]),
            jnp.concatenate([p[3] for p in pend]),
        ))
        g = 0
        for chunk, res, _f, _p in pend:
            B = res.mask.shape[0]
            for ci, key in enumerate(chunk):
                row = g + ci
                results[key] = (idx_np[row], filt_np[row], p2_np[row])
            g += B

        # Per frame: gather 2D-3D correspondences from its (<= 2) reg pairs.
        M2 = 2 * int(idx_np.shape[1])
        F = len(non_kf)
        pts = self.map.points()
        X_all = np.zeros((F, M2, 3), np.float32)
        x_all = np.zeros((F, M2, 2), np.float32)
        t_all = np.full((F, M2), -1, np.int64)
        m_all = np.zeros((F, M2), bool)
        K_all = np.zeros((F, 3, 3), np.float32)
        pairs_of_frame: Dict[int, list] = {}
        for p in reg_pairs:
            pairs_of_frame.setdefault(p[1], []).append(p)
        for fi, f in enumerate(non_kf):
            K_all[fi] = self._intrinsics(f)
            off = 0
            for k in pairs_of_frame.get(f, ()):
                idx, inl, p2c = results[k]
                tr = slot_track[k[0]][idx[:, 0]]
                sel = inl & (tr >= 0)
                n = int(sel.sum())
                if n:
                    sl = slice(off, off + n)
                    X_all[fi, sl] = pts[tr[sel]]
                    x_all[fi, sl] = p2c[sel]
                    t_all[fi, sl] = tr[sel]
                    m_all[fi, sl] = True
                    off += n
        # Deduplicate track observations within a frame (two keyframes can
        # contribute the same track): keep the first occurrence.
        for fi in range(F):
            _, first = np.unique(t_all[fi], return_index=True)
            keep = np.zeros(M2, bool)
            keep[first] = True
            m_all[fi] &= keep

        reg_hyp = min(512, self._pnp_hyp)
        batched_pnp = jax.jit(jax.vmap(
            lambda key, X, x, K, m: pnp_ransac(
                key, X, x, K, mask=m, num_hypotheses=reg_hyp,
                reproj_threshold=self.config.ransac.pnp_reproj_threshold,
            )
        ))
        keys = jax.random.split(self._next_key(), F)
        # Chunk the frame axis: ONE program over all frames is fine on CPU
        # but on TPU its temps scale with F x reg_hyp and the small trailing
        # dims pad 64x under (8,128) tiling — at config-5 scale (974 frames)
        # the single program needs 17.3 GB HBM (measured OOM on v5e). 128
        # frames per launch keeps temps ~2 GB; pow2 bucketing of the last
        # chunk reuses at most two compiled programs.
        CH = 128
        pending = []
        # Dispatch EVERY chunk before fetching any: the fetch fence waits for
        # that chunk's device compute, so a dispatch-fetch-dispatch loop
        # serializes host prep against the device — enqueue the whole chunk
        # train first and the device pipelines through it while the host is
        # already blocked on chunk 0's bytes.
        for c0 in range(0, F, CH):
            n = min(CH, F - c0)
            B = _pow2_bucket(n, CH)
            sel = np.minimum(np.arange(c0, c0 + B), F - 1)
            out = batched_pnp(
                keys[sel], jnp.asarray(X_all[sel]), jnp.asarray(x_all[sel]),
                jnp.asarray(K_all[sel]), jnp.asarray(m_all[sel]),
            )
            pending.append((n, out))
        parts = [
            jax.device_get((out.R[:n], out.t[:n], out.inliers[:n], out.ok[:n]))
            for n, out in pending
        ]
        R_np, t_np, inl_np, ok_np = (
            np.concatenate([p[i] for p in parts]) for i in range(4)
        )

        rvecs_all = np.asarray(
            jax.device_get(_so3_log_batch(jnp.asarray(R_np, jnp.float32))),
            np.float64,
        )
        for fi, f in enumerate(non_kf):
            cam = f - 1
            if bool(ok_np[fi]) and m_all[fi].sum() >= 6:
                rvec = rvecs_all[fi]
                tv = np.asarray(t_np[fi], np.float64)
                good = inl_np[fi] & m_all[fi]
                self.map.add_observations(
                    np.where(good, t_all[fi], -1), x_all[fi].astype(np.float64),
                    cam,
                )
            else:
                # Fallback: inherit the nearest keyframe's pose.
                near = min(kfs, key=lambda k: abs(k - f))
                rvec, tv = self.global_poses[near - 1]
                self.warnings.append(
                    f"frame {f}: PnP registration failed, keyframe pose kept"
                )
            self.global_poses[cam] = (np.asarray(rvec), np.asarray(tv))
        self.stage_times["register"] = time.time() - t0

    # ------------------------------------------------------------------ driver

    def _prepare_pair_selection(self, feats: Features) -> None:
        if self.keyframe_step == "auto" and self._auto_kfs is None:
            self._select_keyframes(feats)

    def run(self) -> "GlobalSfmEngine":
        feats = self._extract_all_features()
        self._prepare_pair_selection(feats)
        self._match_pairs(feats)
        self._relative_poses()
        self._motion_averaging()
        self._build_tracks(feats)
        self._triangulate()
        self._populate_map()
        if self.keyframed:
            self._register_nonkeyframes(feats)
        # Camera 0 frozen: the averaging gauge (R=I, c=0) anchors BA.
        if self.stream_ba_window is not None:
            self._stream_ba()
        else:
            err_before = None
            for r in range(self.ba_rounds):
                self._global_ba(freeze_before=1)
                if err_before is None:
                    err_before = self.errors_before_after_ba[0]
                if r < self.ba_rounds - 1 and self._regate_observations() == 0:
                    break
            self.errors_before_after_ba = (
                err_before, self.errors_before_after_ba[1])
        if self.model_name is not None:
            self.save_data()
        return self

    def _stream_ba(self) -> None:
        """Final BA through the advancing-window block store
        (pipeline/streaming.py, SURVEY.md §5.7): spill the map to contiguous
        camera blocks on disk, sweep a bounded window over them (sharded over
        ``self.mesh`` when present), read the refined state back. On a
        multi-host pod each host would own its blocks and the window exchange
        rides DCN (docs/MULTIHOST.md); the solve inside a window is the same
        psum-sharded Schur/CG as the monolithic path."""
        import shutil
        import tempfile

        from sfmfromscratch_tpu.pipeline.streaming import (
            MapBlockStore, stream_bundle_adjust,
        )

        t0 = time.time()
        frames, tracks, xy = self.map.observations()
        cam_params = np.array(
            [np.hstack([rv, t]) for rv, t in self.global_poses])
        root = tempfile.mkdtemp(prefix="mapblocks_")
        try:
            store = MapBlockStore.build_from_arrays(
                root, cam_params, np.stack(self.global_K).astype(np.float64),
                self.map.points(), frames, tracks, xy,
                block_cams=self.stream_ba_block_cams,
            )
            ba_cfg = self.config.ba
            stats = stream_bundle_adjust(
                store, window_blocks=self.stream_ba_window, mesh=self.mesh,
                sweeps=max(2, self.ba_rounds), max_iters=ba_cfg.max_lm_iters,
                cg_iters=60, ftol=ba_cfg.ftol,
                huber_delta=ba_cfg.huber_delta, regate_px=self.regate_px,
            )
            cams, _Ks = store.read_cameras()
            ids, xyz = store.read_points()
            pts = self.map.points().copy()
            pts[ids] = xyz
            self.map.update_points(pts)
            self.global_poses = [
                (np.asarray(c[:3], np.float64), np.asarray(c[3:], np.float64))
                for c in cams
            ]
            self.errors_before_after_ba = (
                stats.initial_error, stats.final_error)
            self.stream_stats = stats
        finally:
            shutil.rmtree(root, ignore_errors=True)
        self.stage_times["ba(stream)"] = time.time() - t0

    def _regate_observations(self) -> int:
        """Drop observations whose residual under the CURRENT (post-BA) model
        exceeds ``regate_px`` and tracks left with < 2 observations, then
        rebuild the map. Returns the number of observations dropped. The
        first gate ran under the (drifty) averaging init, so it admits wrong
        matches that only become identifiable once BA has converged."""
        from sfmfromscratch_tpu.ops.lie import so3_exp as _exp

        frames, tracks, xy = self.map.observations()
        pts = self.map.points()
        rvs = np.stack([rv for rv, _ in self.global_poses])
        Rs = np.asarray(
            jax.device_get(
                jax.jit(jax.vmap(_exp))(jnp.asarray(rvs, jnp.float32))
            ),
            np.float64,
        )
        P = np.empty((len(self.global_poses), 3, 4))
        for c, (rv, t) in enumerate(self.global_poses):
            P[c] = self.global_K[c] @ np.concatenate(
                [Rs[c], np.asarray(t)[:, None]], 1
            )
        Po = P[frames]
        h = np.einsum("oij,oj->oi", Po[:, :, :3], pts[tracks]) + Po[:, :, 3]
        z = np.where(np.abs(h[:, 2]) < 1e-12, 1e-12, h[:, 2])
        err = np.linalg.norm(h[:, :2] / z[:, None] - xy, axis=1)
        ok = (h[:, 2] > 1e-6) & (err < self.regate_px)
        cnt = np.bincount(tracks[ok], minlength=len(pts))
        ok &= cnt[tracks] >= 2
        dropped = int((~ok).sum())
        if dropped == 0:
            return 0
        uniq, tr_c = np.unique(tracks[ok], return_inverse=True)
        new_map = type(self.map)()
        new_map.append_points_raw(pts[uniq])
        fr = frames[ok]
        xy_k = xy[ok]
        for c in range(len(self.global_poses)):
            m = fr == c
            if m.any():
                new_map.add_observations(tr_c[m].astype(np.int64), xy_k[m], c)
        self.map = new_map
        return dropped
