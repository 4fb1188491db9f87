"""Headline benchmark: end-to-end incremental SfM frames/s on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/s", "vs_baseline": N}

Workload: a rendered 10-view sequence at the reference demo's working
resolution and parameters (2500 keypoints, 3 pyramid levels x1.1, ratio 0.85,
5,967 RANSAC hypotheses — reference main.py:19-30, Runner.py:170).

``vs_baseline`` is measured, not assumed: the reference implementation at
/root/reference runs the same workload's hot stages on this host's CPU
(timeboxed — its RANSAC loop is extrapolated from a 40-iteration sample, its
per-pair cost from one pair), giving reference frames/s to divide by. If the
reference cannot run here, vs_baseline falls back to 0.
"""

import json
import os
import subprocess
import sys
import tempfile
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# --------------------------------------------------------------------------
# Backend probe: the TPU tunnel has a history of outages where backend init
# hangs or raises UNAVAILABLE (round 1 shipped rc=1 because of one).  Probe
# the accelerator in a *subprocess* with a hard timeout before committing the
# main process to it; on persistent failure fall back to a clearly-labeled
# CPU-device measurement instead of dying with a bare traceback.
# --------------------------------------------------------------------------

_PROBE_SRC = """
import jax, jax.numpy as jnp
d = jax.devices()[0]
x = jnp.ones((256, 256), jnp.bfloat16)
(x @ x).block_until_ready()
print("PROBE_OK", d.platform, getattr(d, "device_kind", "?"), flush=True)
"""


def probe_backend(timeout_s=180, retries=3, backoff_s=20):
    """Return (ok, platform, device_kind, error_string)."""
    err = ""
    for attempt in range(1, retries + 1):
        try:
            r = subprocess.run(
                [sys.executable, "-c", _PROBE_SRC],
                capture_output=True, text=True, timeout=timeout_s,
            )
            if r.returncode == 0 and "PROBE_OK" in r.stdout:
                parts = r.stdout.strip().split()
                platform = parts[1] if len(parts) > 1 else "?"
                kind = " ".join(parts[2:]) if len(parts) > 2 else "?"
                log(f"bench: backend probe ok (attempt {attempt}): {platform} {kind}")
                return True, platform, kind, ""
            err = (r.stderr or r.stdout).strip().splitlines()[-1:] or ["unknown"]
            err = err[0][-300:]
        except subprocess.TimeoutExpired:
            err = f"probe timed out after {timeout_s}s"
        log(f"bench: backend probe attempt {attempt}/{retries} failed: {err}")
        if attempt < retries:
            time.sleep(backoff_s * attempt)
    return False, "", "", err


def build_sequence(num_views, hw=(360, 480), num_points=600):
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from tests.render import render_sequence, write_sequence

    rng = np.random.default_rng(7)
    images, K, poses, X = render_sequence(
        rng, num_views=num_views, num_points=num_points, img_hw=hw, f=520.0,
        step_t=(-0.12, 0.01, 0.02), step_r=(0.006, -0.015, 0.004),
    )
    d = tempfile.mkdtemp(prefix="bench_seq_")
    write_sequence(d, images)
    return d, K, images, poses


def engine_config():
    from sfmfromscratch_tpu.config import (
        BundleAdjustConfig,
        ExtractorConfig,
        MatcherConfig,
        PipelineConfig,
        RansacConfig,
    )

    # Reference demo parameters (main.py:19-30). BA ftol: the reference's
    # 1e-2 (SFM.py:427) leaves a wide stopping basin whose exact landing
    # point wobbles ~0.5-1.3% ATE under any numerics change (measured
    # frontier, docs/PERFORMANCE.md); 1e-3 pins the bench scene at ATE
    # ~0.5% for ~0.3 s more BA — the accuracy end of the documented
    # speed/accuracy frontier (ftol=1e-2 runs the same scene at ~20
    # frames/s).
    return PipelineConfig(
        extractor=ExtractorConfig(
            num_interest_points=2500, ksize=3, gaussian_size=7, sigma=6.0,
            alpha=0.05, feature_width=18, pyramid_level=3, pyramid_scale_factor=1.1,
        ),
        matcher=MatcherConfig(ratio_threshold=0.85, max_matches=2500),
        ransac=RansacConfig(),   # -> 5,967 hypotheses
        ba=BundleAdjustConfig(ftol=1e-3),
        scale_factor=1.0,
    )


def run_ours(num_views=10):
    from sfmfromscratch_tpu.pipeline.incremental import SfmEngine

    seq_dir, K, _, gt_poses = build_sequence(num_views)
    cfg = engine_config()

    # Warm-up with the full view count: every stage (including the bucketed
    # BA problem) compiles at exactly the shapes the timed run uses.
    log("bench: warm-up (compiles)...")
    SfmEngine(seq_dir, num_views, config=cfg, single_K=K)

    log("bench: timed run...")
    t0 = time.time()
    eng = SfmEngine(seq_dir, num_views, config=cfg, single_K=K)
    wall = time.time() - t0
    fps = num_views / wall
    log(f"bench: ours {wall:.2f}s for {num_views} views = {fps:.3f} frames/s; "
        f"stages: " + ", ".join(f"{k}={v:.2f}s" for k, v in eng.stage_times.items()))
    log(f"bench: reproj err before/after BA: {eng.errors_before_after_ba}")
    log_ate(eng, gt_poses)

    # Honest stage attribution: the async path's "fetch" time is mostly
    # DEFERRED DEVICE COMPUTE blocking at the fetch fence, not transfer.  Run
    # once more with per-stage sync fences (SFM_STAGE_SYNC) so the reported
    # split separates device compute from transfer; the headline fps above
    # stays the fence-free run (syncing costs extra round trips).
    # The fences themselves carry one-time costs the async runs never pay
    # (jit compile of each fence's slice program, per-shape transfer-channel
    # setup — measured ~0.9 s landing inside the FIRST synced stage), so run
    # the synced engine twice and report the steady-state second run.
    os.environ["SFM_STAGE_SYNC"] = "1"
    try:
        SfmEngine(seq_dir, num_views, config=cfg, single_K=K)
        eng_sync = SfmEngine(seq_dir, num_views, config=cfg, single_K=K)
    finally:
        del os.environ["SFM_STAGE_SYNC"]
    split = {k: round(v, 3) for k, v in eng_sync.stage_times.items()}
    compute = split.get("front.compute", 0.0)
    fetch = split.get("front.fetch", 0.0)
    log("bench: synced stage split (separate diagnostic run): "
        + ", ".join(f"{k}={v:.2f}s" for k, v in split.items()))
    log(f"bench: front stage = {compute:.2f}s device compute + "
        f"{fetch:.2f}s transfer (the async run folds compute into its "
        f"fetch fence)")
    return fps, eng, split


def log_ate(eng, seq_dir_poses):
    """ATE vs the rendered ground truth (similarity-aligned)."""
    from sfmfromscratch_tpu.utils.metrics import absolute_trajectory_error, camera_centers

    try:
        rvecs = np.stack([rv for rv, _ in eng.global_poses])
        ts = np.stack([t for _, t in eng.global_poses])
        est = camera_centers(rvecs, ts)
        gt = np.stack([-(R.T @ t) for R, t in seq_dir_poses[1 : len(est) + 1]])
        ate = absolute_trajectory_error(est, gt)
        extent = float(np.linalg.norm(gt.max(0) - gt.min(0)))
        log(f"bench: ATE {ate:.4f} (trajectory extent {extent:.3f})")
    except Exception as e:
        log(f"bench: ATE unavailable: {e}")


def run_reference_baseline(num_views=10):
    """Measure the reference's per-frame cost on this host (timeboxed)."""
    seq_dir, K, images, _ = build_sequence(2)  # one pair suffices for timing
    ref_dir = "/root/reference"
    if not os.path.isdir(ref_dir):
        return 0.0
    sys.path.insert(0, ref_dir)
    try:
        from FeatureExtractor.SIFT.ScaleRotInvSIFT import ScaleRotInvSIFT
        from FeatureMatcher.NNRatioFeatureMatcher import NNRatioFeatureMatcher
        from SFM import CameraPose

        params = dict(
            num_interest_points=2500, ksize=3, gaussian_size=7, sigma=6,
            alpha=0.05, feature_width=18, pyramid_level=3, pyramid_scale_factor=1.1,
        )
        g1 = images[0].astype(np.float32)
        g2 = images[1].astype(np.float32)

        t0 = time.time()
        e1 = ScaleRotInvSIFT(g1, params)
        x1, y1 = e1.detect_keypoints()
        d1 = e1.extract_descriptors()
        t_extract = time.time() - t0

        t0 = time.time()
        e2 = ScaleRotInvSIFT(g2, params)
        x2, y2 = e2.detect_keypoints()
        d2 = e2.extract_descriptors()
        t_extract = 0.5 * (t_extract + time.time() - t0)

        t0 = time.time()
        matches, conf = NNRatioFeatureMatcher(0.85).match_features_ratio_test(d1, d2)
        t_match = time.time() - t0

        m = matches[:2500]
        p1 = np.column_stack([x1[m[:, 0]], y1[m[:, 0]]]).astype(np.float64)
        p2 = np.column_stack([x2[m[:, 1]], y2[m[:, 1]]]).astype(np.float64)

        # RANSAC: run 40 iterations, extrapolate to 5,967 (reference loop cost
        # is linear in iterations, SFM.py:47-101).
        sample_iters = 40
        cp = CameraPose(p1, p2, K, K)
        t0 = time.time()
        cp.ransac_camera_motion(np.eye(3), np.zeros(3), max_iterations=sample_iters)
        t_ransac = (time.time() - t0) * (5967 / sample_iters)

        # Per-frame cost model over the sequence: every frame is extracted once
        # per pair it joins (the reference re-extracts; Runner.py:344-346 —
        # 2 extractions per pair), each of the N-1 pairs is matched, and each
        # pair runs one full-length RANSAC (bootstrap ransac_camera_motion or
        # find_inliers, both 5,967 iterations).
        per_pair = 2 * t_extract + t_match + t_ransac
        total = (num_views - 1) * per_pair
        fps = num_views / total
        log(
            f"bench: reference measured: extract {t_extract:.1f}s/img, "
            f"match {t_match:.1f}s, ransac {t_ransac:.1f}s (extrapolated from "
            f"{sample_iters} iters) => {fps:.4f} frames/s"
        )
        return fps
    except Exception as e:  # pragma: no cover
        log(f"bench: reference baseline unavailable: {type(e).__name__}: {e}")
        return 0.0
    finally:
        sys.path.remove(ref_dir)


def main():
    num_views = int(os.environ.get("BENCH_VIEWS", "10"))

    device_label, probe_error = "", ""
    if os.environ.get("BENCH_SKIP_PROBE") != "1":
        ok, platform, kind, probe_error = probe_backend()
        if ok:
            device_label = f"{platform}:{kind}"
        else:
            # Accelerator unavailable: fall back to a labeled CPU-device
            # measurement rather than exiting nonzero with no JSON.
            log("bench: accelerator UNAVAILABLE after retries; "
                "falling back to CPU devices (fallback is labeled in the JSON)")
            os.environ["JAX_PLATFORMS"] = "cpu"
            device_label = "cpu-fallback"

    try:
        fps, _, stage_split = run_ours(num_views)
    except Exception as e:  # emit structured failure, never a bare traceback
        import traceback
        traceback.print_exc(file=sys.stderr)
        print(json.dumps({
            "metric": "incremental SfM end-to-end throughput (10 views, 2500 kp, 5967 RANSAC hyps)",
            "value": 0.0,
            "unit": "frames/s",
            "vs_baseline": 0.0,
            "error": f"{type(e).__name__}: {e}"[:300],
            "device": device_label,
            "probe_error": probe_error,
        }))
        return

    ref_fps = run_reference_baseline(num_views)
    vs = fps / ref_fps if ref_fps > 0 else 0.0
    out = {
        "metric": "incremental SfM end-to-end throughput (10 views, 2500 kp, 5967 RANSAC hyps)",
        "value": round(fps, 4),
        "unit": "frames/s",
        "vs_baseline": round(vs, 2),
        "device": device_label,
        # per-stage seconds from a separate run with sync fences: *.compute
        # entries are device compute, *.fetch entries are actual transfer
        "stage_split_synced": stage_split,
    }
    if device_label == "cpu-fallback":
        out["error"] = "tpu_unavailable"
        out["probe_error"] = probe_error
    print(json.dumps(out))


if __name__ == "__main__":
    main()
