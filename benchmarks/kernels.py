"""Kernel-level micro-benchmarks: regenerates docs/PERFORMANCE.md's table.

Usage:
    PYTHONPATH=/root/.axon_site:. python benchmarks/kernels.py          # TPU
    JAX_PLATFORMS=cpu python benchmarks/kernels.py                     # CPU

Prints one line per kernel: XLA path vs Pallas/optimized path (median of
``reps`` timed runs after a warm-up call; block_until_ready fenced). BA
additionally reports LM iters/s — the BASELINE.json "BA iters/s per chip"
metric.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# A sitecustomize may pin jax_platforms at the config level (the env var alone
# does not override it); honor an explicit JAX_PLATFORMS=cpu request.
if os.environ.get("JAX_PLATFORMS", "") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp


def _sync(r):
    """Fence a result. On the tunneled (axon) backend ``block_until_ready``
    returns immediately; only fetching bytes actually waits for the queue."""
    leaf = jax.tree.flatten(r)[0][0]
    leaf.block_until_ready()
    np.asarray(leaf)


def _timed_batch(fn, k):
    t0 = time.perf_counter()
    r = None
    for _ in range(k):
        r = fn()
    _sync(r)
    return time.perf_counter() - t0


def timeit(fn, reps=20):
    """Per-call device time, tunnel-proof.

    Through the axon tunnel every fetch costs a flat ~24 ms round trip that
    swamps sub-ms kernels, so per-call fencing (round-1 method) floors at the
    round-trip cost. Instead: enqueue k dependency-free calls, fence once,
    and take the slope between a 1-call batch and a large batch — the flat
    fetch/dispatch cost differences out. The batch is grown until device time
    dominates the flat cost.
    """
    _sync(fn())  # compile + transfer-channel warm-up
    t1 = min(_timed_batch(fn, 1) for _ in range(3))
    k = max(4, reps)
    while True:
        tk = _timed_batch(fn, k)
        if tk > max(5 * t1, 0.1) or k >= 512:
            break
        k *= 4
    return max(tk - t1, 1e-9) / (k - 1)


# --------------------------------------------------------------------------
# Roofline accounting (VERDICT round-1 item 2): for each kernel, an explicit
# FLOP + HBM-byte model, achieved TFLOP/s and GB/s, % of chip peak, and which
# wall the kernel sits against. Peaks: TPU v5e = 197 TFLOP/s bf16 MXU,
# 819 GB/s HBM => ridge point ~240 FLOP/byte. Kernels whose arithmetic
# intensity exceeds the ridge are compute-(MXU-)bound in the limit; tiny
# workloads that use <2% of either peak are latency/dispatch-bound and the
# roofline is not the binding constraint.
# --------------------------------------------------------------------------

_PEAKS = {
    # device_kind substring -> (MXU bf16 FLOP/s, HBM bytes/s)
    "v5 lite": (197e12, 819e9),
    "v5e": (197e12, 819e9),
    "v5p": (459e12, 2765e9),
    "v4": (275e12, 1228e9),
}


def chip_peaks():
    kind = getattr(jax.devices()[0], "device_kind", "").lower()
    for sub, peaks in _PEAKS.items():
        if sub in kind:
            return peaks
    return None, None


def roofline(name, t_s, flops, bytes_, note=""):
    """Print achieved vs peak and classify the binding wall."""
    tflops = flops / t_s / 1e12
    gbps = bytes_ / t_s / 1e9
    ai = flops / max(bytes_, 1.0)
    peak_f, peak_b = chip_peaks()
    if peak_f is None:
        print(f"  roofline {name}: {tflops:.3f} TFLOP/s, {gbps:.1f} GB/s, "
              f"AI {ai:.0f} FLOP/B (no peak table for this backend)", flush=True)
        return
    pf = 100.0 * tflops * 1e12 / peak_f
    pb = 100.0 * gbps * 1e9 / peak_b
    ridge = peak_f / peak_b
    if max(pf, pb) < 2.0:
        wall = "latency/dispatch-bound (uses <2% of both peaks; workload too small for the roofline to bind)"
    elif ai >= ridge:
        wall = f"compute(MXU)-bound (AI {ai:.0f} >= ridge {ridge:.0f} FLOP/B), {pf:.1f}% of MXU peak"
    else:
        wall = f"bandwidth(HBM)-bound (AI {ai:.0f} < ridge {ridge:.0f} FLOP/B), {pb:.1f}% of HBM peak"
    print(f"  roofline {name}: {tflops:.3f} TFLOP/s ({pf:.2f}% MXU) | "
          f"{gbps:.1f} GB/s ({pb:.2f}% HBM) | AI {ai:.0f} -> {wall}"
          + (f" | {note}" if note else ""), flush=True)


def main():
    from sfmfromscratch_tpu.ops.harris import harris_response
    from sfmfromscratch_tpu.ops.pallas.harris_kernel import harris_response_pallas
    from sfmfromscratch_tpu.ops.matcher import match_ratio_test
    from sfmfromscratch_tpu.ops.sift import sift_descriptors
    from sfmfromscratch_tpu.ops.pallas.support import pallas_tpu_available
    from sfmfromscratch_tpu.geometry.ransac import ransac_essential_pose
    from sfmfromscratch_tpu.ba.lm import bundle_adjust

    on_tpu = pallas_tpu_available()
    interp = not on_tpu
    hires = "--hires" in sys.argv
    # Pallas interpret mode is orders of magnitude slower than Mosaic: on
    # non-TPU backends this is a smoke test, so shrink the workloads.
    # --hires (VERDICT r4 item 2): reference-realistic scales — >=960x1280
    # imagery at 2500-8000 keypoints (BASELINE configs 3-5 name >=VGA to
    # multi-megapixel datasets; the reference demo itself runs 2500 kp,
    # /root/reference/main.py:19) — where FLOPs/bandwidth actually bind
    # instead of dispatch latency.
    if hires:
        N = 8000 if on_tpu else 512
        KP = 8000 if on_tpu else 512
        H, W = (960, 1280) if on_tpu else (240, 320)
    else:
        N = 2499 if on_tpu else 256
        KP = 2500 if on_tpu else 256
        H, W = (360, 480) if on_tpu else (360, 480)
    HYP = 5967 if on_tpu else 512
    reps = 20 if on_tpu else 3
    print(f"backend={jax.default_backend()} pallas_native={on_tpu} "
          f"sizes: img={H}x{W} match={N} kp={KP} hyp={HYP}", flush=True)
    rng = np.random.default_rng(0)

    # Harris response
    G = 7
    img = jnp.asarray(rng.uniform(0, 1, (H, W)), jnp.float32)
    if hires:
        from sfmfromscratch_tpu.ops.pallas.harris_kernel import (
            harris_response_pallas_tiled,
        )
        pallas_harris = lambda: harris_response_pallas_tiled(
            img, G, 3.0, 0.05, interpret=interp)
    else:
        pallas_harris = lambda: harris_response_pallas(
            img, G, 3.0, 0.05, interpret=interp)
    t_xla = timeit(lambda: harris_response(img, G, 3.0, 0.05), reps)
    t_pal = timeit(pallas_harris, reps)
    print(f"harris {H}x{W}: xla {t_xla*1e3:.2f} ms | pallas {t_pal*1e3:.2f} ms"
          + (" (tiled halo-DMA kernel)" if hires else ""), flush=True)
    # FLOPs: 2 Sobel 3x3 convs (2*2*9/px), 3 products, 3 separable GxG
    # smoothings (3*2*2*G/px fused as rows+cols), R-map ~6/px.
    harris_flops = H * W * (2 * 2 * 9 + 3 + 3 * 2 * 2 * G + 6)
    harris_bytes = H * W * 4 * 2  # read image + write R once (fused kernel)
    roofline("harris(pallas)", t_pal, harris_flops, harris_bytes,
             note="fused single-pass VMEM kernel; 0.69 MB in / 0.69 MB out")

    # Top-2 matcher 2499x2499x128
    d1 = jnp.asarray(rng.uniform(0, 1, (N, 128)), jnp.float32)
    d2 = jnp.asarray(rng.uniform(0, 1, (N, 128)), jnp.float32)
    m = jnp.ones(N, bool)
    t_xla = timeit(lambda: match_ratio_test(d1, d2, m, m, ratio_threshold=0.85,
                                            max_matches=N, use_pallas=False), reps)
    t_pal = timeit(lambda: match_ratio_test(d1, d2, m, m, ratio_threshold=0.85,
                                            max_matches=N, use_pallas=on_tpu), reps)
    print(f"matcher {N}^2x128: xla {t_xla*1e3:.2f} ms | pallas {t_pal*1e3:.2f} ms", flush=True)
    # FLOPs: the (n1,n2,128) cross matmul + ~8/entry top-2 merge on the VPU.
    match_flops = 2 * N * N * 128 + 8 * N * N
    # Bytes: both descriptor sets once (database stays VMEM-resident across
    # grid steps: constant index_map), tiny top-2 outputs.
    match_bytes = 2 * N * 128 * 4 + 3 * N * 4
    roofline("matcher(pallas)", t_pal, match_flops, match_bytes,
             note="no HBM distance matrix; XLA path writes+reads the (n1,n2) f32 matrix = "
                  f"{2 * N * N * 4 / 1e6:.0f} MB extra HBM traffic")
    roofline("matcher(xla)", t_xla, match_flops, match_bytes + 2 * N * N * 4)

    # bf16-multiplicand variant (f32 accumulate): 4x the f32 MXU issue rate
    # on v5e. Report both the speed AND the match-set agreement vs the f32
    # kernel so the parity cost of enabling it is a measured number, not a
    # guess (RootSIFT descriptors in [0,1] -> ~0.4% relative cross-term
    # rounding; flips only near-exact ratio ties).
    from sfmfromscratch_tpu.ops.pallas.match_kernel import match_top2_fused

    t_bf = timeit(lambda: match_top2_fused(d1, d2, m, bf16=on_tpu)[2], reps)
    idx_f32 = np.asarray(match_top2_fused(d1, d2, m)[2])
    idx_bf16 = np.asarray(match_top2_fused(d1, d2, m, bf16=on_tpu)[2])
    agree = float((idx_f32 == idx_bf16).mean())
    print(f"matcher bf16: {t_bf*1e3:.2f} ms; nearest-index agreement vs f32 "
          f"{100*agree:.2f}%", flush=True)
    roofline("matcher(pallas,bf16)", t_bf, match_flops, match_bytes,
             note=f"bf16 multiplicands, f32 accumulate; {100*agree:.2f}% "
                  "nearest-index agreement with the f32 kernel")

    # SIFT descriptors: KP keypoints on the HxW image
    x = jnp.asarray(rng.integers(20, W - 20, KP), jnp.int32)
    y = jnp.asarray(rng.integers(20, H - 20, KP), jnp.int32)
    mask = jnp.ones(KP, bool)
    t_xla = timeit(lambda: sift_descriptors(img, x, y, mask, feature_width=16,
                                            rotation_invariant=True), reps)
    print(f"sift {KP} kp: xla {t_xla*1e3:.2f} ms (XLA is the design point: the "
          "Pallas histogram kernel measured 10.3 vs 5.8 ms @2500kp and 50.2 "
          "vs 24.6 ms @8000kp and was deleted, r5)", flush=True)
    # FLOPs per keypoint (fw=16): patch gradients (2*9/px), orientation
    # histogram as one-hot matmul (2*36/px), rotation + 4x4x8 binning matmul
    # (2*128/px at 16x16=256 px), RootSIFT normalize (~4*128).
    fw = 16
    sift_flops = KP * (fw * fw * (2 * 9 + 2 * 36 + 2 * 128) + 4 * 128)
    # Bytes: gathered patches (gradient x/y + magnitude reads) + descriptors.
    sift_bytes = KP * (fw * fw * 4 * 3 + 128 * 4)
    roofline("sift(xla)", t_xla, sift_flops, sift_bytes,
             note="gather-dominated; histogram binning as one-hot matmuls")

    # Essential RANSAC 5967 hypotheses x 2499 correspondences
    p1 = jnp.asarray(rng.uniform(0, 480, (N, 2)), jnp.float32)
    p2 = p1 + jnp.asarray(rng.normal(0, 2, (N, 2)), jnp.float32)
    Kmat = jnp.asarray([[520.0, 0, 240], [0, 520.0, 180], [0, 0, 1]], jnp.float32)
    key = jax.random.key(0)
    t = timeit(lambda: ransac_essential_pose(
        key, p1, p2, Kmat, Kmat, jnp.ones(N, bool),
        num_hypotheses=HYP, threshold=1.0, min_cheirality_frac=0.75), reps=min(5, reps))
    print(f"essential ransac {HYP}x{N}: {t*1e3:.1f} ms", flush=True)
    # FLOPs: batched 9-col SVD null spaces (QDWH, ~40 iter x 2*9^3/hyp), E
    # decomposition (3x3 SVDs ~2k/hyp), then the data-sized terms: epipolar
    # point-line distances both directions (~40/corr) and masked batched
    # cheirality over 4 candidates (~60/corr/cand).
    ransac_flops = HYP * (40 * 2 * 9**3 + 2000) + HYP * N * (40 + 4 * 60)
    # Bytes: correspondences once per hypothesis batch pass (component-wise
    # (B,N) epipolar/cheirality intermediates stream through HBM).
    ransac_bytes = HYP * N * 4 * 6
    roofline("ransac", t, ransac_flops, ransac_bytes,
             note="small-matrix SVD + VPU elementwise work, no MXU-shaped matmuls")

    # BA 8 cams x 400 pts x 3200 obs: wall + LM iters/s
    from tests.test_ba import _multi_view_problem
    problem, _, _ = _multi_view_problem(
        np.random.default_rng(1), num_cams=8, num_pts=400, perturb=0.05, noise=0.5
    )
    def run_ba():
        return bundle_adjust(problem, max_iters=25, cg_iters=50, ftol=1e-12)
    res = run_ba()
    t = timeit(run_ba, reps=min(5, reps))
    iters = int(res.iterations_used)
    print(f"ba 8cx400p: {t*1e3:.1f} ms, {iters} LM iters -> "
          f"{iters/t:.1f} iters/s "
          f"({float(res.initial_mean_error):.2f}->{float(res.final_mean_error):.2f} px)",
          flush=True)
    # FLOPs: per Schur matvec, each observation touches Jc (2x6) and Jp (2x3)
    # twice plus the 3x3 point-block solve (~250/obs); residual+Jacobian
    # rebuild per LM iter ~600/obs; CG runs <=50 matvecs per LM iter.
    n_obs = 3200
    ba_flops = iters * (50 * n_obs * 250 + n_obs * 600)
    ba_bytes = iters * 50 * n_obs * 4 * 30  # J blocks re-streamed per matvec
    roofline("ba(schur+cg)", t, ba_flops, ba_bytes,
             note="serial CG chain: many dependent small steps; bound by "
                  "dispatch latency + HBM streaming of J blocks, not the MXU")


if __name__ == "__main__":
    main()
