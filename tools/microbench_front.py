"""Per-program chip timings for the bench workload's front half.

Times (with a sync after each) the feature extractor, the pallas matcher,
the adaptive F-RANSAC pair filter, and the fused bootstrap+chain program
separately, so headline-optimization work targets the actual hot program
(the engine's fused path hides the split: the single fetch blocks on all
of them, VERDICT round-2 item 1 / round-3 profiling).

Usage: python tools/microbench_front.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import bench
from sfmfromscratch_tpu.pipeline.incremental import SfmEngine
from sfmfromscratch_tpu.utils.fetch import sync_device


def timed(label, fn, n=3):
    fn()  # warm (compile)
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        out = fn()
        sync_device(jax.tree.leaves(out)[0])
        best = min(best, time.time() - t0)
    print(f"{label:40s} {best*1e3:8.1f} ms")
    return best


def main():
    num_views = 10
    seq_dir, K, _, _ = bench.build_sequence(num_views)
    cfg = bench.engine_config()
    eng = SfmEngine(seq_dir, num_views, config=cfg, single_K=K, auto_run=False)

    feats = eng._extract_all_features()
    sync_device(feats.descriptors)
    timed("features (10 views, 2 chunks)", eng._extract_all_features)

    pairs = eng._candidate_pairs(feats)
    from sfmfromscratch_tpu.ops.matcher import match_pairs_batch
    from sfmfromscratch_tpu.ops.pallas.support import pallas_tpu_available
    from sfmfromscratch_tpu.geometry.ransac import (
        ransac_fundamental_adaptive_batch,
    )

    use_pallas = pallas_tpu_available()
    print(f"pallas available: {use_pallas}")
    mcfg = eng.config.matcher
    rcfg = eng.config.ransac
    B = 16
    pad = pairs + [pairs[-1]] * (B - len(pairs))
    pi = jnp.asarray([k[0] - 1 for k in pad], jnp.int32)
    pj = jnp.asarray([k[1] - 1 for k in pad], jnp.int32)

    def run_match():
        return match_pairs_batch(
            feats.descriptors, feats.keypoints.mask, feats.keypoints.xf,
            feats.keypoints.yf, pi, pj,
            ratio_threshold=mcfg.ratio_threshold,
            max_matches=mcfg.max_matches, use_pallas=use_pallas,
        )

    timed(f"matcher (B={B} pairs, pallas={use_pallas})", run_match)

    res, p1, p2 = run_match()
    sync_device(res.mask)
    keys = jax.random.split(jax.random.key(0), B)

    def run_filter():
        return ransac_fundamental_adaptive_batch(
            keys, p1, p2, res.mask,
            max_hypotheses=rcfg.max_hypotheses(), stage_size=rcfg.stage_size,
            threshold=rcfg.epipolar_threshold, confidence=rcfg.prob_success,
        )

    fres = run_filter()
    print("  filter hyps_used per pair:", np.asarray(fres.hyps_used)[: len(pairs)])
    timed(f"pair filter (B={B}, adaptive)", run_filter)

    # matcher with only the real 9 pairs zero-padded to 16 vs done at B=16:
    # how much of the filter cost is the 7 duplicate padding pairs?
    timed("match+filter back-to-back", lambda: (run_match(), run_filter())[1])


if __name__ == "__main__":
    main()
