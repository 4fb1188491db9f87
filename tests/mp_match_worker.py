"""Worker for the host-sharded match-graph test: computes one shard of the
pairwise match graph into a shared pair cache. Spawned by
tests/test_multiprocess.py — not collected by pytest. No coordinator, no
process group: the filesystem is the join point (one atomic file per pair).
"""

import os
import sys

shard = int(sys.argv[1])
num_shards = int(sys.argv[2])
img_dir = sys.argv[3]
cache = sys.argv[4]
n_img = int(sys.argv[5])

os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from sfmfromscratch_tpu.pipeline.incremental import SfmEngine
from tests.test_pipeline import _small_config

K = np.load(os.path.join(img_dir, "K.npy"))
done = SfmEngine.match_graph_shard(
    img_dir, n_img, shard, num_shards, cache,
    config=_small_config(), single_K=K, pair_window=2,
)
print(f"shard {shard}/{num_shards}: {done} pairs", flush=True)
