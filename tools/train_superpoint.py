"""Train the TinyPoint learned extractor on synthetic shapes and save the
in-repo checkpoint (sfmfromscratch_tpu/weights/tinypoint_synth.npz).

Usage:
    python tools/train_superpoint.py [steps]

Runs on whatever backend jax picks (minutes on one v5e chip; longer on CPU).
See sfmfromscratch_tpu/ops/sp_train.py for the training recipe.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 1500
    from sfmfromscratch_tpu.ops.sp_train import train
    from sfmfromscratch_tpu.ops.superpoint import save_flax_weights

    variables, net = train(steps=steps)
    out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "..", "sfmfromscratch_tpu", "weights")
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.abspath(os.path.join(out_dir, "tinypoint_synth.npz"))
    save_flax_weights(path, variables, net.channels, net.desc_dim)
    print(f"saved {path} ({os.path.getsize(path) / 1e6:.2f} MB)")


if __name__ == "__main__":
    main()
