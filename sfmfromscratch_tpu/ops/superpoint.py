"""SuperPoint learned feature extractor (flax) — the engine's slot for the
reference's untracked SuperPoint module.

The reference reserves a learned-extractor slot (commented import main.py:9,
gitignored FeatureExtractor/SuperPoint/SuperPoint.py — the sole reason its
requirements pin torch/CUDA wheels, SURVEY.md §2.1). Here the slot is a real
TPU implementation: the standard SuperPoint architecture (VGG-style shared
encoder, detector head with 65-way cell softmax, 256-D descriptor head) in
flax, with a converter for the widely-distributed MagicLeap checkpoint
(superpoint_v1.pth) so pretrained weights drop in where available; random
initialization otherwise.

Output adapts to the engine's fixed-capacity Keypoints/Features contract, so
``SuperPointExtractor`` plugs into the same pipeline slots as the SIFT
frontend.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

try:
    import flax.linen as nn
except Exception:  # pragma: no cover
    nn = None

from sfmfromscratch_tpu.types import Features, Keypoints


if nn is not None:

    class SuperPointNet(nn.Module):
        """VGG-style encoder + detector/descriptor heads (SuperPoint, CVPRW'18).

        Default widths match the MagicLeap checkpoint layout; the slimmer
        ``tiny()`` configuration (~330k params, 128-D descriptors — the same
        dimensionality as the SIFT frontend, so every matcher path takes it
        unchanged) is what ops/sp_train.py trains from scratch on synthetic
        corners + homography pairs."""

        channels: Tuple[int, int, int, int, int] = (64, 64, 128, 128, 256)
        desc_dim: int = 256

        @classmethod
        def tiny(cls) -> "SuperPointNet":
            return cls(channels=(32, 32, 64, 64, 128), desc_dim=128)

        @nn.compact
        def __call__(self, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
            # x: (B, H, W, 1) grayscale in [0, 1]
            def conv(x, features, name):
                return nn.Conv(features, (3, 3), padding="SAME", name=name)(x)

            c1, c2, c3, c4, c5 = self.channels
            x = nn.relu(conv(x, c1, "conv1a"))
            x = nn.relu(conv(x, c1, "conv1b"))
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
            x = nn.relu(conv(x, c2, "conv2a"))
            x = nn.relu(conv(x, c2, "conv2b"))
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
            x = nn.relu(conv(x, c3, "conv3a"))
            x = nn.relu(conv(x, c3, "conv3b"))
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
            x = nn.relu(conv(x, c4, "conv4a"))
            x = nn.relu(conv(x, c4, "conv4b"))

            # Detector head: 65 = 8x8 cell pixels + dustbin.
            d = nn.relu(nn.Conv(c5, (3, 3), padding="SAME", name="convPa")(x))
            semi = nn.Conv(65, (1, 1), padding="VALID", name="convPb")(d)

            # Descriptor head: desc_dim per cell, bilinearly sampled per keypoint.
            e = nn.relu(nn.Conv(c5, (3, 3), padding="SAME", name="convDa")(x))
            desc = nn.Conv(self.desc_dim, (1, 1), padding="VALID", name="convDb")(e)
            desc = desc / jnp.maximum(
                jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-10
            )
            return semi, desc
else:  # pragma: no cover
    SuperPointNet = None


def load_magicleap_weights(pth_path: str) -> Dict[str, Any]:
    """Convert the public superpoint_v1.pth (torch) into flax params.

    torch conv weights are (out, in, kh, kw); flax wants (kh, kw, in, out).
    """
    import torch

    state = torch.load(pth_path, map_location="cpu")
    params: Dict[str, Any] = {}
    for name in ["conv1a", "conv1b", "conv2a", "conv2b", "conv3a", "conv3b",
                 "conv4a", "conv4b", "convPa", "convPb", "convDa", "convDb"]:
        w = state[f"{name}.weight"].numpy()
        b = state[f"{name}.bias"].numpy()
        params[name] = {
            "kernel": jnp.asarray(np.transpose(w, (2, 3, 1, 0))),
            "bias": jnp.asarray(b),
        }
    return {"params": params}


def save_flax_weights(path: str, variables: Dict[str, Any],
                      channels, desc_dim: int) -> None:
    """Persist flax params + architecture config as one npz (the in-repo
    checkpoint format for synthetically-trained nets, ops/sp_train.py)."""
    flat = {}
    for layer, p in variables["params"].items():
        for k, v in p.items():
            flat[f"{layer}.{k}"] = np.asarray(v)
    np.savez_compressed(
        path, __channels__=np.asarray(channels, np.int32),
        __desc_dim__=np.asarray(desc_dim, np.int32), **flat,
    )


def load_flax_weights(path: str) -> Tuple[Dict[str, Any], "SuperPointNet"]:
    """Load an npz checkpoint written by save_flax_weights; returns
    (variables, net) with the architecture the checkpoint was trained at."""
    z = np.load(path)
    channels = tuple(int(c) for c in z["__channels__"])
    desc_dim = int(z["__desc_dim__"])
    params: Dict[str, Any] = {}
    for key in z.files:
        if key.startswith("__"):
            continue
        layer, leaf = key.rsplit(".", 1)
        params.setdefault(layer, {})[leaf] = jnp.asarray(z[key])
    net = SuperPointNet(channels=channels, desc_dim=desc_dim)
    return {"params": params}, net


def default_weights_path() -> Optional[str]:
    """The in-repo synthetically-trained TinyPoint checkpoint, if present."""
    import os

    p = os.path.join(os.path.dirname(__file__), "..", "weights",
                     "tinypoint_synth.npz")
    p = os.path.abspath(p)
    return p if os.path.exists(p) else None


def _cells_to_heatmap(semi: jax.Array) -> jax.Array:
    """(Hc, Wc, 65) detector logits -> (Hc*8, Wc*8) probability map
    (drop the dustbin, softmax over the 65 classes, unshuffle 8x8 cells)."""
    prob = jax.nn.softmax(semi, axis=-1)[..., :64]
    Hc, Wc, _ = prob.shape
    prob = prob.reshape(Hc, Wc, 8, 8)
    return prob.transpose(0, 2, 1, 3).reshape(Hc * 8, Wc * 8)


class SuperPointExtractor:
    """Engine-facing wrapper with the fixed-capacity Features contract.

    extractor = SuperPointExtractor(weights_path=None)   # random init
    feats = extractor(image_bw, k=1024)
    """

    def __init__(self, weights_path: Optional[str] = "auto", seed: int = 0):
        """``weights_path``: "auto" uses the in-repo synthetically-trained
        TinyPoint checkpoint when present (random init otherwise); an .npz
        path loads a save_flax_weights checkpoint; a .pth path converts the
        MagicLeap torch checkpoint; None forces random init."""
        if nn is None:  # pragma: no cover
            raise RuntimeError("flax unavailable")
        if weights_path == "auto":
            weights_path = default_weights_path()
        if weights_path and str(weights_path).endswith(".npz"):
            self.variables, self.net = load_flax_weights(weights_path)
        elif weights_path:
            self.net = SuperPointNet()
            self.variables = load_magicleap_weights(weights_path)
        else:
            self.net = SuperPointNet()
            dummy = jnp.zeros((1, 120, 160, 1), jnp.float32)
            self.variables = self.net.init(jax.random.key(seed), dummy)
        net = self.net

        @functools.partial(jax.jit, static_argnames=("k", "nms_radius", "border"))
        def _forward(variables, image, k: int, nms_radius: int, border: int):
            return _forward_impl(net, variables, image, k, nms_radius, border)

        self._forward = _forward

    def __call__(
        self, image_bw: jax.Array, k: int = 1024,
        nms_radius: int = 4, border: int = 4,
    ) -> Features:
        x, y, score, mask, desc = self._forward(
            self.variables, image_bw, k, nms_radius, border
        )
        return Features(
            keypoints=Keypoints(
                x=x, y=y, score=score, mask=mask,
                xf=x.astype("float32"), yf=y.astype("float32"),
            ),
            descriptors=desc,
        )


def _forward_impl(net, variables, image: jax.Array, k: int, nms_radius: int, border: int):
        H, W = image.shape
        Hp = (H // 8) * 8
        Wp = (W // 8) * 8
        x = image[:Hp, :Wp][None, :, :, None]
        semi, desc = net.apply(variables, x)
        heat = _cells_to_heatmap(semi[0])                     # (Hp, Wp)

        # NMS via max-pool equality.
        win = 2 * nms_radius + 1
        local_max = jax.lax.reduce_window(
            heat, -jnp.inf, jax.lax.max, (win, win), (1, 1),
            [(nms_radius, nms_radius)] * 2,
        )
        rows = jax.lax.broadcasted_iota(jnp.int32, heat.shape, 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, heat.shape, 1)
        in_b = (rows >= border) & (rows < Hp - border) & (cols >= border) & (cols < Wp - border)
        cand = (heat == local_max) & in_b
        score = jnp.where(cand, heat, -jnp.inf).reshape(-1)
        top, idx = jax.lax.top_k(score, k)
        y = (idx // Wp).astype(jnp.int32)
        xc = (idx % Wp).astype(jnp.int32)
        mask = jnp.isfinite(top)

        # Bilinear descriptor sampling at keypoint positions (cell grid / 8).
        dmap = desc[0]                                        # (Hc, Wc, 256)
        fy = y.astype(jnp.float32) / 8.0 - 0.5
        fx = xc.astype(jnp.float32) / 8.0 - 0.5
        y0 = jnp.clip(jnp.floor(fy).astype(jnp.int32), 0, dmap.shape[0] - 1)
        x0 = jnp.clip(jnp.floor(fx).astype(jnp.int32), 0, dmap.shape[1] - 1)
        y1 = jnp.minimum(y0 + 1, dmap.shape[0] - 1)
        x1 = jnp.minimum(x0 + 1, dmap.shape[1] - 1)
        wy = jnp.clip(fy - y0, 0.0, 1.0)[:, None]
        wx = jnp.clip(fx - x0, 0.0, 1.0)[:, None]
        d = (
            dmap[y0, x0] * (1 - wy) * (1 - wx)
            + dmap[y0, x1] * (1 - wy) * wx
            + dmap[y1, x0] * wy * (1 - wx)
            + dmap[y1, x1] * wy * wx
        )
        d = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-10)
        d = d * mask[:, None]
        return xc, y, jnp.where(mask, top, 0.0), mask, d


def make_hybrid_extractor(
    k: int = 1024,
    feature_width: int = 16,
    rotation_invariant: bool = True,
    weights_path: Optional[str] = "auto",
    nms_radius: int = 4,
):
    """TinyPoint-detector + RootSIFT-descriptor hybrid for the engine's
    ``feature_extractor`` slot (VERDICT round-2 item 4's resolution).

    Measured on the perspective-correct renderer (tools/eval_superpoint.py):
    the learned TinyPoint DETECTOR is competitive, but its 64-D learned
    descriptors lose to RootSIFT at every baseline (21-27% vs 85-97% GT
    -epipolar inlier rate). The hybrid keeps the learned detector's
    repeatability and swaps in the descriptors that actually match —
    the standard detector/descriptor decoupling (e.g. SuperPoint keypoints +
    SIFT descriptors in hloc-style pipelines).

    Usage::

        eng = SfmEngine(path, n, config=cfg,
                        feature_extractor=make_hybrid_extractor(k=600))
    """
    from sfmfromscratch_tpu.ops.sift import sift_descriptors

    ext = SuperPointExtractor(weights_path)
    border = max(4, feature_width)   # SIFT window must fit inside the image

    def extract(image_bw: jax.Array) -> Features:
        f = ext(image_bw, k=k, nms_radius=nms_radius, border=border)
        kp = f.keypoints
        desc = sift_descriptors(
            image_bw, kp.x, kp.y, kp.mask,
            feature_width=feature_width,
            rotation_invariant=rotation_invariant,
        )
        return Features(keypoints=kp, descriptors=desc)

    return extract
