"""Self-supervised training for the SuperPoint slot — no external weights.

The environment has no MagicLeap checkpoint (and no egress), so the learned
extractor is trained from scratch the way the original was bootstrapped
(DeTone et al., CVPRW'18): a MagicPoint stage on SYNTHETIC SHAPES with exact
corner ground truth, joint with a homography-pair descriptor loss so the
descriptors survive viewpoint warps SIFT's fixed 16x16 grid cannot.

* data: random polygons / stars / checkerboards / line sets drawn with PIL,
  photometric noise + blur; corner locations are known exactly. Each sample
  also yields a RANDOM HOMOGRAPHY warp of itself with warped corner labels.
* detector loss: 65-way cell cross-entropy (8x8 cell pixel classes + dustbin)
  on both views.
* descriptor loss: pairwise hinge on the cell-center correspondence induced
  by the homography (positives within 8 px), positives re-weighted by the
  neg/pos ratio.

Training runs in minutes on one v5e chip for the ``tiny()`` net
(tools/train_superpoint.py); the resulting checkpoint is committed at
sfmfromscratch_tpu/weights/tinypoint_synth.npz and auto-discovered by
``SuperPointExtractor(weights_path="auto")``.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


# --------------------------------------------------------------------------
# Synthetic-shapes dataset (host-side generation, exact corner ground truth)
# --------------------------------------------------------------------------

MAX_CORNERS = 64


def _draw_shapes(rng: np.random.Generator, H: int, W: int):
    """One synthetic image + its corner list (exact, subpixel-free)."""
    from PIL import Image, ImageDraw, ImageFilter

    bg = rng.uniform(0.1, 0.9)

    def lum(v: float) -> int:  # PIL "L" mode wants uint8
        return int(np.clip(v, 0, 1) * 255)

    img = Image.new("L", (W, H), color=lum(bg))
    d = ImageDraw.Draw(img)
    corners = []

    kind = rng.integers(0, 4)
    if kind == 0:  # polygons
        for _ in range(rng.integers(2, 5)):
            n = int(rng.integers(3, 7))
            cx, cy = rng.uniform(0.15, 0.85) * W, rng.uniform(0.15, 0.85) * H
            r = rng.uniform(0.06, 0.22) * min(H, W)
            ang = np.sort(rng.uniform(0, 2 * np.pi, n))
            pts = [(cx + r * np.cos(a), cy + r * np.sin(a)) for a in ang]
            d.polygon(pts, fill=lum(bg + rng.uniform(-0.6, 0.6)))
            corners += pts
    elif kind == 1:  # star of segments
        cx, cy = rng.uniform(0.3, 0.7) * W, rng.uniform(0.3, 0.7) * H
        corners.append((cx, cy))
        for _ in range(rng.integers(3, 8)):
            ex, ey = rng.uniform(0, W - 1), rng.uniform(0, H - 1)
            d.line([(cx, cy), (ex, ey)],
                   fill=lum(bg + rng.uniform(-0.6, 0.6)),
                   width=int(rng.integers(1, 3)))
            corners.append((ex, ey))
    elif kind == 2:  # checkerboard patch
        rows, cols = int(rng.integers(3, 6)), int(rng.integers(3, 6))
        cw = rng.uniform(0.08, 0.16) * min(H, W)
        x0, y0 = rng.uniform(0.05, 0.4) * W, rng.uniform(0.05, 0.4) * H
        for r in range(rows):
            for c in range(cols):
                if (r + c) % 2 == 0:
                    d.rectangle(
                        [x0 + c * cw, y0 + r * cw, x0 + (c + 1) * cw, y0 + (r + 1) * cw],
                        fill=lum(bg + rng.uniform(0.3, 0.6) * rng.choice([-1, 1])),
                    )
        for r in range(rows + 1):
            for c in range(cols + 1):
                corners.append((x0 + c * cw, y0 + r * cw))
    else:  # quads (rectangles under rotation)
        for _ in range(rng.integers(2, 5)):
            cx, cy = rng.uniform(0.2, 0.8) * W, rng.uniform(0.2, 0.8) * H
            w2, h2 = rng.uniform(0.05, 0.2) * W, rng.uniform(0.05, 0.2) * H
            th = rng.uniform(0, np.pi)
            R = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
            base = np.array([[-w2, -h2], [w2, -h2], [w2, h2], [-w2, h2]])
            pts = (base @ R.T + [cx, cy]).tolist()
            d.polygon([tuple(p) for p in pts],
                      fill=lum(bg + rng.uniform(-0.6, 0.6)))
            corners += [tuple(p) for p in pts]

    if rng.uniform() < 0.7:
        img = img.filter(ImageFilter.GaussianBlur(radius=float(rng.uniform(0.3, 1.2))))
    arr = np.asarray(img, np.float32) / 255.0
    arr = np.clip(arr + rng.normal(0, rng.uniform(0.0, 0.04), arr.shape), 0, 1)

    c = np.array(corners, np.float32).reshape(-1, 2) if corners else np.zeros((0, 2), np.float32)
    keep = (c[:, 0] >= 4) & (c[:, 0] < W - 4) & (c[:, 1] >= 4) & (c[:, 1] < H - 4)
    c = c[keep][:MAX_CORNERS]
    return arr.astype(np.float32), c


def _draw_texture(rng: np.random.Generator, H: int, W: int):
    """Corner-rich blocky multi-scale noise (the texture statistics of real
    surfaces at SIFT-detectable scales), with Shi-Tomasi pseudo-labels.

    Synthetic shapes alone collapse the descriptor head on textured content
    (flat polygon interiors dominate the hinge's negatives — measured 0.94
    mean descriptor similarity on textured scenes); mixing textured samples
    in makes the negatives informative."""
    import cv2

    img = np.zeros((H, W), np.float32)
    for n in (6, 12, 24, 48):
        g = rng.uniform(0, 1, (n, n)).astype(np.float32)
        img += cv2.resize(g, (W, H), interpolation=cv2.INTER_NEAREST) * rng.uniform(0.3, 1.0)
    img = (img - img.min()) / max(img.max() - img.min(), 1e-6)
    if rng.uniform() < 0.5:
        img = cv2.GaussianBlur(img, (0, 0), float(rng.uniform(0.3, 1.0)))
    img = np.clip(img + rng.normal(0, rng.uniform(0, 0.03), img.shape), 0, 1)

    pts = cv2.goodFeaturesToTrack(
        (img * 255).astype(np.uint8), maxCorners=MAX_CORNERS,
        qualityLevel=0.1, minDistance=8,
    )
    c = (pts.reshape(-1, 2).astype(np.float32)
         if pts is not None else np.zeros((0, 2), np.float32))
    keep = (c[:, 0] >= 4) & (c[:, 0] < W - 4) & (c[:, 1] >= 4) & (c[:, 1] < H - 4)
    return img.astype(np.float32), c[keep]


def _photometric_jitter(rng: np.random.Generator, img: np.ndarray) -> np.ndarray:
    """Brightness/contrast/gamma jitter so descriptors cannot key on
    absolute intensity across the pair."""
    g = rng.uniform(0.7, 1.4)
    img = np.clip(img, 0, 1) ** g
    img = img * rng.uniform(0.7, 1.2) + rng.uniform(-0.15, 0.15)
    return np.clip(img, 0, 1).astype(np.float32)


def _random_homography(rng: np.random.Generator, H: int, W: int) -> np.ndarray:
    """Random perspective warp: corner perturbation + rotation + scale."""
    import cv2

    src = np.array([[0, 0], [W, 0], [W, H], [0, H]], np.float32)
    mag = 0.18
    dst = src + rng.uniform(-mag, mag, (4, 2)).astype(np.float32) * [W, H]
    th = rng.uniform(-0.6, 0.6)
    s = rng.uniform(0.8, 1.25)
    c, sn = np.cos(th) * s, np.sin(th) * s
    ctr = np.array([W / 2, H / 2], np.float32)
    dst = (dst - ctr) @ np.array([[c, -sn], [sn, c]], np.float32).T + ctr
    return cv2.getPerspectiveTransform(src, dst.astype(np.float32))


def _warp_points(Hm: np.ndarray, pts: np.ndarray) -> np.ndarray:
    if len(pts) == 0:
        return pts
    ph = np.concatenate([pts, np.ones((len(pts), 1), np.float32)], 1)
    q = ph @ Hm.T
    return q[:, :2] / np.maximum(np.abs(q[:, 2:3]), 1e-8) * np.sign(q[:, 2:3])


def _cell_labels(corners: np.ndarray, H: int, W: int) -> np.ndarray:
    """(Hc, Wc) int32 labels: 8*(y%8)+(x%8) of a corner in the cell, else 64."""
    Hc, Wc = H // 8, W // 8
    lab = np.full((Hc, Wc), 64, np.int32)
    for x, y in corners:
        xi, yi = int(round(x)), int(round(y))
        if 0 <= xi < W and 0 <= yi < H:
            lab[yi // 8, xi // 8] = 8 * (yi % 8) + (xi % 8)
    return lab


def make_batch(rng: np.random.Generator, B: int, H: int, W: int):
    """(imgs, labels, imgs_w, labels_w, homographies) — each sample paired
    with a random homography warp of itself."""
    import cv2

    imgs = np.zeros((B, H, W), np.float32)
    imgs_w = np.zeros((B, H, W), np.float32)
    labs = np.zeros((B, H // 8, W // 8), np.int32)
    labs_w = np.zeros((B, H // 8, W // 8), np.int32)
    Hs = np.zeros((B, 3, 3), np.float32)
    for b in range(B):
        if rng.uniform() < 0.5:
            img, c = _draw_shapes(rng, H, W)
        else:
            img, c = _draw_texture(rng, H, W)
        Hm = _random_homography(rng, H, W)
        imgs[b] = _photometric_jitter(rng, img)
        imgs_w[b] = _photometric_jitter(
            rng,
            cv2.warpPerspective(img, Hm, (W, H), borderMode=cv2.BORDER_REFLECT),
        )
        labs[b] = _cell_labels(c, H, W)
        cw = _warp_points(Hm, c)
        if len(cw):
            keep = (cw[:, 0] >= 0) & (cw[:, 0] < W) & (cw[:, 1] >= 0) & (cw[:, 1] < H)
            cw = cw[keep]
        labs_w[b] = _cell_labels(cw, H, W)
        Hs[b] = Hm
    return imgs, labs, imgs_w, labs_w, Hs


# --------------------------------------------------------------------------
# Losses + train step
# --------------------------------------------------------------------------


def _detector_ce(semi: jax.Array, labels: jax.Array) -> jax.Array:
    """Mean 65-way cell cross-entropy; corner cells up-weighted to balance
    the dustbin-dominated label distribution."""
    logp = jax.nn.log_softmax(semi, axis=-1)
    ce = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    is_corner = labels < 64
    n_pos = jnp.maximum(jnp.sum(is_corner), 1)
    n_neg = jnp.maximum(jnp.sum(~is_corner), 1)
    w = jnp.where(is_corner, 0.5 / n_pos, 0.5 / n_neg)
    return jnp.sum(ce * w)


def _descriptor_hinge(desc_a, desc_b, Hm, mp=1.0, mn=0.2):
    """SuperPoint pairwise hinge over cell-center correspondences.

    desc_a/b: (Hc, Wc, D) L2-normalized; Hm maps A pixels to B pixels.
    """
    Hc, Wc, D = desc_a.shape
    ys, xs = jnp.meshgrid(jnp.arange(Hc), jnp.arange(Wc), indexing="ij")
    pc = jnp.stack([xs * 8 + 4, ys * 8 + 4], -1).reshape(-1, 2).astype(jnp.float32)
    ph = jnp.concatenate([pc, jnp.ones((pc.shape[0], 1))], 1)
    q = ph @ Hm.T
    q = q[:, :2] / jnp.where(jnp.abs(q[:, 2:3]) < 1e-8, 1e-8, q[:, 2:3])
    # s[i, j] = 1 when warped center i lands within 8 px of center j.
    d2 = jnp.sum((q[:, None, :] - pc[None, :, :]) ** 2, -1)
    s = (d2 <= 64.0).astype(jnp.float32)
    da = desc_a.reshape(-1, D)
    db = desc_b.reshape(-1, D)
    dot = da @ db.T
    pos = jnp.maximum(0.0, mp - dot)
    neg = jnp.maximum(0.0, dot - mn)
    n_pos = jnp.maximum(jnp.sum(s), 1.0)
    n_neg = jnp.maximum(jnp.sum(1 - s), 1.0)
    return 0.5 * (jnp.sum(s * pos) / n_pos + jnp.sum((1 - s) * neg) / n_neg)


def make_train_step(net, lambda_desc: float = 1.0):
    import optax

    tx = optax.adam(1e-3)

    def loss_fn(params, batch):
        imgs, labs, imgs_w, labs_w, Hs = batch
        semi_a, desc_a = net.apply({"params": params}, imgs[..., None])
        semi_b, desc_b = net.apply({"params": params}, imgs_w[..., None])
        ld = _detector_ce(semi_a, labs) + _detector_ce(semi_b, labs_w)
        ldesc = jnp.mean(jax.vmap(_descriptor_hinge)(desc_a, desc_b, Hs))
        return ld + lambda_desc * ldesc, (ld, ldesc)

    @jax.jit
    def step(params, opt_state, batch):
        (loss, (ld, ldesc)), g = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch)
        updates, opt_state = tx.update(g, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, ld, ldesc

    return tx, step


def train(steps: int = 1500, batch: int = 16, hw: Tuple[int, int] = (120, 160),
          seed: int = 0, log_every: int = 100, net=None):
    """Train TinyPoint on synthetic shapes; returns (variables, net)."""
    from sfmfromscratch_tpu.ops.superpoint import SuperPointNet

    net = net or SuperPointNet.tiny()
    H, W = hw
    rng = np.random.default_rng(seed)
    variables = net.init(jax.random.key(seed), jnp.zeros((1, H, W, 1)))
    params = variables["params"]
    tx, step = make_train_step(net)
    opt_state = tx.init(params)
    for i in range(steps):
        b = make_batch(rng, batch, H, W)
        b = tuple(jnp.asarray(x) for x in b)
        params, opt_state, loss, ld, ldesc = step(params, opt_state, b)
        if log_every and (i % log_every == 0 or i == steps - 1):
            print(f"step {i}: loss {float(loss):.4f} "
                  f"(det {float(ld):.4f}, desc {float(ldesc):.4f})", flush=True)
    return {"params": params}, net
