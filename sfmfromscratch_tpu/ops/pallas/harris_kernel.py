"""Fused Harris-response Pallas kernel.

The XLA path (ops/harris.py) runs 5 convolutions with 6 intermediate HBM
arrays (Ix, Iy, Ix^2, Iy^2, IxIy, 3 smoothed maps). This kernel computes the
whole response in one VMEM-resident pass — one HBM read of the image, one HBM
write of R — which matters because the frontend is bandwidth-bound, not
FLOP-bound (SURVEY.md §7; pallas_guide.md: HBM->VMEM->compute).

Implementation notes:
* Sobel and the Gaussian are separable; both passes are unrolled shift-
  multiply-accumulate chains on the VPU over the full image block.
* Zero padding reproduces cv2.filter2D(BORDER_CONSTANT) semantics
  (reference NaiveSIFT.py:67-69, 212-213).
* The image is processed as a single VMEM block (grayscale float32 SfM frames
  are a few MB — VMEM is ~16 MB; `harris_response_fused` falls back to the XLA
  path for images that don't fit).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sfmfromscratch_tpu.ops.harris import harris_response as harris_response_xla

# Whole-block kernel budget: image + ~6 temporaries in f32.
_VMEM_BUDGET_BYTES = 12 * 1024 * 1024


def _shift(x: jax.Array, dr: int, dc: int) -> jax.Array:
    """result[i, j] = x[i + dr, j + dc] with zeros outside.

    dr/dc are Python ints, so this is a static lax.slice — Mosaic does not
    lower dynamic_slice on values inside TC kernels."""
    H, W = x.shape
    padded = jnp.pad(x, ((abs(dr), abs(dr)), (abs(dc), abs(dc))))
    r0 = abs(dr) + dr
    c0 = abs(dc) + dc
    return jax.lax.slice(padded, (r0, c0), (r0 + H, c0 + W))


def _sep_conv(x: jax.Array, row_taps, col_taps) -> jax.Array:
    """Separable cross-correlation with zero padding: rows then columns."""
    acc = None
    half_r = len(row_taps) // 2
    for k, w in enumerate(row_taps):
        if isinstance(w, float) and w == 0.0:  # static zero taps only
            continue
        term = _shift(x, 0, k - half_r) * w
        acc = term if acc is None else acc + term
    y = acc
    acc = None
    half_c = len(col_taps) // 2
    for k, w in enumerate(col_taps):
        if isinstance(w, float) and w == 0.0:
            continue
        term = _shift(y, k - half_c, 0) * w
        acc = term if acc is None else acc + term
    return acc


def _harris_kernel(gauss_ref, alpha_ref, img_ref, out_ref):
    img = img_ref[0]
    # Sobel (cross-correlation taps; reference NaiveSIFT.py:23-31):
    #   Kx = [1,2,1]^T x [-1,0,1],  Ky = [-1,0,1]^T x [1,2,1]
    Ix = _sep_conv(img, (-1.0, 0.0, 1.0), (1.0, 2.0, 1.0))
    Iy = _sep_conv(img, (1.0, 2.0, 1.0), (-1.0, 0.0, 1.0))

    # SMEM allows scalar loads only — read each tap individually.
    taps = tuple(gauss_ref[0, k] for k in range(gauss_ref.shape[1]))
    Sxx = _sep_conv(Ix * Ix, taps, taps)
    Sxy = _sep_conv(Ix * Iy, taps, taps)
    Syy = _sep_conv(Iy * Iy, taps, taps)

    det = Sxx * Syy - Sxy * Sxy
    trace = Sxx + Syy
    out_ref[0] = det - alpha_ref[0, 0] * trace * trace


def _harris_pallas_batched(
    images: jax.Array, gaussian_size: int, sigma, alpha, interpret: bool
) -> jax.Array:
    """(B, H, W) batched fused response: grid over the batch, one image block
    per program."""
    B, H, W = images.shape
    # 1-D factor of the reference's normalized 2-D Gaussian: outer(g1, g1)
    # with g1 = e / sum(e) equals the jointly-normalized dense kernel
    # (NaiveSIFT.py:175-199) exactly.
    mean = gaussian_size // 2
    axis = jnp.asarray(np.linspace(-mean, mean, gaussian_size), dtype=images.dtype)
    e = jnp.exp(-(axis ** 2) / (2.0 * jnp.asarray(sigma, images.dtype) ** 2))
    g1 = e / jnp.sum(e)
    g_row = g1[None, :]

    alpha_arr = jnp.asarray([[alpha]], dtype=images.dtype)
    return pl.pallas_call(
        _harris_kernel,
        grid=(B,),
        out_shape=jax.ShapeDtypeStruct((B, H, W), images.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, H, W), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, W), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(g_row, alpha_arr, images)


@functools.partial(
    jax.jit, static_argnames=("gaussian_size", "sigma", "alpha", "interpret")
)
def harris_response_pallas(
    image: jax.Array,
    gaussian_size: int,
    sigma,
    alpha,
    interpret: bool = False,
) -> jax.Array:
    """Pallas fused Harris response for one (H, W) float32 image.

    ``jax.vmap`` over this function dispatches to the natively-batched grid
    (custom_vmap rule) instead of failing to lower a batched block spec.
    """

    @jax.custom_batching.custom_vmap
    def run(img):
        return _harris_pallas_batched(
            img[None], gaussian_size, sigma, alpha, interpret
        )[0]

    @run.def_vmap
    def _rule(axis_size, in_batched, imgs):
        out = _harris_pallas_batched(imgs, gaussian_size, sigma, alpha, interpret)
        return out, True

    return run(image)


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _harris_tiled_kernel(gauss_ref, alpha_ref, img_hbm, out_ref,
                         scratch, sem, *, TH, THp, halo, num_tiles, H, W):
    """Row-tiled variant for images too large for the whole-block kernel.

    The padded images stay in HBM (memory_space=ANY); each grid step DMAs a
    (THp, Wp) row slab — TH output rows plus a ``halo`` ring so the separable
    convolutions read true neighbor pixels at tile seams — into one of two
    VMEM slots, with the NEXT slab's DMA issued before this slab's compute
    (double buffering: the HBM stream overlaps the VPU convolution chain, so
    the kernel tracks the bandwidth roofline instead of alternating
    stalls).  Zero padding in the slab reproduces BORDER_CONSTANT semantics
    at image borders (reference NaiveSIFT.py:67-69)."""
    b = pl.program_id(0)
    i = pl.program_id(1)

    def get_dma(slot, tile):
        return pltpu.make_async_copy(
            img_hbm.at[b, pl.ds(tile * TH, THp), :],
            scratch.at[slot],
            sem.at[slot],
        )

    @pl.when(i == 0)
    def _():
        get_dma(0, 0).start()

    slot = jax.lax.rem(i, 2)
    next_slot = jax.lax.rem(i + 1, 2)

    @pl.when(i + 1 < num_tiles)
    def _():
        get_dma(next_slot, i + 1).start()

    get_dma(slot, i).wait()
    img = scratch[slot]

    Ix = _sep_conv(img, (-1.0, 0.0, 1.0), (1.0, 2.0, 1.0))
    Iy = _sep_conv(img, (1.0, 2.0, 1.0), (-1.0, 0.0, 1.0))
    # BORDER_CONSTANT parity: the slab's zero margin makes Sobel fire one
    # pixel OUTSIDE the true image (zero pad -> image step edge), and the
    # Gaussian would smear those phantom gradients back in.  The XLA path
    # has no outside — zero every gradient not on a true image pixel.
    rows = jax.lax.broadcasted_iota(jnp.int32, img.shape, 0) + i * TH - halo
    cols = jax.lax.broadcasted_iota(jnp.int32, img.shape, 1)
    inside = (rows >= 0) & (rows < H) & (cols < W)
    Ix = jnp.where(inside, Ix, 0.0)
    Iy = jnp.where(inside, Iy, 0.0)
    taps = tuple(gauss_ref[0, k] for k in range(gauss_ref.shape[1]))
    Sxx = _sep_conv(Ix * Ix, taps, taps)
    Sxy = _sep_conv(Ix * Iy, taps, taps)
    Syy = _sep_conv(Iy * Iy, taps, taps)
    det = Sxx * Syy - Sxy * Sxy
    trace = Sxx + Syy
    R = det - alpha_ref[0, 0] * trace * trace
    out_ref[0] = jax.lax.slice(R, (halo, 0), (halo + TH, R.shape[1]))


def _harris_tiled_batched(
    images: jax.Array, gaussian_size: int, sigma, alpha,
    interpret: bool, tile_rows: int,
) -> jax.Array:
    """(B, H, W) batched row-tiled response (grid = batch x row tiles)."""
    B, H, W = images.shape
    halo = gaussian_size // 2 + 1          # sobel (1) + gaussian reach
    TH = tile_rows
    num_tiles = -(-H // TH)
    THp = _round_up(TH + 2 * halo, 8)
    Wp = _round_up(W, 128)
    Hp = (num_tiles - 1) * TH + THp
    padded = jnp.zeros((B, Hp, Wp), images.dtype).at[
        :, halo:halo + H, :W
    ].set(images)

    mean = gaussian_size // 2
    axis = jnp.asarray(np.linspace(-mean, mean, gaussian_size), dtype=images.dtype)
    e = jnp.exp(-(axis ** 2) / (2.0 * jnp.asarray(sigma, images.dtype) ** 2))
    g_row = (e / jnp.sum(e))[None, :]
    alpha_arr = jnp.asarray([[alpha]], dtype=images.dtype)

    out = pl.pallas_call(
        functools.partial(
            _harris_tiled_kernel, TH=TH, THp=THp, halo=halo,
            num_tiles=num_tiles, H=H, W=W,
        ),
        grid=(B, num_tiles),
        out_shape=jax.ShapeDtypeStruct((B, num_tiles * TH, Wp), images.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, TH, Wp), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, THp, Wp), images.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(g_row, alpha_arr, padded)
    return out[:, :H, :W]


@functools.partial(
    jax.jit,
    static_argnames=("gaussian_size", "sigma", "alpha", "interpret", "tile_rows"),
)
def harris_response_pallas_tiled(
    image: jax.Array,
    gaussian_size: int,
    sigma,
    alpha,
    interpret: bool = False,
    tile_rows: int = 128,
) -> jax.Array:
    """Fused Harris response for images beyond the whole-block VMEM budget
    (>=960x1280 hires ladder scales, VERDICT r4 item 2): row-tiled grid with
    double-buffered halo DMA.  Matches the XLA path exactly on the valid
    region (tested in tests/test_pallas_kernels.py); ``jax.vmap`` dispatches
    to the natively-batched grid like the whole-block kernel."""

    @jax.custom_batching.custom_vmap
    def run(img):
        return _harris_tiled_batched(
            img[None], gaussian_size, sigma, alpha, interpret, tile_rows
        )[0]

    @run.def_vmap
    def _rule(axis_size, in_batched, imgs):
        out = _harris_tiled_batched(
            imgs, gaussian_size, sigma, alpha, interpret, tile_rows
        )
        return out, True

    return run(image)


def _tiled_tile_rows(W: int, gaussian_size: int) -> int:
    """Width-aware tile height for the tiled kernel: ~10 live (THp, Wp) f32
    slabs coexist per grid step (2 DMA scratch slots + ~7 conv-chain
    temporaries + the output block), so THp must shrink as rows widen or the
    kernel exceeds VMEM at multi-megapixel widths (review r5: at Wp=4096 the
    fixed 128-row tile needs ~22 MB).  Returns 0 when even the minimum tile
    does not fit (caller falls back to XLA)."""
    Wp = _round_up(W, 128)
    halo = gaussian_size // 2 + 1
    # Mosaic's scoped-VMEM accounting for this kernel measures ~12 live
    # (THp, Wp) slabs (chip error report at Wp=4096/tile=72: 17.4 MB) —
    # the conv-chain temporaries are not buffer-shared across the unrolled
    # shifts.  Budget 16 slabs of margin against a 14 MB target.
    thp_max = (14 * 1024 * 1024) // (16 * 4 * Wp)
    tile = (thp_max - 2 * halo) // 8 * 8
    if tile < 16:
        return 0
    return min(tile, 128)


def harris_response_fused(
    image: jax.Array, gaussian_size: int, sigma, alpha, interpret: bool = False
) -> jax.Array:
    """Fused Harris response: whole-block kernel for images that fit VMEM,
    row-tiled halo-DMA kernel beyond that (XLA only as the last resort)."""
    H, W = image.shape
    if H * W * 4 * 8 > _VMEM_BUDGET_BYTES:
        tile = _tiled_tile_rows(W, gaussian_size)
        if interpret or (H * W <= 4096 * 4096 and tile):
            return harris_response_pallas_tiled(
                image, gaussian_size, sigma, alpha, interpret=interpret,
                tile_rows=tile or 64,
            )
        return harris_response_xla(image, gaussian_size, sigma, alpha)
    return harris_response_pallas(image, gaussian_size, sigma, alpha, interpret=interpret)
