"""Pallas kernels validated in interpreter mode against the XLA reference
paths (the same kernels compile with Mosaic on TPU backends)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sfmfromscratch_tpu.ops.harris import harris_response
from sfmfromscratch_tpu.ops.matcher import match_ratio_test, pairwise_sq_dists
from sfmfromscratch_tpu.ops.pallas.harris_kernel import harris_response_pallas
from sfmfromscratch_tpu.ops.pallas.match_kernel import match_top2_fused


@pytest.fixture(scope="module")
def img(rng=None):
    r = np.random.default_rng(0)
    base = r.uniform(0, 1, (96, 128)).astype(np.float32)
    return jnp.asarray(base)


def test_harris_kernel_matches_xla(img):
    ref = np.asarray(harris_response(img, 7, 6.0, 0.05))
    got = np.asarray(harris_response_pallas(img, 7, 6.0, 0.05, interpret=True))
    np.testing.assert_allclose(got, ref, atol=1e-5 * np.abs(ref).max())


def test_harris_kernel_ksize5(img):
    ref = np.asarray(harris_response(img, 5, 2.0, 0.04))
    got = np.asarray(harris_response_pallas(img, 5, 2.0, 0.04, interpret=True))
    np.testing.assert_allclose(got, ref, atol=1e-5 * np.abs(ref).max())


def test_match_kernel_top2(rng):
    d1 = jnp.asarray(rng.uniform(0, 1, (300, 128)), jnp.float32)
    d2 = jnp.asarray(rng.uniform(0, 1, (451, 128)), jnp.float32)
    sq = np.asarray(pairwise_sq_dists(d1, d2))
    s1, s2, idx = match_top2_fused(d1, d2, interpret=True)
    srt = np.sort(sq, axis=1)
    np.testing.assert_allclose(np.asarray(s1), srt[:, 0], atol=1e-4)
    np.testing.assert_allclose(np.asarray(s2), srt[:, 1], atol=1e-4)
    np.testing.assert_array_equal(np.asarray(idx), np.argmin(sq, axis=1))


def test_match_kernel_bf16_agreement(rng):
    """bf16-multiplicand mode: nearest indices overwhelmingly agree with the
    f32 kernel on RootSIFT-like [0,1] descriptors (flips only at near-exact
    ties); distances within bf16 rounding of the cross term."""
    d1 = jnp.asarray(rng.uniform(0, 1, (300, 128)), jnp.float32)
    d2 = jnp.asarray(rng.uniform(0, 1, (451, 128)), jnp.float32)
    s1f, s2f, idxf = match_top2_fused(d1, d2, interpret=True)
    s1b, s2b, idxb = match_top2_fused(d1, d2, interpret=True, bf16=True)
    assert float((np.asarray(idxf) == np.asarray(idxb)).mean()) > 0.97
    np.testing.assert_allclose(np.asarray(s1b), np.asarray(s1f),
                               atol=0.35, rtol=0.05)


def test_match_kernel_masked(rng):
    d1 = jnp.asarray(rng.uniform(0, 1, (64, 128)), jnp.float32)
    d2 = jnp.asarray(rng.uniform(0, 1, (96, 128)), jnp.float32)
    mask2 = jnp.asarray(rng.uniform(size=96) > 0.3)
    s1, s2, idx = match_top2_fused(d1, d2, mask2, interpret=True)
    sq = np.array(pairwise_sq_dists(d1, d2))  # writable copy
    sq[:, ~np.asarray(mask2)] = np.inf
    np.testing.assert_array_equal(np.asarray(idx), np.argmin(sq, axis=1))


def test_ratio_test_pallas_path_equals_xla(rng):
    """match_ratio_test(use_pallas=True, interpret via monkeypatch) — full
    parity of the integrated path."""
    d1 = jnp.asarray(rng.uniform(0, 1, (120, 128)), jnp.float32)
    d2 = jnp.asarray(rng.uniform(0, 1, (150, 128)), jnp.float32)
    mask1 = jnp.asarray(rng.uniform(size=120) > 0.1)
    mask2 = jnp.asarray(rng.uniform(size=150) > 0.1)

    import sfmfromscratch_tpu.ops.matcher as M
    import sfmfromscratch_tpu.ops.pallas.match_kernel as MK
    import functools

    orig = MK.match_top2_fused
    try:
        MK.match_top2_fused = functools.partial(orig, interpret=True)
        got = M.match_ratio_test.__wrapped__(
            d1, d2, mask1, mask2, ratio_threshold=0.85, max_matches=120,
            use_pallas=True,
        )
    finally:
        MK.match_top2_fused = orig
    ref = M.match_ratio_test(d1, d2, mask1, mask2, ratio_threshold=0.85,
                             max_matches=120, use_pallas=False)
    n_ref = int(np.asarray(ref.mask).sum())
    n_got = int(np.asarray(got.mask).sum())
    assert n_ref == n_got
    assert {tuple(r) for r in np.asarray(ref.indices)[:n_ref]} == \
           {tuple(r) for r in np.asarray(got.indices)[:n_got]}


def test_harris_tiled_matches_xla():
    """Row-tiled halo-DMA kernel (large images): exact agreement with the XLA
    reference, including at tile seams and image borders."""
    from sfmfromscratch_tpu.ops.pallas.harris_kernel import (
        harris_response_pallas_tiled,
    )

    r = np.random.default_rng(3)
    # Non-multiple-of-tile height and non-multiple-of-128 width on purpose.
    img_big = jnp.asarray(r.uniform(0, 1, (200, 168)), jnp.float32)
    ref = np.asarray(harris_response(img_big, 7, 3.0, 0.05))
    got = np.asarray(harris_response_pallas_tiled(
        img_big, 7, 3.0, 0.05, interpret=True, tile_rows=64))
    np.testing.assert_allclose(got, ref, atol=1e-5 * np.abs(ref).max())


def test_harris_tiled_vmap_batched():
    from sfmfromscratch_tpu.ops.pallas.harris_kernel import (
        harris_response_pallas_tiled,
    )

    r = np.random.default_rng(4)
    imgs = jnp.asarray(r.uniform(0, 1, (3, 120, 160)), jnp.float32)
    ref = np.stack([np.asarray(harris_response(im, 7, 3.0, 0.05)) for im in imgs])
    got = np.asarray(jax.vmap(
        lambda im: harris_response_pallas_tiled(im, 7, 3.0, 0.05,
                                                interpret=True, tile_rows=64)
    )(imgs))
    np.testing.assert_allclose(got, ref, atol=1e-5 * np.abs(ref).max())


def test_tiled_tile_rows_width_aware():
    """VMEM gate for the tiled Harris kernel: tile height shrinks as rows
    widen (review r5: a fixed 128-row tile OOMs scoped VMEM at 4096-wide),
    and infeasible widths return 0 (caller falls back to XLA)."""
    from sfmfromscratch_tpu.ops.pallas.harris_kernel import _tiled_tile_rows

    assert _tiled_tile_rows(1280, 7) == 128
    t4k = _tiled_tile_rows(4096, 7)
    assert 16 <= t4k < 128
    # budget check: 16 slabs of (tile + 2*halo, Wp) f32 stay under 14 MB
    halo = 7 // 2 + 1
    assert 16 * (t4k + 2 * halo) * 4096 * 4 <= 14 * 1024 * 1024 + 16 * 2 * halo * 4096 * 4
    assert _tiled_tile_rows(200_000, 7) == 0
