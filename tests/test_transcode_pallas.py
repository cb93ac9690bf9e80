"""Fused Pallas transcode kernel vs the two-stage path (interpret mode)."""

import numpy as np
import pytest
import jax.numpy as jnp

from amv_tpu.bitstream import jpeg_tables as T
from amv_tpu.bitstream.entropy import huffman_decode_frames
from amv_tpu.codecs.amv_video import (decode_transform, encode_transform,
                                      _encoder_quant_qmat_np)
from amv_tpu.containers import riff
from amv_tpu.kernels import idct as KI
from amv_tpu.kernels.transcode_pallas import (transcode_soa, transcode_soa3,
                                              transcode_zz)

QM = np.zeros((6, 64), np.int32)
QM[:4, T.ZIGZAG] = T.SP5X_QUANT_LUMA_ZZ
QM[4:, T.ZIGZAG] = T.SP5X_QUANT_CHROMA_ZZ


def test_fused_transcode_bit_exact(sample_amv_bytes):
    s = riff.demux(sample_amv_bytes)
    F, M, mbw, mbh = 4, 48, 8, 6
    levels = huffman_decode_frames(s.video_chunks[:F], M)
    y1, cb1, cr1 = decode_transform(jnp.asarray(levels), mbw, mbh, 128, 96)
    lv_ref = np.asarray(encode_transform(y1, cb1, cr1, mbw, mbh, 2))

    lv = levels.astype(np.int32)
    dc = np.concatenate([
        np.cumsum(lv[:, :, :4, 0].reshape(F, M * 4) * 13,
                  axis=1).reshape(F, M, 4) + 1024,
        (np.cumsum(lv[:, :, 4, 0] * 14, axis=1) + 1024)[..., None],
        (np.cumsum(lv[:, :, 5, 0] * 14, axis=1) + 1024)[..., None]],
        axis=-1).astype(np.int32)
    raster = np.take(lv, np.asarray(T.UNZIGZAG), axis=-1)
    deq = ((raster * QM[None, None] + 0x8000) & 0xFFFF) - 0x8000
    deq[..., 0] = ((dc + 0x8000) & 0xFFFF) - 0x8000
    n = F * M * 6
    pad = -n % 512
    cm = np.zeros((64, n + pad), np.int16)
    cm[:, :n] = deq.reshape(n, 64).T
    qk = tuple(int(v) for v in _encoder_quant_qmat_np(2))
    pix, lv2 = transcode_soa(jnp.asarray(cm), qk, interpret=True)
    lv2_zz = np.take(np.asarray(lv2)[:, :n].T.reshape(F, M, 6, 64),
                     np.asarray(T.ZIGZAG), axis=-1)
    np.testing.assert_array_equal(lv2_zz, lv_ref)
    pix_blocks = np.asarray(pix)[:, :n].T.reshape(F, M, 6, 8, 8)
    pix_ref = np.asarray(KI.dequantize_idct(
        jnp.asarray(raster), jnp.asarray(dc), jnp.asarray(QM)[None, None]))
    np.testing.assert_array_equal(pix_blocks, pix_ref)

def test_fused_transcode_3d_matches_2d():
    """The sublane-packed 3D layout kernel is bit-exact with the 2D one."""
    rng = np.random.default_rng(7)
    N = 8 * 512
    deq = rng.integers(-2048, 2048, (64, N)).astype(np.int16)
    qk = tuple(int(v) for v in _encoder_quant_qmat_np(2))
    p1, l1 = transcode_soa(jnp.asarray(deq), qk, interpret=True)
    p2, l2 = transcode_soa3(jnp.asarray(deq), qk, interpret=True)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))

def test_fused_transcode_zz_full_fusion(sample_amv_bytes):
    """transcode_zz (dequant folded in) matches the explicit-dequant kernel
    on real corpus levels."""
    import jax
    s = riff.demux(sample_amv_bytes)
    F, M = 4, 48
    levels = huffman_decode_frames(s.video_chunks[:F], M)
    lv = levels.astype(np.int32)
    dc = np.concatenate([
        np.cumsum(lv[:, :, :4, 0].reshape(F, M * 4) * 13,
                  axis=1).reshape(F, M, 4) + 1024,
        (np.cumsum(lv[:, :, 4, 0] * 14, axis=1) + 1024)[..., None],
        (np.cumsum(lv[:, :, 5, 0] * 14, axis=1) + 1024)[..., None]],
        axis=-1).astype(np.int32)
    raster = np.take(lv, np.asarray(T.UNZIGZAG), axis=-1)
    deq = ((raster * QM[None, None] + 0x8000) & 0xFFFF) - 0x8000
    deq[..., 0] = ((dc + 0x8000) & 0xFFFF) - 0x8000
    n = F * M * 6
    pad = -n % (8 * 512)
    cmr = np.zeros((64, n + pad), np.int16)
    cmr[:, :n] = deq.reshape(n, 64).T
    cmz = np.zeros((64, n + pad), np.int16)
    cmz[:, :n] = lv.reshape(n, 64).T.astype(np.int16)
    dcf = np.zeros(n + pad, np.int32)
    dcf[:n] = dc.reshape(n)
    qk = tuple(int(v) for v in _encoder_quant_qmat_np(2))
    p1, l1 = transcode_soa3(jnp.asarray(cmr), qk, interpret=True)
    p2, l2 = transcode_zz(jnp.asarray(cmz), jnp.asarray(dcf), qk,
                          interpret=True)
    np.testing.assert_array_equal(np.asarray(p1)[:, :n], np.asarray(p2)[:, :n])
    np.testing.assert_array_equal(np.asarray(l1)[:, :n], np.asarray(l2)[:, :n])


def test_transcode_zz_rejects_unpadded():
    """N not a multiple of 8*tile raises instead of silently skipping
    trailing blocks (kernels/transcode_pallas.py guard)."""
    qk = tuple(int(v) for v in _encoder_quant_qmat_np(2))
    n = 8 * 512 + 6 * 64  # one full tile plus a ragged tail
    lv = jnp.zeros((64, n), jnp.int16)
    dc = jnp.zeros((n,), jnp.int32)
    with pytest.raises(ValueError, match="multiple of 8\\*tile"):
        transcode_zz(lv, dc, qk, interpret=True)


def test_transcode_zz_wrap_matches_materialized():
    """transcode_zz_wrap(base, dc, repeat) is bit-identical to transcode_zz
    on the materialized lane-tiled slab (the wrap's documented contract),
    including the pf>1 alignment-pretile path (nm_base=192, tile=128 ->
    pf=2)."""
    from amv_tpu.kernels.transcode_pallas import transcode_zz_wrap

    qk = tuple(int(v) for v in _encoder_quant_qmat_np(2))
    rng = np.random.default_rng(7)
    nm_base, repeat, tile = 192, 4, 128
    n_base = 8 * nm_base
    base = rng.integers(-64, 64, (64, n_base)).astype(np.int16)
    nm_full = nm_base * repeat
    dc = rng.integers(-2048, 2048, (8 * nm_full,)).astype(np.int32)

    tiled = np.tile(base.reshape(64, 8, nm_base),
                    (1, 1, repeat)).reshape(64, -1)
    p_ref, l_ref = transcode_zz(jnp.asarray(tiled), jnp.asarray(dc), qk,
                                interpret=True, tile=tile)
    p_w, l_w = transcode_zz_wrap(jnp.asarray(base), jnp.asarray(dc), qk,
                                 repeat=repeat, interpret=True, tile=tile)
    assert np.array_equal(np.asarray(p_ref), np.asarray(p_w))
    assert np.array_equal(np.asarray(l_ref), np.asarray(l_w))


def test_transcode_zz_wrap_rejects_bad_geometry():
    from amv_tpu.kernels.transcode_pallas import transcode_zz_wrap

    qk = tuple(int(v) for v in _encoder_quant_qmat_np(2))
    lv = jnp.zeros((64, 8 * 64), jnp.int16)  # nm_base=64, 6 does not divide
    dc = jnp.zeros((8 * 64 * 2,), jnp.int32)
    with pytest.raises(ValueError, match="6 \\| n_base/8"):
        transcode_zz_wrap(lv, dc, qk, repeat=2, interpret=True, tile=128)
    lv2 = jnp.zeros((64, 8 * 192), jnp.int16)  # pf=2 at tile=128
    dc2 = jnp.zeros((8 * 192 * 3,), jnp.int32)
    with pytest.raises(ValueError, match="multiple of the alignment"):
        transcode_zz_wrap(lv2, dc2, qk, repeat=3, interpret=True, tile=128)
