"""Single-pass dense async encoder vs the lockstep packer.

CPU interpret mode; compiled-Mosaic coverage rides on the bench gates
and AMV_TPU_SMOKE."""
import numpy as np
import jax.numpy as jnp

from amv_tpu.containers import riff
from amv_tpu.bitstream.entropy import huffman_decode_frames
from amv_tpu.codecs.amv_video import (decode_transform, encode_transform,
                                      _encoder_quant_qmat_np)
from amv_tpu.kernels.entropy_encode_pallas import _encode_layout
from amv_tpu.kernels.entropy_encode_async_pallas import (
    encode_layout_async_dense, default_t_max_enc)

SAMPLE = "/root/reference/C-AMVDecoder/bin/AMV1.amv"


def _slab(F=1024, n=4, seed=7):
    """lv2 slab [1, NB, 64, 8, 128]: a few real corpus re-encode frames
    plus synthetic lanes with varied sparsity (empty-block runs and
    high-slot values exercise stalls and the mask tail)."""
    s = riff.read(SAMPLE)
    w, h = s.info.width, s.info.height
    mb_w, mb_h = (w + 15) // 16, (h + 15) // 16
    M = mb_w * mb_h
    levels = huffman_decode_frames(s.video_chunks[:n], M)
    y, cb, cr = decode_transform(jnp.asarray(levels), mb_w, mb_h, w, h)
    lv2 = np.asarray(encode_transform(y, cb, cr, mb_w, mb_h, 2))
    NB = M * 6
    rng = np.random.default_rng(seed)
    lv2p = np.zeros((F, NB, 64), np.int16)
    lv2p[:n] = lv2.reshape(n, NB, 64)
    lv2p[n:, :, 0] = rng.integers(100, 160, (F - n, NB))
    sel = rng.random((F - n, NB)) < 0.4
    lv2p[n:, :, 5] = np.where(sel, rng.integers(-9, 9, (F - n, NB)), 0)
    lv2p[n:, ::11, 63] = 3                    # last-slot sym: no EOB
    lv2p[n:, ::7, 40] = -2                    # forces ZRL runs
    return jnp.asarray(lv2p.reshape(8, 128, NB, 64)
                       .transpose(2, 3, 0, 1)[None]), NB


def test_enc_dense_matches_lockstep():
    slab, NB = _slab()
    w_ref, b_ref = _encode_layout(slab, 1024, interpret=True, win_rows=64)
    w_new, b_new, ok = encode_layout_async_dense(
        slab, 1024, default_t_max_enc(NB) * 2, interpret=True,
        win_rows=64)
    assert bool(ok)
    np.testing.assert_array_equal(np.asarray(b_ref), np.asarray(b_new))
    np.testing.assert_array_equal(np.asarray(w_ref), np.asarray(w_new))
    # packed input-ring variant (XLA pre-pack staging; measured negative
    # on TPU, kept for the record — see encode_layout_async_dense)
    w_up, b_up, ok_up = encode_layout_async_dense(
        slab, 1024, default_t_max_enc(NB) * 2, interpret=True,
        win_rows=64, packed=True)
    assert bool(ok_up)
    np.testing.assert_array_equal(np.asarray(b_ref), np.asarray(b_up))
    np.testing.assert_array_equal(np.asarray(w_ref), np.asarray(w_up))


def test_pack_levels_masks_format():
    """The XLA pre-pack emits exactly the kernel's staging format."""
    from amv_tpu.kernels.entropy_encode_async_pallas import \
        pack_levels_masks
    rng = np.random.default_rng(3)
    lv = rng.integers(-1023, 1023, (1, 4, 64, 8, 128)).astype(np.int16)
    lv[0, 1, 1:] = 0                       # empty-AC block
    lv[0, 2, 63] = 5                       # last-slot tail
    out = np.asarray(pack_levels_masks(jnp.asarray(lv)))
    out = out.reshape(1, 4, 34, 8, 128)
    for b in range(4):
        for j in range(32):
            lo = lv[0, b, 2 * j].astype(np.int32) & 0xFFFF
            hi = lv[0, b, 2 * j + 1].astype(np.int32) << 16
            np.testing.assert_array_equal(out[0, b, j], lo | hi)
        nz = lv[0, b] != 0
        emlo = np.zeros((8, 128), np.uint32)
        emhi = np.zeros((8, 128), np.uint32)
        for k in range(1, 32):
            emlo |= nz[k].astype(np.uint32) << k
        for k in range(32, 64):
            emhi |= nz[k].astype(np.uint32) << (k - 32)
        np.testing.assert_array_equal(out[0, b, 32].view(np.uint32), emlo)
        np.testing.assert_array_equal(out[0, b, 33].view(np.uint32), emhi)


def test_enc_dense_overflow_reports_not_ok():
    slab, NB = _slab(seed=9)
    _, _, ok = encode_layout_async_dense(slab, 1024, 256, interpret=True,
                                         win_rows=64)
    assert not bool(ok)


def test_complete_async_dense_enc_bytes():
    """Complete async chain with enc='async' == lockstep chain bytes."""
    from amv_tpu.native import entropy_native as native
    from amv_tpu.pipeline.transcode import (transcode_complete_layout,
                                            transcode_complete_async)
    s = riff.read(SAMPLE)
    w, h = s.info.width, s.info.height
    M = ((w + 15) // 16) * ((h + 15) // 16)
    rows, _ = native.unescape_frames(s.video_chunks[:4])
    rows = np.asarray(rows)
    qk = tuple(int(v) for v in _encoder_quant_qmat_np(2))
    w_ref, b_ref = transcode_complete_layout(jnp.asarray(rows), M, qk,
                                             interpret=True, win_fetch=64,
                                             win_emit=64)
    w_new, b_new, ok = transcode_complete_async(jnp.asarray(rows), M, qk,
                                                interpret=True,
                                                win_fetch=64, win_emit=64,
                                                enc="async")
    assert bool(ok)
    np.testing.assert_array_equal(np.asarray(b_ref), np.asarray(b_new))
    np.testing.assert_array_equal(np.asarray(w_ref), np.asarray(w_new))


def test_complete_async_dense_enc_segmented_bytes():
    """segs > 1 async chain (per-segment dc0 predictors) splices to the
    same payload bytes as the lockstep chain."""
    from amv_tpu.native import entropy_native as native
    from amv_tpu.pipeline.transcode import (transcode_complete_layout,
                                            transcode_complete_async)
    s = riff.read(SAMPLE)
    w, h = s.info.width, s.info.height
    M = ((w + 15) // 16) * ((h + 15) // 16)
    rows, _ = native.unescape_frames(s.video_chunks[:4])
    rows = np.asarray(rows)
    qk = tuple(int(v) for v in _encoder_quant_qmat_np(2))
    w_ref, b_ref = transcode_complete_layout(jnp.asarray(rows), M, qk,
                                             interpret=True, win_fetch=64,
                                             win_emit=64)
    w_s, b_s, ok = transcode_complete_async(jnp.asarray(rows), M, qk,
                                            interpret=True, win_fetch=64,
                                            win_emit=64, enc="async",
                                            segs=4, w_out=512)
    assert bool(ok)
    vch_seg = native.concat_escape_frames(np.asarray(w_s),
                                          np.asarray(b_s), 4)
    vch_ref = native.escape_frames(np.asarray(w_ref), np.asarray(b_ref))
    assert all(a == b for a, b in zip(vch_seg, vch_ref))
