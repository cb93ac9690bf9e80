"""Async tokenizer+packer and the complete async transcode chain.

CPU interpret mode; compiled-Mosaic coverage rides on bench gates and
AMV_TPU_SMOKE."""
import numpy as np
import jax.numpy as jnp

from amv_tpu.containers import riff
from amv_tpu.native import entropy_native as native
from amv_tpu.bitstream.entropy import huffman_decode_frames
from amv_tpu.codecs.amv_video import (decode_transform, encode_transform,
                                      _encoder_quant_qmat_np)
from amv_tpu.kernels.entropy_encode_pallas import encode_scans_pallas
from amv_tpu.kernels.entropy_encode_async_pallas import encode_scans_async

SAMPLE = "/root/reference/C-AMVDecoder/bin/AMV1.amv"


def _levels(n):
    s = riff.read(SAMPLE)
    w, h = s.info.width, s.info.height
    mb_w, mb_h = (w + 15) // 16, (h + 15) // 16
    levels = huffman_decode_frames(s.video_chunks[:n], mb_w * mb_h)
    y, cb, cr = decode_transform(jnp.asarray(levels), mb_w, mb_h, w, h)
    return (np.asarray(encode_transform(y, cb, cr, mb_w, mb_h, 2)),
            mb_w * mb_h, s)


def test_async_encode_matches_lockstep():
    lv2, M, _ = _levels(5)
    w_ref, b_ref = encode_scans_pallas(jnp.asarray(lv2), w_out=1024,
                                       interpret=True)
    w_new, b_new, ok = encode_scans_async(jnp.asarray(lv2), w_out=1024,
                                          interpret=True)
    assert bool(ok)
    np.testing.assert_array_equal(np.asarray(b_ref), np.asarray(b_new))
    np.testing.assert_array_equal(np.asarray(w_ref), np.asarray(w_new))


def test_complete_async_transcode_bytes():
    """Whole-frame and segmented async transcode == lockstep chain,
    through the C framing/splice to final payload bytes."""
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
                                                win_fetch=64, win_emit=64)
    assert bool(ok)
    np.testing.assert_array_equal(np.asarray(b_ref), np.asarray(b_new))
    np.testing.assert_array_equal(np.asarray(w_ref), np.asarray(w_new))
    w_s, b_s, ok_s = transcode_complete_async(jnp.asarray(rows), M, qk,
                                              interpret=True, win_fetch=64,
                                              win_emit=64, segs=4,
                                              w_out=512)
    assert bool(ok_s)
    vch_seg = native.concat_escape_frames(np.asarray(w_s),
                                          np.asarray(b_s), 4)
    vch_ref = native.escape_frames(np.asarray(w_ref), np.asarray(b_ref))
    assert all(a == b for a, b in zip(vch_seg, vch_ref))


def test_async_encode_overflow_not_ok():
    lv2, M, _ = _levels(2)
    _, _, ok = encode_scans_async(jnp.asarray(lv2), w_out=1024,
                                  t_max=256, interpret=True)
    assert not bool(ok)
