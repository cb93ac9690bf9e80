"""Segmented device encode: frames > 80 MCUs stay on the device path.

A 320x240 frame (300 MCUs) exceeds the encoder kernel's VMEM output
budget; pipeline/transcode.py splits it into lane-parallel segments with
per-lane initial DC predictors and native.concat_escape_frames splices
the bitstreams.  The result must be byte-identical to the host
whole-frame encoder (mjpegenc.c:379-450 parity at any geometry).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from amv_tpu.bitstream.entropy import huffman_encode_frame
from amv_tpu.codecs.amv_video import encode_transform, _encoder_quant_qmat_np
from amv_tpu.native import entropy_native as native
from amv_tpu.pipeline.transcode import (encode_planes_layout, pick_segments)


def test_pick_segments():
    assert pick_segments(48) == 1      # 128x96
    assert pick_segments(80) == 1      # 160x120
    assert pick_segments(300) == 4     # 320x240 -> 75-MCU segments
    assert pick_segments(1200) == 15   # 640x480 -> 80-MCU segments
    assert pick_segments(81) == 3
    assert pick_segments(97) == 97     # prime: 1-MCU segments still fit


def _encode_both(F, H, W, seed=0):
    # realistic content (smooth gradients + mild noise): full-range
    # white noise is pathological for entropy coding and overflows any
    # realistic per-segment word budget
    rng = np.random.default_rng(seed)
    mb_w, mb_h = (W + 15) // 16, (H + 15) // 16
    yy, xx = np.mgrid[0:H, 0:W]
    base = (128 + 60 * np.sin(xx / 9.0) + 40 * np.cos(yy / 7.0))
    y = np.clip(base[None] + rng.integers(-3, 4, (F, H, W)),
                0, 255).astype(np.uint8)
    cyy, cxx = np.mgrid[0:H // 2, 0:W // 2]
    cb = np.clip(128 + 25 * np.sin(cxx[None] / 11.0) +
                 rng.integers(-2, 3, (F, H // 2, W // 2)),
                 0, 255).astype(np.uint8)
    cr = np.clip(128 + 25 * np.cos(cyy[None] / 13.0) +
                 rng.integers(-2, 3, (F, H // 2, W // 2)),
                 0, 255).astype(np.uint8)
    lv = np.asarray(encode_transform(jnp.asarray(y), jnp.asarray(cb),
                                     jnp.asarray(cr), mb_w, mb_h, 2))
    want = [huffman_encode_frame(lv[f]) for f in range(F)]

    qk = tuple(int(v) for v in _encoder_quant_qmat_np(2))
    segs = pick_segments(mb_w * mb_h)
    ms = mb_w * mb_h // segs
    w_out = min(1664, 1024 * ((ms + 47) // 48))
    words, bits = encode_planes_layout(
        jnp.asarray(y), jnp.asarray(cb), jnp.asarray(cr), mb_w, mb_h, qk,
        w_out=w_out, interpret=True, win_emit=64, segs=segs)
    if segs == 1:
        got = native.escape_frames(np.asarray(words), np.asarray(bits))
    else:
        got = native.concat_escape_frames(np.asarray(words),
                                          np.asarray(bits), segs)
    return got, want, segs


def test_segmented_encode_320x240_byte_exact():
    # F=1 keeps the interpret-mode run ~3 min; the kernel is
    # lane-parallel so frame count adds no coverage
    got, want, segs = _encode_both(1, 240, 320)
    assert segs == 4
    assert got == want


def test_segmented_encode_96x96_multiseg_byte_exact():
    """Small geometry forced through the segment path (n_mcu=36, segs
    chosen artificially) to exercise boundary DC predictors cheaply."""
    rng = np.random.default_rng(3)
    F, H, W = 2, 96, 96
    mb_w = mb_h = 6                     # 36 MCUs
    y = rng.integers(0, 256, (F, H, W)).astype(np.uint8)
    cb = rng.integers(0, 256, (F, 48, 48)).astype(np.uint8)
    cr = rng.integers(0, 256, (F, 48, 48)).astype(np.uint8)
    lv = np.asarray(encode_transform(jnp.asarray(y), jnp.asarray(cb),
                                     jnp.asarray(cr), mb_w, mb_h, 2))
    want = [huffman_encode_frame(lv[f]) for f in range(F)]
    qk = tuple(int(v) for v in _encoder_quant_qmat_np(2))
    words, bits = encode_planes_layout(
        jnp.asarray(y), jnp.asarray(cb), jnp.asarray(cr), mb_w, mb_h, qk,
        w_out=1024, interpret=True, win_emit=64, segs=3)
    got = native.concat_escape_frames(np.asarray(words), np.asarray(bits), 3)
    assert got == want


def test_complete_chain_hbm_decode_plus_segmented_encode():
    """The full device transcode chain with the HBM-streamed decoder
    (forced via wide zero-padded scan rows) and a segmented re-encode,
    byte-exact vs the host re-encode."""
    from amv_tpu.bitstream.entropy import huffman_decode_frames
    from amv_tpu.pipeline.transcode import (transcode_complete_layout,
                                            transcode_levels_fused)
    from amv_tpu.codecs.amv_video import _unescape_pack

    rng = np.random.default_rng(9)
    F, M = 8, 6                       # 96x96, segs=2 -> 3-MCU segments
    lv = np.zeros((F, M, 6, 64), np.int16)
    lv[..., 0] = rng.integers(-20, 60, (F, M, 6))
    lv[..., 1] = rng.integers(-6, 6, (F, M, 6))
    pays = [huffman_encode_frame(lv[f]) for f in range(F)]
    rows = _unescape_pack(pays)
    # pad rows past the HBM threshold (1536 word rows = 6144 bytes) so
    # the decoder takes the DMA-windowed fetch path
    rows = np.pad(rows, ((0, 0), (0, 6400 - rows.shape[1])))
    qk = tuple(int(v) for v in _encoder_quant_qmat_np(2))
    words, bits = transcode_complete_layout(
        jnp.asarray(rows), M, qk, w_out=128, interpret=True,
        win_fetch=64, win_emit=64, segs=2)
    got = native.concat_escape_frames(np.asarray(words),
                                      np.asarray(bits), 2)
    lvdec = huffman_decode_frames(pays, M)
    lv2 = np.asarray(transcode_levels_fused(jnp.asarray(lvdec), 2)[0])
    want = [huffman_encode_frame(lv2[f]) for f in range(F)]
    assert got == want
