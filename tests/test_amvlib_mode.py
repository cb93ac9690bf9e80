"""amvlib-compatible decode mode: plausibility + cross-decoder agreement."""

import numpy as np
import pytest

from amv_tpu.containers import riff
from amv_tpu.codecs import amv_video
from amv_tpu.codecs.amvlib_video import decode_frames_amvlib_rgb, AMVLIB_ZIGZAG
from amv_tpu.kernels import color


def test_amvlib_zigzag_bug_preserved():
    # the reference table repeats 37 and omits 31 (AmvJpeg.c:133-143)
    vals, counts = np.unique(AMVLIB_ZIGZAG, return_counts=True)
    assert 31 not in vals
    assert counts[list(vals).index(37)] == 2


def test_amvlib_decode_device_corpus(sample_amv_bytes):
    s = riff.demux(sample_amv_bytes)
    w, h = s.info.width, s.info.height
    rgb_amvlib = decode_frames_amvlib_rgb(s.video_chunks[:3], w, h)
    assert rgb_amvlib.shape == (3, h, w, 3)
    # FFmpeg-path decode of the same frames for comparison
    y, cb, cr = amv_video.decode_frames(s.video_chunks[:3], w, h)
    rgb_ff = color.yuv420_to_rgb(y, cb, cr, mode="amvlib")
    # the two reference implementations use different quant tables
    # (Q75 vs Q60) so outputs differ in scale/detail, but must agree
    # structurally on real content
    a = rgb_amvlib.astype(np.float64).ravel()
    b = rgb_ff.astype(np.float64).ravel()
    c = np.corrcoef(a, b)[0, 1]
    assert c > 0.9, f"amvlib-mode decode diverges from FFmpeg-mode: corr={c}"
