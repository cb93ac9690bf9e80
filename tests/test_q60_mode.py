"""Device-consistent "q60" encode mode (r4 verdict item 4).

The reference's encoder quantizes with the MPEG-1 intra matrix x qscale
(mpegvideo_enc.c:2866-2876) while BOTH its decoders dequantize with
fixed tables (sp5x.h:187-195 Q60 pair / AmvJpeg.c:30-61), which is the
unfinished bug AMVmuxer/README:14-19 describes ("compare to
hole_correct.amv and fix those bugs"): faithful re-encodes land at
~19 dB.  quant="q60" closes the loop by quantizing with the very tables
the decoder will use.  Contract: >=30 dB Y round trips on the corpus,
and bitstreams that remain valid for the C reference decoder.
"""

import numpy as np
import pytest

from amv_tpu.codecs import amv_video as AV
from amv_tpu.containers import riff


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return np.inf
    return 10 * np.log10(255.0 ** 2 / mse)


@pytest.fixture(scope="module")
def corpus(sample_amv_bytes):
    s = riff.demux(sample_amv_bytes)
    w, h = s.info.width, s.info.height
    y, cb, cr = AV.decode_frames(s.video_chunks[:12], w, h)
    return s, y, cb, cr


def test_q60_roundtrip_psnr(corpus):
    s, y, cb, cr = corpus
    w, h = s.info.width, s.info.height
    pay = AV.encode_frames(y, cb, cr, quant="q60")
    y2, cb2, cr2 = AV.decode_frames(pay, w, h)
    py, pu, pv = _psnr(y, y2), _psnr(cb, cb2), _psnr(cr, cr2)
    assert py >= 30.0, f"q60 Y roundtrip {py:.2f} dB < 30"
    assert pu >= 30.0 and pv >= 30.0
    # the faithful mode stays faithful (and therefore bad): the gap is
    # the whole point of the q60 mode
    pay_ff = AV.encode_frames(y, cb, cr, qscale=2)
    y3, _, _ = AV.decode_frames(pay_ff, w, h)
    assert _psnr(y, y3) < 25.0, "ffmpeg mode unexpectedly consistent?"


def test_q60_bitstream_valid_for_c_reference(corpus):
    """q60 payloads decode through the independent C reference decoder
    (native.ref_decode_frame) to the same planes as the repo decoder."""
    s, y, cb, cr = corpus
    w, h = s.info.width, s.info.height
    from amv_tpu.native import entropy_native as native
    pay = AV.encode_frames(y[:4], cb[:4], cr[:4], quant="q60")
    y2, cb2, cr2 = AV.decode_frames(pay, w, h)
    for f, p in enumerate(pay):
        yr, cbr, crr = native.ref_decode_frame(p, w, h)
        np.testing.assert_array_equal(y2[f], yr)
        np.testing.assert_array_equal(cb2[f], cbr)
        np.testing.assert_array_equal(cr2[f], crr)


def test_q60_transcode_bytes(corpus, sample_amv_bytes):
    """CLI-shape transcode with quant=q60: container re-muxes, audio is
    untouched, video re-decodes at >=30 dB vs the source decode."""
    from amv_tpu.pipeline.transcode import transcode_bytes
    s, y, cb, cr = corpus
    w, h = s.info.width, s.info.height
    out = transcode_bytes(sample_amv_bytes, quant="q60")
    s2 = riff.demux(out)
    assert s2.audio_chunks == s.audio_chunks
    assert len(s2.video_chunks) == len(s.video_chunks)
    y2, _, _ = AV.decode_frames(s2.video_chunks[:12], w, h)
    assert _psnr(y, y2) >= 30.0


def test_q60_dc_chain_extremes():
    """Flat frames at luma extremes: the DC chain (last_dc=128 encode
    predictor vs the decoder's 1024 + cumsum*q0) must stay consistent
    at the clip rails, across many MCUs."""
    w, h = 48, 32
    for val in (0, 255, 128, 13):
        y = np.full((2, h, w), val, np.uint8)
        cb = np.full((2, h // 2, w // 2), 255 - val, np.uint8)
        cr = np.full((2, h // 2, w // 2), val, np.uint8)
        pay = AV.encode_frames(y, cb, cr, quant="q60")
        y2, cb2, cr2 = AV.decode_frames(pay, w, h)
        assert abs(int(y2.astype(np.int32).mean()) - val) <= 2
        assert abs(int(cb2.astype(np.int32).mean()) - (255 - val)) <= 2
        assert abs(int(cr2.astype(np.int32).mean()) - val) <= 2
