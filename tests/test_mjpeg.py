"""Standard MJPEG decode (parsed tables) vs the AMV path."""

import numpy as np
import pytest

from amv_tpu.bitstream.jpeg_tables import canned_jpeg_header
from amv_tpu.bitstream.jpeg_parse import parse_jpeg
from amv_tpu.codecs.mjpeg import decode_mjpeg_frames
from amv_tpu.containers import riff
from amv_tpu.codecs import amv_video


def _canonical_jpegs(sample_amv_bytes, n=3):
    s = riff.demux(sample_amv_bytes)
    w, h = s.info.width, s.info.height
    hdr = canned_jpeg_header(w, h)
    return [hdr + p[2:-2] + b"\xFF\xD9" for p in s.video_chunks[:n]], s, w, h


def test_parse_jpeg(sample_amv_bytes):
    jpegs, s, w, h = _canonical_jpegs(sample_amv_bytes, 1)
    f = parse_jpeg(jpegs[0])
    assert (f.width, f.height) == (w, h)
    assert f.is_420_3c
    assert 0 in f.quant and 1 in f.quant
    assert len(f.huff) == 4
    assert f.scan_components == [(0, 0, 0), (1, 1, 1), (2, 1, 1)]


def test_mjpeg_decode_matches_amv_path(sample_amv_bytes):
    """The canonical JPEG rewrap of AMV frames must decode to exactly the
    flip of the AMV decode (same tables, same scan, no flip)."""
    jpegs, s, w, h = _canonical_jpegs(sample_amv_bytes, 3)
    y, cb, cr = decode_mjpeg_frames(jpegs)
    ya, cba, cra = amv_video.decode_frames(s.video_chunks[:3], w, h)
    np.testing.assert_array_equal(y, ya[:, ::-1])
    np.testing.assert_array_equal(cb, cba[:, ::-1])
    np.testing.assert_array_equal(cr, cra[:, ::-1])


def test_mjpeg_custom_tables(sample_amv_bytes):
    """Non-K.3 path: rewrite a frame with modified quant tables and ensure
    the parsed-table decode honors them."""
    jpegs, s, w, h = _canonical_jpegs(sample_amv_bytes, 1)
    f = parse_jpeg(jpegs[0])
    # double the luma quant table inside the DQT segment
    data = bytearray(jpegs[0])
    dqt_off = data.find(b"\xFF\xDB") + 5
    orig = bytes(data[dqt_off:dqt_off + 64])
    data[dqt_off:dqt_off + 64] = bytes(min(255, 2 * b) for b in orig)
    y2, _, _ = decode_mjpeg_frames([bytes(data)])
    y1, _, _ = decode_mjpeg_frames([jpegs[0]])
    assert not np.array_equal(y1, y2)  # parsed tables actually applied
    assert y2.shape == y1.shape
    # the modified tables change many pixels, and both decodes stay valid
    assert (y1 != y2).mean() > 0.1


def test_jpeg_encode_roundtrip():
    """Self-consistent standard JPEG encode: with matching tables (unlike
    the AMV format's mismatched pair) the roundtrip is near-lossless."""
    from amv_tpu.codecs.mjpeg import encode_mjpeg_frames
    from amv_tpu.verify.fixtures import videogen
    y, cb, cr = videogen(2, 96, 128)
    jpegs = encode_mjpeg_frames(y, cb, cr)
    assert all(j[:2] == b"\xFF\xD8" and j[-2:] == b"\xFF\xD9" for j in jpegs)
    y2, cb2, cr2 = decode_mjpeg_frames(jpegs)
    rmse = np.sqrt(((y2.astype(float) - y.astype(float)) ** 2).mean())
    assert rmse < 3.0, f"roundtrip rmse {rmse}"
