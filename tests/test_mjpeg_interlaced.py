"""Interlaced MJPEG field tests (mjpegdec.c:263-283 two-field SOF
detection, :339/:712-713 field-interleaved output, :1277-1285 field
pairing inside one packet)."""

import numpy as np
import pytest

from amv_tpu.codecs.mjpeg import (decode_mjpeg_frames,
                                  decode_interlaced_frames,
                                  encode_mjpeg_frames, _image_spans)


def _frames(rng, n, h, w):
    y = rng.integers(0, 256, (n, h, w)).astype(np.uint8)
    cb = rng.integers(0, 256, (n, h // 2, w // 2)).astype(np.uint8)
    cr = rng.integers(0, 256, (n, h // 2, w // 2)).astype(np.uint8)
    return y, cb, cr


def _field_packets(rng, n, fh, w):
    """n packets, each = top-field JPEG + bottom-field JPEG."""
    yt, cbt, crt = _frames(rng, n, fh, w)
    yb, cbb, crb = _frames(rng, n, fh, w)
    top = encode_mjpeg_frames(yt, cbt, crt)
    bot = encode_mjpeg_frames(yb, cbb, crb)
    return [t + b for t, b in zip(top, bot)], (top, bot)


def test_image_spans_walk():
    rng = np.random.default_rng(0)
    pkts, (top, bot) = _field_packets(rng, 1, 16, 32)
    spans = _image_spans(pkts[0])
    assert len(spans) == 2
    s0, s1 = spans
    assert pkts[0][s0[0]:s0[1]] == top[0]
    assert pkts[0][s1[0]:s1[1]] == bot[0]
    # a single image yields one span
    assert len(_image_spans(top[0])) == 1


def test_interlaced_decode_matches_field_oracle():
    """Packet-of-two-fields decode == scalar oracle (decode each field
    separately, row-interleave top on even rows)."""
    rng = np.random.default_rng(1)
    pkts, (top, bot) = _field_packets(rng, 3, 16, 32)
    y, cb, cr = decode_mjpeg_frames(pkts)          # auto-detected
    yt, cbt, crt = decode_mjpeg_frames(top)
    yb, cbb, crb = decode_mjpeg_frames(bot)
    assert y.shape == (3, 32, 32)
    np.testing.assert_array_equal(y[:, 0::2], yt)
    np.testing.assert_array_equal(y[:, 1::2], yb)
    np.testing.assert_array_equal(cb[:, 0::2], cbt)
    np.testing.assert_array_equal(cb[:, 1::2], cbb)
    np.testing.assert_array_equal(cr[:, 0::2], crt)
    np.testing.assert_array_equal(cr[:, 1::2], crb)


def test_interlace_polarity_swaps_fields():
    rng = np.random.default_rng(2)
    pkts, (top, bot) = _field_packets(rng, 2, 8, 16)
    y0, _, _ = decode_interlaced_frames(pkts, interlace_polarity=0)
    y1, _, _ = decode_interlaced_frames(pkts, interlace_polarity=1)
    np.testing.assert_array_equal(y0[:, 0::2], y1[:, 1::2])
    np.testing.assert_array_equal(y0[:, 1::2], y1[:, 0::2])


def test_avi1_polarity_autodetect():
    """interlace_polarity=None reads the buggy-AVID AVI1 APP0 marker
    (mjpegdec.c:890-914): polarity byte 2 = first image is the bottom
    field, so fields swap vs the top-first default."""
    rng = np.random.default_rng(6)
    pkts, _ = _field_packets(rng, 2, 8, 16)

    def tag(jpeg: bytes, pol: int) -> bytes:
        app0 = b"AVI1" + bytes([pol, 0]) + b"\x00" * 8
        seg = b"\xFF\xE0" + (len(app0) + 2).to_bytes(2, "big") + app0
        return jpeg[:2] + seg + jpeg[2:]

    def retag(pkt: bytes, first_pol: int) -> bytes:
        s0, s1 = _image_spans(pkt)
        return (tag(pkt[s0[0]:s0[1]], first_pol)
                + tag(pkt[s1[0]:s1[1]], 3 - first_pol))

    bottom_first = [retag(p, 2) for p in pkts]
    top_first = [retag(p, 1) for p in pkts]
    y_bf, _, _ = decode_interlaced_frames(bottom_first,
                                          interlace_polarity=None)
    y_tf, _, _ = decode_interlaced_frames(top_first,
                                          interlace_polarity=None)
    y0, _, _ = decode_interlaced_frames(pkts, interlace_polarity=0)
    y1, _, _ = decode_interlaced_frames(pkts, interlace_polarity=1)
    np.testing.assert_array_equal(y_tf, y0)
    np.testing.assert_array_equal(y_bf, y1)
    # untagged packets default to top-field-first under auto-detect
    y_plain, _, _ = decode_interlaced_frames(pkts,
                                             interlace_polarity=None)
    np.testing.assert_array_equal(y_plain, y0)


def test_org_height_gate():
    """With an org_height hint, two-image packets only route through
    the interlaced path when field height < 3/4 org_height
    (mjpegdec.c:266-269)."""
    rng = np.random.default_rng(3)
    pkts, _ = _field_packets(rng, 1, 16, 32)
    y, _, _ = decode_mjpeg_frames(pkts, org_height=32)   # 16 < 24
    assert y.shape[1] == 32
    # org_height close to the field height: NOT interlaced; only the
    # first image of the packet is decoded (progressive-download JPEG)
    y2, _, _ = decode_mjpeg_frames(pkts, org_height=17)  # 16 >= 12
    assert y2.shape[1] == 16


def test_avi_mjpg_interlaced_extract():
    """AVI carrying two-field MJPG packets decodes to container-height
    frames through extract_yuv420."""
    from amv_tpu.containers import avi as A
    rng = np.random.default_rng(4)
    pkts, (top, bot) = _field_packets(rng, 2, 8, 32)

    class _St:
        width, height = 32, 16
        bits = 24
        codec = b"MJPG"
        chunks = pkts
    y, cb, cr = A.extract_yuv420(_St())
    assert y.shape == (2, 16, 32) and cb.shape == (2, 8, 16)
    yt, cbt, crt = decode_mjpeg_frames(top)
    np.testing.assert_array_equal(y[:, 0::2], yt)
    np.testing.assert_array_equal(cb[:, 0::2], cbt)
