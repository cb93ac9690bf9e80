"""Generic MJPEG: restart markers, 4:2:2 / 4:4:4 / grayscale sampling.

Round-trip strategy: our own generalized encoder (mjpeg.py
encode_mjpeg_frames with subsampling/restart_interval) produces streams
that the decode path (C fast decoder + device transform) must reproduce
bit-exactly against the scalar Python oracle (_decode_scan_generic +
the same transform), and — for the no-restart case — against the
restart-free encode of identical input, since RST/DRI only re-frames
the entropy stream without changing coefficients.
"""

import numpy as np
import pytest

from amv_tpu.bitstream.jpeg_parse import parse_jpeg
from amv_tpu.codecs.mjpeg import (decode_mjpeg_frames, encode_mjpeg_frames,
                                  _decode_scan_generic, _layout_of)
from amv_tpu.verify import ref_jpeg as R


def _frames(rng, F, H, W, layout):
    y = rng.integers(0, 256, (F, H, W)).astype(np.uint8)
    if layout == "gray":
        return y, None, None
    if layout == "444":
        ch, cw = H, W
    elif layout == "422":
        ch, cw = H, W // 2
    else:
        ch, cw = H // 2, W // 2
    cb = rng.integers(0, 256, (F, ch, cw)).astype(np.uint8)
    cr = rng.integers(0, 256, (F, ch, cw)).astype(np.uint8)
    return y, cb, cr


@pytest.mark.parametrize("layout", ["420", "422", "444", "gray"])
def test_sampling_roundtrip_bit_exact(layout):
    """Encode at each sampling, decode, and compare against a scalar
    decode of the same stream (C decoder vs Python oracle must agree
    bit-exactly on every pixel)."""
    rng = np.random.default_rng(42)
    F, H, W = 2, 24, 40
    y, cb, cr = _frames(rng, F, H, W, layout)
    jpegs = encode_mjpeg_frames(y, cb, cr, subsampling=layout)
    yd, cbd, crd = decode_mjpeg_frames(jpegs)
    assert yd.shape[0] == F and yd.shape[1] == H and yd.shape[2] == W
    if layout == "gray":
        assert cbd is None and crd is None
    elif layout == "444":
        assert cbd.shape[1:] == (H, W)
    elif layout == "422":
        assert cbd.shape[1:] == (H, W // 2)
    else:
        assert cbd.shape[1:] == (H // 2, W // 2)

    # scalar-oracle equality: Python generic Huffman decode must produce
    # the same levels the C path consumed
    f = parse_jpeg(jpegs[0])
    _, nb, mcu_w, mcu_h = _layout_of(f)
    n_mcu = ((W + mcu_w - 1) // mcu_w) * ((H + mcu_h - 1) // mcu_h)
    lv_py = _decode_scan_generic(R.unescape_scan(f.scan), n_mcu, f)
    from amv_tpu.native import entropy_native as native
    pairs = [(d, a) for (_, d, a, _) in f.mcu_blocks()]
    lv_c = native.decode_scans_custom([f.scan], n_mcu, f.huff, pairs,
                                      restart_interval=f.restart_interval)
    np.testing.assert_array_equal(lv_py, lv_c[0])


@pytest.mark.parametrize("layout,ri", [("420", 3), ("422", 2), ("444", 5),
                                       ("gray", 1), ("420", 7)])
def test_restart_markers_bit_exact(layout, ri):
    """A DRI/RST stream must decode to exactly the same pixels as the
    restart-free encode of the same input (restart markers only re-frame
    the entropy stream), via both the C decoder and the Python oracle."""
    rng = np.random.default_rng(7)
    F, H, W = 2, 24, 40
    y, cb, cr = _frames(rng, F, H, W, layout)
    plain = encode_mjpeg_frames(y, cb, cr, subsampling=layout)
    rst = encode_mjpeg_frames(y, cb, cr, subsampling=layout,
                              restart_interval=ri)
    assert rst[0] != plain[0]
    f = parse_jpeg(rst[0])
    assert f.restart_interval == ri
    _, nb0, mw0, mh0 = _layout_of(f)
    n_mcu0 = ((W + mw0 - 1) // mw0) * ((H + mh0 - 1) // mh0)
    if n_mcu0 > ri:
        # RST markers actually present in the scan
        assert any(bytes([0xFF, 0xD0 + k]) in f.scan for k in range(8))

    got = decode_mjpeg_frames(rst)
    want = decode_mjpeg_frames(plain)
    for g, w in zip(got, want):
        if g is None:
            assert w is None
        else:
            np.testing.assert_array_equal(g, w)

    # Python oracle agrees with the C decoder on the restart stream
    _, nb, mcu_w, mcu_h = _layout_of(f)
    n_mcu = ((W + mcu_w - 1) // mcu_w) * ((H + mcu_h - 1) // mcu_h)
    lv_py = _decode_scan_generic(R.unescape_scan(f.scan), n_mcu, f)
    from amv_tpu.native import entropy_native as native
    pairs = [(d, a) for (_, d, a, _) in f.mcu_blocks()]
    lv_c = native.decode_scans_custom([f.scan], n_mcu, f.huff, pairs,
                                      restart_interval=ri)
    np.testing.assert_array_equal(lv_py, lv_c[0])


def test_unescape_keeps_rst_markers():
    data = bytes([0x12, 0xFF, 0x00, 0x34, 0xFF, 0xD3, 0x56, 0xFF, 0xD9])
    out = R.unescape_scan(data)
    # stuffing removed, RST kept, stops BEFORE the EOI's FF prefix
    # (mjpegdec.c:1181 t -= 2)
    assert out == bytes([0x12, 0xFF, 0x34, 0xFF, 0xD3, 0x56])
    # a bare trailing FF with no marker byte after it stays
    assert R.unescape_scan(bytes([0x12, 0xFF])) == bytes([0x12, 0xFF])


def test_decode_rejects_unsupported_sampling():
    rng = np.random.default_rng(3)
    y, cb, cr = _frames(rng, 1, 16, 16, "420")
    jpeg = bytearray(encode_mjpeg_frames(y, cb, cr)[0])
    sof = jpeg.find(b"\xFF\xC0")
    jpeg[sof + 11] = 0x41  # h=4, v=1 sampling
    with pytest.raises(ValueError, match="sampling"):
        decode_mjpeg_frames([bytes(jpeg)])
