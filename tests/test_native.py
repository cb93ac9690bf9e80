"""Native C entropy codec vs the Python oracle: byte/level equality."""

import numpy as np
import pytest

from amv_tpu.containers import riff
from amv_tpu.verify import ref_adpcm, ref_jpeg

native = pytest.importorskip("amv_tpu.native.entropy_native")


def test_native_decode_matches_python(sample_amv_bytes):
    s = riff.demux(sample_amv_bytes)
    w, h = s.info.width, s.info.height
    n_mcu = ((w + 15) // 16) * ((h + 15) // 16)
    payloads = s.video_chunks[:6]
    got = native.decode_frames(payloads, n_mcu)
    for f, p in enumerate(payloads):
        scan = ref_jpeg.unescape_scan(p[2:-2])
        want = ref_jpeg.huffman_decode_scan(scan, n_mcu).astype(np.int16)
        np.testing.assert_array_equal(got[f], want, err_msg=f"frame {f}")


def test_native_encode_matches_python():
    rng = np.random.default_rng(23)
    h, w = 96, 128
    yy, xx = np.mgrid[0:h, 0:w]
    y = (128 + 70 * np.sin(xx / 6.0) * np.cos(yy / 8.0)).astype(np.uint8)
    cb = (128 + 45 * np.sin(xx[::2, ::2] / 10.0)).astype(np.uint8)
    cr = (128 + 45 * np.cos(yy[::2, ::2] / 12.0)).astype(np.uint8)
    want = ref_jpeg.encode_frame(y, cb, cr)
    got = native.ref_encode_frame(y, cb, cr, qscale=2)
    assert got == want


def test_native_ref_decode_matches_oracle(sample_amv_bytes):
    s = riff.demux(sample_amv_bytes)
    w, h = s.info.width, s.info.height
    p = s.video_chunks[0]
    gy, gcb, gcr = native.ref_decode_frame(p, w, h)
    wy, wcb, wcr = ref_jpeg.decode_frame(p, w, h)
    np.testing.assert_array_equal(gy, wy)
    np.testing.assert_array_equal(gcb, wcb)
    np.testing.assert_array_equal(gcr, wcr)


def test_native_adpcm_matches_oracle(sample_amv_bytes):
    s = riff.demux(sample_amv_bytes)
    c = s.audio_chunks[0]
    import struct
    pred = struct.unpack_from("<h", c, 0)[0]
    sidx = struct.unpack_from("<H", c, 2)[0]
    got = native.ref_adpcm_decode(c[8:], pred, sidx)
    want = ref_adpcm.decode_chunk(c)
    np.testing.assert_array_equal(got, want)


def test_native_entropy_roundtrip():
    rng = np.random.default_rng(29)
    n_mcu = 48
    levels = np.zeros((n_mcu, 6, 64), dtype=np.int16)
    levels[:, :, 0] = rng.integers(0, 256, (n_mcu, 6))
    mask = rng.random((n_mcu, 6, 63)) < 0.2
    vals = rng.integers(-200, 200, (n_mcu, 6, 63))
    levels[:, :, 1:] = np.where(mask, vals, 0)
    payload = native.encode_frame(levels)
    dec = native.decode_frames([payload], n_mcu)[0]
    # decode yields DC *diffs*; rebuild values to compare
    rebuilt = dec.astype(np.int64)
    dc_y = np.cumsum(rebuilt[:, :4, 0].reshape(-1)) + 128
    rebuilt[:, :4, 0] = dc_y.reshape(n_mcu, 4)
    rebuilt[:, 4, 0] = np.cumsum(rebuilt[:, 4, 0]) + 128
    rebuilt[:, 5, 0] = np.cumsum(rebuilt[:, 5, 0]) + 128
    np.testing.assert_array_equal(rebuilt, levels.astype(np.int64))
