"""Device-side entropy decoder vs the host decoder: bit-exact."""

import numpy as np
import pytest
import jax.numpy as jnp

from amv_tpu.containers import riff
from amv_tpu.bitstream.entropy import huffman_decode_frames
from amv_tpu.verify.ref_jpeg import unescape_scan
from amv_tpu.kernels.entropy_decode import decode_scans_device


def _pack(scans):
    maxb = (max(len(x) for x in scans) + 3) & ~3
    arr = np.zeros((len(scans), maxb), np.uint8)
    for i, x in enumerate(scans):
        arr[i, :len(x)] = np.frombuffer(x, np.uint8)
    return arr


def test_device_entropy_decode_corpus(sample_amv_bytes):
    s = riff.demux(sample_amv_bytes)
    payloads = s.video_chunks[:10]
    want = huffman_decode_frames(payloads, 48)
    arr = _pack([unescape_scan(p[2:-2]) for p in payloads])
    got = np.asarray(decode_scans_device(jnp.asarray(arr), 48))
    np.testing.assert_array_equal(got, want)


def test_device_entropy_decode_own_encoder():
    """Round trip through the device entropy ENCODER output."""
    from amv_tpu.bitstream.entropy import huffman_encode_frame
    rng = np.random.default_rng(41)
    n_mcu = 48
    lv = np.zeros((2, n_mcu, 6, 64), np.int16)
    lv[..., 0] = rng.integers(0, 256, (2, n_mcu, 6))
    mask = rng.random((2, n_mcu, 6, 63)) < 0.15
    lv[..., 1:] = np.where(mask, rng.integers(-200, 200, (2, n_mcu, 6, 63)), 0)
    payloads = [huffman_encode_frame(lv[f]) for f in range(2)]
    want = huffman_decode_frames(payloads, n_mcu)
    arr = _pack([unescape_scan(p[2:-2]) for p in payloads])
    got = np.asarray(decode_scans_device(jnp.asarray(arr), n_mcu))
    np.testing.assert_array_equal(got, want)


def test_decode_frames_device_entropy_path(sample_amv_bytes):
    from amv_tpu.codecs import amv_video
    s = riff.demux(sample_amv_bytes)
    w, h = s.info.width, s.info.height
    a = amv_video.decode_frames(s.video_chunks[:4], w, h)
    b = amv_video.decode_frames(s.video_chunks[:4], w, h, device_entropy=True)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
