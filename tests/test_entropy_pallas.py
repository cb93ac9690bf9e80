"""Pallas entropy decoder vs the host decoder: bit-exact (interpret mode)."""

import numpy as np
import jax.numpy as jnp

from amv_tpu.containers import riff
from amv_tpu.bitstream.entropy import huffman_decode_frames
from amv_tpu.verify.ref_jpeg import unescape_scan
from amv_tpu.kernels.entropy_decode_pallas import decode_scans_pallas


def _pack(scans):
    maxb = (max(len(x) for x in scans) + 3) & ~3
    arr = np.zeros((len(scans), maxb), np.uint8)
    for i, x in enumerate(scans):
        arr[i, :len(x)] = np.frombuffer(x, np.uint8)
    return arr


def test_pallas_entropy_decode_corpus(sample_amv_bytes):
    # interpret mode is slow (per-op emulation of the masked fetches),
    # so decode only the first 8 MCUs of real corpus scans — a valid
    # prefix decode — and compare against the host decode's prefix.
    s = riff.demux(sample_amv_bytes)
    payloads = s.video_chunks[:3]
    want = np.asarray(huffman_decode_frames(payloads, 48))[:, :4]
    arr = _pack([unescape_scan(p[2:-2]) for p in payloads])
    # 4 MCUs consume only the first few hundred scan bytes; truncating
    # the padded rows shrinks the interpret-mode fetch 6x
    got = np.asarray(decode_scans_pallas(jnp.asarray(arr[:, :512]), 4,
                                         interpret=True))
    np.testing.assert_array_equal(got, want)


def test_pallas_entropy_decode_windowed_fetch(sample_amv_bytes):
    # full-width rows (W=724 > WIN) force the min-cursor windowed fetch
    # path; 2-MCU prefix keeps interpret-mode cost down
    s = riff.demux(sample_amv_bytes)
    payloads = s.video_chunks[:2]
    want = np.asarray(huffman_decode_frames(payloads, 48))[:, :2]
    arr = _pack([unescape_scan(p[2:-2]) for p in payloads])
    assert arr.shape[1] // 4 > 256
    got = np.asarray(decode_scans_pallas(jnp.asarray(arr), 2,
                                         interpret=True))
    np.testing.assert_array_equal(got, want)


def test_pallas_entropy_decode_synthetic():
    """Round trip through the host entropy encoder: stresses long runs,
    ZRL, EOB-less blocks (coef at 63), and large magnitudes."""
    from amv_tpu.bitstream.entropy import huffman_encode_frame
    rng = np.random.default_rng(5)
    n_mcu = 6
    lv = np.zeros((3, n_mcu, 6, 64), np.int16)
    lv[..., 0] = rng.integers(-500, 500, (3, n_mcu, 6))
    mask = rng.random((3, n_mcu, 6, 63)) < 0.1
    lv[..., 1:] = np.where(mask, rng.integers(-1000, 1000,
                                              (3, n_mcu, 6, 63)), 0)
    lv[0, 0, 0, 63] = 7     # block ending on coefficient 63 (no EOB)
    lv[0, 1, 2, 1:] = 0     # DC-only block (immediate EOB)
    lv[1, 2, 3, 40] = 3     # forces ZRL (run of 38 zeros)
    payloads = [huffman_encode_frame(lv[f]) for f in range(3)]
    want = huffman_decode_frames(payloads, n_mcu)
    arr = _pack([unescape_scan(p[2:-2]) for p in payloads])
    got = np.asarray(decode_scans_pallas(jnp.asarray(arr), n_mcu,
                                         interpret=True))
    np.testing.assert_array_equal(got, np.asarray(want))
