"""Pallas entropy encoder + C framing vs the host encoder: byte-exact."""

import numpy as np
import jax.numpy as jnp

from amv_tpu.bitstream.entropy import huffman_encode_frame
from amv_tpu.kernels.entropy_encode_pallas import encode_scans_pallas
from amv_tpu.native import entropy_native as native


def _roundtrip(lv, w_out=128):
    words, bits = encode_scans_pallas(jnp.asarray(lv), w_out=w_out,
                                      interpret=True)
    got = native.escape_frames(np.asarray(words), np.asarray(bits))
    want = [huffman_encode_frame(lv[f]) for f in range(lv.shape[0])]
    for f, (g, w) in enumerate(zip(got, want)):
        assert g == w, (
            f"frame {f}: {g[:24].hex()}... != {w[:24].hex()}... "
            f"(lens {len(g)}/{len(w)})")


def test_encode_pallas_random():
    rng = np.random.default_rng(11)
    F, n_mcu = 2, 2
    lv = np.zeros((F, n_mcu, 6, 64), np.int16)
    lv[..., 0] = rng.integers(0, 512, (F, n_mcu, 6))
    mask = rng.random((F, n_mcu, 6, 63)) < 0.15
    lv[..., 1:] = np.where(mask, rng.integers(-1000, 1000,
                                              (F, n_mcu, 6, 63)), 0)
    _roundtrip(lv)


def test_encode_pallas_edge_cases():
    F, n_mcu = 3, 2
    lv = np.zeros((F, n_mcu, 6, 64), np.int16)
    lv[..., 0] = 128            # zero DC diff everywhere (EOB-only blocks)
    lv[0, 0, 0, 63] = -5        # last nonzero at 63: no EOB
    lv[0, 0, 1, 40] = 3         # long run: 2 ZRLs + symbol
    lv[1, 0, 2, 0] = -700       # negative DC diff
    lv[1, 0, 3, 1] = -1023      # max magnitude AC
    lv[2, 1, 5, 62] = 1         # run 61: 3 ZRLs
    _roundtrip(lv)


def test_encode_pallas_matches_corpus_levels(sample_amv_bytes):
    from amv_tpu.containers import riff
    from amv_tpu.bitstream.entropy import huffman_decode_frames
    from amv_tpu.codecs.amv_video import decode_transform, encode_transform
    s = riff.demux(sample_amv_bytes)
    payloads = s.video_chunks[:2]
    w, h = s.info.width, s.info.height
    mb_w, mb_h = (w + 15) // 16, (h + 15) // 16
    levels = np.asarray(huffman_decode_frames(payloads, mb_w * mb_h))
    y, cb, cr = decode_transform(jnp.asarray(levels), mb_w, mb_h, w, h)
    lv = np.asarray(encode_transform(y, cb, cr, mb_w, mb_h, 2))
    # the qscale-2 re-encode is larger than the device file's original
    # frames (~3.2 KB scans), so size the output for it
    words, bits = encode_scans_pallas(jnp.asarray(lv), w_out=1024,
                                      interpret=True)
    got = native.escape_frames(np.asarray(words), np.asarray(bits))
    want = [huffman_encode_frame(lv[f]) for f in range(lv.shape[0])]
    assert got == want
