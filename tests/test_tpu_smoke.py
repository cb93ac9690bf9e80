"""Opt-in real-TPU smoke tests: compiled Mosaic behavior of the flagship
kernels, byte-exact against the C reference.

Every other Pallas test in this suite runs in interpret mode on the
forced CPU mesh (conftest.py), so a Mosaic-only regression would
otherwise surface only at bench time.  Run with:

    AMV_TPU_SMOKE=1 python -m pytest tests/test_tpu_smoke.py -x -q

Kept to two jit programs: remote TPU compiles cost 1-3 min each in this
environment (memory/axon-tpu-environment.md).
"""

import os
import struct

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("AMV_TPU_SMOKE") != "1",
    reason="real-TPU smoke tests are opt-in (AMV_TPU_SMOKE=1)")


@pytest.fixture(scope="module")
def tpu():
    import jax
    if jax.default_backend() == "cpu":
        pytest.skip("no accelerator backend available")
    return jax


def test_complete_transcode_byte_exact(tpu, sample_amv_bytes):
    """Both entropy stages + the fused transform on device, compiled
    Mosaic, payload bytes equal to the host C re-encode (same gate as
    bench.py's K=1 check)."""
    import jax.numpy as jnp
    from amv_tpu.containers import riff
    from amv_tpu.bitstream.entropy import (huffman_decode_frames,
                                           huffman_encode_frame)
    from amv_tpu.codecs.amv_video import (_encoder_quant_qmat_np,
                                          decode_transform, encode_transform)
    from amv_tpu.native import entropy_native as native
    from amv_tpu.pipeline.transcode import transcode_complete_layout

    s = riff.demux(sample_amv_bytes)
    payloads = s.video_chunks
    w, h = s.info.width, s.info.height
    mb_w, mb_h = (w + 15) // 16, (h + 15) // 16
    M = mb_w * mb_h
    qk = tuple(int(v) for v in _encoder_quant_qmat_np(2))

    # host truth: decode -> transform -> re-encode via the C-exact host path
    levels = huffman_decode_frames(payloads, M)
    y, cb, cr = decode_transform(jnp.asarray(levels), mb_w, mb_h, w, h)
    lv_enc = np.asarray(encode_transform(y, cb, cr, mb_w, mb_h, 2))
    want = [huffman_encode_frame(lv_enc[f]) for f in range(len(payloads))]

    rows, _ = native.unescape_frames(payloads)
    lens = np.array([len(p) for p in payloads])
    order = np.argsort(lens, kind="stable")
    inv = np.argsort(order)
    words, bits = transcode_complete_layout(
        jnp.asarray(rows[order]), M, qk, w_out=1024,
        win_fetch=64, win_emit=64)
    got = native.escape_frames(np.asarray(words)[inv], np.asarray(bits)[inv])
    assert got == want

    # the round-3 lane-async chain (bench headline), same gate
    from amv_tpu.pipeline.transcode import transcode_complete_async
    words_a, bits_a, ok = transcode_complete_async(
        jnp.asarray(rows[order]), M, qk, w_out=1024,
        win_fetch=64, win_emit=64, enc="async")
    assert bool(ok)
    got_a = native.escape_frames(np.asarray(words_a)[inv],
                                 np.asarray(bits_a)[inv])
    assert got_a == want


def test_adpcm_decode_bit_exact(tpu, sample_amv_bytes):
    """Compiled Mosaic ADPCM decode equals the C reference per sample."""
    import jax.numpy as jnp
    from amv_tpu.containers import riff
    from amv_tpu.kernels import adpcm_pallas as KP
    from amv_tpu.native import entropy_native as native

    chunks = riff.demux(sample_amv_bytes).audio_chunks[:8]
    maxlen = max(len(c) - 8 for c in chunks)
    payload = np.zeros((len(chunks), maxlen), np.uint8)
    pred = np.zeros(len(chunks), np.int32)
    sidx = np.zeros(len(chunks), np.int32)
    for i, ch in enumerate(chunks):
        b = np.frombuffer(ch, np.uint8)
        payload[i, :len(b) - 8] = b[8:]
        pred[i] = struct.unpack_from("<h", ch, 0)[0]
        sidx[i] = min(struct.unpack_from("<H", ch, 2)[0], 88)
    got = np.asarray(KP.decode_chunks_pallas(
        jnp.asarray(payload), jnp.asarray(pred), jnp.asarray(sidx)))
    for i, ch in enumerate(chunks):
        n = len(ch) - 8
        ref = np.frombuffer(
            native.ref_adpcm_decode(ch[8:], int(pred[i]), int(sidx[i])),
            np.int16)
        assert np.array_equal(got[i, :len(ref)], ref), f"chunk {i}"
