"""Pallas ADPCM encode kernel vs the XLA scan encoder (bit-exact)."""

import numpy as np
import jax.numpy as jnp

from amv_tpu.kernels import adpcm as KA
from amv_tpu.kernels.adpcm_encode_pallas import encode_streams_pallas


def _compare(samples, reset, sidx0):
    nib, sb = KA.encode_samples(jnp.asarray(samples.astype(np.int32)),
                                jnp.asarray(reset),
                                jnp.asarray(sidx0.astype(np.int32)))
    nib, sb = np.asarray(nib), np.asarray(sb)
    want_bytes = ((nib[:, 0::2] << 4) | (nib[:, 1::2] & 0xF)).astype(np.uint8)
    want_sidx = sb[:, 0::2].astype(np.uint8)
    got_b, got_s = encode_streams_pallas(
        jnp.asarray(samples), jnp.asarray(reset), jnp.asarray(sidx0),
        interpret=True)
    np.testing.assert_array_equal(np.asarray(got_b), want_bytes)
    np.testing.assert_array_equal(np.asarray(got_s), want_sidx)


def test_encode_pallas_random():
    rng = np.random.default_rng(3)
    B, n = 5, 600
    samples = rng.integers(-32768, 32768, (B, n)).astype(np.int16)
    reset = np.zeros((B, n), bool)
    reset[:, 0] = True
    reset[:, 250] = True  # mid-stream chunk boundary
    sidx0 = rng.integers(0, 89, B).astype(np.int32)
    _compare(samples, reset, sidx0)


def test_encode_pallas_extremes():
    B, n = 4, 300
    samples = np.zeros((B, n), np.int16)
    samples[0] = 32767          # clamp at +max
    samples[1] = -32768         # clamp at -max
    samples[2, ::2] = 30000     # alternating extremes drive step to 88
    samples[2, 1::2] = -30000
    reset = np.zeros((B, n), bool)
    reset[:, 0] = True
    sidx0 = np.array([0, 88, 44, 0], np.int32)
    _compare(samples, reset, sidx0)


def test_encode_pallas_matches_production_chunks():
    """The Pallas kernel reproduces the production encoder's chunk
    payload bytes and header step indices exactly."""
    from amv_tpu.codecs import amv_audio
    from amv_tpu.verify.fixtures import audiogen
    pcm = np.asarray(audiogen(seconds=0.5, sample_rate=22050), np.int16)
    chunks = amv_audio.encode_stream(pcm, frame_size=1378,
                                     sample_rate=22050)
    n = 2 * sum(len(c) - 8 for c in chunks)
    padded = np.zeros(n, np.int16)
    padded[:len(pcm)] = pcm[:min(len(pcm), n)]
    starts = np.cumsum([0] + [2 * (len(c) - 8) for c in chunks[:-1]])
    reset = np.zeros(n, bool)
    reset[starts] = True
    got_b, got_s = encode_streams_pallas(
        jnp.asarray(padded[None]), jnp.asarray(reset[None]),
        jnp.asarray(np.zeros(1, np.int32)), interpret=True)
    got_b, got_s = np.asarray(got_b[0]), np.asarray(got_s[0])
    pos = 0
    for c in chunks:
        nbytes = len(c) - 8
        hdr_sidx = int.from_bytes(c[2:4], "little")
        assert got_s[pos // 2] == hdr_sidx
        assert got_b[pos // 2: pos // 2 + nbytes].tobytes() == c[8:]
        pos += 2 * nbytes


def test_encode_layout_wrap_matches_tiled():
    """encode_layout_wrap(base, repeat) is bit-identical to encode_layout
    on the materialized chunk-block-tiled input, including a cb >= 2 base
    so the wrapping index map `i % cb` must cycle through DISTINCT
    chunk-blocks (the decode-side r4 ADVICE lesson: cb=1 degenerates to a
    constant map)."""
    from amv_tpu.kernels import adpcm_encode_pallas as KE
    rng = np.random.default_rng(7)
    B, n = 2 * KE.SB * 128, 2 * KE.T_BLOCK
    samples = rng.integers(-32768, 32768, (B, n)).astype(np.int16)
    reset = np.zeros((B, n), bool)
    reset[:, 0] = True
    sidx0 = rng.integers(0, 89, B).astype(np.int32)
    xl, rl, sl = KE.to_layout_enc(jnp.asarray(samples), jnp.asarray(reset),
                                  jnp.asarray(sidx0), interpret=True)
    assert xl.shape[0] == 2           # the wrap period under test
    rep = 2
    ref_b, ref_s = KE.encode_layout(
        jnp.tile(xl, (rep, 1, 1, 1)), jnp.tile(rl, (rep, 1, 1, 1)),
        jnp.tile(sl, (rep, 1, 1)), interpret=True)
    got_b, got_s = KE.encode_layout_wrap(xl, rl, sl, repeat=rep,
                                         interpret=True)
    np.testing.assert_array_equal(np.asarray(got_b), np.asarray(ref_b))
    np.testing.assert_array_equal(np.asarray(got_s), np.asarray(ref_s))
