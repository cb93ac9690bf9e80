"""Pallas ADPCM decode kernel vs the XLA scan kernel (bit-exact)."""

import numpy as np
import jax.numpy as jnp

from amv_tpu.kernels import adpcm as KA
from amv_tpu.kernels import adpcm_pallas as KP


def _random_case(rng, c, nb):
    payload = rng.integers(0, 256, (c, nb), dtype=np.uint8)
    pred = rng.integers(-32768, 32768, (c,), dtype=np.int64).astype(np.int32)
    sidx = rng.integers(0, 89, (c,), dtype=np.int64).astype(np.int32)
    return payload, pred, sidx


def test_pallas_matches_scan_random():
    rng = np.random.default_rng(7)
    payload, pred, sidx = _random_case(rng, 5, 300)
    ref = np.asarray(KA.decode_chunks(
        jnp.asarray(payload), jnp.asarray(pred), jnp.asarray(sidx)))
    got = np.asarray(KP.decode_chunks_pallas(
        jnp.asarray(payload), jnp.asarray(pred), jnp.asarray(sidx),
        interpret=True))
    np.testing.assert_array_equal(got, ref)


def test_pallas_clamp_stress():
    # all-0x77 drives the predictor into the +32767 clamp, all-0xFF into
    # -32768 with the step index pinned at 88.
    c = 3
    payload = np.stack([np.full(200, 0x77, np.uint8),
                        np.full(200, 0xFF, np.uint8),
                        np.zeros(200, np.uint8)])
    pred = np.array([32000, -32000, 0], np.int32)
    sidx = np.array([88, 88, 0], np.int32)
    ref = np.asarray(KA.decode_chunks(
        jnp.asarray(payload), jnp.asarray(pred), jnp.asarray(sidx)))
    got = np.asarray(KP.decode_chunks_pallas(
        jnp.asarray(payload), jnp.asarray(pred), jnp.asarray(sidx),
        interpret=True))
    np.testing.assert_array_equal(got, ref)


def test_pallas_corpus_chunks(sample_amv_path):
    from amv_tpu.containers import riff

    achunks = riff.read(sample_amv_path).audio_chunks
    maxlen = max(len(c) - 8 for c in achunks)
    c = len(achunks)
    payload = np.zeros((c, maxlen), np.uint8)
    pred = np.zeros(c, np.int32)
    sidx = np.zeros(c, np.int32)
    for i, ch in enumerate(achunks):
        b = np.frombuffer(ch, np.uint8)
        payload[i, :len(b) - 8] = b[8:]
        pred[i] = int(np.frombuffer(ch[:2], '<i2')[0])
        sidx[i] = int(np.frombuffer(ch[2:4], '<u2')[0])
    ref = np.asarray(KA.decode_chunks(
        jnp.asarray(payload), jnp.asarray(pred), jnp.asarray(sidx)))
    got = np.asarray(KP.decode_chunks_pallas(
        jnp.asarray(payload), jnp.asarray(pred), jnp.asarray(sidx),
        interpret=True))
    np.testing.assert_array_equal(got, ref)


def test_decode_layout_wrap_matches_tiled():
    """decode_layout_wrap(base, repeat) is bit-identical to decode_layout
    on the materialized chunk-block-tiled input (its documented
    contract)."""
    rng = np.random.default_rng(11)
    payload, pred, sidx = _random_case(rng, 7, 256)
    bts, pr, si = KP.to_layout(
        jnp.asarray(payload), jnp.asarray(pred), jnp.asarray(sidx),
        interpret=True)
    rep = 3
    ref = np.asarray(KP.decode_layout(
        jnp.tile(bts, (rep, 1, 1, 1)), jnp.tile(pr, (rep, 1, 1)),
        jnp.tile(si, (rep, 1, 1)), interpret=True))
    got = np.asarray(KP.decode_layout_wrap(bts, pr, si, repeat=rep,
                                           interpret=True))
    np.testing.assert_array_equal(got, ref)


def test_decode_layout_wrap_multiblock_base():
    """cb >= 2: the wrapping index map `i % cb` must cycle through
    DISTINCT chunk-blocks (r4 ADVICE: the cb=1 case above degenerates to
    a constant map, so any index map would pass it).  2*SB*128 chunks
    with distinct payload/pred/sidx per block, short streams to keep
    interpret-mode cost down."""
    rng = np.random.default_rng(23)
    payload, pred, sidx = _random_case(rng, 2 * KP.SB * 128, KP.T_BLOCK)
    bts, pr, si = KP.to_layout(
        jnp.asarray(payload), jnp.asarray(pred), jnp.asarray(sidx),
        interpret=True)
    assert bts.shape[0] == 2          # the wrap period under test
    rep = 2
    ref = np.asarray(KP.decode_layout(
        jnp.tile(bts, (rep, 1, 1, 1)), jnp.tile(pr, (rep, 1, 1)),
        jnp.tile(si, (rep, 1, 1)), interpret=True))
    got = np.asarray(KP.decode_layout_wrap(bts, pr, si, repeat=rep,
                                           interpret=True))
    np.testing.assert_array_equal(got, ref)
