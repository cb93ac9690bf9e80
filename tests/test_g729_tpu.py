"""Batched JAX G.729A decoder vs the scalar reference: bit-exact."""

import numpy as np
import pytest

from amv_tpu.codecs import g729a
from amv_tpu.verify.ref_g729 import G729Decoder

from test_g729 import make_frame


def _streams(rng, T, B, erasures=(), bad_parity=(), high_pitch=()):
    frames = np.zeros((T, B, 10), np.uint8)
    for b in range(B):
        for t in range(T):
            if (t, b) in erasures:
                continue
            kw = {}
            if (t, b) in bad_parity:
                kw["bad_parity"] = True
            if (t, b) in high_pitch:
                kw["p1_range"] = (197, 256)
            frames[t, b] = np.frombuffer(make_frame(rng, **kw), np.uint8)
    return frames


def _check(frames):
    got = g729a.decode_streams(frames)
    T, B = frames.shape[:2]
    for b in range(B):
        dec = G729Decoder()
        want = np.concatenate(
            [dec.decode_frame(frames[t, b].tobytes()) for t in range(T)])
        np.testing.assert_array_equal(got[b], want, err_msg=f"stream {b}")


def test_batch_bit_exact_basic():
    rng = np.random.default_rng(21)
    _check(_streams(rng, T=10, B=4))


def test_batch_bit_exact_erasures_and_edge_cases():
    rng = np.random.default_rng(22)
    frames = _streams(
        rng, T=16, B=4,
        erasures={(5, 0), (6, 0), (9, 2)},
        bad_parity={(3, 1), (12, 3)},
        high_pitch={(2, 2), (8, 1)})
    _check(frames)


def test_unpack_frames_matches_scalar():
    from amv_tpu.verify.ref_g729 import bytes2parm
    rng = np.random.default_rng(23)
    frames = _streams(rng, T=3, B=2)
    parms = g729a.unpack_frames(frames)
    for t in range(3):
        for b in range(2):
            p, er = bytes2parm(frames[t, b].tobytes())
            assert parms[t, b, 15] == (1 if er else 0)
            assert parms[t, b, 0] == p["ma_predictor"]
            assert parms[t, b, 5] == p["ac_index"][0]
            assert parms[t, b, 6] == p["ac_index"][1]
            assert parms[t, b, 7] == p["fc_indexes"][0]
            assert parms[t, b, 8] == p["fc_indexes"][1]
            assert parms[t, b, 14] == p["gb_cb_index"][1]


def test_decode_scan_equals_chunk_chain():
    """decode_frames_scan (one dispatch) is bit-identical to the
    unrolled _decode_chain pipeline, state included."""
    import jax.numpy as jnp
    rng = np.random.default_rng(31)
    T, B = 16, 4
    frames = _streams(rng, T=T, B=B)
    parms = jnp.asarray(g729a.unpack_frames(frames))
    st1 = g729a.init_state(B)
    outs = []
    for t0 in range(0, T, g729a.DECODE_CHUNK):
        st1, pcm = g729a._decode_chain(
            st1, parms[t0:t0 + g729a.DECODE_CHUNK])
        outs.append(np.asarray(pcm))
    st2 = g729a.init_state(B)
    st2, pcm2 = g729a.decode_frames_scan(st2, parms)
    np.testing.assert_array_equal(np.asarray(pcm2),
                                  np.concatenate(outs, axis=0))
    for k in st1:
        np.testing.assert_array_equal(np.asarray(st1[k]),
                                      np.asarray(st2[k]), err_msg=k)
