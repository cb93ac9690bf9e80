"""Batched TPU G.729A encoder: quality + exact decoder-state tracking."""

import numpy as np
import jax.numpy as jnp

from amv_tpu.codecs import g729a as G
from amv_tpu.codecs.g729a_encoder_tpu import (FRAME, PITCH_MAX,
                                              encode_frame_batch,
                                              encode_streams_tpu)
from amv_tpu.verify.ref_g729 import G729Decoder
from test_g729_encoder import _speechlike


def _metrics(sig, frames, b):
    dec = G729Decoder()
    out = np.concatenate([dec.decode_frame(frames[f, b].tobytes())
                          for f in range(frames.shape[0])])
    a = out[400:len(sig)].astype(float)
    r = sig[400:len(sig)].astype(float)
    c = np.corrcoef(a, r)[0, 1]
    segs = []
    for s0 in range(0, len(a) - 160, 160):
        e = ((a[s0:s0 + 160] - r[s0:s0 + 160]) ** 2).mean()
        p = (r[s0:s0 + 160] ** 2).mean()
        if p > 1e4:
            segs.append(10 * np.log10(max(p, 1) / max(e, 1)))
    return c, float(np.mean(segs))


def test_tpu_encoder_quality_multistream():
    sigs = np.stack([_speechlike(2400, seed=s) for s in (3, 7)])
    frames = encode_streams_tpu(sigs)
    assert frames.shape == (30, 2, 10)
    for b in range(2):
        c, snr = _metrics(sigs[b], frames, b)
        assert c > 0.8, f"stream {b}: corr {c}"
        assert snr > 4.0, f"stream {b}: segSNR {snr}"


def test_tpu_encoder_state_tracks_decoder():
    """The batched shadow state must equal a real scalar decoder's state
    after decoding the emitted frames — the encoder IS a decoder."""
    sig = _speechlike(800, seed=11).astype(np.float32)
    B = 1
    st = G.init_state(B)
    hist = jnp.zeros((B, 160))
    dec = G729Decoder()
    from amv_tpu.codecs.g729a_encoder import pack_parameters
    for f in range(len(sig) // FRAME):
        xs = jnp.asarray(sig[None, f * FRAME:(f + 1) * FRAME])
        st, hist, parm = encode_frame_batch(st, hist, xs)
        pn = np.asarray(parm)[0]
        frame = pack_parameters({
            "ma_predictor": int(pn[0]), "quantizer_1st": int(pn[1]),
            "quantizer_2nd_lo": int(pn[2]), "quantizer_2nd_hi": int(pn[3]),
            "parity": int(pn[4]), "ac_index": [int(pn[5]), int(pn[6])],
            "fc_indexes": [int(pn[7]), int(pn[8])],
            "pulses_signs": [int(pn[9]), int(pn[10])],
            "ga_cb_index": [int(pn[11]), int(pn[12])],
            "gb_cb_index": [int(pn[13]), int(pn[14])]})
        dec.decode_frame(frame)
        exc_j = np.asarray(st["exc"])[0]
        assert list(exc_j[:len(dec.exc_base)]) == dec.exc_base[:len(exc_j)] \
            or list(exc_j) == dec.exc_base[:len(exc_j)], f"exc frame {f}"
        assert list(np.asarray(st["syn_filter_data"])[0]) \
            == dec.syn_filter_data, f"syn frame {f}"
        assert list(np.asarray(st["pred_energ_q"])[0]) \
            == dec.pred_energ_q, f"pred frame {f}"


def test_scan_equals_per_frame_loop():
    """encode_frames_scan (one dispatch for T frames) is bit-identical
    to the per-frame encode_frame_batch loop, state included."""
    from amv_tpu.codecs.g729a_encoder_tpu import encode_frames_scan
    rng = np.random.default_rng(5)
    B, T = 4, 5
    sig = (3000 * rng.standard_normal((T, B, FRAME))).astype(np.float32)
    st1, h1 = G.init_state(B), jnp.zeros((B, 160))
    st2, h2 = G.init_state(B), jnp.zeros((B, 160))
    outs = []
    for t in range(T):
        st1, h1, p = encode_frame_batch(st1, h1, jnp.asarray(sig[t]))
        outs.append(np.asarray(p))
    st2, h2, parms = encode_frames_scan(st2, h2, jnp.asarray(sig))
    np.testing.assert_array_equal(np.asarray(parms), np.stack(outs))
    np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))
    for k in st1:
        np.testing.assert_array_equal(np.asarray(st1[k]),
                                      np.asarray(st2[k]), err_msg=k)
