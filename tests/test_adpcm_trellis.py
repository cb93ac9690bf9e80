"""Trellis ADPCM encoder: validity + rate-distortion win over greedy."""

import numpy as np
import pytest

from amv_tpu.codecs.adpcm_trellis import trellis_encode, trellis_encode_fast
from amv_tpu.verify import ref_adpcm


def _decode(nibbles, predictor, step_index):
    p, s = predictor, step_index
    out = np.empty(len(nibbles), np.int16)
    for i, nb in enumerate(nibbles):
        p, s = ref_adpcm.expand_nibble(p, s, int(nb))
        out[i] = p
    return out


def test_fast_matches_reference_impl():
    rng = np.random.default_rng(0)
    sig = (2000 * np.sin(np.arange(300) / 7.0)
           + 300 * rng.standard_normal(300)).astype(np.int16)
    n1, f1 = trellis_encode(sig, 0)
    n2, f2 = trellis_encode_fast(sig, 0)
    d1 = _decode(n1, int(sig[0]), 0)
    d2 = _decode(n2, int(sig[0]), 0)
    e1 = ((d1.astype(float) - sig) ** 2).sum()
    e2 = ((d2.astype(float) - sig) ** 2).sum()
    # identical distortion (tie-breaking may differ, cost must not)
    assert e1 == e2


def test_trellis_beats_greedy():
    rng = np.random.default_rng(1)
    sig = (6000 * np.sin(np.arange(1000) / 9.0)
           + 1200 * rng.standard_normal(1000)).astype(np.int16)
    # greedy: reference compress_sample chain
    p, s = int(sig[0]), 0
    greedy = np.empty(len(sig), np.uint8)
    for i, x in enumerate(sig):
        nb, p, s = ref_adpcm.compress_sample(p, s, int(x))
        greedy[i] = nb
    d_g = _decode(greedy, int(sig[0]), 0)
    n_t, _ = trellis_encode_fast(sig, 0)
    d_t = _decode(n_t, int(sig[0]), 0)
    e_g = ((d_g.astype(float) - sig) ** 2).mean()
    e_t = ((d_t.astype(float) - sig) ** 2).mean()
    assert e_t <= e_g, f"trellis ({e_t:.0f}) worse than greedy ({e_g:.0f})"
    assert e_t < 0.9 * e_g, "trellis should clearly beat greedy on this input"


def test_trellis_chunks_decodable():
    """Trellis-encoded chunks decode with the standard decoder."""
    rng = np.random.default_rng(2)
    sig = (4000 * np.sin(np.arange(2756) / 11.0)).astype(np.int16)
    from amv_tpu.codecs.amv_audio import encode_stream
    chunks = encode_stream(sig, frame_size=1378, sample_rate=22050,
                           trellis=True)
    dec = np.concatenate([ref_adpcm.decode_chunk(c) for c in chunks])
    n = min(len(sig), len(dec))
    err = dec[:n].astype(float) - sig[:n].astype(float)
    assert np.sqrt((err ** 2).mean()) < 500
