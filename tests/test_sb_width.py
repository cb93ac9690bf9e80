"""Sublane-width (sb) parameterization of the async transcode chain.

sb=8 is the production layout (frames per kernel chunk = 1024); wider
tiles (16/32) pack more frames per chunk and cut the latency-bound
kernels' iteration counts (measured on TPU: decode 67.3 -> 58.1 ms at
sb=32, scripts/measure_sb.py).  These interpret-mode tests pin the
byte contract: every sb width must produce the identical
words/bits stream for the identical input, including the segmented
encode wiring."""
import numpy as np
import jax.numpy as jnp

from amv_tpu.bitstream.entropy import huffman_encode_frame
from amv_tpu.codecs.amv_video import _unescape_pack
from amv_tpu.pipeline.transcode import transcode_complete_async


def _synth(F, M, seed=7):
    rng = np.random.default_rng(seed)
    lv = np.zeros((F, M, 6, 64), np.int16)
    lv[..., 0] = rng.integers(-30, 60, (F, M, 6))
    lv[..., 1] = rng.integers(-8, 8, (F, M, 6))
    lv[:, :, :, 9] = rng.integers(-4, 4, (F, M, 6))
    lv[: F // 4, 1:] = 0
    pays = [huffman_encode_frame(lv[f]) for f in range(F)]
    return np.asarray(_unescape_pack(pays))


def test_async_chain_sb16_matches_sb8():
    from amv_tpu.codecs.amv_video import _encoder_quant_qmat_np
    M = 6
    rows = _synth(12, M)
    qk = tuple(int(v) for v in _encoder_quant_qmat_np(2))
    w8, b8, ok8 = transcode_complete_async(jnp.asarray(rows), M, qk,
                                           interpret=True, win_fetch=64,
                                           win_emit=64, enc="async")
    assert bool(ok8)
    w16, b16, ok16 = transcode_complete_async(jnp.asarray(rows), M, qk,
                                              interpret=True, win_fetch=64,
                                              win_emit=64, enc="async",
                                              sb=16)
    assert bool(ok16)
    np.testing.assert_array_equal(np.asarray(b8), np.asarray(b16))
    np.testing.assert_array_equal(np.asarray(w8), np.asarray(w16))


def test_async_chain_sb16_segmented_matches_sb8():
    from amv_tpu.codecs.amv_video import _encoder_quant_qmat_np
    M = 6
    rows = _synth(10, M, seed=13)
    qk = tuple(int(v) for v in _encoder_quant_qmat_np(2))
    w8, b8, ok8 = transcode_complete_async(jnp.asarray(rows), M, qk,
                                           interpret=True, win_fetch=64,
                                           win_emit=64, enc="async",
                                           segs=2, w_out=128)
    assert bool(ok8)
    w16, b16, ok16 = transcode_complete_async(jnp.asarray(rows), M, qk,
                                              interpret=True, win_fetch=64,
                                              win_emit=64, enc="async",
                                              segs=2, w_out=128, sb=16)
    assert bool(ok16)
    np.testing.assert_array_equal(np.asarray(b8), np.asarray(b16))
    np.testing.assert_array_equal(np.asarray(w8), np.asarray(w16))
