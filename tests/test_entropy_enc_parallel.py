"""Fully parallel (where-reduce) entropy encoder vs the lockstep packer.

Pure XLA — runs identically on the CPU mesh and the TPU."""
import numpy as np
import jax.numpy as jnp

from amv_tpu.kernels.entropy_encode_pallas import _encode_layout
from amv_tpu.kernels.entropy_encode_parallel import encode_layout_parallel
from test_entropy_enc_async_dense import _slab


def test_parallel_matches_lockstep():
    slab, NB = _slab()
    w_ref, b_ref = _encode_layout(slab, 1024, interpret=True, win_rows=64)
    w_new, b_new, ok = encode_layout_parallel(slab, 1024)
    assert bool(ok)
    np.testing.assert_array_equal(np.asarray(b_ref), np.asarray(b_new))
    np.testing.assert_array_equal(np.asarray(w_ref), np.asarray(w_new))


def test_parallel_window_overflow_flags_not_ok():
    """A block too dense for the wl word window must clear ok (the
    caller falls back to a serial kernel) and never corrupt silently."""
    rng = np.random.default_rng(2)
    lv = np.zeros((1, 6, 64, 8, 128), np.int16)
    lv[:, :, 0] = 128
    lv[0, 3] = rng.integers(-900, 900, (64, 8, 128))   # ~64 long tokens
    _, _, ok = encode_layout_parallel(jnp.asarray(lv), 1024, wl=2)
    assert not bool(ok)
    _, _, ok2 = encode_layout_parallel(jnp.asarray(lv), 1024, wl=64,
                                       wg=128, ws=256)
    assert bool(ok2)


def test_parallel_dc0_predictors():
    """Segmented encode wiring: dc0 initial predictors shift only the
    first DC difference of each component chain."""
    rng = np.random.default_rng(4)
    lv = np.zeros((1, 12, 64, 8, 128), np.int16)
    lv[:, :, 0] = rng.integers(100, 160, (1, 12, 8, 128))
    lv[:, :, 9] = rng.integers(-4, 5, (1, 12, 8, 128))
    slab = jnp.asarray(lv)
    dflt = jnp.full((1, 3, 8, 128), 128, jnp.int32)
    w0, b0, ok0 = encode_layout_parallel(slab, 128)
    w1, b1, ok1 = encode_layout_parallel(slab, 128, dc0=dflt)
    assert bool(ok0) and bool(ok1)
    np.testing.assert_array_equal(np.asarray(w0), np.asarray(w1))
    shifted = jnp.asarray(
        np.broadcast_to(np.array([120, 130, 140], np.int32)[None, :, None,
                                                            None],
                        (1, 3, 8, 128)))
    w2, b2, ok2 = encode_layout_parallel(slab, 128, dc0=shifted)
    assert bool(ok2)
    assert (np.asarray(b2) != np.asarray(b0)).any() or \
        (np.asarray(w2) != np.asarray(w0)).any()


def test_complete_parallel_enc_bytes():
    """Complete async chain with enc='parallel' == lockstep chain."""
    from amv_tpu.containers import riff
    from amv_tpu.codecs.amv_video import _encoder_quant_qmat_np
    from amv_tpu.native import entropy_native as native
    from amv_tpu.pipeline.transcode import (transcode_complete_layout,
                                            transcode_complete_async)
    s = riff.read("/root/reference/C-AMVDecoder/bin/AMV1.amv")
    w, h = s.info.width, s.info.height
    M = ((w + 15) // 16) * ((h + 15) // 16)
    rows, _ = native.unescape_frames(s.video_chunks[:4])
    rows = np.asarray(rows)
    qk = tuple(int(v) for v in _encoder_quant_qmat_np(2))
    w_ref, b_ref = transcode_complete_layout(jnp.asarray(rows), M, qk,
                                             interpret=True, win_fetch=64,
                                             win_emit=64)
    w_new, b_new, ok = transcode_complete_async(jnp.asarray(rows), M, qk,
                                                interpret=True,
                                                win_fetch=64, win_emit=64,
                                                enc="parallel")
    assert bool(ok)
    np.testing.assert_array_equal(np.asarray(b_ref), np.asarray(b_new))
    np.testing.assert_array_equal(np.asarray(w_ref), np.asarray(w_new))


def test_complete_parallel_enc_segmented_bytes():
    """segs > 1 parallel chain (per-segment dc0) splices to the same
    payload bytes as the lockstep chain."""
    from amv_tpu.containers import riff
    from amv_tpu.codecs.amv_video import _encoder_quant_qmat_np
    from amv_tpu.native import entropy_native as native
    from amv_tpu.pipeline.transcode import (transcode_complete_layout,
                                            transcode_complete_async)
    s = riff.read("/root/reference/C-AMVDecoder/bin/AMV1.amv")
    w, h = s.info.width, s.info.height
    M = ((w + 15) // 16) * ((h + 15) // 16)
    rows, _ = native.unescape_frames(s.video_chunks[:4])
    rows = np.asarray(rows)
    qk = tuple(int(v) for v in _encoder_quant_qmat_np(2))
    w_ref, b_ref = transcode_complete_layout(jnp.asarray(rows), M, qk,
                                             interpret=True, win_fetch=64,
                                             win_emit=64)
    w_s, b_s, ok = transcode_complete_async(jnp.asarray(rows), M, qk,
                                            interpret=True, win_fetch=64,
                                            win_emit=64, enc="parallel",
                                            segs=4, w_out=512)
    assert bool(ok)
    vch_seg = native.concat_escape_frames(np.asarray(w_s),
                                          np.asarray(b_s), 4)
    vch_ref = native.escape_frames(np.asarray(w_ref), np.asarray(b_ref))
    assert all(a == b for a, b in zip(vch_seg, vch_ref))


def test_rechunk_matches_lockstep():
    """Uniform-record rechunk pack == lockstep packer, words and bits."""
    from amv_tpu.kernels.entropy_encode_parallel import \
        encode_layout_rechunk
    slab, NB = _slab()
    w_ref, b_ref = _encode_layout(slab, 1024, interpret=True, win_rows=64)
    w_new, b_new, ok = encode_layout_rechunk(slab, 1024, interpret=True,
                                             win_rows=64)
    assert bool(ok)
    np.testing.assert_array_equal(np.asarray(b_ref), np.asarray(b_new))
    np.testing.assert_array_equal(np.asarray(w_ref), np.asarray(w_new))


def test_rechunk_complete_chain_bytes():
    """Complete async chain with enc='rechunk' == lockstep chain, and
    the segs>1 wiring splices to the same payload bytes."""
    from amv_tpu.containers import riff
    from amv_tpu.codecs.amv_video import _encoder_quant_qmat_np
    from amv_tpu.native import entropy_native as native
    from amv_tpu.pipeline.transcode import (transcode_complete_layout,
                                            transcode_complete_async)
    s = riff.read("/root/reference/C-AMVDecoder/bin/AMV1.amv")
    w, h = s.info.width, s.info.height
    M = ((w + 15) // 16) * ((h + 15) // 16)
    rows, _ = native.unescape_frames(s.video_chunks[:4])
    rows = np.asarray(rows)
    qk = tuple(int(v) for v in _encoder_quant_qmat_np(2))
    w_ref, b_ref = transcode_complete_layout(jnp.asarray(rows), M, qk,
                                             interpret=True, win_fetch=64,
                                             win_emit=64)
    w_new, b_new, ok = transcode_complete_async(jnp.asarray(rows), M, qk,
                                                interpret=True,
                                                win_fetch=64, win_emit=64,
                                                enc="rechunk")
    assert bool(ok)
    np.testing.assert_array_equal(np.asarray(b_ref), np.asarray(b_new))
    np.testing.assert_array_equal(np.asarray(w_ref), np.asarray(w_new))
    w_s, b_s, ok = transcode_complete_async(jnp.asarray(rows), M, qk,
                                            interpret=True, win_fetch=64,
                                            win_emit=64, enc="rechunk",
                                            segs=4, w_out=512)
    assert bool(ok)
    vch_seg = native.concat_escape_frames(np.asarray(w_s),
                                          np.asarray(b_s), 4)
    vch_ref = native.escape_frames(np.asarray(w_ref), np.asarray(b_ref))
    assert all(a == b for a, b in zip(vch_seg, vch_ref))
