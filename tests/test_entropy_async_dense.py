"""Single-pass dense async decoder vs the lockstep path.

CPU interpret mode (conftest forces the CPU mesh); compiled-Mosaic
coverage rides on the bench gates and AMV_TPU_SMOKE."""
import numpy as np
import jax.numpy as jnp

from amv_tpu.containers import riff
from amv_tpu.native import entropy_native as native
from amv_tpu.bitstream.entropy import huffman_encode_frame
from amv_tpu.codecs.amv_video import _unescape_pack
from amv_tpu.kernels.entropy_decode_pallas import (scan_words_layout,
                                                   _decode_layout)
from amv_tpu.kernels.entropy_async_pallas import (decode_scans_async_dense,
                                                  default_t_max_dense,
                                                  empty_scan_bytes)

SAMPLE = "/root/reference/C-AMVDecoder/bin/AMV1.amv"


def _pad_empty(rows, n_mcu):
    """Pad a sub-1024 batch with valid empty scans: zero-padded lanes
    would decode as endless AC(0,1) runs and trip the ok gate (the
    production wrappers pad the same way)."""
    F = rows.shape[0]
    fp = (F + 1023) // 1024 * 1024
    pad = np.frombuffer(empty_scan_bytes(n_mcu), np.uint8)
    width = max(rows.shape[1], len(pad))
    out = np.zeros((fp, width), np.uint8)
    out[:F, :rows.shape[1]] = rows
    out[F:, :len(pad)] = pad
    return out


def _corpus_rows(n):
    s = riff.read(SAMPLE)
    w, h = s.info.width, s.info.height
    M = ((w + 15) // 16) * ((h + 15) // 16)
    rows, _ = native.unescape_frames(s.video_chunks[:n])
    return np.asarray(rows), M


def test_dense_decode_matches_lockstep_corpus():
    rows, M = _corpus_rows(8)
    nb = M * 6
    wl = scan_words_layout(jnp.asarray(_pad_empty(rows, M)))
    ref = np.asarray(_decode_layout(wl, nb, interpret=True, win=64))
    tm = default_t_max_dense(nb, rows.shape[1])
    slab, ok = decode_scans_async_dense(wl, nb, tm, interpret=True,
                                        win=64)
    assert bool(ok)
    np.testing.assert_array_equal(np.asarray(slab), ref)


def _synth_rows(F, M, seed=5, empty_runs=True):
    rng = np.random.default_rng(seed)
    lv = np.zeros((F, M, 6, 64), np.int16)
    lv[..., 0] = rng.integers(-30, 60, (F, M, 6))
    lv[..., 1] = rng.integers(-8, 8, (F, M, 6))
    lv[:, :, :, 9] = rng.integers(-4, 4, (F, M, 6))
    if empty_runs:
        # empty-block-heavy lanes complete blocks every ~2 tokens and
        # exercise the defer/stall path hard
        lv[: F // 4, 1:] = 0
    pays = [huffman_encode_frame(lv[f]) for f in range(F)]
    return _unescape_pack(pays), lv


def test_dense_decode_defer_heavy_and_unroll():
    rows, _ = _synth_rows(16, 5)
    nb = 30
    wl = scan_words_layout(jnp.asarray(_pad_empty(rows, 5)))
    ref = np.asarray(_decode_layout(wl, nb, interpret=True, win=64))
    tm = default_t_max_dense(nb, rows.shape[1])
    slab, ok = decode_scans_async_dense(wl, nb, tm, interpret=True,
                                        win=64, unroll=2, pmax=8,
                                        wb=4, adv=2)
    assert bool(ok)
    np.testing.assert_array_equal(np.asarray(slab), ref)
    # packed output-ring variant (pair-packed int32 flush; measured
    # negative on TPU, kept for the record — see decode_scans_async_dense)
    slab_u, ok_u = decode_scans_async_dense(wl, nb, tm, interpret=True,
                                            win=64, unroll=2, pmax=8,
                                            wb=4, adv=2, packed=True)
    assert bool(ok_u)
    np.testing.assert_array_equal(np.asarray(slab_u), ref)


def test_dense_decode_hbm_streamed():
    rows, _ = _synth_rows(8, 4, seed=11)
    nb = 24
    rows = _pad_empty(rows, 4)
    rows = np.pad(rows, ((0, 0), (0, -rows.shape[1] % 4)))
    wl = scan_words_layout(jnp.asarray(rows))
    ref = np.asarray(_decode_layout(wl, nb, interpret=True, win=16))
    tm = default_t_max_dense(nb, rows.shape[1])
    slab, ok = decode_scans_async_dense(wl, nb, tm, interpret=True,
                                        win=16, hbm=True)
    assert bool(ok)
    np.testing.assert_array_equal(np.asarray(slab), ref)


def test_dense_overflow_reports_not_ok():
    rows, M = _corpus_rows(4)
    wl = scan_words_layout(jnp.asarray(_pad_empty(rows, M)))
    slab, ok = decode_scans_async_dense(wl, M * 6, 256, interpret=True)
    assert not bool(ok)
