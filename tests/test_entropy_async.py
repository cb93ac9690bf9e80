"""Async record-IR entropy decoder vs the block-lockstep path.

CPU interpret mode (conftest forces the CPU mesh); the kernels also run
compiled on real TPU via the bench gates and AMV_TPU_SMOKE."""
import numpy as np
import jax.numpy as jnp
import pytest

from amv_tpu.containers import riff
from amv_tpu.native import entropy_native as native
from amv_tpu.kernels.entropy_decode_pallas import decode_scans_pallas
from amv_tpu.kernels.entropy_async_pallas import (decode_scans_async,
                                                  default_t_max,
                                                  empty_scan_bytes)

SAMPLE = "/root/reference/C-AMVDecoder/bin/AMV1.amv"


def _corpus_rows(n):
    s = riff.read(SAMPLE)
    w, h = s.info.width, s.info.height
    M = ((w + 15) // 16) * ((h + 15) // 16)
    rows, _ = native.unescape_frames(s.video_chunks[:n])
    return np.asarray(rows), M


def test_async_decode_matches_lockstep():
    rows, M = _corpus_rows(8)
    tm = default_t_max(M * 6, rows.shape[1])
    ref = np.asarray(decode_scans_pallas(jnp.asarray(rows), M,
                                         interpret=True))
    lv, ok = decode_scans_async(jnp.asarray(rows), M, tm, interpret=True)
    assert bool(ok)
    np.testing.assert_array_equal(np.asarray(lv), ref)


def test_async_decode_no_rank_sort():
    rows, M = _corpus_rows(4)
    tm = default_t_max(M * 6, rows.shape[1])
    ref = np.asarray(decode_scans_pallas(jnp.asarray(rows), M,
                                         interpret=True))
    lv, ok = decode_scans_async(jnp.asarray(rows), M, tm, interpret=True,
                                rank_sort=False)
    assert bool(ok)
    np.testing.assert_array_equal(np.asarray(lv), ref)


def test_async_overflow_reports_not_ok():
    """A record budget too small for the stream must trip the ok gate
    (the caller then falls back to the host decoder)."""
    rows, M = _corpus_rows(4)
    lv, ok = decode_scans_async(jnp.asarray(rows), M, 512, interpret=True)
    assert not bool(ok)


def test_empty_scan_pad_decodes_empty():
    """The pad-lane filler is itself a valid scan of empty MCUs."""
    M = 4
    pad = np.frombuffer(empty_scan_bytes(M), np.uint8)[None]
    tm = default_t_max(M * 6, pad.shape[1])
    lv, ok = decode_scans_async(jnp.asarray(pad), M, tm, interpret=True)
    assert bool(ok)
    lv = np.asarray(lv)
    assert np.array_equal(lv, np.zeros_like(lv))
