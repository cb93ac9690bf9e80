"""Device-side entropy encoder vs host encoder: byte equality."""

import numpy as np
import pytest

from amv_tpu.bitstream.entropy import huffman_encode_frame
from amv_tpu.kernels.entropy_encode import encode_frames_device


def _levels(rng, F, M, dense=0.2):
    lv = np.zeros((F, M, 6, 64), np.int16)
    lv[..., 0] = rng.integers(0, 256, (F, M, 6))
    mask = rng.random((F, M, 6, 63)) < dense
    vals = rng.integers(-255, 256, (F, M, 6, 63))
    lv[..., 1:] = np.where(mask, vals, 0)
    return lv


def _compare(lv):
    F = lv.shape[0]
    payload, lens = encode_frames_device(lv, max_bytes=131072)
    payload, lens = np.asarray(payload), np.asarray(lens)
    for f in range(F):
        want = huffman_encode_frame(lv[f])
        got = payload[f, :lens[f]].tobytes()
        assert got == want, (
            f"frame {f}: {len(got)} vs {len(want)} bytes; "
            f"first diff at {next((i for i in range(min(len(got), len(want))) if got[i] != want[i]), -1)}")


def test_device_entropy_random():
    rng = np.random.default_rng(31)
    _compare(_levels(rng, 3, 48))


def test_device_entropy_sparse_and_dense():
    rng = np.random.default_rng(32)
    _compare(_levels(rng, 2, 48, dense=0.02))   # long runs, many ZRL/EOB
    _compare(_levels(rng, 2, 48, dense=0.9))    # dense, coeff at 63 common


def test_device_entropy_dc_only():
    rng = np.random.default_rng(33)
    lv = np.zeros((2, 48, 6, 64), np.int16)
    lv[..., 0] = rng.integers(0, 256, (2, 48, 6))
    _compare(lv)


def test_device_entropy_real_pipeline():
    """levels from the actual encode transform on synthetic frames."""
    from amv_tpu.codecs.amv_video import encode_transform
    import jax.numpy as jnp
    h, w = 96, 128
    yy, xx = np.mgrid[0:h, 0:w]
    y = np.stack([(128 + 70 * np.sin(xx / 6.0 + f) * np.cos(yy / 8.0)).astype(np.uint8)
                  for f in range(2)])
    cb = np.stack([(128 + 45 * np.sin(xx[::2, ::2] / 10.0)).astype(np.uint8)] * 2)
    cr = np.stack([(128 + 45 * np.cos(yy[::2, ::2] / 12.0)).astype(np.uint8)] * 2)
    lv = np.asarray(encode_transform(jnp.asarray(y), jnp.asarray(cb),
                                     jnp.asarray(cr), 8, 6, 2))
    _compare(lv)
