"""Pallas IDCT kernel vs the jnp reference kernel (interpret mode on CPU)."""

import numpy as np
import pytest

from amv_tpu.kernels import idct as KI
from amv_tpu.kernels.idct_pallas import idct_put_pallas


def test_pallas_idct_bit_exact():
    rng = np.random.default_rng(7)
    blocks = rng.integers(-32768, 32768, (1100, 8, 8)).astype(np.int16)
    blocks[3] = 0
    blocks[3, 0, 0] = 2048  # DC-only shortcut path
    want = np.asarray(KI.idct_put(blocks))
    got = np.asarray(idct_put_pallas(blocks, interpret=True))
    np.testing.assert_array_equal(got, want)
