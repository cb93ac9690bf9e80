"""Pallas FDCT+quant kernel vs jnp reference (interpret mode)."""

import numpy as np
import pytest

from amv_tpu.kernels import fdct as KF
from amv_tpu.kernels.fdct_pallas import fdct_quantize_pallas
from amv_tpu.verify.ref_jpeg import encoder_qmat


def test_pallas_fdct_quant_bit_exact():
    rng = np.random.default_rng(13)
    px = rng.integers(0, 256, (600, 8, 8)).astype(np.uint8)
    qmat = encoder_qmat(2)
    want = np.asarray(KF.fdct_quantize(px, qmat))
    got = np.asarray(fdct_quantize_pallas(px, qmat, interpret=True))
    np.testing.assert_array_equal(got, want)
