"""Fully-fused Pallas encode kernel: block extract + FDCT + quantize.

Twin of decode_fused_pallas.py: reads coded (flipped/padded) planes once,
does the MCU block gather, the jfdctint forward DCT and the
dct_quantize_c quantizer in VMEM, and writes quantized levels once.
Bit-exact with codecs.amv_video.encode_transform (which keeps the
flip/pad in XLA).

STATUS: interpret-mode prototype (same Mosaic rank-6 reshape limit as
decode_fused_pallas.py); the production fused path is
kernels/transcode_pallas.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from .fdct_pallas import _fdct_1d, PASS1_BITS


def _make_kernel(mb_w, mb_h, f_t, qmat_key):
    M = mb_w * mb_h
    q = list(qmat_key)

    def kernel(y_ref, cb_ref, cr_ref, out_ref):
        y = y_ref[...].astype(jnp.int32)    # [F_T, 16mbh, 16mbw]
        cb = cb_ref[...].astype(jnp.int32)  # [F_T, 8mbh, 8mbw]
        cr = cr_ref[...].astype(jnp.int32)
        # block extraction (VMEM reshuffles)
        yb = y.reshape(f_t, mb_h, 2, 8, mb_w, 2, 8).transpose(0, 1, 4, 2, 5, 3, 6)
        cbb = cb.reshape(f_t, mb_h, 8, mb_w, 8).transpose(0, 1, 3, 2, 4)
        crb = cr.reshape(f_t, mb_h, 8, mb_w, 8).transpose(0, 1, 3, 2, 4)
        blocks = jnp.concatenate([
            yb.reshape(f_t, M, 4, 64),
            cbb.reshape(f_t, M, 1, 64),
            crb.reshape(f_t, M, 1, 64),
        ], axis=2)                           # [F_T, M, 6, 64]
        cm = blocks.reshape(f_t * M * 6, 64).T  # [64, N]
        cols = [[cm[r * 8 + i] for i in range(8)] for r in range(8)]
        mid = [_fdct_1d(cols[r], 13 - PASS1_BITS, True) for r in range(8)]
        out64 = [None] * 64
        for j in range(8):
            cc = [mid[i][j] for i in range(8)]
            o = _fdct_1d(cc, 13 + PASS1_BITS, False)
            for i in range(8):
                pos = i * 8 + j
                coef = o[i]
                if pos == 0:
                    out64[0] = ((coef + 32) >> 6).astype(jnp.int16)
                else:
                    level = coef * q[pos]
                    qv = jnp.where(level >= 0, level >> 22, -((-level) >> 22))
                    out64[pos] = jnp.clip(qv, -1023, 1023).astype(jnp.int16)
        lv = jnp.stack(out64, axis=0).T.reshape(f_t, M, 6, 64)
        out_ref[...] = lv

    return kernel


@partial(jax.jit, static_argnames=("mb_w", "mb_h", "f_t", "qmat_key",
                                   "interpret"))
def encode_fused(ycoded, cbcoded, crcoded, mb_w: int, mb_h: int,
                 qmat_key, f_t: int = 16, interpret: bool = False):
    """Coded planes (already flipped/padded) -> levels int16 [F, M, 6, 64]
    raster order."""
    F = ycoded.shape[0]
    M = mb_w * mb_h
    assert F % f_t == 0
    kernel = _make_kernel(mb_w, mb_h, f_t, qmat_key)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((F, M, 6, 64), jnp.int16),
        grid=(F // f_t,),
        in_specs=[
            pl.BlockSpec((f_t, 16 * mb_h, 16 * mb_w), lambda i: (i, 0, 0)),
            pl.BlockSpec((f_t, 8 * mb_h, 8 * mb_w), lambda i: (i, 0, 0)),
            pl.BlockSpec((f_t, 8 * mb_h, 8 * mb_w), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((f_t, M, 6, 64), lambda i: (i, 0, 0, 0)),
        interpret=interpret,
    )(ycoded, cbcoded, crcoded)
