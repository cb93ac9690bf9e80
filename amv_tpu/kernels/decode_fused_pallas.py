"""Fully-fused Pallas decode kernel: dequant + IDCT + MCU assembly in VMEM.

The XLA decode path materializes ~6 HBM-sized intermediates (dequant,
row pass, col pass, assembly transposes); this kernel reads the quantized
levels once and writes assembled coded planes once, doing every reshuffle
in VMEM.  Grid is over frame tiles; each instance transforms all blocks
of F_T frames and lays them out as Y/Cb/Cr coded planes.

Bit-exact with codecs.amv_video.decode_transform up to the final
flip+crop, which stays in XLA (a single fused pass).

STATUS: interpret-mode prototype.  Mosaic (TPU compile) rejects the
in-kernel rank-6 assembly reshapes (remote compile HTTP 500); the
production fused path is kernels/transcode_pallas.py, which stays 2D/3D.
Kept for the round-2 direction of expressing assembly via 2D strided ops.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from ..bitstream import jpeg_tables as T
from .idct import W1, W2, W3, W4, W5, W6, W7, ROW_SHIFT, COL_SHIFT

_QM_RASTER = np.zeros((6, 64), dtype=np.int32)
_QM_RASTER[:4, T.ZIGZAG] = T.SP5X_QUANT_LUMA_ZZ
_QM_RASTER[4:, T.ZIGZAG] = T.SP5X_QUANT_CHROMA_ZZ


def _wrap16(x):
    return ((x + 0x8000) & 0xFFFF) - 0x8000


def _idct_soa(c64):
    """c64: list of 64 [N] int32 arrays (raster order) -> 64 uint8 arrays."""
    mid = [[None] * 8 for _ in range(8)]
    for r in range(8):
        c = [c64[r * 8 + i] for i in range(8)]
        dc_only = (c[1] | c[2] | c[3] | c[4] | c[5] | c[6] | c[7]) == 0
        short = _wrap16(c[0] << 3)
        a0 = W4 * c[0] + (1 << (ROW_SHIFT - 1))
        a1 = a0 + W6 * c[2] - W4 * c[4] - W2 * c[6]
        a2 = a0 - W6 * c[2] - W4 * c[4] + W2 * c[6]
        a3 = a0 - W2 * c[2] + W4 * c[4] - W6 * c[6]
        a0 = a0 + W2 * c[2] + W4 * c[4] + W6 * c[6]
        b0 = W1 * c[1] + W3 * c[3] + W5 * c[5] + W7 * c[7]
        b1 = W3 * c[1] - W7 * c[3] - W1 * c[5] - W5 * c[7]
        b2 = W5 * c[1] - W1 * c[3] + W7 * c[5] + W3 * c[7]
        b3 = W7 * c[1] - W5 * c[3] + W3 * c[5] - W1 * c[7]
        o = [(a0 + b0) >> ROW_SHIFT, (a1 + b1) >> ROW_SHIFT,
             (a2 + b2) >> ROW_SHIFT, (a3 + b3) >> ROW_SHIFT,
             (a3 - b3) >> ROW_SHIFT, (a2 - b2) >> ROW_SHIFT,
             (a1 - b1) >> ROW_SHIFT, (a0 - b0) >> ROW_SHIFT]
        for i in range(8):
            mid[r][i] = jnp.where(dc_only, short, _wrap16(o[i]))
    bias = (1 << (COL_SHIFT - 1)) // W4
    out = [None] * 64
    for j in range(8):
        c = [mid[i][j] for i in range(8)]
        a0 = W4 * (c[0] + bias)
        a1 = a0 + W6 * c[2] - W4 * c[4] - W2 * c[6]
        a2 = a0 - W6 * c[2] - W4 * c[4] + W2 * c[6]
        a3 = a0 - W2 * c[2] + W4 * c[4] - W6 * c[6]
        a0 = a0 + W2 * c[2] + W4 * c[4] + W6 * c[6]
        b0 = W1 * c[1] + W3 * c[3] + W5 * c[5] + W7 * c[7]
        b1 = W3 * c[1] - W7 * c[3] - W1 * c[5] - W5 * c[7]
        b2 = W5 * c[1] - W1 * c[3] + W7 * c[5] + W3 * c[7]
        b3 = W7 * c[1] - W5 * c[3] + W3 * c[5] - W1 * c[7]
        o = [(a0 + b0) >> COL_SHIFT, (a1 + b1) >> COL_SHIFT,
             (a2 + b2) >> COL_SHIFT, (a3 + b3) >> COL_SHIFT,
             (a3 - b3) >> COL_SHIFT, (a2 - b2) >> COL_SHIFT,
             (a1 - b1) >> COL_SHIFT, (a0 - b0) >> COL_SHIFT]
        for i in range(8):
            out[i * 8 + j] = jnp.clip(o[i], 0, 255).astype(jnp.uint8)
    return out


def _make_kernel(mb_w, mb_h, f_t):
    M = mb_w * mb_h

    def kernel(lv_ref, dc_ref, qm_ref, y_ref, cb_ref, cr_ref):
        lv = lv_ref[...].astype(jnp.int32)       # [F_T, M, 6, 64]
        dc = dc_ref[...]                         # [F_T, M, 6]
        qmc = qm_ref[...]                        # [6, 64]
        deq = _wrap16(lv * qmc[None, None])
        # slot 0 := DC (Mosaic has no scatter; use a lane mask)
        k_idx = jax.lax.broadcasted_iota(jnp.int32, deq.shape, 3)
        deq = jnp.where(k_idx == 0, _wrap16(dc)[..., None], deq)
        flat = deq.reshape(f_t * M * 6, 64)
        cm = flat.T                               # [64, N] in VMEM
        pix = _idct_soa([cm[k] for k in range(64)])
        pix2 = jnp.stack(pix, axis=0).T           # [N, 64]
        mcu = pix2.reshape(f_t, mb_h, mb_w, 6, 8, 8)
        yb = mcu[:, :, :, :4].reshape(f_t, mb_h, mb_w, 2, 2, 8, 8)
        y_ref[...] = yb.transpose(0, 1, 3, 5, 2, 4, 6).reshape(
            f_t, 16 * mb_h, 16 * mb_w)
        cb_ref[...] = mcu[:, :, :, 4].transpose(0, 1, 3, 2, 4).reshape(
            f_t, 8 * mb_h, 8 * mb_w)
        cr_ref[...] = mcu[:, :, :, 5].transpose(0, 1, 3, 2, 4).reshape(
            f_t, 8 * mb_h, 8 * mb_w)

    return kernel


@partial(jax.jit, static_argnames=("mb_w", "mb_h", "f_t", "interpret"))
def decode_fused(levels_raster, dc, mb_w: int, mb_h: int, f_t: int = 16,
                 interpret: bool = False):
    """levels_raster int16 [F, M, 6, 64] (raster, slot0 ignored), dc int32
    [F, M, 6] -> coded (un-flipped) planes (y, cb, cr) uint8."""
    F, M = levels_raster.shape[0], levels_raster.shape[1]
    assert F % f_t == 0, (F, f_t)
    grid = (F // f_t,)
    kernel = _make_kernel(mb_w, mb_h, f_t)
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((F, 16 * mb_h, 16 * mb_w), jnp.uint8),
            jax.ShapeDtypeStruct((F, 8 * mb_h, 8 * mb_w), jnp.uint8),
            jax.ShapeDtypeStruct((F, 8 * mb_h, 8 * mb_w), jnp.uint8),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((f_t, M, 6, 64), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((f_t, M, 6), lambda i: (i, 0, 0)),
            pl.BlockSpec((6, 64), lambda i: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((f_t, 16 * mb_h, 16 * mb_w), lambda i: (i, 0, 0)),
            pl.BlockSpec((f_t, 8 * mb_h, 8 * mb_w), lambda i: (i, 0, 0)),
            pl.BlockSpec((f_t, 8 * mb_h, 8 * mb_w), lambda i: (i, 0, 0)),
        ),
        interpret=interpret,
    )(levels_raster, dc, jnp.asarray(_QM_RASTER))
