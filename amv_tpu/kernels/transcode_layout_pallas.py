"""Layout-native fused transcode: consumes/produces the entropy kernels'
slab layout directly.

transcode_zz (kernels/transcode_pallas.py) is coefficient-major
([64, N] planes), which forces two 64xN transposes when chained between
the Pallas entropy decoder and encoder (both work in
[CB, n_blocks, 64, 8, 128] frame-slab layout).  This kernel walks grid
(frame-chunk, MCU, slot) over that layout directly: the quant-table
choice is a scalar select on the slot index and both zigzag
permutations are compile-time row orders — no lane-dependent selects at
all.  Same arithmetic as transcode_zz (dequant + IDCT + FDCT + requant
in one VMEM pass, mjpegdec/simple_idct/jfdctint/dct_quantize
semantics); bit-exact with transcode_levels_fused (tests).

Input slot 0 must be the *resolved* dequantized DC (+1024 bias), which
the caller computes in-layout with per-component cumulative sums of the
DC differences the entropy decoder emits; output slot 0 is the absolute
re-quantized DC the entropy encoder expects.  Prototype status: the
round-2 path to a zero-relayout complete transcode; not yet wired into
the bench chain.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from ..bitstream import jpeg_tables as T
from .transcode_pallas import _idct_cols, _wrap16
from .fdct_pallas import _fdct_1d, PASS1_BITS

SB = 8

_QM_L = np.zeros(64, np.int32)
_QM_C = np.zeros(64, np.int32)
_QM_L[T.ZIGZAG] = T.SP5X_QUANT_LUMA_ZZ
_QM_C[T.ZIGZAG] = T.SP5X_QUANT_CHROMA_ZZ
_ZZ = [int(v) for v in T.ZIGZAG]


def _make_mcu_kernel(qmat_key):
    """One grid step = one MCU (6 blocks): the component type is a
    Python constant per sub-block, so the quant-table select disappears
    entirely, and the grid shrinks 6x (the per-block grid measured
    launch-bound: 27.9 ms for 4,608 steps at F=16K)."""
    q = list(qmat_key)

    def one_block(lv_ref, dc_ref, out_ref, k, luma):
        deq = [None] * 64
        deq[0] = _wrap16(dc_ref[0, 0, k].astype(jnp.int32))
        qm = _QM_L if luma else _QM_C
        for i in range(1, 64):
            deq[_ZZ[i]] = _wrap16(lv_ref[0, 0, k, i].astype(jnp.int32) *
                                  int(qm[_ZZ[i]]))
        pix = _idct_cols(deq)
        cols = [[pix[r * 8 + i2] for i2 in range(8)] for r in range(8)]
        mid = [_fdct_1d(cols[r], 13 - PASS1_BITS, True) for r in range(8)]
        out = [None] * 64
        for j in range(8):
            cc = [mid[i2][j] for i2 in range(8)]
            o = _fdct_1d(cc, 13 + PASS1_BITS, False)
            for i2 in range(8):
                pos = i2 * 8 + j
                coef = o[i2]
                if pos == 0:
                    out[0] = ((coef + 32) >> 6).astype(jnp.int16)
                else:
                    level = coef * q[pos]
                    qv2 = jnp.where(level >= 0, level >> 22,
                                    -((-level) >> 22))
                    out[pos] = jnp.clip(qv2, -1023, 1023).astype(jnp.int16)
        for i in range(64):
            out_ref[0, 0, k, i] = out[_ZZ[i]]

    def kernel(lv_ref, dc_ref, out_ref):
        for k in range(6):
            one_block(lv_ref, dc_ref, out_ref, k, k < 4)

    return kernel


def _make_kernel(qmat_key):
    q = list(qmat_key)

    def kernel(lv_ref, dc_ref, out_ref):
        luma = pl.program_id(2) < 4  # scalar slot type
        deq = [None] * 64
        deq[0] = _wrap16(dc_ref[0, 0, 0].astype(jnp.int32))
        # zigzag input row i holds the raster-ZIGZAG[i] coefficient
        for i in range(1, 64):
            qv = jnp.where(luma, int(_QM_L[_ZZ[i]]), int(_QM_C[_ZZ[i]]))
            deq[_ZZ[i]] = _wrap16(lv_ref[0, 0, 0, i].astype(jnp.int32) * qv)
        pix = _idct_cols(deq)
        cols = [[pix[r * 8 + i2] for i2 in range(8)] for r in range(8)]
        mid = [_fdct_1d(cols[r], 13 - PASS1_BITS, True) for r in range(8)]
        out = [None] * 64
        for j in range(8):
            cc = [mid[i2][j] for i2 in range(8)]
            o = _fdct_1d(cc, 13 + PASS1_BITS, False)
            for i2 in range(8):
                pos = i2 * 8 + j
                coef = o[i2]
                if pos == 0:
                    out[0] = ((coef + 32) >> 6).astype(jnp.int16)
                else:
                    level = coef * q[pos]
                    qv2 = jnp.where(level >= 0, level >> 22,
                                    -((-level) >> 22))
                    out[pos] = jnp.clip(qv2, -1023, 1023).astype(jnp.int16)
        for i in range(64):
            out_ref[0, 0, 0, i] = out[_ZZ[i]]      # raster -> zigzag rows

    return kernel


def _make_dec_kernel():
    def kernel(lv_ref, dc_ref, out_ref):
        luma = pl.program_id(2) < 4  # scalar slot type
        deq = [None] * 64
        deq[0] = _wrap16(dc_ref[0, 0, 0].astype(jnp.int32))
        for i in range(1, 64):
            qv = jnp.where(luma, int(_QM_L[_ZZ[i]]), int(_QM_C[_ZZ[i]]))
            deq[_ZZ[i]] = _wrap16(lv_ref[0, 0, 0, i].astype(jnp.int32) * qv)
        pix = _idct_cols(deq)
        for k in range(64):
            out_ref[0, 0, 0, k] = pix[k].astype(jnp.uint8)

    return kernel


@partial(jax.jit, static_argnames=("interpret",))
def decode_mcu_layout(lv, dc, interpret: bool = False):
    """Decode-only half of transcode_mcu_layout: dequant + zigzag + IDCT
    on the entropy decoder's slab layout (mjpegdec/simple_idct
    semantics).  lv int16 [CB, M, 6, 64, 8, 128] zigzag (slot0 ignored),
    dc int32 [CB, M, 6, 8, 128] resolved dequantized DC ->
    pix uint8 [CB, M, 6, 64, 8, 128] raster pixel rows."""
    cb, m, sb = lv.shape[0], lv.shape[1], lv.shape[4]
    return pl.pallas_call(
        _make_dec_kernel(),
        out_shape=jax.ShapeDtypeStruct((cb, m, 6, 64, sb, 128), jnp.uint8),
        grid=(cb, m, 6),
        in_specs=[
            pl.BlockSpec((1, 1, 1, 64, sb, 128),
                         lambda i, j, k: (i, j, k, 0, 0, 0)),
            pl.BlockSpec((1, 1, 1, sb, 128),
                         lambda i, j, k: (i, j, k, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, 1, 64, sb, 128),
                               lambda i, j, k: (i, j, k, 0, 0, 0)),
        interpret=interpret,
    )(lv, dc)


def _make_enc_kernel(qmat_key):
    q = list(qmat_key)

    def kernel(pix_ref, out_ref):
        pix = [pix_ref[0, 0, 0, k].astype(jnp.int32) for k in range(64)]
        cols = [[pix[r * 8 + i2] for i2 in range(8)] for r in range(8)]
        mid = [_fdct_1d(cols[r], 13 - PASS1_BITS, True) for r in range(8)]
        out = [None] * 64
        for j in range(8):
            cc = [mid[i2][j] for i2 in range(8)]
            o = _fdct_1d(cc, 13 + PASS1_BITS, False)
            for i2 in range(8):
                pos = i2 * 8 + j
                coef = o[i2]
                if pos == 0:
                    out[0] = ((coef + 32) >> 6).astype(jnp.int16)
                else:
                    level = coef * q[pos]
                    qv2 = jnp.where(level >= 0, level >> 22,
                                    -((-level) >> 22))
                    out[pos] = jnp.clip(qv2, -1023, 1023).astype(jnp.int16)
        for i in range(64):
            out_ref[0, 0, 0, i] = out[_ZZ[i]]      # raster -> zigzag rows

    return kernel


@partial(jax.jit, static_argnames=("qmat_key", "interpret"))
def encode_mcu_layout(pix, qmat_key, interpret: bool = False):
    """Encode-only half of transcode_mcu_layout: FDCT + quantize on
    pixel-row slabs (jfdctint/dct_quantize semantics).  pix uint8
    [CB, M, 6, 64, 8, 128] raster rows -> lv int16 [CB, M, 6, 64, 8,
    128] zigzag levels (slot0 = absolute quantized DC, the entropy
    encoder's contract)."""
    cb, m, sb = pix.shape[0], pix.shape[1], pix.shape[4]
    return pl.pallas_call(
        _make_enc_kernel(qmat_key),
        out_shape=jax.ShapeDtypeStruct((cb, m, 6, 64, sb, 128), jnp.int16),
        grid=(cb, m, 6),
        in_specs=[pl.BlockSpec((1, 1, 1, 64, sb, 128),
                               lambda i, j, k: (i, j, k, 0, 0, 0))],
        out_specs=pl.BlockSpec((1, 1, 1, 64, sb, 128),
                               lambda i, j, k: (i, j, k, 0, 0, 0)),
        interpret=interpret,
    )(pix)


@partial(jax.jit, static_argnames=("qmat_key", "interpret"))
def transcode_mcu_layout(lv, dc, qmat_key, interpret: bool = False):
    """lv int16 [CB, M, 6, 64, 8, 128] zigzag levels (slot0 ignored),
    dc int32 [CB, M, 6, 8, 128] resolved dequantized DC ->
    lv2 int16 [CB, M, 6, 64, 8, 128] zigzag re-quantized levels
    (slot0 = absolute DC)."""
    cb, m, sb = lv.shape[0], lv.shape[1], lv.shape[4]
    if interpret:
        # the 6-block MCU kernel's interpret graph (6x the DCT body)
        # makes 1-core XLA-CPU compiles pathological (>20 min for the
        # tiny sharding test); interpret mode keeps the per-block grid
        # — both kernels are bit-exact by construction
        return pl.pallas_call(
            _make_kernel(qmat_key),
            out_shape=jax.ShapeDtypeStruct((cb, m, 6, 64, sb, 128),
                                           jnp.int16),
            grid=(cb, m, 6),
            in_specs=[
                pl.BlockSpec((1, 1, 1, 64, sb, 128),
                             lambda i, j, k: (i, j, k, 0, 0, 0)),
                pl.BlockSpec((1, 1, 1, sb, 128),
                             lambda i, j, k: (i, j, k, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, 1, 64, sb, 128),
                                   lambda i, j, k: (i, j, k, 0, 0, 0)),
            interpret=True,
        )(lv, dc)
    kernel = _make_mcu_kernel(qmat_key)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((cb, m, 6, 64, sb, 128), jnp.int16),
        grid=(cb, m),
        in_specs=[
            pl.BlockSpec((1, 1, 6, 64, sb, 128),
                         lambda i, j: (i, j, 0, 0, 0, 0)),
            pl.BlockSpec((1, 1, 6, sb, 128),
                         lambda i, j: (i, j, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, 6, 64, sb, 128),
                               lambda i, j: (i, j, 0, 0, 0, 0)),
        interpret=interpret,
    )(lv, dc)
