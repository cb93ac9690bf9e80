"""Batched bit-exact forward DCT + quantizer (encoder compute path).

Replicates:
* ff_jpeg_fdct_islow (AMVmuxer/ffmpeg/libavcodec/jfdctint.c:184-341,
  CONST_BITS=13, PASS1_BITS=4, DESCALE with rounding, int16 stores between
  passes);
* dct_quantize_c for the intra/AMV case (mpegvideo_enc.c:3646-3725):
  DC = (dc + 32) / 64 (y/c_dc_scale=8; dc >= 0 for unsigned input so
  truncating division == shift), AC via qmat (QMAT_SHIFT=22) with
  intra_quant_bias=0, plus the clip_coeffs +/-1023 clamp applied on
  overflow (a no-op otherwise, so applied unconditionally here);
* int32 multiply wraparound in `level = block[j]*qmat[j]` is preserved.

Output: quantized levels [N, 64] int16 in RASTER order.  The host entropy
coder derives runs/EOB from the levels directly (the reference's
block_last_index only affects the EOB-at-63 rule, which is recoverable from
the level at scan position 63).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

C0298, C0390, C0541, C0765 = 2446, 3196, 4433, 6270
C0899, C1175, C1501, C1847 = 7373, 9633, 12299, 15137
C1961, C2053, C2562, C3072 = 16069, 16819, 20995, 25172
CONST_BITS, PASS1_BITS = 13, 4


def _wrap16(x):
    return ((x + 0x8000) & 0xFFFF) - 0x8000


def _descale(x, n):
    return (x + (1 << (n - 1))) >> n


def _fdct_1d(c, shift_even, shift_odd, pass1_scale_even):
    """Shared butterfly for both passes; c is a list of 8 arrays."""
    t0, t7 = c[0] + c[7], c[0] - c[7]
    t1, t6 = c[1] + c[6], c[1] - c[6]
    t2, t5 = c[2] + c[5], c[2] - c[5]
    t3, t4 = c[3] + c[4], c[3] - c[4]
    t10, t13 = t0 + t3, t0 - t3
    t11, t12 = t1 + t2, t1 - t2

    if pass1_scale_even:
        o0 = _wrap16((t10 + t11) << PASS1_BITS)
        o4 = _wrap16((t10 - t11) << PASS1_BITS)
    else:
        o0 = _wrap16(_descale(t10 + t11, PASS1_BITS))
        o4 = _wrap16(_descale(t10 - t11, PASS1_BITS))
    z1 = (t12 + t13) * C0541
    o2 = _wrap16(_descale(z1 + t13 * C0765, shift_even))
    o6 = _wrap16(_descale(z1 - t12 * C1847, shift_even))

    z1, z2 = t4 + t7, t5 + t6
    z3, z4 = t4 + t6, t5 + t7
    z5 = (z3 + z4) * C1175
    t4 = t4 * C0298
    t5 = t5 * C2053
    t6 = t6 * C3072
    t7 = t7 * C1501
    z1 = z1 * (-C0899)
    z2 = z2 * (-C2562)
    z3 = z3 * (-C1961) + z5
    z4 = z4 * (-C0390) + z5
    o7 = _wrap16(_descale(t4 + z1 + z3, shift_odd))
    o5 = _wrap16(_descale(t5 + z2 + z4, shift_odd))
    o3 = _wrap16(_descale(t6 + z2 + z3, shift_odd))
    o1 = _wrap16(_descale(t7 + z1 + z4, shift_odd))
    return [o0, o1, o2, o3, o4, o5, o6, o7]


@jax.jit
def fdct(blocks: jnp.ndarray) -> jnp.ndarray:
    """ff_jpeg_fdct_islow on [..., 8, 8] int (pixels) -> int32 [..., 8, 8]."""
    x = blocks.astype(jnp.int32)
    # pass 1: rows
    c = [x[..., :, i] for i in range(8)]
    rows = _fdct_1d(c, CONST_BITS - PASS1_BITS, CONST_BITS - PASS1_BITS, True)
    x = jnp.stack(rows, axis=-1)
    # pass 2: columns
    c = [x[..., i, :] for i in range(8)]
    cols = _fdct_1d(c, CONST_BITS + PASS1_BITS, CONST_BITS + PASS1_BITS, False)
    return jnp.stack(cols, axis=-2)


@jax.jit
def fdct_quantize(blocks: jnp.ndarray, qmat_raster: jnp.ndarray) -> jnp.ndarray:
    """get_pixels + fdct + dct_quantize_c (intra, bias=0) on a batch.

    blocks: uint8/int [..., 8, 8]; qmat_raster: int32 [64].
    Returns int16 levels [..., 64] raster order.
    """
    coefs = fdct(blocks).reshape(*blocks.shape[:-2], 64)
    dc = (coefs[..., 0] + 32) >> 6  # (x+32)/64 with x >= 0
    level = coefs * qmat_raster  # int32 wrap, as in C
    q = jnp.where(level >= 0, level >> 22, -((-level) >> 22))
    # threshold: |level| > (1<<22)-1  <=>  q != 0 for level>=0; for negative
    # levels the C test is on the pre-negated value; (-level)>>22 > 0 iff
    # -level >= 1<<22 iff level <= -(1<<22), matching |level| > (1<<22)-1.
    ac = jnp.clip(q, -1023, 1023)
    out = ac.at[..., 0].set(dc)
    return out.astype(jnp.int16)
