"""amvlib-compatible AMV video decode mode (the reference's second decoder).

C-AMVDecoder/amvlib implements its own AMV frame decoder that differs from
the FFmpeg path in three documented ways (SURVEY.md §7.1):

* fixed ~Q75 quant tables (AmvJpeg.c:30-61) instead of the sp5x Q60 pair;
* the Wang integer IDCT (AmvJpeg.c idctrow/idctcol:1082-1176, W constants
  :145-150) with [-256,255] output clipping and a +128 luma offset applied
  after the transform (IQtIZzBlock:1010-1048);
* DC prediction accumulated in the quantized-level domain starting at 0.

It also ships a buggy zigzag table (AmvJpeg.c:133-143: entry 37 appears
twice, 31 is missing), reproduced here for fidelity.

This mode exists for parity with the second reference implementation; the
FFmpeg-compatible path (codecs/amv_video.py) is the primary decoder.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..bitstream import jpeg_tables as T
from ..bitstream.entropy import huffman_decode_frames

# amvlib's zigzag (AmvJpeg.c:133-143) — note the 37/31 bug, kept verbatim
AMVLIB_ZIGZAG = np.array([
    0, 1, 5, 6, 14, 15, 27, 28,
    2, 4, 7, 13, 16, 26, 29, 42,
    3, 8, 12, 17, 25, 30, 41, 43,
    9, 11, 18, 24, 37, 40, 44, 53,
    10, 19, 23, 32, 39, 45, 52, 54,
    20, 22, 33, 38, 46, 51, 55, 60,
    21, 34, 37, 47, 50, 56, 59, 61,
    35, 36, 48, 49, 57, 58, 62, 63,
], dtype=np.int32)

W1, W2, W3, W5, W6, W7 = 2841, 2676, 2408, 1609, 1108, 565


def _idct_row_wang(c):
    """idctrow on 8 [N]-arrays of int32 (AmvJpeg.c:1082-1128)."""
    x1 = c[4] << 11
    x2, x3, x4, x5, x6, x7 = c[6], c[2], c[1], c[7], c[5], c[3]
    shortcut = (x1 | x2 | x3 | x4 | x5 | x6 | x7) == 0
    short_val = c[0] << 3

    x0 = (c[0] << 11) + 128
    x8 = W7 * (x4 + x5)
    x4b = x8 + (W1 - W7) * x4
    x5b = x8 - (W1 + W7) * x5
    x8 = W3 * (x6 + x7)
    x6b = x8 - (W3 - W5) * x6
    x7b = x8 - (W3 + W5) * x7
    x8 = x0 + x1
    x0 = x0 - x1
    x1b = W6 * (x3 + x2)
    x2b = x1b - (W2 + W6) * x2
    x3b = x1b + (W2 - W6) * x3
    x1c = x4b + x6b
    x4c = x4b - x6b
    x6c = x5b + x7b
    x5c = x5b - x7b
    x7c = x8 + x3b
    x8 = x8 - x3b
    x3c = x0 + x2b
    x0 = x0 - x2b
    x2c = (181 * (x4c + x5c) + 128) >> 8
    x4d = (181 * (x4c - x5c) + 128) >> 8
    out = [(x7c + x1c) >> 8, (x3c + x2c) >> 8, (x0 + x4d) >> 8,
           (x8 + x6c) >> 8, (x8 - x6c) >> 8, (x0 - x4d) >> 8,
           (x3c - x2c) >> 8, (x7c - x1c) >> 8]
    return [jnp.where(shortcut, short_val, o) for o in out]


def _idct_col_wang(c):
    """idctcol (AmvJpeg.c:1130-1176); returns clipped [-256,255] ints."""
    x1 = c[4] << 8
    x2, x3, x4, x5, x6, x7 = c[6], c[2], c[1], c[7], c[5], c[3]
    shortcut = (x1 | x2 | x3 | x4 | x5 | x6 | x7) == 0
    short_val = jnp.clip((c[0] + 32) >> 6, -256, 255)

    x0 = (c[0] << 8) + 8192
    x8 = W7 * (x4 + x5) + 4
    x4b = (x8 + (W1 - W7) * x4) >> 3
    x5b = (x8 - (W1 + W7) * x5) >> 3
    x8 = W3 * (x6 + x7) + 4
    x6b = (x8 - (W3 - W5) * x6) >> 3
    x7b = (x8 - (W3 + W5) * x7) >> 3
    x8 = x0 + x1
    x0 = x0 - x1
    x1b = W6 * (x3 + x2) + 4
    x2b = (x1b - (W2 + W6) * x2) >> 3
    x3b = (x1b + (W2 - W6) * x3) >> 3
    x1c = x4b + x6b
    x4c = x4b - x6b
    x6c = x5b + x7b
    x5c = x5b - x7b
    x7c = x8 + x3b
    x8 = x8 - x3b
    x3c = x0 + x2b
    x0 = x0 - x2b
    x2c = (181 * (x4c + x5c) + 128) >> 8
    x4d = (181 * (x4c - x5c) + 128) >> 8
    out = [(x7c + x1c) >> 14, (x3c + x2c) >> 14, (x0 + x4d) >> 14,
           (x8 + x6c) >> 14, (x8 - x6c) >> 14, (x0 - x4d) >> 14,
           (x3c - x2c) >> 14, (x7c - x1c) >> 14]
    return [jnp.where(shortcut, short_val, jnp.clip(o, -256, 255))
            for o in out]


@partial(jax.jit, static_argnames=("mb_w", "mb_h", "width", "height"))
def decode_transform_amvlib(levels_zz, mb_w: int, mb_h: int,
                            width: int, height: int):
    """amvlib-semantics transform: levels -> (y, u, v) int32 planes.

    y is level-shifted (+128) and clipped to [-128, 383] like amvlib's Y
    buffer; u/v stay zero-centered in [-256, 255] (StoreBuffer consumes
    them that way).
    """
    F, M = levels_zz.shape[0], levels_zz.shape[1]
    lv = levels_zz.astype(jnp.int32)

    # DC prediction in the level domain, init 0 (HufBlock semantics)
    dc_y = jnp.cumsum(lv[:, :, :4, 0].reshape(F, M * 4), axis=1).reshape(F, M, 4)
    dc_u = jnp.cumsum(lv[:, :, 4, 0], axis=1)
    dc_v = jnp.cumsum(lv[:, :, 5, 0], axis=1)
    dc = jnp.concatenate([dc_y, dc_u[..., None], dc_v[..., None]], axis=-1)
    lv = lv.at[..., 0].set(dc)

    # dequant in zigzag order with amvlib's Q75 pair, then the buggy
    # zigzag->raster gather
    qt = jnp.concatenate([
        jnp.tile(jnp.asarray(T.AMVLIB_QUANT_LUMA)[None], (4, 1)),
        jnp.tile(jnp.asarray(T.AMVLIB_QUANT_CHROMA)[None], (2, 1))])
    deq_zz = lv * qt[None, None]
    raster = jnp.take(deq_zz, jnp.asarray(AMVLIB_ZIGZAG), axis=-1)
    blocks = raster.reshape(F, M, 6, 8, 8)

    rows_in = [[blocks[..., r, i] for i in range(8)] for r in range(8)]
    mid = [None] * 8
    for r in range(8):
        mid[r] = _idct_row_wang(rows_in[r])
    cols = [None] * 8
    for j in range(8):
        cols[j] = _idct_col_wang([mid[i][j] for i in range(8)])
    # pix[..., i, j] = cols[j][i]
    pix = jnp.stack([jnp.stack([cols[j][i] for j in range(8)], axis=-1)
                     for i in range(8)], axis=-2)

    offset = jnp.where(jnp.arange(6) < 4, 128, 0)
    pix = pix + offset[None, None, :, None, None]

    mcu = pix.reshape(F, mb_h, mb_w, 6, 8, 8)
    yb = mcu[:, :, :, :4].reshape(F, mb_h, mb_w, 2, 2, 8, 8)
    ycoded = yb.transpose(0, 1, 3, 5, 2, 4, 6).reshape(F, 16 * mb_h, 16 * mb_w)
    ucoded = mcu[:, :, :, 4].transpose(0, 1, 3, 2, 4).reshape(F, 8 * mb_h, 8 * mb_w)
    vcoded = mcu[:, :, :, 5].transpose(0, 1, 3, 2, 4).reshape(F, 8 * mb_h, 8 * mb_w)
    # amvlib writes bottom-up BMP rows, cancelling the AMV flip; returning
    # display-oriented planes means flipping like the FFmpeg path
    y = ycoded[:, height - 1::-1, :width]
    u = ucoded[:, height // 2 - 1::-1, :width // 2]
    v = vcoded[:, height // 2 - 1::-1, :width // 2]
    return y, u, v


def decode_frames_amvlib_rgb(payloads, width, height):
    """Full amvlib-path decode to RGB (StoreBuffer fixed-point conversion,
    AmvJpeg.c:789-840): uint8 [F, H, W, 3]."""
    mb_w, mb_h = (width + 15) // 16, (height + 15) // 16
    levels = huffman_decode_frames(payloads, mb_w * mb_h)
    y, u, v = decode_transform_amvlib(jnp.asarray(levels), mb_w, mb_h,
                                      width, height)
    yv = y << 8
    uu = jnp.repeat(jnp.repeat(u, 2, axis=1), 2, axis=2)
    vv = jnp.repeat(jnp.repeat(v, 2, axis=1), 2, axis=2)
    r = (yv + 18 * uu + 367 * vv) >> 8
    g = (yv - 159 * uu - 220 * vv) >> 8
    b = (yv + 411 * uu - 29 * vv) >> 8
    rgb = jnp.stack([r, g, b], axis=-1)
    return np.asarray(jnp.clip(rgb, 0, 255).astype(jnp.uint8))
