"""Fused YUV420 <-> RGB conversion kernels (libswscale's role, L5).

The reference feeds the AMV encoder YUVJ420P (full-range JPEG YUV,
ffmpeg.c:757 via libswscale) and exports RGB through either libswscale or
amvlib's fixed-point BMP path (C-AMVDecoder/amvlib/AmvJpeg.c StoreBuffer,
:789-840).  Two conversion modes are provided:

* "bt601": full-range BT.601 (the JPEG/JFIF convention), integer
  fixed-point with 16-bit precision — the idiomatic replacement for
  libswscale's default path;
* "amvlib": bit-faithful reproduction of StoreBuffer's odd fixed-point
  constants (rr = (y<<8 + 18u + 367v)>>8 etc. on zero-centered chroma).

Chroma upsampling is nearest-neighbour (2x pixel replication), matching
both reference paths.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _upsample2(c: jnp.ndarray) -> jnp.ndarray:
    """[..., H/2, W/2] -> [..., H, W] by replication."""
    c = jnp.repeat(c, 2, axis=-2)
    return jnp.repeat(c, 2, axis=-1)


@jax.jit
def yuv420_to_rgb_bt601(y: jnp.ndarray, cb: jnp.ndarray, cr: jnp.ndarray):
    """Full-range BT.601 (JPEG) -> uint8 RGB [..., H, W, 3].

    R = Y + 1.402 (Cr-128); G = Y - 0.344136 (Cb-128) - 0.714136 (Cr-128);
    B = Y + 1.772 (Cb-128), computed in 16-bit fixed point.
    """
    yv = y.astype(jnp.int32) << 16
    u = _upsample2(cb.astype(jnp.int32)) - 128
    v = _upsample2(cr.astype(jnp.int32)) - 128
    r = (yv + 91881 * v + 32768) >> 16
    g = (yv - 22554 * u - 46802 * v + 32768) >> 16
    b = (yv + 116130 * u + 32768) >> 16
    rgb = jnp.stack([r, g, b], axis=-1)
    return jnp.clip(rgb, 0, 255).astype(jnp.uint8)


@jax.jit
def yuv420_to_rgb_amvlib(y: jnp.ndarray, cb: jnp.ndarray, cr: jnp.ndarray):
    """amvlib StoreBuffer fixed-point math (AmvJpeg.c:808-829), on
    128-centered chroma, clamped to uint8."""
    yv = y.astype(jnp.int32) << 8
    u = _upsample2(cb.astype(jnp.int32)) - 128
    v = _upsample2(cr.astype(jnp.int32)) - 128
    r = (yv + 18 * u + 367 * v) >> 8
    g = (yv - 159 * u - 220 * v) >> 8
    b = (yv + 411 * u - 29 * v) >> 8
    rgb = jnp.stack([r, g, b], axis=-1)
    return jnp.clip(rgb, 0, 255).astype(jnp.uint8)


@jax.jit
def rgb_to_yuv420_bt601(rgb: jnp.ndarray):
    """uint8 RGB [..., H, W, 3] -> full-range YUV420 planes.

    Y = 0.299R + 0.587G + 0.114B; Cb/Cr box-filtered 2x2 then offset 128.
    """
    r = rgb[..., 0].astype(jnp.int32)
    g = rgb[..., 1].astype(jnp.int32)
    b = rgb[..., 2].astype(jnp.int32)
    yy = (19595 * r + 38470 * g + 7471 * b + 32768) >> 16
    cb_full = ((-11059 * r - 21709 * g + 32768 * b + 32768) >> 16) + 128
    cr_full = ((32768 * r - 27439 * g - 5329 * b + 32768) >> 16) + 128
    # 2x2 average for 420 chroma
    def box2(c):
        c00 = c[..., 0::2, 0::2]
        c01 = c[..., 0::2, 1::2]
        c10 = c[..., 1::2, 0::2]
        c11 = c[..., 1::2, 1::2]
        return (c00 + c01 + c10 + c11 + 2) >> 2
    y8 = jnp.clip(yy, 0, 255).astype(jnp.uint8)
    cb8 = jnp.clip(box2(cb_full), 0, 255).astype(jnp.uint8)
    cr8 = jnp.clip(box2(cr_full), 0, 255).astype(jnp.uint8)
    return y8, cb8, cr8


def yuv420_to_rgb(y, cb, cr, mode: str = "bt601"):
    fn = {"bt601": yuv420_to_rgb_bt601, "amvlib": yuv420_to_rgb_amvlib}[mode]
    return np.asarray(fn(jnp.asarray(y), jnp.asarray(cb), jnp.asarray(cr)))
