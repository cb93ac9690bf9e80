"""Packed/dithered RGB output conversions (libswscale yuv2rgb parity).

Implements the reference's full packed-output family from YUV420:

* 32-bit  XRGB/XBGR          (yuv2rgb.c:304-328  yuv2rgb_c_32)
* 24-bit  RGB/BGR            (yuv2rgb.c:330-381  yuv2rgb_c_24_{rgb,bgr})
* 16/15-bit 565/555          (yuv2rgb.c:385-401  yuv2rgb_c_16, undithered;
                              swscale.c:578-607  2x2-dithered scaled path)
* 8-bit   R3G3B2/B2G3R3      (yuv2rgb.c:424-455  yuv2rgb_c_8_ordered_dither)
* 4-bit   1-2-1, nibble pair (yuv2rgb.c:493-528  yuv2rgb_c_4_ordered_dither)
* 4-bit   1-2-1, one byte/px (yuv2rgb.c:550-582  yuv2rgb_c_4b_ordered_dither)
* 1-bit   monochrome         (yuv2rgb.c:584-615  yuv2rgb_c_1_ordered_dither)
* YUYV422 / UYVY422 packing  (swscale.c:705+     PIX_FMT_YUYV422 case)

The conversion is table-driven exactly like the reference: one flat
table arena per depth built by the `yuv2rgb_c_init_tables` recipe
(yuv2rgb.c:697-902) — clipped luma ramp `table_Y`, per-depth quantized
r/g/b sub-tables at the reference's arena offsets, per-U/V index
offsets `div_round(c * (i-128), 76309)` — and per-pixel gathers
`r[Y+off_r(V)+dither] + g[Y+off_g(U,V)+dither] + b[Y+off_b(U)+dither]`.
The ordered-dither matrices are the reference's own
(dither_2x2_4/2x2_8/8x8_32/8x8_73/8x8_220, yuv2rgb.c:52-120).

Divergences from the C (documented, deliberate):

* Index clamping.  The C indexes its malloc'd arena out of the defined
  sub-table span for saturated pixels (e.g. the 4-bpp path adds a
  0..217 dither to an index that already spans -197..451), silently
  reading the *next* sub-table or uninitialized heap.  We reproduce the
  arena layout — so reads that land in an adjacent initialized region
  match the C bit-for-bit — and clamp the flat index to the arena, with
  the two uninitialized gap regions zero-filled.  Where the C's
  behavior is undefined (heap garbage), ours is deterministic.
* Width tails.  The C's dithered unscaled converters silently DROP a
  trailing 4-pixel group (their EPILOG1 tail body is empty,
  yuv2rgb.c:290-298); we convert every pixel and require even width
  (multiple of 8 for monochrome).

Chroma upsampling is 2x2 replication, matching the unscaled C loops
(PROLOG processes two rows per chroma row, pu[i] shared by two
columns, yuv2rgb.c:259-298).

Performance note: this is a parity/export path (gathers from ~2K-entry
tables), not a bench headline; the hot AMV chain uses kernels/color.py.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

# --- ordered-dither matrices (spec data, yuv2rgb.c:52-120) ---

DITHER_2X2_4 = np.array([[1, 3], [2, 0]], np.int32)
DITHER_2X2_8 = np.array([[6, 2], [0, 4]], np.int32)

DITHER_8X8_32 = np.array([
    [17, 9, 23, 15, 16, 8, 22, 14],
    [5, 29, 3, 27, 4, 28, 2, 26],
    [21, 13, 19, 11, 20, 12, 18, 10],
    [0, 24, 6, 30, 1, 25, 7, 31],
    [16, 8, 22, 14, 17, 9, 23, 15],
    [4, 28, 2, 26, 5, 29, 3, 27],
    [20, 12, 18, 10, 21, 13, 19, 11],
    [1, 25, 7, 31, 0, 24, 6, 30]], np.int32)

DITHER_8X8_73 = np.array([
    [0, 55, 14, 68, 3, 58, 17, 72],
    [37, 18, 50, 32, 40, 22, 54, 35],
    [9, 64, 5, 59, 13, 67, 8, 63],
    [46, 27, 41, 23, 49, 31, 44, 26],
    [2, 57, 16, 71, 1, 56, 15, 70],
    [39, 21, 52, 34, 38, 19, 51, 33],
    [11, 66, 7, 62, 10, 65, 6, 60],
    [48, 30, 43, 25, 47, 29, 42, 24]], np.int32)

DITHER_8X8_220 = np.array([
    [117, 62, 158, 103, 113, 58, 155, 100],
    [34, 199, 21, 186, 31, 196, 17, 182],
    [144, 89, 131, 76, 141, 86, 127, 72],
    [0, 165, 41, 206, 10, 175, 52, 217],
    [110, 55, 151, 96, 120, 65, 162, 107],
    [28, 193, 14, 179, 38, 203, 24, 189],
    [138, 83, 124, 69, 148, 93, 134, 79],
    [7, 172, 48, 213, 3, 168, 45, 210]], np.int32)

# Inverse_Table_6_9[2] "unspecified" — swscale's default coefficient
# set (yuv2rgb.c:205-214, SWS_CS_DEFAULT rows are identical).
DEFAULT_INV_TABLE = (104597, 132201, 25675, 53279)

# fmt -> (depth, is_rgb).  is_rgb means R occupies the high field
# (matches the reference's isRgb branch in yuv2rgb_c_init_tables).
_FORMATS = {
    "rgb32": (32, True), "bgr32": (32, False),
    "rgb24": (24, True), "bgr24": (24, False),
    "rgb565": (16, True), "bgr565": (16, False),
    "rgb555": (15, True), "bgr555": (15, False),
    "rgb8": (8, True), "bgr8": (8, False),
    "rgb4": (4, True), "bgr4": (4, False),
    "rgb4_byte": (4, True), "bgr4_byte": (4, False),
    "monoblack": (1, True),
}

# Arena geometry shared by depths 32/16/15/8/4 (yuv2rgb.c:749-869):
# r at +197 spanning [-197, 452), b at +882 spanning [-232, 488),
# g at +1561 spanning [-132, 388); total 197 + 2*682 + 256 + 132.
_ARENA_LEN = 197 + 2 * 682 + 256 + 132
_BASE_R, _BASE_B, _BASE_G = 197, 882, 1561


def _tdiv(a: int, b: int) -> int:
    """C integer division (truncate toward zero)."""
    q = abs(a) // abs(b)
    return q if (a < 0) == (b < 0) else -q


def _div_round(dividend: int, divisor: int) -> int:
    """yuv2rgb.c:689-695 div_round (round half away from zero)."""
    if dividend > 0:
        return (dividend + (divisor >> 1)) // divisor
    return -((-dividend + (divisor >> 1)) // divisor)


@lru_cache(maxsize=None)
def _build_tables(fmt: str, full_range: bool,
                  brightness: int = 0, contrast: int = 65536,
                  saturation: int = 65536,
                  inv_table: tuple = DEFAULT_INV_TABLE):
    """yuv2rgb_c_init_tables (yuv2rgb.c:697-902) -> (arena int32 [L],
    base offsets (r, g, b), offset tables off_r/off_gu/off_gv/off_b
    int32 [256])."""
    depth, is_rgb = _FORMATS[fmt]

    crv, cbu = int(inv_table[0]), int(inv_table[1])
    cgu, cgv = -int(inv_table[2]), -int(inv_table[3])
    cy, oy = 1 << 16, 0
    if not full_range:
        cy = _tdiv(cy * 255, 219)
        oy = 16 << 16
    else:
        crv = _tdiv(crv * 224, 255)
        cbu = _tdiv(cbu * 224, 255)
        cgu = _tdiv(cgu * 224, 255)
        cgv = _tdiv(cgv * 224, 255)
    cy = (cy * contrast) >> 16
    crv = (crv * contrast * saturation) >> 32
    cbu = (cbu * contrast * saturation) >> 32
    cgu = (cgu * contrast * saturation) >> 32
    cgv = (cgv * contrast * saturation) >> 32
    oy -= 256 * brightness

    ty = np.empty(1024, np.int64)
    for i in range(1024):
        j = (cy * (((i - 384) << 16) - oy) + (1 << 31)) >> 32
        ty[i] = min(255, max(0, j))

    if depth == 32:
        arena = np.zeros(_ARENA_LEN, np.int64)
        for i in range(-197, 256 + 197):
            arena[_BASE_R + i] = ty[i + 384] << (16 if is_rgb else 0)
        for i in range(-132, 256 + 132):
            arena[_BASE_G + i] = ty[i + 384] << 8
        for i in range(-232, 256 + 232):
            arena[_BASE_B + i] = ty[i + 384] << (0 if is_rgb else 16)
        bases = (_BASE_R, _BASE_G, _BASE_B)
    elif depth == 24:
        # one shared clip table, all channels at +232 (yuv2rgb.c:764-772)
        arena = np.zeros(256 + 2 * 232, np.int64)
        for i in range(-232, 256 + 232):
            arena[232 + i] = ty[i + 384]
        bases = (232, 232, 232)
    elif depth in (15, 16):
        arena = np.zeros(_ARENA_LEN, np.int64)
        for i in range(-197, 256 + 197):
            j = int(ty[i + 384]) >> 3
            if is_rgb:
                j <<= 11 if depth == 16 else 10
            arena[_BASE_R + i] = j
        for i in range(-132, 256 + 132):
            j = int(ty[i + 384]) >> (2 if depth == 16 else 3)
            arena[_BASE_G + i] = j << 5
        for i in range(-232, 256 + 232):
            j = int(ty[i + 384]) >> 3
            if not is_rgb:
                j <<= 11 if depth == 16 else 10
            arena[_BASE_B + i] = j
        bases = (_BASE_R, _BASE_G, _BASE_B)
    elif depth == 8:
        arena = np.zeros(_ARENA_LEN, np.int64)
        for i in range(-197, 256 + 197):
            j = (int(ty[i + 384 - 16]) + 18) // 36
            if is_rgb:
                j <<= 5
            arena[_BASE_R + i] = j
        for i in range(-132, 256 + 132):
            j = (int(ty[i + 384 - 16]) + 18) // 36
            if not is_rgb:
                j <<= 1
            arena[_BASE_G + i] = j << 2
        for i in range(-232, 256 + 232):
            j = (int(ty[i + 384 - 37]) + 43) // 85
            if not is_rgb:
                j <<= 6
            arena[_BASE_B + i] = j
        bases = (_BASE_R, _BASE_G, _BASE_B)
    elif depth == 4:
        arena = np.zeros(_ARENA_LEN, np.int64)
        for i in range(-197, 256 + 197):
            j = int(ty[i + 384 - 110]) >> 7
            if is_rgb:
                j <<= 3
            arena[_BASE_R + i] = j
        for i in range(-132, 256 + 132):
            j = (int(ty[i + 384 - 37]) + 43) // 85
            arena[_BASE_G + i] = j << 1
        for i in range(-232, 256 + 232):
            j = int(ty[i + 384 - 110]) >> 7
            if not is_rgb:
                j <<= 3
            arena[_BASE_B + i] = j
        bases = (_BASE_R, _BASE_G, _BASE_B)
    elif depth == 1:
        arena = np.zeros(512, np.int64)
        for i in range(512):
            arena[i] = int(ty[i + 384 - 110]) >> 7
        bases = (0, 0, 0)
    else:  # pragma: no cover
        raise ValueError(fmt)

    off_r = np.array([_div_round(crv * (i - 128), 76309)
                      for i in range(256)], np.int32)
    off_gu = np.array([_div_round(cgu * (i - 128), 76309)
                       for i in range(256)], np.int32)
    off_gv = np.array([_div_round(cgv * (i - 128), 76309)
                       for i in range(256)], np.int32)
    off_b = np.array([_div_round(cbu * (i - 128), 76309)
                      for i in range(256)], np.int32)
    return (arena.astype(np.int32), bases, off_r, off_gu, off_gv, off_b)


def _upsample2(c: jnp.ndarray) -> jnp.ndarray:
    c = jnp.repeat(c, 2, axis=-2)
    return jnp.repeat(c, 2, axis=-1)


def _tile(mat: np.ndarray, h: int, w: int) -> np.ndarray:
    """Per-pixel dither plane D[y % rows][x % cols] of shape (h, w)."""
    rows, cols = mat.shape
    return mat[np.arange(h)[:, None] % rows, np.arange(w)[None, :] % cols]


def _dither_planes(fmt: str, depth: int, dither: bool, h: int, w: int):
    """(dr, dg, db) int32 (h, w) numpy planes per the reference rules."""
    z = np.zeros((h, w), np.int32)
    if depth in (15, 16):
        if not dither:          # unscaled yuv2rgb_c_16 path
            return z, z, z
        # scaled path, swscale.c:578-607: dr/db from dither_2x2_8 on
        # complementary rows, dg from 2x2_4 (565) or column-swapped
        # 2x2_8 (555)
        dr = _tile(DITHER_2X2_8, h, w)
        db = _tile(DITHER_2X2_8[::-1], h, w)
        if depth == 16:
            dg = _tile(DITHER_2X2_4, h, w)
        else:
            dg = _tile(DITHER_2X2_8[:, ::-1], h, w)
        return dr, dg, db
    if depth == 8:              # yuv2rgb.c:424-455: r,g share d32; b d64
        drg = _tile(DITHER_8X8_32, h, w)
        return drg, drg, _tile(DITHER_8X8_73, h, w)
    if depth == 4:              # yuv2rgb.c:493-582: r,b share d128; g d64
        drb = _tile(DITHER_8X8_220, h, w)
        return drb, _tile(DITHER_8X8_73, h, w), drb
    if depth == 1:              # yuv2rgb.c:584-615
        d = _tile(DITHER_8X8_220, h, w)
        return z, d, z
    return z, z, z


@partial(jax.jit, static_argnames=("fmt", "full_range", "dither",
                                   "brightness", "contrast",
                                   "saturation"))
def yuv420_to_packed(y: jnp.ndarray, cb: jnp.ndarray, cr: jnp.ndarray,
                     fmt: str = "rgb565", full_range: bool = True,
                     dither: bool = True, brightness: int = 0,
                     contrast: int = 65536, saturation: int = 65536):
    """uint8 YUV420 planes [..., H, W] / [..., H/2, W/2] -> packed pixels.

    Output by fmt: rgb32/bgr32 -> uint32 [..., H, W] (X8R8G8B8 /
    X8B8G8R8); rgb24/bgr24 -> uint8 [..., H, W, 3] in memory order;
    rgb565/bgr565/rgb555/bgr555 -> uint16 [..., H, W] (`dither`
    selects the scaled-path 2x2 dither, swscale.c:578-607, vs the
    undithered unscaled converter yuv2rgb.c:385-401); rgb8/bgr8 ->
    uint8 R3G3B2/B2G3R3; rgb4/bgr4 -> uint8 [..., H, W/2] nibble pairs
    (low nibble = even column); rgb4_byte/bgr4_byte -> uint8 1-2-1 per
    byte; monoblack -> uint8 [..., H, W/8] MSB-first bits."""
    if fmt not in _FORMATS:
        raise ValueError(f"unknown packed format {fmt!r}")
    depth, is_rgb = _FORMATS[fmt]
    h, w = y.shape[-2], y.shape[-1]
    if w % 2 or h % 2:
        raise ValueError("packed output needs even dimensions")
    if fmt == "monoblack" and w % 8:
        raise ValueError("monoblack needs width % 8 == 0")

    arena, bases, off_r, off_gu, off_gv, off_b = _build_tables(
        fmt, full_range, brightness, contrast, saturation)
    base_r, base_g, base_b = bases
    arena_j = jnp.asarray(arena)
    hi = arena.shape[0] - 1

    yy = y.astype(jnp.int32)
    u = _upsample2(cb.astype(jnp.int32))
    v = _upsample2(cr.astype(jnp.int32))
    dr, dg, db = _dither_planes(fmt, depth, dither, h, w)

    def lut(base, off, d):
        idx = jnp.clip(yy + off + base + jnp.asarray(d), 0, hi)
        return jnp.take(arena_j, idx)

    gv = jnp.take(jnp.asarray(off_gu), u) + jnp.take(jnp.asarray(off_gv), v)
    if depth == 1:
        # g table only, at U=V=128 (offsets 0), yuv2rgb.c:584-587
        bit = lut(base_g, 0, dg)
        bits = bit.reshape(*bit.shape[:-1], w // 8, 8).astype(jnp.uint8)
        weights = jnp.asarray([128, 64, 32, 16, 8, 4, 2, 1], jnp.uint8)
        return jnp.sum(bits * weights, axis=-1, dtype=jnp.uint8)

    r = lut(base_r, jnp.take(jnp.asarray(off_r), v), dr)
    g = lut(base_g, gv, dg)
    b = lut(base_b, jnp.take(jnp.asarray(off_b), u), db)

    if depth == 24:
        first, last = (r, b) if is_rgb else (b, r)
        return jnp.stack([first, g, last], axis=-1).astype(jnp.uint8)
    s = r + g + b
    if depth == 32:
        return s.astype(jnp.uint32)
    if depth in (15, 16):
        return s.astype(jnp.uint16)
    if fmt in ("rgb4", "bgr4"):  # nibble pack, low = even column
        pairs = s.reshape(*s.shape[:-1], w // 2, 2)
        return (pairs[..., 0] | (pairs[..., 1] << 4)).astype(jnp.uint8)
    return s.astype(jnp.uint8)   # rgb8/bgr8 and rgb4_byte/bgr4_byte


@jax.jit
def yuv420_to_yuyv422(y: jnp.ndarray, cb: jnp.ndarray, cr: jnp.ndarray):
    """uint8 YUV420 planes -> packed YUYV422 bytes [..., H, 2*W]
    (Y0 U Y1 V per pixel pair, swscale.c:705-711; chroma rows
    replicated 420->422)."""
    h, w = y.shape[-2], y.shape[-1]
    u = jnp.repeat(cb, 2, axis=-2)
    v = jnp.repeat(cr, 2, axis=-2)
    out = jnp.stack([y[..., 0::2], u, y[..., 1::2], v], axis=-1)
    return out.reshape(*y.shape[:-2], h, 2 * w).astype(jnp.uint8)


@jax.jit
def yuv420_to_uyvy422(y: jnp.ndarray, cb: jnp.ndarray, cr: jnp.ndarray):
    """uint8 YUV420 planes -> packed UYVY422 bytes [..., H, 2*W]
    (U Y0 V Y1 per pixel pair)."""
    h, w = y.shape[-2], y.shape[-1]
    u = jnp.repeat(cb, 2, axis=-2)
    v = jnp.repeat(cr, 2, axis=-2)
    out = jnp.stack([u, y[..., 0::2], v, y[..., 1::2]], axis=-1)
    return out.reshape(*y.shape[:-2], h, 2 * w).astype(jnp.uint8)
