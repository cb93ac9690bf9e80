"""Standard baseline MJPEG codec (per-frame tables).

Generalizes the AMV path: quant/Huffman tables are parsed from each frame
(bitstream/jpeg_parse.py) instead of canned, output is top-down (no AMV
flip), sampling may be 4:2:0 / 4:2:2 / 4:4:4 / grayscale, and restart
markers (DRI/RSTn, mjpegdec.c:533-548) are decoded with the DC-prediction
reset expressed as a restart-segmented cumsum on device.  Covers the
reference's mjpegdec.c baseline usage for MJPEG-in-AVI material (which
commonly carries DRI/RST); the same bit-exact integer IDCT path is reused
on device.  Progressive JPEG (decode_block_progressive, mjpegdec.c:432)
routes through bitstream/jpeg_progressive.py: its multi-scan coefficient
recovery feeds the same device dequant/IDCT, with absolute (rather than
differential) DC.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..bitstream import jpeg_tables as T
from ..bitstream.jpeg_parse import parse_jpeg
from ..bitstream.entropy import huffman_decode_frames
from ..verify import ref_jpeg as R
from ..kernels import idct as KI

_K3 = {
    (0, 0): (T.BITS_DC_LUMA, T.VALS_DC_LUMA),
    (0, 1): (T.BITS_DC_CHROMA, T.VALS_DC_CHROMA),
    (1, 0): (T.BITS_AC_LUMA, T.VALS_AC_LUMA),
    (1, 1): (T.BITS_AC_CHROMA, T.VALS_AC_CHROMA),
}


def _tables_are_k3(frame) -> bool:
    for key, (bits, vals) in _K3.items():
        got = frame.huff.get(key)
        if got is None:
            return False
        if not (np.array_equal(got[0], bits) and np.array_equal(got[1], vals)):
            return False
    return True


def _layout_of(frame):
    """(kind, nb, mcu_w, mcu_h) for the supported interleaved samplings
    (mjpegdec.c mjpeg_decode_sof's h/v handling, baseline subset)."""
    comps = frame.components
    if len(comps) == 1 and comps[0][1:3] == (1, 1):
        return ("gray", 1, 8, 8)
    if len(comps) == 3:
        sub = tuple(c[1:3] for c in comps)
        if sub == ((2, 2), (1, 1), (1, 1)):
            return ("420", 6, 16, 16)
        if sub == ((2, 1), (1, 1), (1, 1)):
            return ("422", 4, 16, 8)
        if sub == ((1, 1), (1, 1), (1, 1)):
            return ("444", 3, 8, 8)
    raise ValueError(
        "unsupported MJPEG sampling "
        f"{[(c[1], c[2]) for c in comps]} (4:2:0/4:2:2/4:4:4/gray only)")


# per layout: component index of each MCU block
_COMP_OF_BLOCK = {"420": (0, 0, 0, 0, 1, 2), "422": (0, 0, 1, 2),
                  "444": (0, 1, 2), "gray": (0,)}


def _decode_scan_generic(scan: bytes, n_mcu: int, frame) -> np.ndarray:
    """Python Huffman decode with arbitrary parsed tables, any supported
    sampling, and restart markers (scalar oracle for the C fast path;
    mjpegdec.c decode_block + the :533-548 RSTn resync)."""
    luts = {}
    for key, spec in frame.huff.items():
        luts[key] = T.build_decode_table(*spec)
    blocks = frame.mcu_blocks()
    nb = len(blocks)
    tabs = [(luts[(0, dc_id)], luts[(1, ac_id)])
            for (_, dc_id, ac_id, _) in blocks]
    ri = frame.restart_interval

    br = R.BitReader(scan)
    levels = np.zeros((n_mcu, nb, 64), dtype=np.int16)
    for m in range(n_mcu):
        if ri and m and m % ri == 0:
            br.pos = (br.pos + 7) & ~7          # byte align
            marker = br.get_bits(16)
            if marker & 0xFFF8 != 0xFFD0:
                raise ValueError(f"expected RSTn at MCU {m}, "
                                 f"got 0x{marker:04x}")
        for b in range(nb):
            dc_lut, ac_lut = tabs[b]
            sym = R._read_vlc(br, dc_lut)
            levels[m, b, 0] = br.get_xbits(sym) if sym else 0
            i = 0
            while True:
                code = R._read_vlc(br, ac_lut)
                if code == 0x00:
                    break
                run, size = code >> 4, code & 0xF
                if size == 0:
                    if run != 15:
                        raise ValueError("unexpected AC symbol")
                    i += 16
                    continue
                level = br.get_xbits(size)
                i += run + 1
                if i > 63:
                    raise ValueError("AC index overflow")
                levels[m, b, i] = level
                if i == 63:
                    break
    return levels


def _seg_cumsum(x, seg_len: int):
    """Cumulative sum along axis 1 that resets every seg_len entries
    (seg_len <= 0: plain cumsum).  The restart-marker DC-prediction
    reset (mjpegdec.c:545-547) expressed as prefix subtraction so it
    stays one XLA gather instead of a ragged scan."""
    c = jnp.cumsum(x, axis=1)
    if seg_len <= 0 or x.shape[1] <= seg_len:
        return c
    idx = jnp.arange(x.shape[1])
    start = (idx // seg_len) * seg_len
    prev = jnp.take(c, jnp.maximum(start - 1, 0), axis=1)
    return c - jnp.where(start > 0, prev, 0)


def _assemble(pix, layout, mb_w, mb_h, width, height):
    """Pixel blocks [F, M, nb, 8, 8] -> top-down planes per layout."""
    F = pix.shape[0]
    mcu = pix.reshape(F, mb_h, mb_w, -1, 8, 8)
    if layout == "420":
        yb = mcu[:, :, :, :4].reshape(F, mb_h, mb_w, 2, 2, 8, 8)
        y = yb.transpose(0, 1, 3, 5, 2, 4, 6).reshape(
            F, 16 * mb_h, 16 * mb_w)[:, :height, :width]
        cb = mcu[:, :, :, 4].transpose(0, 1, 3, 2, 4).reshape(
            F, 8 * mb_h, 8 * mb_w)[:, :height // 2, :width // 2]
        cr = mcu[:, :, :, 5].transpose(0, 1, 3, 2, 4).reshape(
            F, 8 * mb_h, 8 * mb_w)[:, :height // 2, :width // 2]
        return y, cb, cr
    if layout == "422":
        yb = mcu[:, :, :, :2]                  # [F, mh, mw, 2, 8, 8]
        y = yb.transpose(0, 1, 4, 2, 3, 5).reshape(
            F, 8 * mb_h, 16 * mb_w)[:, :height, :width]
        cb = mcu[:, :, :, 2].transpose(0, 1, 3, 2, 4).reshape(
            F, 8 * mb_h, 8 * mb_w)[:, :height, :(width + 1) // 2]
        cr = mcu[:, :, :, 3].transpose(0, 1, 3, 2, 4).reshape(
            F, 8 * mb_h, 8 * mb_w)[:, :height, :(width + 1) // 2]
        return y, cb, cr
    if layout == "444":
        planes = [mcu[:, :, :, k].transpose(0, 1, 3, 2, 4).reshape(
            F, 8 * mb_h, 8 * mb_w)[:, :height, :width] for k in range(3)]
        return tuple(planes)
    # gray
    y = mcu[:, :, :, 0].transpose(0, 1, 3, 2, 4).reshape(
        F, 8 * mb_h, 8 * mb_w)[:, :height, :width]
    return y, None, None


@partial(jax.jit, static_argnames=("layout", "mb_w", "mb_h", "width",
                                   "height", "restart", "dc_absolute"))
def _transform(levels_zz, qm_zz, layout, mb_w, mb_h, width, height,
               restart=0, dc_absolute=False):
    """Like amv_video.decode_transform but parameterized tables, general
    sampling, no flip, optional restart-segmented DC prediction.

    levels_zz: int16 [F, M, nb, 64] zigzag (slot 0 = DC difference, or
    the absolute quantized DC when dc_absolute — the progressive path
    resolves prediction during scan assembly, jpeg_progressive.py);
    qm_zz: int32 [nb, 64] per-block quant tables, zigzag order.
    """
    F, M, nb = levels_zz.shape[0], levels_zz.shape[1], levels_zz.shape[2]
    comp_of = _COMP_OF_BLOCK[layout]
    lv = levels_zz.astype(jnp.int32)
    if dc_absolute:
        dc = lv[:, :, :, 0] * qm_zz[None, None, :, 0] + 1024
    else:
        # blocks of each component are contiguous in MCU order for every
        # supported layout, so the per-component DC chains concatenate
        # back without a scatter
        parts = []
        for c in sorted(set(comp_of)):
            blks = [b for b in range(nb) if comp_of[b] == c]
            k = len(blks)
            x = lv[:, :, blks[0]:blks[0] + k, 0].reshape(F, M * k) * \
                qm_zz[blks[0], 0]
            s = _seg_cumsum(x, restart * k) + 1024
            parts.append(s.reshape(F, M, k))
        dc = jnp.concatenate(parts, axis=2)
    raster = jnp.take(lv, jnp.asarray(T.UNZIGZAG), axis=-1)
    qm = jnp.take(qm_zz, jnp.asarray(T.UNZIGZAG), axis=-1)[None, None]
    pix = KI.dequantize_idct(raster, dc, qm)
    return _assemble(pix, layout, mb_w, mb_h, width, height)


def _image_spans(data: bytes) -> list:
    """(start, end) byte spans of each complete SOI..EOI image in the
    buffer — a marker/segment walk (scan data is skipped via its
    escaped-0xFF structure, so table payloads can't false-positive).
    Interlaced MJPEG material carries TWO field images per packet,
    which the reference decodes in one call (mjpegdec.c eoi_parser
    :1277-1285 withholds output until the second field's EOI)."""
    import struct as _s
    spans = []
    pos, n = 0, len(data)
    start = None
    in_scan = False
    while pos + 1 < n:
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        if in_scan:
            # inside entropy data: only stuffing, RSTn or a real marker
            if marker == 0x00 or 0xD0 <= marker <= 0xD7:
                pos += 2
                continue
            in_scan = False
            continue  # re-examine the real marker
        if marker == 0xD8:
            if start is None:
                start = pos
            pos += 2
            continue
        if marker == 0xD9:
            if start is not None:
                spans.append((start, pos + 2))
                start = None
            pos += 2
            continue
        if marker == 0x01 or 0xD0 <= marker <= 0xD7 or marker == 0xFF:
            pos += 2 if marker != 0xFF else 1
            continue
        if pos + 4 > n:
            break
        seglen = _s.unpack_from(">H", data, pos + 2)[0]
        if marker == 0xDA:
            in_scan = True
        pos += 2 + seglen
    if start is not None:  # EOI-less trailing image
        spans.append((start, n))
    return spans


def _interleave_fields(top, bottom):
    """Row-interleave two field plane stacks [F, fh, w] -> [F, 2fh, w]
    (mjpegdec.c:339 doubles the line stride per field; :712-713 offsets
    the bottom field by one picture row)."""
    F, fh, w = top.shape
    out = np.empty((F, 2 * fh, w), top.dtype)
    out[:, 0::2] = top
    out[:, 1::2] = bottom
    return out


def _sof_marker(data: bytes) -> int:
    """First SOFn marker byte before the scan (0 if none found) —
    segment walk, so table payloads can't false-positive."""
    import struct as _s
    pos, n = 2, len(data)
    while pos + 4 <= n:
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            return marker
        if marker in (0xD9, 0xDA):
            return 0
        pos += 2 + _s.unpack_from(">H", data, pos + 2)[0]
    return 0


def decode_lossless_frames(payloads: list[bytes]):
    """Decode a batch of lossless (SOF3) JPEG frames.

    Returns (mode, planes): mode "rgb" with three full-size [F, H, W]
    uint8 arrays in the reference's RGB32 byte order (B, G, R —
    mjpegdec.c ljpeg_decode_rgb_scan:544-561), or mode "yuv" with one
    [F, ...] array per component at its sampled size (grayscale: one).
    All frames must share geometry/mode (mjpegdec.c:1254-1261 SOF3
    dispatch; predictors/point-transform/RCT handled per frame).
    """
    from ..bitstream.jpeg_lossless import decode_lossless
    mode0 = None
    stacks = None
    for i, p in enumerate(payloads):
        mode, planes, _ = decode_lossless(p)
        if mode0 is None:
            mode0 = mode
            stacks = [np.zeros((len(payloads),) + pl.shape, np.uint8)
                      for pl in planes]
        if mode != mode0 or len(planes) != len(stacks) or any(
                pl.shape != st.shape[1:] for pl, st in zip(planes, stacks)):
            raise ValueError("lossless frames must share geometry/mode")
        for pl, st in zip(planes, stacks):
            st[i] = pl
    return mode0, stacks


def _sof_height(data: bytes) -> int:
    """Height field of the first SOFn segment (0 if none)."""
    import struct as _s
    pos, n = 2, len(data)
    while pos + 4 <= n:
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            return _s.unpack_from(">H", data, pos + 5)[0]
        if marker in (0xD9, 0xDA):
            return 0
        pos += 2 + _s.unpack_from(">H", data, pos + 2)[0]
    return 0


def decode_interlaced_frames(payloads: list[bytes],
                             interlace_polarity: int | None = 0):
    """Decode two-field interlaced MJPEG packets (each payload carries
    both field images) and row-interleave them into full frames
    (mjpegdec.c:263-283 two-field detection, :339 stride doubling,
    :712-713 bottom-field row offset, :1277-1285 eoi_parser field
    pairing).  polarity 0 = first field on even rows (top field first,
    the default `interlace_polarity`); None = auto-detect from the
    first field's AVI1 APP0 marker when present (buggy-AVID polarity
    byte, mjpegdec.c:890-914: 2 means the first image is the bottom
    field).  Returns (y, cb, cr) with height = 2 x field height."""
    spans = [_image_spans(p) for p in payloads]
    if not all(len(s) == 2 for s in spans):
        raise ValueError("interlaced packets must carry two field images")
    fields = []
    for p, s in zip(payloads, spans):
        fields.append(p[s[0][0]:s[0][1]])
        fields.append(p[s[1][0]:s[1][1]])
    if interlace_polarity is None:
        pol = parse_jpeg(fields[0]).avi1_polarity
        interlace_polarity = 1 if pol == 2 else 0
    y, cb, cr = decode_mjpeg_frames(fields)
    f0, f1 = (0, 1) if interlace_polarity == 0 else (1, 0)
    yo = _interleave_fields(y[f0::2], y[f1::2])
    if cb is None:
        return yo, None, None
    return (yo, _interleave_fields(cb[f0::2], cb[f1::2]),
            _interleave_fields(cr[f0::2], cr[f1::2]))


def decode_mjpeg_frames(payloads: list[bytes], org_height: int = 0):
    """Decode standard MJPEG frames (baseline SOF0 or progressive SOF2,
    plus lossless SOF3 YUV/grayscale — RGB-mode lossless frames need
    decode_lossless_frames for their extra plane semantics).

    org_height is the container-declared frame height: when the coded
    SOF height is less than 3/4 of it, the stream is two-field
    interlaced (mjpegdec.c:266-274) and packets route through
    decode_interlaced_frames.  Without the hint, packets carrying two
    complete SOI..EOI images are detected as field pairs directly.

    Supports 4:2:0, 4:2:2, 4:4:4 and grayscale sampling, per-frame
    quant/Huffman tables, and restart markers (DRI/RSTn,
    mjpegdec.c:533-548).  Progressive frames (mjpegdec.c:432
    decode_block_progressive) recover coefficients scan-by-scan on the
    host then share the device dequant/IDCT.  All frames must share
    geometry; tables/DRI may vary per frame (batched per table-group).
    Returns (y, cb, cr) uint8 arrays, top-down; chroma is None for
    grayscale, half-width for 4:2:2, half-size for 4:2:0, full-size
    for 4:4:4.
    """
    if payloads:
        nimg = len(_image_spans(payloads[0]))
        h0 = _sof_height(payloads[0])
        if nimg == 2 and (not org_height or h0 < (org_height * 3) // 4):
            # polarity from the AVI1 APP0 marker when tagged
            # (mjpegdec.c:890-914), top-field-first otherwise
            return decode_interlaced_frames(payloads,
                                            interlace_polarity=None)
    sofs = [_sof_marker(p) for p in payloads]
    if any(m == 0xC3 for m in sofs):
        if not all(m == 0xC3 for m in sofs):
            raise ValueError("cannot mix lossless and DCT frames")
        mode, planes = decode_lossless_frames(payloads)
        if mode == "rgb":
            raise ValueError("RGB-mode lossless stream: use "
                             "decode_lossless_frames")
        if len(planes) == 1:
            return planes[0], None, None
        if len(planes) != 3:
            raise ValueError("unsupported lossless component count")
        return planes[0], planes[1], planes[2]
    is_prog = [m == 0xC2 for m in sofs]
    if any(is_prog):
        from ..bitstream.jpeg_progressive import decode_progressive
    frames = []
    prog_levels = {}
    for i, p in enumerate(payloads):
        if is_prog[i]:
            lv, f = decode_progressive(p)
            # synthesize scan bookkeeping so mcu_blocks()/qkey work
            f.scan_components = [(ci, 0, 0)
                                 for ci in range(len(f.components))]
            prog_levels[i] = lv
            frames.append(f)
        else:
            frames.append(parse_jpeg(p))
    f0 = frames[0]
    layout, nb, mcu_w, mcu_h = _layout_of(f0)
    for f in frames[1:]:
        if _layout_of(f)[0] != layout or (f.width, f.height) != \
                (f0.width, f0.height):
            raise ValueError("frames must share geometry and sampling")
    w, h = f0.width, f0.height
    mb_w = (w + mcu_w - 1) // mcu_w
    mb_h = (h + mcu_h - 1) // mcu_h
    n_mcu = mb_w * mb_h

    levels = np.zeros((len(frames), n_mcu, nb, 64), np.int16)
    for i, lv in prog_levels.items():
        levels[i] = lv
    base_idx = [i for i in range(len(frames)) if not is_prog[i]]
    std_scan = (layout == "420" and all(
        frames[i].scan_components == [(0, 0, 0), (1, 1, 1), (2, 1, 1)] and
        frames[i].restart_interval == 0 for i in base_idx))
    if std_scan and all(_tables_are_k3(frames[i]) for i in base_idx):
        # common case: stock tables -> reuse the fast C scan decoder
        if base_idx:
            wrapped = [b"\xFF\xD8" + frames[i].scan + b"\xFF\xD9"
                       for i in base_idx]
            levels[base_idx] = huffman_decode_frames(wrapped, n_mcu)
    else:
        from ..native import entropy_native as native
        # group frames with identical table sets for batched C decode
        def hkey(f):
            return tuple(sorted(
                (k, bits.tobytes(), vals.tobytes())
                for k, (bits, vals) in f.huff.items())) + \
                tuple(map(tuple, f.scan_components)) + (f.restart_interval,)
        groups = {}
        for i in base_idx:
            groups.setdefault(hkey(frames[i]), []).append(i)
        for idxs in groups.values():
            f = frames[idxs[0]]
            pairs = [(dc_id, ac_id)
                     for (_, dc_id, ac_id, _) in f.mcu_blocks()]
            try:
                got = native.decode_scans_custom(
                    [frames[i].scan for i in idxs], n_mcu, f.huff, pairs,
                    restart_interval=f.restart_interval)
                for j, i in enumerate(idxs):
                    levels[i] = got[j]
            except AttributeError:   # pure-python fallback (no native lib)
                for i in idxs:
                    scan = R.unescape_scan(frames[i].scan)
                    levels[i] = _decode_scan_generic(scan, n_mcu, frames[i])

    # quant tables / restart interval / DC convention may vary per
    # frame; group runs (progressive DC is absolute, restart resolved
    # during scan assembly)
    def qkey(i):
        f = frames[i]
        ri = 0 if is_prog[i] else f.restart_interval
        return b"".join(f.quant[tq].tobytes()
                        for (_, _, _, tq) in f.mcu_blocks()) + \
            bytes([ri & 0xFF, ri >> 8, is_prog[i]])

    y = cb = cr = None
    idxs_by_key = {}
    for i in range(len(frames)):
        idxs_by_key.setdefault(qkey(i), []).append(i)
    for idxs in idxs_by_key.values():
        f = frames[idxs[0]]
        qm = np.stack([f.quant[tq].astype(np.int32)
                       for (_, _, _, tq) in f.mcu_blocks()])
        yy, ccb, ccr = _transform(
            jnp.asarray(levels[idxs]), jnp.asarray(qm), layout, mb_w,
            mb_h, w, h,
            restart=0 if is_prog[idxs[0]] else f.restart_interval,
            dc_absolute=is_prog[idxs[0]])
        if y is None:
            y = np.zeros((len(frames),) + yy.shape[1:], np.uint8)
            if ccb is not None:
                cb = np.zeros((len(frames),) + ccb.shape[1:], np.uint8)
                cr = np.zeros_like(cb)
        y[idxs] = np.asarray(yy)
        if ccb is not None:
            cb[idxs], cr[idxs] = np.asarray(ccb), np.asarray(ccr)
    return y, cb, cr


# ---------------------------------------------------------------------------
# Standard MJPEG/JPEG encoding (self-consistent tables)
# ---------------------------------------------------------------------------

_SOF_SAMPLING = {"420": 0x22, "422": 0x21, "444": 0x11}


def _jpeg_header_with_tables(width, height, qm_zz: np.ndarray,
                             layout: str = "420",
                             restart_interval: int = 0) -> bytes:
    """Full JPEG header with the given quant table (all components) and the
    K.3 Huffman set — mjpegenc.c jpeg_table_header/picture_header layout —
    plus optional DRI and 4:2:2/4:4:4/grayscale SOF variants."""
    out = bytearray()
    out += b"\xFF\xD8"
    out += b"\xFF\xDB" + (2 + 65).to_bytes(2, "big") + b"\x00"
    out += bytes(np.clip(qm_zz, 1, 255).astype(np.uint8))
    dht = bytearray()
    for tclass, tid, bits, vals in (
        (0, 0, T.BITS_DC_LUMA, T.VALS_DC_LUMA),
        (0, 1, T.BITS_DC_CHROMA, T.VALS_DC_CHROMA),
        (1, 0, T.BITS_AC_LUMA, T.VALS_AC_LUMA),
        (1, 1, T.BITS_AC_CHROMA, T.VALS_AC_CHROMA),
    ):
        dht.append((tclass << 4) | tid)
        dht += bytes(bits[1:].astype(np.uint8))
        dht += bytes(vals.astype(np.uint8))
    out += b"\xFF\xC4" + (len(dht) + 2).to_bytes(2, "big") + dht
    if restart_interval:
        out += b"\xFF\xDD\x00\x04" + int(restart_interval).to_bytes(2, "big")
    if layout == "gray":
        out += b"\xFF\xC0\x00\x0B\x08"
        out += int(height).to_bytes(2, "big") + int(width).to_bytes(2, "big")
        out += b"\x01\x01\x11\x00"
        out += b"\xFF\xDA\x00\x08\x01\x01\x00\x00\x3F\x00"
    else:
        samp = _SOF_SAMPLING[layout]
        out += b"\xFF\xC0\x00\x11\x08"
        out += int(height).to_bytes(2, "big") + int(width).to_bytes(2, "big")
        out += bytes([3, 1, samp, 0, 2, 0x11, 0, 3, 0x11, 0])
        out += b"\xFF\xDA\x00\x0C\x03\x01\x00\x02\x11\x03\x11\x00\x3F\x00"
    return bytes(out)


def _extract_blocks_topdown(y, cb, cr, layout, mb_w, mb_h):
    """Top-down plane(s) -> MCU block layout uint8 [F, M, nb, 8, 8] with
    bottom/right edge replication (ff_emulated_edge_mc semantics, no AMV
    flip)."""
    F = y.shape[0]

    def pad(p, th, tw):
        return jnp.pad(p, ((0, 0), (0, th - p.shape[1]),
                           (0, tw - p.shape[2])), mode="edge")

    def blocks8(p, bh, bw):
        return pad(p, 8 * bh, 8 * bw).reshape(
            F, bh, 8, bw, 8).transpose(0, 1, 3, 2, 4).reshape(
            F, bh * bw, 1, 8, 8)

    if layout == "gray":
        return blocks8(y, mb_h, mb_w)
    if layout == "444":
        return jnp.concatenate(
            [blocks8(p, mb_h, mb_w) for p in (y, cb, cr)], axis=2)
    if layout == "422":
        yc = pad(y, 8 * mb_h, 16 * mb_w)
        yb = yc.reshape(F, mb_h, 8, mb_w, 2, 8).transpose(
            0, 1, 3, 4, 2, 5).reshape(F, mb_h * mb_w, 2, 8, 8)
        return jnp.concatenate(
            [yb, blocks8(cb, mb_h, mb_w), blocks8(cr, mb_h, mb_w)], axis=2)
    # 420
    yc = pad(y, 16 * mb_h, 16 * mb_w)
    yb = yc.reshape(F, mb_h, 2, 8, mb_w, 2, 8).transpose(
        0, 1, 4, 2, 5, 3, 6).reshape(F, mb_h * mb_w, 4, 8, 8)
    return jnp.concatenate(
        [yb, blocks8(cb, mb_h, mb_w), blocks8(cr, mb_h, mb_w)], axis=2)


def _pack_scan_generic(levels_zz: np.ndarray, comp_of, ri: int) -> bytes:
    """Huffman-pack one frame's zigzag levels [M, nb, 64] with K.3 tables
    (luma for component 0, chroma otherwise), inserting RSTn markers and
    resetting DC prediction every ri MCUs.  Returns the escaped scan
    (no SOI/EOI)."""
    from ..verify import ref_jpeg as RJ

    n_mcu, nb = levels_zz.shape[0], levels_zz.shape[1]
    segs = []
    bw = RJ.BitWriter()
    last_dc = [128, 128, 128]
    for m in range(n_mcu):
        if ri and m and m % ri == 0:
            pad = (-bw.bit_count()) & 7
            if pad:
                bw.put_bits(pad, (1 << pad) - 1)   # 1-bit stuffing
            segs.append(RJ.escape_ff(bw.flush()))
            segs.append(bytes([0xFF, 0xD0 + ((m // ri - 1) & 7)]))
            bw = RJ.BitWriter()
            last_dc = [128, 128, 128]
        for b in range(nb):
            comp = comp_of[b]
            luma = comp == 0
            dc_t = RJ._ENC_DC_L if luma else RJ._ENC_DC_C
            ac_sizes, ac_codes = RJ._ENC_AC_L if luma else RJ._ENC_AC_C
            zz = levels_zz[m, b]
            dc = int(zz[0])
            RJ._encode_dc(bw, dc - last_dc[comp], dc_t)
            last_dc[comp] = dc
            nz = np.nonzero(zz[1:])[0]
            prev = 0
            for idx in nz:
                i = int(idx) + 1
                run = i - prev - 1
                prev = i
                val = int(zz[i])
                while run >= 16:
                    bw.put_bits(int(ac_sizes[0xF0]), int(ac_codes[0xF0]))
                    run -= 16
                mant = val
                if val < 0:
                    val = -val
                    mant -= 1
                nbits = val.bit_length()
                code = (run << 4) | nbits
                bw.put_bits(int(ac_sizes[code]), int(ac_codes[code]))
                bw.put_bits(nbits, mant & ((1 << nbits) - 1))
            if prev != 63:
                bw.put_bits(int(ac_sizes[0]), int(ac_codes[0]))  # EOB
    pad = (-bw.bit_count()) & 7
    if pad:
        bw.put_bits(pad, (1 << pad) - 1)
    segs.append(RJ.escape_ff(bw.flush()))
    return b"".join(segs)


def encode_mjpeg_frames(y: np.ndarray, cb: np.ndarray = None,
                        cr: np.ndarray = None, qscale: int = 2,
                        subsampling: str = "420",
                        restart_interval: int = 0) -> list[bytes]:
    """Encode top-down YUV frames as standalone baseline JPEGs.

    Unlike the AMV format (whose encoder and decoder use mismatched
    tables, the reference's known WIP bug), these files carry the
    encoder's actual quantization matrix, so any JPEG decoder reconstructs
    them correctly.  DC predictors start at 128 like the AMV scan, and the
    decoder's 1024 bias cancels against qm[0]=8 (1024 = 128*8), keeping
    scan-level compatibility with the K.3 path.

    subsampling: "420" (chroma half-size), "422" (half-width),
    "444" (full), "gray" (no chroma; cb/cr ignored).
    restart_interval > 0 writes DRI and RSTn markers every that many
    MCUs with DC-prediction reset (the reference's mjpegenc.c never
    emits these; the decoder side mjpegdec.c:533-548 consumes them).
    """
    from .amv_video import (encode_transform, _encoder_quant_matrix,
                            _encoder_quant_qmat_np)
    from ..bitstream.entropy import huffman_encode_frame
    from ..kernels import fdct as KF
    F, H, W = y.shape
    qm_raster = _encoder_quant_matrix(qscale)
    qm_zz = qm_raster[T.ZIGZAG]
    if subsampling == "420" and restart_interval == 0:
        mb_w, mb_h = (W + 15) // 16, (H + 15) // 16
        # cancel the AMV flip inside encode_transform: top-down coding
        lv = np.asarray(encode_transform(
            jnp.asarray(y[:, ::-1].copy()), jnp.asarray(cb[:, ::-1].copy()),
            jnp.asarray(cr[:, ::-1].copy()), mb_w, mb_h, qscale))
        hdr = _jpeg_header_with_tables(W, H, qm_zz)
        out = []
        for f in range(F):
            payload = huffman_encode_frame(lv[f])  # SOI + scan + EOI
            out.append(hdr + payload[2:])
        return out
    mcu_w, mcu_h = {"420": (16, 16), "422": (16, 8),
                    "444": (8, 8), "gray": (8, 8)}[subsampling]
    mb_w = (W + mcu_w - 1) // mcu_w
    mb_h = (H + mcu_h - 1) // mcu_h
    blocks = _extract_blocks_topdown(
        jnp.asarray(y), None if cb is None else jnp.asarray(cb),
        None if cr is None else jnp.asarray(cr), subsampling, mb_w, mb_h)
    lv_raster = np.asarray(KF.fdct_quantize(
        blocks, jnp.asarray(_encoder_quant_qmat_np(qscale))))  # [F,M,nb,64]
    lv_zz = lv_raster[..., T.ZIGZAG]
    comp_of = _COMP_OF_BLOCK[subsampling]
    hdr = _jpeg_header_with_tables(W, H, qm_zz, layout=subsampling,
                                   restart_interval=restart_interval)
    out = []
    for f in range(F):
        scan = _pack_scan_generic(lv_zz[f], comp_of, restart_interval)
        out.append(hdr + scan + b"\xFF\xD9")
    return out
