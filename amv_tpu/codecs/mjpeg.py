"""Standard baseline MJPEG decoder (per-frame tables), 4:2:0.

Generalizes the AMV path: quant/Huffman tables are parsed from each frame
(bitstream/jpeg_parse.py) instead of canned, output is top-down (no AMV
flip).  Covers the reference's mjpegdec.c baseline usage for MJPEG-in-AVI
material; the same bit-exact integer IDCT path is reused on device.
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


def _decode_scan_generic(scan: bytes, n_mcu: int, frame) -> np.ndarray:
    """Python Huffman decode with arbitrary parsed tables (420, 3 comp)."""
    luts = {}
    for key, spec in frame.huff.items():
        luts[key] = T.build_decode_table(*spec)
    # per block index within MCU: (dc table id, ac table id)
    sc = frame.scan_components
    tabs = []
    for b in range(6):
        comp = 0 if b < 4 else b - 3
        _, dc_id, ac_id = sc[comp]
        tabs.append((luts[(0, dc_id)], luts[(1, ac_id)]))

    br = R.BitReader(scan)
    levels = np.zeros((n_mcu, 6, 64), dtype=np.int16)
    for m in range(n_mcu):
        for b in range(6):
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


@partial(jax.jit, static_argnames=("mb_w", "mb_h", "width", "height"))
def _transform(levels_zz, qm_zz_luma, qm_zz_chroma, mb_w, mb_h, width, height):
    """Like amv_video.decode_transform but parameterized tables, no flip."""
    F, M = levels_zz.shape[0], levels_zz.shape[1]
    lv = levels_zz.astype(jnp.int32)
    dc_y = jnp.cumsum(lv[:, :, :4, 0].reshape(F, M * 4) * qm_zz_luma[0],
                      axis=1).reshape(F, M, 4) + 1024
    dc_cb = jnp.cumsum(lv[:, :, 4, 0] * qm_zz_chroma[0], axis=1) + 1024
    dc_cr = jnp.cumsum(lv[:, :, 5, 0] * qm_zz_chroma[0], axis=1) + 1024
    dc = jnp.concatenate([dc_y, dc_cb[..., None], dc_cr[..., None]], axis=-1)
    raster = jnp.take(lv, jnp.asarray(T.UNZIGZAG), axis=-1)
    unzz = jnp.asarray(T.UNZIGZAG)
    qm_l = jnp.take(qm_zz_luma, unzz)
    qm_c = jnp.take(qm_zz_chroma, unzz)
    qm = jnp.stack([qm_l] * 4 + [qm_c] * 2)[None, None]
    pix = KI.dequantize_idct(raster, dc, qm)
    mcu = pix.reshape(F, mb_h, mb_w, 6, 8, 8)
    yb = mcu[:, :, :, :4].reshape(F, mb_h, mb_w, 2, 2, 8, 8)
    y = yb.transpose(0, 1, 3, 5, 2, 4, 6).reshape(
        F, 16 * mb_h, 16 * mb_w)[:, :height, :width]
    cb = mcu[:, :, :, 4].transpose(0, 1, 3, 2, 4).reshape(
        F, 8 * mb_h, 8 * mb_w)[:, :height // 2, :width // 2]
    cr = mcu[:, :, :, 5].transpose(0, 1, 3, 2, 4).reshape(
        F, 8 * mb_h, 8 * mb_w)[:, :height // 2, :width // 2]
    return y, cb, cr


def decode_mjpeg_frames(payloads: list[bytes]):
    """Decode standard baseline MJPEG frames (4:2:0, 3 components).

    All frames must share geometry; tables may vary per frame (batched per
    table-group).  Returns (y, cb, cr) uint8 arrays, top-down.
    """
    frames = [parse_jpeg(p) for p in payloads]
    f0 = frames[0]
    if not f0.is_420_3c:
        raise ValueError("only 3-component 4:2:0 baseline MJPEG supported")
    w, h = f0.width, f0.height
    mb_w, mb_h = (w + 15) // 16, (h + 15) // 16
    n_mcu = mb_w * mb_h

    levels = np.zeros((len(frames), n_mcu, 6, 64), np.int16)
    std_scan = all(f.scan_components == [(0, 0, 0), (1, 1, 1), (2, 1, 1)]
                   for f in frames)
    if std_scan and all(_tables_are_k3(f) for f in frames):
        # common case: stock tables -> reuse the fast C scan decoder
        wrapped = [b"\xFF\xD8" + f.scan + b"\xFF\xD9" for f in frames]
        levels = huffman_decode_frames(wrapped, n_mcu)
    else:
        from ..native import entropy_native as native
        # group frames with identical table sets for batched C decode
        def hkey(f):
            return tuple(sorted(
                (k, bits.tobytes(), vals.tobytes())
                for k, (bits, vals) in f.huff.items())) + \
                tuple(map(tuple, f.scan_components))
        groups = {}
        for i, f in enumerate(frames):
            groups.setdefault(hkey(f), []).append(i)
        for idxs in groups.values():
            f = frames[idxs[0]]
            pairs = []
            for b in range(6):
                comp = 0 if b < 4 else b - 3
                _, dc_id, ac_id = f.scan_components[comp]
                pairs.append((dc_id, ac_id))
            try:
                got = native.decode_scans_custom(
                    [frames[i].scan for i in idxs], n_mcu, f.huff, pairs)
                for j, i in enumerate(idxs):
                    levels[i] = got[j]
            except AttributeError:   # pure-python fallback (no native lib)
                for i in idxs:
                    scan = R.unescape_scan(frames[i].scan)
                    levels[i] = _decode_scan_generic(scan, n_mcu, frames[i])

    # quant tables may vary per frame; group identical-table runs
    def qkey(f):
        qt_l = f.quant[f.components[0][3]]
        qt_c = f.quant[f.components[1][3]]
        return qt_l.tobytes() + qt_c.tobytes()

    y = np.zeros((len(frames), h, w), np.uint8)
    cb = np.zeros((len(frames), h // 2, w // 2), np.uint8)
    cr = np.zeros_like(cb)
    idxs_by_key = {}
    for i, f in enumerate(frames):
        idxs_by_key.setdefault(qkey(f), []).append(i)
    for key, idxs in idxs_by_key.items():
        f = frames[idxs[0]]
        qt_l = jnp.asarray(f.quant[f.components[0][3]].astype(np.int32))
        qt_c = jnp.asarray(f.quant[f.components[1][3]].astype(np.int32))
        yy, ccb, ccr = _transform(jnp.asarray(levels[idxs]), qt_l, qt_c,
                                  mb_w, mb_h, w, h)
        y[idxs], cb[idxs], cr[idxs] = (np.asarray(yy), np.asarray(ccb),
                                       np.asarray(ccr))
    return y, cb, cr


# ---------------------------------------------------------------------------
# Standard MJPEG/JPEG encoding (self-consistent tables)
# ---------------------------------------------------------------------------

def _jpeg_header_with_tables(width, height, qm_zz: np.ndarray) -> bytes:
    """Full JPEG header with the given quant table (both components) and the
    K.3 Huffman set — mjpegenc.c jpeg_table_header/picture_header layout."""
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
    out += b"\xFF\xC0\x00\x11\x08"
    out += int(height).to_bytes(2, "big") + int(width).to_bytes(2, "big")
    out += b"\x03\x01\x22\x00\x02\x11\x00\x03\x11\x00"
    out += b"\xFF\xDA\x00\x0C\x03\x01\x00\x02\x11\x03\x11\x00\x3F\x00"
    return bytes(out)


def encode_mjpeg_frames(y: np.ndarray, cb: np.ndarray, cr: np.ndarray,
                        qscale: int = 2) -> list[bytes]:
    """Encode top-down YUV420 frames as standalone baseline JPEGs.

    Unlike the AMV format (whose encoder and decoder use mismatched
    tables, the reference's known WIP bug), these files carry the
    encoder's actual quantization matrix, so any JPEG decoder reconstructs
    them correctly.  DC predictors start at 128 like the AMV scan, and the
    decoder's 1024 bias cancels against qm[0]=8 (1024 = 128*8), keeping
    scan-level compatibility with the K.3 path.
    """
    from .amv_video import encode_transform, _encoder_quant_matrix
    from ..bitstream.entropy import huffman_encode_frame
    F, H, W = y.shape
    mb_w, mb_h = (W + 15) // 16, (H + 15) // 16
    # cancel the AMV flip inside encode_transform to get top-down coding
    lv = np.asarray(encode_transform(
        jnp.asarray(y[:, ::-1].copy()), jnp.asarray(cb[:, ::-1].copy()),
        jnp.asarray(cr[:, ::-1].copy()), mb_w, mb_h, qscale))
    qm_raster = _encoder_quant_matrix(qscale)
    qm_zz = qm_raster[T.ZIGZAG]
    hdr = _jpeg_header_with_tables(W, H, qm_zz)
    out = []
    for f in range(F):
        payload = huffman_encode_frame(lv[f])  # SOI + scan + EOI
        out.append(hdr + payload[2:])
    return out
