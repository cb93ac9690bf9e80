"""AMV MJPEG-variant video codec: host entropy <-> TPU transform split.

Decode: host Huffman scan decode produces per-block quantized levels
(zigzag); everything after — DC prediction, dequant, IDCT, MCU->plane
assembly, the AMV vertical flip — runs as one jitted TPU program over a
whole batch of frames.

Encode: flip/pad, block extraction, FDCT and quantization run on device for
the batch; the host packs Huffman bits (mjpegenc.c semantics) from the
returned levels.

Reference semantics: sp5xdec.c + mjpegdec.c (decode), mjpegenc.c +
mpegvideo_enc.c (encode); see kernels/idct.py and kernels/fdct.py for the
exact arithmetic provenance.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..bitstream import jpeg_tables as T
from ..bitstream.entropy import (huffman_decode_frames, huffman_encode_frame)
from ..kernels import idct as KI
from ..kernels import fdct as KF

_QM_RASTER = np.zeros((6, 64), dtype=np.int32)
_QM_RASTER[:4, T.ZIGZAG] = T.SP5X_QUANT_LUMA_ZZ
_QM_RASTER[4:, T.ZIGZAG] = T.SP5X_QUANT_CHROMA_ZZ

_ZZ = jnp.asarray(T.ZIGZAG)
_UNZZ = jnp.asarray(T.UNZIGZAG)


def _use_pallas() -> bool:
    import os
    return os.environ.get("AMV_PALLAS") == "1" and jax.default_backend() != "cpu"


@partial(jax.jit, static_argnames=("mb_w", "mb_h", "width", "height"))
def decode_transform(levels_zz: jnp.ndarray, mb_w: int, mb_h: int,
                     width: int, height: int):
    """Quantized levels -> YUV420 planes (flipped to display orientation).

    levels_zz: int16 [F, n_mcu, 6, 64] in ZIGZAG order; position 0 holds the
               DC *difference* (pre-prediction).
    Returns (y uint8 [F, H, W], cb uint8 [F, H/2, W/2], cr likewise).
    """
    F, M = levels_zz.shape[0], levels_zz.shape[1]
    lv = levels_zz.astype(jnp.int32)

    # --- DC prediction (decode_block:387-389), init 1024 per scan ----------
    qm0_l = int(T.SP5X_QUANT_LUMA_ZZ[0])
    qm0_c = int(T.SP5X_QUANT_CHROMA_ZZ[0])
    dc_y = jnp.cumsum(lv[:, :, :4, 0].reshape(F, M * 4) * qm0_l, axis=1)
    dc_y = (dc_y + 1024).reshape(F, M, 4)
    dc_cb = jnp.cumsum(lv[:, :, 4, 0] * qm0_c, axis=1) + 1024
    dc_cr = jnp.cumsum(lv[:, :, 5, 0] * qm0_c, axis=1) + 1024
    dc = jnp.concatenate([dc_y, dc_cb[..., None], dc_cr[..., None]], axis=-1)

    # --- zigzag -> raster + dequant + IDCT ---------------------------------
    # raster[j] = levels[unzigzag[j]]: a gather, which compiles much faster
    # than the equivalent scatter on every backend
    raster = jnp.take(lv, _UNZZ, axis=-1)
    qm = jnp.asarray(_QM_RASTER)[None, None]
    if _use_pallas():
        # coefficient-major Pallas kernel: ~6x faster than the XLA path on
        # the isolated IDCT, but the [N,64]<->[64,N] layout transposes cost
        # more than the win inside the fused decode+encode pipeline, so the
        # XLA path is the default (see bench history); AMV_PALLAS=1 opts in
        from ..kernels.idct_pallas import idct_put_pallas
        deq = KI._wrap16(raster * qm).at[..., 0].set(KI._wrap16(dc))
        pix = idct_put_pallas(deq.astype(jnp.int16).reshape(F, M, 6, 8, 8))
    else:
        pix = KI.dequantize_idct(raster, dc, qm)  # uint8 [F, M, 6, 8, 8]

    return assemble_planes(pix, mb_w, mb_h, width, height)


def assemble_planes(pix, mb_w: int, mb_h: int, width: int, height: int):
    """Decoded blocks uint8 [F, M, 6, 8, 8] -> YUV420 display planes
    (MCU assembly + AMV flip, mjpeg_decode_scan:672-723)."""
    F = pix.shape[0]
    mcu = pix.reshape(F, mb_h, mb_w, 6, 8, 8)
    yb = mcu[:, :, :, :4].reshape(F, mb_h, mb_w, 2, 2, 8, 8)
    ycoded = yb.transpose(0, 1, 3, 5, 2, 4, 6).reshape(F, 16 * mb_h, 16 * mb_w)
    cbc = mcu[:, :, :, 4].transpose(0, 1, 3, 2, 4).reshape(F, 8 * mb_h, 8 * mb_w)
    crc = mcu[:, :, :, 5].transpose(0, 1, 3, 2, 4).reshape(F, 8 * mb_h, 8 * mb_w)
    y = ycoded[:, height - 1::-1, :width]
    ch, cw = height // 2, width // 2
    cb = cbc[:, ch - 1::-1, :cw]
    cr = crc[:, ch - 1::-1, :cw]
    return y, cb, cr


def _unescape_pack(payloads: list[bytes]) -> np.ndarray:
    """SOI/EOI strip + 0xFF00 unescape into zero-padded rows (the device
    entropy decoders' input), via the C batch path when available."""
    try:
        from ..native import entropy_native as native
        rows, _ = native.unescape_frames(payloads)
        return rows
    except Exception:
        from ..verify.ref_jpeg import unescape_scan
        scans = [unescape_scan(p[2:len(p) - 2]) for p in payloads]
        max_b = (max(len(x) for x in scans) + 3) & ~3
        arr = np.zeros((len(scans), max_b), np.uint8)
        for i, x in enumerate(scans):
            arr[i, :len(x)] = np.frombuffer(x, np.uint8)
        return arr


def decode_frames(payloads: list[bytes], width: int, height: int,
                  device_entropy: bool = False):
    """Decode a batch of AMV '00dc' payloads to YUV420 planes (numpy).

    device_entropy=True runs the Huffman stage on the TPU too
    (kernels/entropy_decode.py, frame-parallel symbol scan); only the raw
    scan bytes cross the host link.  Default: host/C scan decode.
    """
    mb_w, mb_h = (width + 15) // 16, (height + 15) // 16
    if device_entropy:
        arr = _unescape_pack(payloads)
        if jax.default_backend() == "cpu":
            # tests / CPU mesh: XLA symbol-scan kernel (interpret-mode
            # Pallas would be pathologically slow here)
            from ..kernels.entropy_decode import decode_scans_device
            levels = decode_scans_device(jnp.asarray(arr), mb_w * mb_h)
        else:
            from ..pipeline.transcode import decode_scans_layout
            # length-sorted batch (lane cursors cluster: fetch window
            # shrinks, stragglers drop ~1.5x) through the zero-relayout
            # slab chain (entropy + dequant/IDCT share one layout)
            lens = np.array([len(p) for p in payloads])
            order = np.argsort(lens, kind="stable")
            inv = np.argsort(order)
            pix = decode_scans_layout(jnp.asarray(arr[order]),
                                      mb_w * mb_h, win_fetch=64)
            y, cb, cr = assemble_planes(pix, mb_w, mb_h, width, height)
            return (np.asarray(y)[inv], np.asarray(cb)[inv],
                    np.asarray(cr)[inv])
    else:
        levels = jnp.asarray(huffman_decode_frames(payloads, mb_w * mb_h))
    y, cb, cr = decode_transform(levels, mb_w, mb_h, width, height)
    return np.asarray(y), np.asarray(cb), np.asarray(cr)


# ---------------------------------------------------------------------------
# Encode
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("mb_w", "mb_h"))
def extract_blocks(y: jnp.ndarray, cb: jnp.ndarray, cr: jnp.ndarray,
                   mb_w: int, mb_h: int):
    """YUV420 planes -> encoder block layout uint8 [F, n_mcu, 6, 8, 8]
    (flip + bottom/right edge replication, amv_encode_picture:467-471 +
    ff_emulated_edge_mc)."""
    F = y.shape[0]

    def flip_pad(p, th, tw):
        p = p[:, ::-1]
        h, w = p.shape[1], p.shape[2]
        p = jnp.pad(p, ((0, 0), (0, th - h), (0, tw - w)), mode="edge")
        return p

    yc = flip_pad(y, 16 * mb_h, 16 * mb_w)
    cbc = flip_pad(cb, 8 * mb_h, 8 * mb_w)
    crc = flip_pad(cr, 8 * mb_h, 8 * mb_w)
    yb = yc.reshape(F, mb_h, 2, 8, mb_w, 2, 8).transpose(0, 1, 4, 2, 5, 3, 6)
    cbb = cbc.reshape(F, mb_h, 8, mb_w, 8).transpose(0, 1, 3, 2, 4)
    crb = crc.reshape(F, mb_h, 8, mb_w, 8).transpose(0, 1, 3, 2, 4)
    return jnp.concatenate([
        yb.reshape(F, mb_h * mb_w, 4, 8, 8),
        cbb.reshape(F, mb_h * mb_w, 1, 8, 8),
        crb.reshape(F, mb_h * mb_w, 1, 8, 8),
    ], axis=2)


@partial(jax.jit, static_argnames=("mb_w", "mb_h", "qscale", "quant"))
def encode_transform(y: jnp.ndarray, cb: jnp.ndarray, cr: jnp.ndarray,
                     mb_w: int, mb_h: int, qscale: int = 2,
                     quant: str = "ffmpeg"):
    """YUV420 frames -> quantized levels [F, n_mcu, 6, 64] (zigzag order).

    Implements the flip + bottom/right edge replication
    (amv_encode_picture:467-471 + ff_emulated_edge_mc) and the
    fdct+quantize path on device.

    quant="ffmpeg" (default) replicates the reference encoder exactly:
    MPEG-1 intra matrix x qscale (mpegvideo_enc.c:2866-2876) +
    dct_quantize_c bias arithmetic — faithful INCLUDING its known bug:
    the AMV decoder dequantizes with the fixed sp5x Q60 pair
    (sp5x.h:187-195), not this matrix, so decode(encode(x)) lands at
    ~19 dB.  quant="q60" is the *device-consistent* mode that finishes
    what the reference's README set out to do (AMVmuxer/README:14-19):
    quantize with the same Q60 pair the decoder will use (round to
    nearest; DC = 128 + round((dct-1024)/q0) so the entropy coder's
    last_dc=128 chain telescopes into the decoder's 1024 + cumsum*q0
    reconstruction), giving >=30 dB round trips.
    """
    if quant == "q60":
        blocks = extract_blocks(y, cb, cr, mb_w, mb_h)
        coefs = KF.fdct(blocks).reshape(*blocks.shape[:-2], 64)
        # ff_jpeg_fdct_islow output is the JPEG DCT x8; decoder-side
        # reconstruction is level*q (raster, wrap16) + 1024 DC offset
        off = np.zeros((6, 64), np.int32)
        off[:, 0] = 8192                     # 8 x the decoder's 1024 DC
        num = coefs - jnp.asarray(off)
        den = jnp.asarray(8 * _QM_RASTER)    # [6, 64]
        mag = (jnp.abs(num) + (den >> 1)) // den
        lv = jnp.clip(jnp.where(num < 0, -mag, mag), -1023, 1023)
        lv = lv.at[..., 0].add(128)          # absolute DC for last_dc=128
        return lv.astype(jnp.int16)[..., _ZZ]
    if quant != "ffmpeg":
        raise ValueError(f"unknown quant mode {quant!r}")
    qmat = jnp.asarray(
        ((1 << 22) // (8 * _encoder_quant_matrix(qscale).astype(np.int64)))
        .astype(np.int32))
    blocks = extract_blocks(y, cb, cr, mb_w, mb_h)

    if _use_pallas():
        from ..kernels.fdct_pallas import fdct_quantize_pallas
        levels_raster = fdct_quantize_pallas(
            blocks, _encoder_quant_qmat_np(qscale))
    else:
        levels_raster = KF.fdct_quantize(blocks, qmat)  # [F, M, 6, 64]
    return levels_raster[..., _ZZ]  # zigzag order for the entropy coder


def _encoder_quant_qmat_np(qscale: int) -> np.ndarray:
    m = _encoder_quant_matrix(qscale)
    return ((1 << 22) // (8 * m.astype(np.int64))).astype(np.int32)


def _encoder_quant_matrix(qscale: int) -> np.ndarray:
    m = np.empty(64, dtype=np.int32)
    m[0] = T.MPEG1_INTRA_MATRIX[0]
    m[1:] = np.clip((T.MPEG1_INTRA_MATRIX[1:] * qscale) >> 3, 0, 255)
    return m


def encode_frames(y: np.ndarray, cb: np.ndarray, cr: np.ndarray,
                  qscale: int = 2, device_entropy: bool = False,
                  quant: str = "ffmpeg") -> list[bytes]:
    """Encode YUV420 frames into AMV '00dc' payloads.

    device_entropy=True packs the Huffman bitstream on device too
    (kernels/entropy_encode.py), so only final payload bytes cross the
    host link; the default routes levels through the host/C packer.

    quant="q60" selects the device-consistent quantizer (see
    encode_transform); it routes through the levels path (the fused
    segmented chain is single-matrix).
    """
    F, H, W = y.shape
    mb_w, mb_h = (W + 15) // 16, (H + 15) // 16
    if quant == "q60":
        levels = np.asarray(encode_transform(
            jnp.asarray(y), jnp.asarray(cb), jnp.asarray(cr), mb_w, mb_h,
            qscale, quant="q60"))
        return [huffman_encode_frame(levels[f]) for f in range(F)]
    if device_entropy:
        from ..pipeline.transcode import pick_segments
        segs = pick_segments(mb_w * mb_h)
        if jax.default_backend() != "cpu" and segs:
            # zero-relayout Pallas chain (extract -> FDCT/quant ->
            # Huffman pack in slab layout) + C framing.  Frames larger
            # than the VMEM output budget split into `segs` lane-
            # parallel segments (pipeline/transcode.py) so any geometry
            # stays on device.  If a segment still overflows its word
            # budget the C pass raises and we fall through to the host
            # packer below.
            from ..native import entropy_native as native
            from ..pipeline.transcode import encode_planes_layout
            qk = tuple(int(v) for v in _encoder_quant_qmat_np(qscale))
            ms = mb_w * mb_h // segs
            w_out = min(1664, 1024 * ((ms + 47) // 48))
            words, bits = encode_planes_layout(
                jnp.asarray(y), jnp.asarray(cb), jnp.asarray(cr),
                mb_w, mb_h, qk, w_out=w_out, segs=segs)
            try:
                if segs == 1:
                    return native.escape_frames(np.asarray(words),
                                                np.asarray(bits))
                return native.concat_escape_frames(np.asarray(words),
                                                   np.asarray(bits), segs)
            except ValueError:
                pass  # a segment exceeded the word budget: host packer
        from ..kernels.entropy_encode import encode_frames_device
        levels_dev = encode_transform(
            jnp.asarray(y), jnp.asarray(cb), jnp.asarray(cr),
            mb_w, mb_h, qscale)
        # worst case ~2.2 bytes/coeff incl. escapes; frames are tiny
        max_bytes = max(4096, mb_w * mb_h * 6 * 140)
        payload, lens = encode_frames_device(levels_dev, max_bytes=max_bytes)
        payload, lens = np.asarray(payload), np.asarray(lens)
        return [payload[f, :lens[f]].tobytes() for f in range(F)]
    levels = np.asarray(encode_transform(
        jnp.asarray(y), jnp.asarray(cb), jnp.asarray(cr), mb_w, mb_h,
        qscale))
    return [huffman_encode_frame(levels[f]) for f in range(F)]
