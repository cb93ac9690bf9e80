"""AVI container support (the reference pipeline's input/output).

The canonical reference invocations convert AVI <-> AMV
(AMVmuxer/Makefile:24-27).  This module provides the host-side subset
needed for parity:

* demux: RIFF-AVI chunk walk (avidec.c structure) for uncompressed video
  (I420 / YV12 / packed YUY2/UYVY / 16/24/32-bit RGB DIB / grayscale /
  MJPEG) and PCM s16 audio — enough to feed the AMV encoder with raw
  material;
* index: idx1 parse (avi_read_idx1, avidec.c:740-806) and ODML indx /
  ix## parse (read_braindead_odml_indx, avidec.c:520-598), used for
  index-based chunk extraction and seeking (avi_read_seek,
  avidec.c:933-1012) instead of the linear movi walk;
* mux: writes standard AVI with I420 video + PCM s16 audio plus an idx1
  index so decoded AMV output opens (and seeks) in stock players/tools.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np


@dataclass
class AviStream:
    kind: str                 # "video" | "audio"
    codec: bytes = b""        # fourcc / wFormatTag
    width: int = 0
    height: int = 0
    fps_num: int = 0
    fps_den: int = 1
    sample_rate: int = 0
    channels: int = 0
    bits: int = 0
    chunks: list = field(default_factory=list)
    # per-chunk (file_offset_of_payload, size, keyframe) from idx1/indx;
    # empty when the file carries no index
    index: list = field(default_factory=list)
    # pal8: BGRX RGBQUAD palette from strf (BITMAPINFOHEADER tail)
    palette: object = None
    # BI_BITFIELDS: (r, g, b) channel masks (e.g. RGB565) from strf
    bitmasks: object = None
    # audio: nBlockAlign from strf (ADPCM block size)
    block_align: int = 0


def _walk_list(data, pos, end, handler):
    while pos + 8 <= end:
        tag = data[pos:pos + 4]
        size = struct.unpack_from("<I", data, pos + 4)[0]
        body_start = pos + 8
        handler(tag, body_start, size)
        pos = body_start + size + (size & 1)
    return pos


def _parse_idx1(data, body, size, movi_start, streams):
    """idx1 entries -> per-stream (payload_offset, size, keyframe) lists
    (avi_read_idx1, avidec.c:740-806).  Entry offsets are either absolute
    file offsets or relative to the movi list's 'movi' tag; detected like
    the reference does, by checking whether the first entry's offset
    points at its own chunk tag."""
    n = size // 16
    if n == 0:
        return
    tag0, _, ofs0, _ = struct.unpack_from("<4sIII", data, body)
    base = 0
    if data[ofs0:ofs0 + 4] != tag0:
        base = movi_start  # offsets relative to 'movi' tag
    for k in range(n):
        tag, flags, ofs, ln = struct.unpack_from("<4sIII", data,
                                                 body + 16 * k)
        if tag[2:4] not in (b"db", b"dc", b"wb") or not tag[:2].isdigit():
            continue
        sid = int(tag[:2])
        if sid < len(streams):
            streams[sid].index.append((base + ofs + 8, ln,
                                       bool(flags & 0x10)))


def _parse_odml_indx(data, body, size, sid, streams):
    """OpenDML 'indx' super/standard index (read_braindead_odml_indx,
    avidec.c:520-598).  Handles AVI_INDEX_OF_CHUNKS (standard ix##
    entries, relative to qwBaseOffset) and AVI_INDEX_OF_INDEXES
    (super index whose entries point at ix## chunks)."""
    if size < 24 or sid >= len(streams):
        return
    longs_per_entry, _sub, idx_type = struct.unpack_from("<HBB", data, body)
    n_in_use = struct.unpack_from("<I", data, body + 4)[0]
    base_ofs = struct.unpack_from("<Q", data, body + 12)[0]
    ent = body + 24
    if idx_type == 1:          # AVI_INDEX_OF_CHUNKS
        if longs_per_entry != 2:
            return
        for k in range(n_in_use):
            ofs, ln = struct.unpack_from("<II", data, ent + 8 * k)
            streams[sid].index.append(
                (base_ofs + ofs, ln & 0x7FFFFFFF,
                 not (ln & 0x80000000)))  # high bit set = non-key
    elif idx_type == 0:        # AVI_INDEX_OF_INDEXES
        if longs_per_entry != 4:
            return
        for k in range(n_in_use):
            qw_ofs, sz = struct.unpack_from("<QI", data, ent + 16 * k)
            # nested standard index chunk: 'ix##' + size + body
            if data[qw_ofs:qw_ofs + 2] == b"ix":
                sub_sz = struct.unpack_from("<I", data, qw_ofs + 4)[0]
                _parse_odml_indx(data, qw_ofs + 8, sub_sz, sid, streams)


def demux(data: bytes, use_index: bool = True):
    """Returns list[AviStream] (video first when present).

    With use_index=True (default) and an idx1/ODML index present,
    chunks are read through the index (avi_load_index semantics)
    instead of the linear movi walk — this is what makes seeking and
    sparse access O(1) per chunk.
    """
    if data[0:4] != b"RIFF" or data[8:12] not in (b"AVI ", b"AVIX"):
        raise ValueError("not an AVI file")
    streams: list[AviStream] = []
    movi_ranges = []
    idx1_loc = []
    indx_pending = []  # (strl stream id, body, size)

    def parse_strl(pos, end):
        st = None
        p = pos
        while p + 8 <= end:
            tag = data[p:p + 4]
            size = struct.unpack_from("<I", data, p + 4)[0]
            body = p + 8
            if tag == b"indx":
                indx_pending.append((len(streams), body, size))
            if tag == b"strh":
                fcc_type = data[body:body + 4]
                handler = data[body + 4:body + 8]
                scale, rate = struct.unpack_from("<II", data, body + 20)
                if fcc_type == b"vids":
                    st = AviStream("video", codec=handler,
                                   fps_num=rate, fps_den=max(scale, 1))
                elif fcc_type == b"auds":
                    st = AviStream("audio")
            elif tag == b"strf" and st is not None:
                if st.kind == "video":
                    (_, w, hgt, _, bits, compr) = struct.unpack_from(
                        "<IiiHH4s", data, body)
                    st.width, st.height, st.bits = w, abs(hgt), bits
                    if bits == 8 and size > 40:
                        # pal8: RGBQUAD palette follows the 40-byte
                        # BITMAPINFOHEADER (biClrUsed at offset 32;
                        # 0 means the full 256)
                        (ncol,) = struct.unpack_from("<I", data, body + 32)
                        ncol = ncol or 256
                        ncol = min(ncol, (size - 40) // 4)
                        if ncol:
                            st.palette = np.frombuffer(
                                data, np.uint8, 4 * ncol,
                                body + 40).reshape(ncol, 4).copy()
                    if compr == b"\x03\x00\x00\x00":
                        # BI_BITFIELDS: three DWORD channel masks follow
                        # the 40-byte BITMAPINFOHEADER (this is how real
                        # RGB565 DIBs are declared — avidec.c defers to
                        # raw.c/avcodec_get_pix_fmt via the masks)
                        if size >= 52:
                            st.bitmasks = struct.unpack_from(
                                "<III", data, body + 40)
                        st.codec = b"DIB "
                    elif compr.strip(b"\x00") and compr != b"\x00\x00\x00\x00":
                        st.codec = compr
                    elif not st.codec.strip(b"\x00"):
                        st.codec = b"DIB "
                else:
                    fmt, ch, rate_, _, balign, bits = struct.unpack_from(
                        "<HHIIHH", data, body)
                    st.codec = struct.pack("<H", fmt)
                    st.channels, st.sample_rate, st.bits = ch, rate_, bits
                    st.block_align = balign
            p = body + size + (size & 1)
        if st is not None:
            streams.append(st)

    # walk top-level lists
    pos = 12
    n = len(data)
    while pos + 8 <= n:
        tag = data[pos:pos + 4]
        size = struct.unpack_from("<I", data, pos + 4)[0]
        body = pos + 8
        if tag == b"LIST":
            ltype = data[body:body + 4]
            if ltype == b"hdrl":
                # parse nested strl lists
                p2 = body + 4
                while p2 + 8 <= body + size:
                    t2 = data[p2:p2 + 4]
                    s2 = struct.unpack_from("<I", data, p2 + 4)[0]
                    if t2 == b"LIST" and data[p2 + 8:p2 + 12] == b"strl":
                        parse_strl(p2 + 12, p2 + 8 + s2)
                    p2 += 8 + s2 + (s2 & 1)
            elif ltype == b"movi":
                movi_ranges.append((body, body + size))
        elif tag == b"idx1":
            idx1_loc.append((body, size))
        pos = body + size + (size & 1)

    # index-based chunk extraction (preferred when an index exists)
    if use_index:
        for sid, body, size in indx_pending:
            _parse_odml_indx(data, body, size, sid, streams)
        if not any(st.index for st in streams):
            for body, size in idx1_loc:
                # relative idx1 offsets count from the 'movi' fourcc
                movi_start = movi_ranges[0][0] if movi_ranges else 0
                _parse_idx1(data, body, size, movi_start, streams)
        if any(st.index for st in streams):
            for st in streams:
                st.chunks = [data[o:o + ln] for (o, ln, _) in st.index]
            return streams

    for lo, hi in movi_ranges:
        p = lo + 4
        while p + 8 <= hi:
            tag = data[p:p + 4]
            size = struct.unpack_from("<I", data, p + 4)[0]
            body = p + 8
            if tag[2:4] in (b"db", b"dc", b"wb") and tag[:2].isdigit():
                idx = int(tag[:2])
                if idx < len(streams) and size:
                    streams[idx].chunks.append(data[body:body + size])
                    streams[idx].index.append((body, size, True))
            elif tag == b"LIST":
                p = body + 4
                continue
            p = body + size + (size & 1)
    return streams


def seek_frame(st: AviStream, frame: int) -> int:
    """Index-based seek: clamp `frame` into range and back up to the
    nearest keyframe at or before it (avi_read_seek, avidec.c:933-1012 —
    av_index_search_timestamp with AVSEEK_FLAG_BACKWARD semantics).
    Returns the chunk index to start decoding from."""
    if not st.index:
        return max(0, min(frame, len(st.chunks) - 1))
    frame = max(0, min(frame, len(st.index) - 1))
    while frame > 0 and not st.index[frame][2]:
        frame -= 1
    return frame


def read(path: str):
    with open(path, "rb") as f:
        return demux(f.read())


def _downsample_chroma(c):
    """Full-res chroma [F, H, W] -> 4:2:0 by 2x2 mean (libswscale's
    default chroma reduction for packed 4:2:2/RGB inputs)."""
    F, H, W = c.shape
    c = c[:, :H & ~1, :W & ~1].astype(np.uint16)
    return ((c[:, 0::2, 0::2] + c[:, 0::2, 1::2] +
             c[:, 1::2, 0::2] + c[:, 1::2, 1::2] + 2) >> 2).astype(np.uint8)


def extract_yuv420(st: AviStream):
    """Decode a raw-video AVI stream's chunks to (Y, Cb, Cr) uint8 planes.

    Input-format breadth mirrors the libswscale formats the reference
    CLI accepts from AVI material (swscale.c isSupportedIn): planar
    I420/IYUV/YV12, packed YUY2/YUYV/UYVY 4:2:2, RGB DIBs at 16
    (RGB565/555), 24 (BGR) and 32 (BGRX) bits, grayscale Y800/GREY,
    and MJPG/JPEG streams (decoded by codecs.mjpeg).
    """
    w, h = st.width, st.height
    frames = len(st.chunks)
    tag = bytes(st.codec).upper()
    if tag.startswith(b"MJPG") or tag.startswith(b"JPEG"):
        from ..codecs.mjpeg import (decode_mjpeg_frames, _sof_marker,
                                    decode_lossless_frames)
        if st.chunks and _sof_marker(st.chunks[0]) == 0xC3:
            mode, planes = decode_lossless_frames(st.chunks)
            if mode == "rgb":
                # planes are the reference's RGB32 byte order (B, G, R)
                from ..kernels.color import rgb_to_yuv420_bt601
                rgb = np.stack([planes[2], planes[1], planes[0]], axis=-1)
                yy, cc, rr = rgb_to_yuv420_bt601(rgb)
                return np.asarray(yy), np.asarray(cc), np.asarray(rr)
            y = planes[0]
            cb, cr = (planes[1], planes[2]) if len(planes) == 3 \
                else (None, None)
        else:
            y, cb, cr = decode_mjpeg_frames(st.chunks, org_height=h)
            if y.shape[1] > h:
                # interlaced: coded height is 2 x field height, which
                # may pad past the container height — crop
                ratio = 1 if cb is None else y.shape[1] // cb.shape[1]
                y = y[:, :h]
                if cb is not None:
                    cb, cr = cb[:, :h // ratio], cr[:, :h // ratio]
        if cb is None:                       # grayscale MJPEG
            gray = np.full((frames, h // 2, w // 2), 128, np.uint8)
            return y, gray, gray.copy()
        if cb.shape[1:] == (h, w):           # 4:4:4 -> 4:2:0
            return y, _downsample_chroma(cb), _downsample_chroma(cr)
        if cb.shape[1:] == (h, (w + 1) // 2):  # 4:2:2 -> 4:2:0 (vert mean)
            # odd-width 4:2:2 chroma is (w+1)//2 wide; crop to the w//2
            # columns the 4:2:0 contract downstream expects
            cb, cr = cb[:, :, :w // 2], cr[:, :, :w // 2]
            h2 = h & ~1
            cb2 = ((cb[:, 0:h2:2].astype(np.uint16) +
                    cb[:, 1:h2:2] + 1) >> 1).astype(np.uint8)
            cr2 = ((cr[:, 0:h2:2].astype(np.uint16) +
                    cr[:, 1:h2:2] + 1) >> 1).astype(np.uint8)
            return y, cb2, cr2
        return y, cb, cr

    def rgb_frames_to_yuv(rgb):
        from ..kernels.color import rgb_to_yuv420_bt601
        yy, cc, rr = rgb_to_yuv420_bt601(rgb)
        return np.asarray(yy), np.asarray(cc), np.asarray(rr)

    y = np.zeros((frames, h, w), np.uint8)
    cb = np.zeros((frames, h // 2, w // 2), np.uint8)
    cr = np.zeros((frames, h // 2, w // 2), np.uint8)
    for i, c in enumerate(st.chunks):
        buf = np.frombuffer(c, np.uint8)
        if tag.startswith(b"I420") or tag.startswith(b"IYUV"):
            y[i] = buf[:w * h].reshape(h, w)
            cb[i] = buf[w * h:w * h * 5 // 4].reshape(h // 2, w // 2)
            cr[i] = buf[w * h * 5 // 4:w * h * 3 // 2].reshape(h // 2, w // 2)
        elif tag.startswith(b"YV12"):
            y[i] = buf[:w * h].reshape(h, w)
            cr[i] = buf[w * h:w * h * 5 // 4].reshape(h // 2, w // 2)
            cb[i] = buf[w * h * 5 // 4:w * h * 3 // 2].reshape(h // 2, w // 2)
        elif tag.startswith(b"YUY2") or tag.startswith(b"YUYV") or \
                tag.startswith(b"V422") or tag.startswith(b"YUNV"):
            pk = buf[:w * h * 2].reshape(h, w // 2, 4)
            y[i] = pk[:, :, 0::2].reshape(h, w)
            cb[i] = ((pk[0::2, :, 1].astype(np.uint16) +
                      pk[1::2, :, 1] + 1) >> 1).astype(np.uint8)
            cr[i] = ((pk[0::2, :, 3].astype(np.uint16) +
                      pk[1::2, :, 3] + 1) >> 1).astype(np.uint8)
        elif tag.startswith(b"UYVY") or tag.startswith(b"Y422") or \
                tag.startswith(b"UYNV"):
            pk = buf[:w * h * 2].reshape(h, w // 2, 4)
            y[i] = pk[:, :, 1::2].reshape(h, w)
            cb[i] = ((pk[0::2, :, 0].astype(np.uint16) +
                      pk[1::2, :, 0] + 1) >> 1).astype(np.uint8)
            cr[i] = ((pk[0::2, :, 2].astype(np.uint16) +
                      pk[1::2, :, 2] + 1) >> 1).astype(np.uint8)
        elif tag.startswith(b"Y800") or tag.startswith(b"GREY") or \
                (st.bits == 8 and (tag.startswith(b"DIB") or not
                                   tag.strip(b"\x00"))):
            pal = getattr(st, "palette", None)
            gray_pal = pal is None or (
                pal.shape[0] >= 256 and
                np.array_equal(pal[:256, 0], np.arange(256)) and
                np.array_equal(pal[:256, 0], pal[:256, 1]) and
                np.array_equal(pal[:256, 0], pal[:256, 2]))
            if tag.startswith(b"Y800") or tag.startswith(b"GREY") or \
                    gray_pal:
                # top-down luma (or an identity-gray pal8 DIB)
                y[i] = buf[:w * h].reshape(h, w)
                cb[i] = 128
                cr[i] = 128
            else:
                # pal8 bottom-up DIB: palette LUT (BGRX quads) -> RGB
                # (swscale.c pal8 input support)
                row = (w + 3) & ~3
                idxs = buf[:row * h].reshape(h, row)[:, :w][::-1]
                lut = np.zeros((256, 4), np.uint8)
                lut[:pal.shape[0]] = pal
                rgb = lut[idxs][:, :, 2::-1]   # BGRX -> RGB
                y[i], cb[i], cr[i] = (a[0] for a in rgb_frames_to_yuv(
                    np.ascontiguousarray(rgb)[None]))
        elif st.bits == 16 and (tag.startswith(b"DIB") or
                                not tag.strip(b"\x00")):
            # 16-bit bottom-up DIB: RGB555 for BI_RGB (the 16-bit
            # default), or the BI_BITFIELDS channel masks from strf
            # (RGB565 in practice — raw.c pix_fmt selection by masks)
            row = (w * 2 + 3) & ~3
            px = buf[:row * h].reshape(h, row)[:, :w * 2]
            v = px.view("<u2").reshape(h, w)[::-1]
            masks = getattr(st, "bitmasks", None) or (0x7C00, 0x3E0, 0x1F)
            chans = []
            for m in masks:
                shift = (m & -m).bit_length() - 1 if m else 0
                width = max(1, int(m >> shift).bit_length())
                c = ((v >> shift) & (m >> shift)).astype(np.uint8)
                # expand to 8 bits by bit replication (5->8: <<3 | >>2)
                c8 = (c.astype(np.uint16) << (8 - width)) | \
                     (c >> max(0, 2 * width - 8))
                chans.append(c8.astype(np.uint8))
            rgb = np.stack(chans, axis=-1)
            y[i], cb[i], cr[i] = (a[0] for a in rgb_frames_to_yuv(rgb[None]))
        elif st.bits == 32 and (tag.startswith(b"DIB") or
                                not tag.strip(b"\x00")):
            img = buf[:w * h * 4].reshape(h, w, 4)
            rgb = img[::-1, :, 2::-1]  # bottom-up BGRX -> RGB
            y[i], cb[i], cr[i] = (a[0] for a in rgb_frames_to_yuv(
                np.ascontiguousarray(rgb)[None]))
        elif tag.startswith(b"DIB") or st.bits == 24:
            row = (w * 3 + 3) & ~3
            img = buf[:row * h].reshape(h, row)[:, :w * 3].reshape(h, w, 3)
            rgb = img[::-1, :, ::-1]  # bottom-up BGR -> RGB
            y[i], cb[i], cr[i] = (a[0] for a in rgb_frames_to_yuv(
                np.ascontiguousarray(rgb)[None]))
        else:
            raise ValueError(f"unsupported AVI video codec {st.codec!r}")
    return y, cb, cr


def extract_pcm(st: AviStream) -> np.ndarray:
    """Audio stream -> mono int16 PCM.

    Accepts the WAVE formats the reference ingests: PCM u8/s16/s24/s32,
    A-law/mu-law, IMA-ADPCM-WAV (0x11), MS-ADPCM (0x02) — decoded via
    `codecs/wav_audio.py`; multi-channel input downmixes by mean."""
    data = b"".join(st.chunks)
    fmt = struct.unpack("<H", (st.codec or b"\x01\x00")[:2])[0]
    ch = max(st.channels, 1)
    if fmt == 1 and st.bits in (0, 16):
        pcm = np.frombuffer(data[:len(data) & ~1], "<i2")
        pcm = pcm[:len(pcm) // ch * ch]
    else:
        from ..codecs.wav_audio import decode_pcm_bytes
        pcm = decode_pcm_bytes(data, fmt, st.bits, ch,
                               getattr(st, "block_align", 0))
    if ch > 1:
        pcm = pcm.reshape(-1, ch).mean(axis=1).astype(np.int16)
    return pcm


def mux(y: np.ndarray, cb: np.ndarray, cr: np.ndarray, pcm: np.ndarray,
        fps: int, sample_rate: int, video_chunks: list[bytes] = None) -> bytes:
    """Write an AVI with I420 video + PCM s16 mono audio.

    When `video_chunks` is given they are written as MJPG-compressed
    frames (full-header baseline JPEGs, the `ffmpeg -vcodec mjpeg out.avi`
    shape) instead of raw I420 planes; y is still consulted for geometry.
    """
    F, H, W = y.shape
    if video_chunks is not None:
        fourcc, frame_bytes = b"MJPG", max(len(c) for c in video_chunks)
    else:
        fourcc, frame_bytes = b"I420", W * H * 3 // 2
    samples_per_frame = sample_rate // fps if fps else 0

    def chunk(tag, payload):
        pad = b"\x00" if len(payload) & 1 else b""
        return tag + struct.pack("<I", len(payload)) + payload + pad

    # headers
    avih = struct.pack("<14I", 1_000_000 // fps, frame_bytes * fps, 0, 0x10,
                       F, 0, 2 if len(pcm) else 1, frame_bytes, W, H, 0, 0, 0, 0)
    strh_v = (b"vids" + fourcc + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0,
              1, fps, 0, F, frame_bytes, 0xFFFFFFFF, 0)
              + struct.pack("<4h", 0, 0, W, H))
    strf_v = struct.pack("<IiiHH4sIiiII", 40, W, H, 1,
                         24 if video_chunks is not None else 12, fourcc,
                         frame_bytes, 0, 0, 0, 0)
    strl_v = b"LIST" + struct.pack(
        "<I", 4 + len(chunk(b"strh", strh_v)) + len(chunk(b"strf", strf_v))) \
        + b"strl" + chunk(b"strh", strh_v) + chunk(b"strf", strf_v)

    strls = strl_v
    if len(pcm):
        strh_a = (b"auds" + b"\x00" * 4 + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0,
                  1, sample_rate, 0, len(pcm), 2, 0xFFFFFFFF, 2)
                  + struct.pack("<4h", 0, 0, 0, 0))
        strf_a = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
        strl_a = b"LIST" + struct.pack(
            "<I", 4 + len(chunk(b"strh", strh_a)) + len(chunk(b"strf", strf_a))) \
            + b"strl" + chunk(b"strh", strh_a) + chunk(b"strf", strf_a)
        strls += strl_a

    hdrl = b"LIST" + struct.pack("<I", 4 + len(chunk(b"avih", avih)) + len(strls)) \
        + b"hdrl" + chunk(b"avih", avih) + strls

    movi = bytearray(b"movi")
    index = []  # (tag, flags, offset-from-movi-fourcc, size) for idx1
    for i in range(F):
        if video_chunks is not None:
            payload = video_chunks[i]
        else:
            payload = y[i].tobytes() + cb[i].tobytes() + cr[i].tobytes()
        index.append((b"00dc", 0x10, len(movi), len(payload)))
        movi += chunk(b"00dc", payload)
        if len(pcm):
            lo = i * samples_per_frame
            hi = min(len(pcm), (i + 1) * samples_per_frame)
            if i == F - 1:
                hi = len(pcm)
            ab = np.ascontiguousarray(pcm[lo:hi], dtype="<i2").tobytes()
            index.append((b"01wb", 0x10, len(movi), len(ab)))
            movi += chunk(b"01wb", ab)
    movi_list = b"LIST" + struct.pack("<I", len(movi)) + bytes(movi)

    # idx1 (avi_write_idx1 layout): offsets relative to the 'movi' fourcc,
    # AVIIF_KEYFRAME on every chunk (raw video is all-intra)
    idx1 = b"".join(struct.pack("<4sIII", tag, flags, ofs, sz)
                    for (tag, flags, ofs, sz) in index)
    riff_body = b"AVI " + hdrl + movi_list + chunk(b"idx1", idx1)
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body
