"""AVI container tests + the canonical AVI<->AMV conversion paths."""

import numpy as np
import pytest

from amv_tpu.containers import avi
from amv_tpu.pipeline import decode as P
from amv_tpu.pipeline import encode as E


def _clip(F=4, h=120, w=160):
    yy, xx = np.mgrid[0:h, 0:w]
    y = np.stack([(128 + 60 * np.sin(xx / 8.0 + f)).astype(np.uint8)
                  for f in range(F)])
    cb = np.stack([(128 + 30 * np.cos(yy[::2, ::2] / 9.0)).astype(np.uint8)] * F)
    cr = np.stack([(128 + 30 * np.sin(xx[::2, ::2] / 7.0)).astype(np.uint8)] * F)
    pcm = (5000 * np.sin(np.arange(int(F / 16 * 22050)) * 0.1)).astype(np.int16)
    return y, cb, cr, pcm


def test_avi_mux_demux_roundtrip():
    y, cb, cr, pcm = _clip()
    data = avi.mux(y, cb, cr, pcm, fps=16, sample_rate=22050)
    streams = avi.demux(data)
    kinds = [s.kind for s in streams]
    assert kinds == ["video", "audio"]
    vst, ast = streams
    assert (vst.width, vst.height) == (160, 120)
    assert vst.fps_num == 16
    assert ast.sample_rate == 22050
    y2, cb2, cr2 = avi.extract_yuv420(vst)
    np.testing.assert_array_equal(y2, y)
    np.testing.assert_array_equal(cb2, cb)
    np.testing.assert_array_equal(cr2, cr)
    pcm2 = avi.extract_pcm(ast)
    np.testing.assert_array_equal(pcm2, pcm)


def test_avi_to_amv_to_avi():
    """The reference's make-test round trip: avi -> amv -> avi."""
    y, cb, cr, pcm = _clip()
    avi_in = avi.mux(y, cb, cr, pcm, fps=16, sample_rate=22050)
    streams = avi.demux(avi_in)
    vy, vcb, vcr = avi.extract_yuv420(streams[0])
    apcm = avi.extract_pcm(streams[1])
    amv = E.encode_to_bytes(vy, vcb, vcr, apcm, fps=16, sample_rate=22050)
    dec = P.decode_bytes(amv)
    avi_out = avi.mux(dec.y, dec.cb, dec.cr, dec.pcm, fps=16, sample_rate=22050)
    streams2 = avi.demux(avi_out)
    y3, _, _ = avi.extract_yuv420(streams2[0])
    c = np.corrcoef(y3.astype(float).ravel(), y.astype(float).ravel())[0, 1]
    assert c > 0.9


def test_avi_mjpeg_input(sample_amv_bytes):
    """MJPEG-in-AVI (the reference's typical hole.avi material) feeds the
    encoder via the parsed-table decoder."""
    import struct
    from amv_tpu.containers import riff
    from amv_tpu.bitstream.jpeg_tables import canned_jpeg_header
    s = riff.demux(sample_amv_bytes)
    w, h = s.info.width, s.info.height
    hdr = canned_jpeg_header(w, h)
    jpegs = [hdr + c[2:-2] + b"\xFF\xD9" for c in s.video_chunks[:3]]

    # hand-build a minimal MJPG AVI
    def chunk(tag, payload):
        pad = b"\x00" if len(payload) & 1 else b""
        return tag + struct.pack("<I", len(payload)) + payload + pad
    avih = struct.pack("<14I", 83333, 0, 0, 0x10, 3, 0, 1, 0, w, h, 0, 0, 0, 0)
    strh = (b"vids" + b"MJPG" + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0,
            1, 12, 0, 3, 0, 0xFFFFFFFF, 0) + struct.pack("<4h", 0, 0, w, h))
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", 0, 0, 0, 0, 0)
    strl = b"LIST" + struct.pack("<I", 4 + len(chunk(b"strh", strh)) +
                                 len(chunk(b"strf", strf))) + b"strl" \
        + chunk(b"strh", strh) + chunk(b"strf", strf)
    hdrl = b"LIST" + struct.pack("<I", 4 + len(chunk(b"avih", avih)) +
                                 len(strl)) + b"hdrl" + chunk(b"avih", avih) + strl
    movi = bytearray(b"movi")
    for j in jpegs:
        movi += chunk(b"00dc", j)
    body = b"AVI " + hdrl + b"LIST" + struct.pack("<I", len(movi)) + bytes(movi)
    data = b"RIFF" + struct.pack("<I", len(body)) + body

    streams = avi.demux(data)
    assert streams[0].codec.upper().startswith(b"MJPG")
    y, cb, cr = avi.extract_yuv420(streams[0])
    # must equal the unflipped AMV decode of the same frames
    from amv_tpu.codecs import amv_video
    ya, _, _ = amv_video.decode_frames(s.video_chunks[:3], w, h)
    np.testing.assert_array_equal(y, ya[:, ::-1])
