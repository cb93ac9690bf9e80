"""Corrupt-input robustness: malformed containers/bitstreams must raise
cleanly (the reference returns -1 from decoders, mjpegdec.c:699-703),
never crash or loop."""

import numpy as np
import pytest

from amv_tpu.containers import riff
from amv_tpu.bitstream.entropy import huffman_decode_frames


def test_truncated_file_handling(sample_amv_bytes):
    """Header truncation raises; mid-movi truncation yields only the
    complete chunks (streaming-demuxer semantics), all decodable."""
    for cut in (10, 0x50):
        with pytest.raises(Exception):
            riff.demux(sample_amv_bytes[:cut])
    s_half = riff.demux(sample_amv_bytes[:len(sample_amv_bytes) // 2])
    full = riff.demux(sample_amv_bytes)
    n = len(s_half.video_chunks)
    assert 0 < n < len(full.video_chunks)
    # all but the cut-off final chunk are intact (FFmpeg returns the short
    # final packet too, so a partial last chunk is reference-faithful)
    assert s_half.video_chunks[:n - 1] == full.video_chunks[:n - 1]
    huffman_decode_frames(s_half.video_chunks[:2], 48)   # still decodable


def test_corrupt_scan_handling(sample_amv_bytes):
    s = riff.demux(sample_amv_bytes)

    # bare 0xFF mid-scan = marker: scan ends early, the rest zero-fills
    # (FFmpeg get_bits semantics) -> decode completes with garbage levels,
    # never crashes or overreads
    p = bytearray(s.video_chunks[0])
    p[10:30] = b"\xFF\xEE" * 10
    lv = huffman_decode_frames([bytes(p)], 48)
    assert lv.shape == (1, 48, 6, 64)

    # escaped FF00 pairs survive unescaping as 0xFF bytes: a 32-bit run of
    # ones hits an invalid (all-ones) Huffman prefix -> must raise
    p2 = bytearray(s.video_chunks[0])
    p2[10:18] = b"\xFF\x00" * 4
    with pytest.raises(Exception):
        huffman_decode_frames([bytes(p2)], 48)


def test_garbage_header_rejected():
    with pytest.raises(Exception):
        riff.demux(b"\x00" * 512)
    with pytest.raises(Exception):
        riff.demux(b"RIFF\xff\xff\xff\xffAMV " + b"\x00" * 64)


def test_audio_chunk_short_header(sample_amv_bytes):
    """A 7-byte audio chunk (shorter than its own header) must not crash
    the batch path."""
    from amv_tpu.codecs import amv_audio
    s = riff.demux(sample_amv_bytes)
    chunks = [s.audio_chunks[0][:7]]
    try:
        amv_audio.decode_chunks(chunks)
    except Exception:
        pass  # raising is fine; crashing/hanging is not
