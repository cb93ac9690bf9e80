"""ACT dictaphone container (G.729A frames) demux/mux.

Reference: AMVmuxer/ffmpeg/libavformat/act.c.  Layout: WAVE-ish header, an
ACT duration record at offset 256 (tag 0x84, msec le16, sec u8, minutes
le32), audio data from offset 512 in 512-byte chunks, each holding 51
10-byte G.729 frames (last 2 bytes of each chunk unused).  Every frame's
bytes are stored with a fixed permutation (act.c:210-219 read side,
:84-93 write side).
"""

from __future__ import annotations

import struct

# packet[i] = frame_byte[PERM_READ[i]] (act_read_packet)
PERM_READ = [5, 0, 6, 1, 7, 2, 8, 3, 9, 4]
# file_byte[i] = packet[PERM_WRITE[i]] (act_write_packet)
PERM_WRITE = [1, 3, 5, 7, 9, 0, 2, 4, 6, 8]

CHUNK_SIZE = 512


def probe(data: bytes) -> bool:
    if len(data) < 512:
        return False
    if data[0:4] != b"RIFF" or data[8:12] != b"WAVE":
        return False
    if struct.unpack_from("<I", data, 16)[0] != 16:
        return False
    return data[256] == 0x84


def demux(data: bytes):
    """Returns (frames list[bytes 10], sample_rate, duration_csec)."""
    if not probe(data):
        raise ValueError("not an ACT file")
    sample_rate = struct.unpack_from("<I", data, 24)[0]
    msec = struct.unpack_from("<H", data, 257)[0]
    sec = data[259]
    minutes = struct.unpack_from("<I", data, 260)[0]
    duration_csec = (minutes * 60 + sec) * 100 + msec // 10
    frames = []
    pos = 512
    while pos + CHUNK_SIZE <= len(data):
        chunk = data[pos:pos + CHUNK_SIZE]
        for i in range(51):
            raw = chunk[i * 10:(i + 1) * 10]
            frames.append(bytes(raw[PERM_READ[k]] for k in range(10)))
        pos += CHUNK_SIZE
    return frames, sample_rate, duration_csec


def mux(frames: list[bytes], sample_rate: int = 8000,
        frame_size: int = 10) -> bytes:
    """Write an ACT file from packed 10-byte G.729 frames (act_write_*)."""
    out = bytearray()
    out += b"RIFF"
    riff_size_pos = len(out)
    out += b"\x00\x00\x00\x00"
    out += b"WAVE"
    out += b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate,
                                 sample_rate * 2, 2, 16)
    out += b"data"
    data_size_pos = len(out)
    out += b"\x00\x00\x00\x00"
    while len(out) < 512:
        out.append(0)

    bytes_left = 0
    for f in frames:
        if not bytes_left:
            bytes_left = CHUNK_SIZE
        out += bytes(f[PERM_WRITE[k]] for k in range(10))
        bytes_left -= 10
        if bytes_left < 10:
            out += bytes(bytes_left)
            bytes_left = 0
    # act_write_trailer pads (512 - len%512) bytes unconditionally — a full
    # extra zero chunk when already aligned; reproduced faithfully
    out += bytes(512 - (len(out) % 512))

    struct.pack_into("<I", out, riff_size_pos, len(out) - riff_size_pos - 4)
    struct.pack_into("<I", out, data_size_pos, len(out) - data_size_pos - 4)
    # duration record: frames * 80 samples at sample_rate
    duration_ms = (len(frames) * 80 * 1000) // sample_rate
    out[256] = 0x84
    struct.pack_into("<H", out, 257, duration_ms % 1000)
    duration_s = duration_ms // 1000
    out[259] = duration_s % 60
    struct.pack_into("<I", out, 260, duration_s // 60)
    return bytes(out)


def to_itu_bitstream(frames: list[bytes]) -> bytes:
    """ACT frames -> ITU .BIT serial format (G.729/act2bit.c semantics):
    per frame 0x6b21 sync, 80 count, then 80 soft bits (0x81/0x7f) le16."""
    out = bytearray()
    for f in frames:
        out += struct.pack("<HH", 0x6B21, 80)
        for byte in f:
            for k in range(8):
                out += struct.pack("<H", 0x81 if (byte << k) & 0x80 else 0x7F)
    return bytes(out)
