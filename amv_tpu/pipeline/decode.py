"""End-to-end AMV decode pipeline: .amv bytes -> YUV frames + PCM."""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..containers import riff
from ..codecs import amv_audio, amv_video


@dataclass
class DecodedAmv:
    info: riff.AmvInfo
    y: np.ndarray    # uint8 [F, H, W]
    cb: np.ndarray   # uint8 [F, H/2, W/2]
    cr: np.ndarray   # uint8 [F, H/2, W/2]
    pcm: np.ndarray  # int16 [n_samples]


def decode_bytes(data: bytes, *, video=True, audio=True,
                 max_frames: int | None = None,
                 start_frame: int = 0) -> DecodedAmv:
    """Decode an AMV file.

    start_frame gives O(1) seek: AMV frames are intra-only and each audio
    chunk header resets the codec state, so decode can begin at any chunk
    boundary (the avi_read_seek / AmvRewindFrameStart analog).
    """
    s = riff.demux(data)
    info = s.info
    vchunks = s.video_chunks[start_frame:]
    achunks_all = s.audio_chunks[start_frame:]
    if max_frames:
        vchunks = vchunks[:max_frames]
    if video and vchunks:
        y, cb, cr = amv_video.decode_frames(vchunks, info.width, info.height)
    else:
        y = np.zeros((0, info.height, info.width), np.uint8)
        cb = np.zeros((0, info.height // 2, info.width // 2), np.uint8)
        cr = cb.copy()
    if audio and achunks_all:
        achunks = achunks_all[:max_frames] if max_frames else achunks_all
        pcm = amv_audio.decode_chunks(achunks)
    else:
        pcm = np.zeros(0, np.int16)
    return DecodedAmv(info=info, y=y, cb=cb, cr=cr, pcm=pcm)


def decode_file(path: str, **kw) -> DecodedAmv:
    with open(path, "rb") as f:
        return decode_bytes(f.read(), **kw)
