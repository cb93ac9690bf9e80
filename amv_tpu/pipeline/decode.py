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
                 max_frames: int | None = None) -> DecodedAmv:
    s = riff.demux(data)
    info = s.info
    vchunks = s.video_chunks[:max_frames] if max_frames else s.video_chunks
    if video and vchunks:
        y, cb, cr = amv_video.decode_frames(vchunks, info.width, info.height)
    else:
        y = np.zeros((0, info.height, info.width), np.uint8)
        cb = np.zeros((0, info.height // 2, info.width // 2), np.uint8)
        cr = cb.copy()
    if audio and s.audio_chunks:
        achunks = s.audio_chunks[:max_frames] if max_frames else s.audio_chunks
        pcm = amv_audio.decode_chunks(achunks)
    else:
        pcm = np.zeros(0, np.int16)
    return DecodedAmv(info=info, y=y, cb=cb, cr=cr, pcm=pcm)


def decode_file(path: str, **kw) -> DecodedAmv:
    with open(path, "rb") as f:
        return decode_bytes(f.read(), **kw)
