"""End-to-end AMV encode pipeline: raw YUV frames + PCM -> .amv bytes.

Mirrors the canonical reference invocation
`ffmpeg -i in.avi -f amv -r 16 -s 160x120 -ac 1 -ar 22050 out.amv`
(AMVmuxer/Makefile:25-27): video at a fixed fps, mono ADPCM audio whose
per-chunk sample budget tracks the video frame rate
(frame_size = av_rescale(sample_rate, 1, fps), amvenc.c:276-281).
"""

from __future__ import annotations

import numpy as np

from ..containers import riff
from ..codecs import amv_audio, amv_video


def av_rescale_near(a: int, b: int, c: int) -> int:
    """av_rescale with AV_ROUND_NEAR_INF (round half away from zero)."""
    return (2 * a * b + c) // (2 * c)


def encode_to_bytes(y: np.ndarray, cb: np.ndarray, cr: np.ndarray,
                    pcm: np.ndarray, *, fps: int = 16,
                    sample_rate: int = 22050, qscale: int = 2,
                    trellis: bool = False, quant: str = "ffmpeg") -> bytes:
    """Encode video frames + PCM into a complete .amv file.

    quant="q60" selects the device-consistent quantizer (decode-matched
    sp5x Q60 tables, >=30 dB round trips) instead of the reference's
    faithful-but-inconsistent MPEG-1-matrix mode — see
    codecs/amv_video.encode_transform."""
    F, H, W = y.shape
    video_chunks = amv_video.encode_frames(y, cb, cr, qscale=qscale,
                                           quant=quant)
    frame_size = av_rescale_near(sample_rate, 1, fps)
    audio_chunks = amv_audio.encode_stream(
        np.asarray(pcm, np.int16), frame_size, sample_rate, trellis=trellis)
    # the muxer alternates V/A; trim or pad audio chunk count to video count,
    # matching what the reference pipeline produces for matched durations
    return riff.mux(video_chunks, audio_chunks, width=W, height=H, fps=fps,
                    sample_rate=sample_rate)


def encode_to_file(path: str, *args, **kw):
    data = encode_to_bytes(*args, **kw)
    with open(path, "wb") as f:
        f.write(data)
    return len(data)
