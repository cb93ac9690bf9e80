"""Multi-file batched decode: one device dispatch for many .amv files.

Throughput-oriented API: all video frames (and audio chunks) from a set of
same-geometry files decode in a single jitted program, which is how the
framework saturates a chip (and, sharded on the 'dp' mesh axis, many
chips) despite the tiny per-file work.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..bitstream.entropy import huffman_decode_frames
from ..codecs import amv_audio
from ..codecs.amv_video import decode_transform
from ..containers import riff
from .decode import DecodedAmv


def decode_many(datas: list[bytes]) -> list[DecodedAmv]:
    """Decode several AMV files; video of same-geometry files is batched
    into one device dispatch."""
    streams = [riff.demux(d) for d in datas]
    results: list[DecodedAmv | None] = [None] * len(datas)

    # group by geometry
    groups: dict[tuple, list[int]] = {}
    for i, s in enumerate(streams):
        groups.setdefault((s.info.width, s.info.height), []).append(i)

    for (w, h), idxs in groups.items():
        mb_w, mb_h = (w + 15) // 16, (h + 15) // 16
        counts = [len(streams[i].video_chunks) for i in idxs]
        all_payloads = [p for i in idxs for p in streams[i].video_chunks]
        if all_payloads:
            levels = huffman_decode_frames(all_payloads, mb_w * mb_h)
            y, cb, cr = decode_transform(jnp.asarray(levels), mb_w, mb_h, w, h)
            y, cb, cr = np.asarray(y), np.asarray(cb), np.asarray(cr)
        off = 0
        for i, n in zip(idxs, counts):
            s = streams[i]
            pcm = amv_audio.decode_chunks(s.audio_chunks) \
                if s.audio_chunks else np.zeros(0, np.int16)
            results[i] = DecodedAmv(
                info=s.info,
                y=y[off:off + n] if n else np.zeros((0, h, w), np.uint8),
                cb=cb[off:off + n] if n else np.zeros((0, h // 2, w // 2), np.uint8),
                cr=cr[off:off + n] if n else np.zeros((0, h // 2, w // 2), np.uint8),
                pcm=pcm)
            off += n
    return results
