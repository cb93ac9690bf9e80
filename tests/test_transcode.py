"""Device-resident transcode pipeline."""

import numpy as np
import pytest

from amv_tpu.containers import riff
from amv_tpu.pipeline.transcode import transcode_bytes
from amv_tpu.pipeline.decode import decode_bytes


def test_transcode_device_corpus(sample_amv_bytes):
    out = transcode_bytes(sample_amv_bytes)
    s_in = riff.demux(sample_amv_bytes)
    s_out = riff.demux(out)
    assert len(s_out.video_chunks) == len(s_in.video_chunks)
    assert s_out.audio_chunks == s_in.audio_chunks  # pass-through
    # re-encoded video still decodes and matches the source decode closely
    d_in = decode_bytes(sample_amv_bytes, audio=False, max_frames=6)
    d_out = decode_bytes(out, audio=False, max_frames=6)
    c = np.corrcoef(d_in.y.astype(float).ravel(),
                    d_out.y.astype(float).ravel())[0, 1]
    # one generation of the reference's asymmetric encode(MPEG1 matrix)/
    # decode(Q60) quantization costs fidelity; 0.87 measured on this corpus
    assert c > 0.8
