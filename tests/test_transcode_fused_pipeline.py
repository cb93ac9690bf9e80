"""transcode_levels_fused (pipeline API) vs the two-stage path."""

import numpy as np
import jax.numpy as jnp

from amv_tpu.bitstream.entropy import huffman_decode_frames
from amv_tpu.codecs.amv_video import decode_transform, encode_transform
from amv_tpu.containers import riff
from amv_tpu.pipeline.transcode import transcode_levels_fused


def test_fused_pipeline_matches_two_stage(sample_amv_bytes):
    s = riff.demux(sample_amv_bytes)
    F, M, mbw, mbh = 3, 48, 8, 6
    levels = huffman_decode_frames(s.video_chunks[:F], M)
    y, cb, cr = decode_transform(jnp.asarray(levels), mbw, mbh, 128, 96)
    lv_ref = np.asarray(encode_transform(y, cb, cr, mbw, mbh, 2))
    lv2, pix = transcode_levels_fused(jnp.asarray(levels), 2)
    np.testing.assert_array_equal(np.asarray(lv2), lv_ref)


def test_fused_pipeline_qscale4(sample_amv_bytes):
    s = riff.demux(sample_amv_bytes)
    F, M, mbw, mbh = 2, 48, 8, 6
    levels = huffman_decode_frames(s.video_chunks[:F], M)
    y, cb, cr = decode_transform(jnp.asarray(levels), mbw, mbh, 128, 96)
    lv_ref = np.asarray(encode_transform(y, cb, cr, mbw, mbh, 4))
    lv2, _ = transcode_levels_fused(jnp.asarray(levels), 4)
    np.testing.assert_array_equal(np.asarray(lv2), lv_ref)
