"""TPU ADPCM kernels vs the scalar oracle: bit-exact."""

import numpy as np
import pytest

from amv_tpu.codecs import amv_audio
from amv_tpu.containers import riff
from amv_tpu.verify import ref_adpcm


def test_decode_bit_exact_random():
    rng = np.random.default_rng(42)
    chunks = []
    for i in range(7):
        n = int(rng.integers(4, 700))
        header = (int(rng.integers(-30000, 30000)).to_bytes(2, "little", signed=True)
                  + int(rng.integers(0, 89)).to_bytes(2, "little")
                  + (2 * n).to_bytes(4, "little"))
        chunks.append(header + rng.integers(0, 256, n, dtype=np.uint8).tobytes())
    got = amv_audio.decode_chunks(chunks)
    want = np.concatenate([ref_adpcm.decode_chunk(c) for c in chunks])
    np.testing.assert_array_equal(got, want)


def test_decode_bit_exact_device_corpus(sample_amv_bytes):
    s = riff.demux(sample_amv_bytes)
    got = amv_audio.decode_chunks(s.audio_chunks)
    want = np.concatenate([ref_adpcm.decode_chunk(c) for c in s.audio_chunks])
    np.testing.assert_array_equal(got, want)


def test_decode_clamp_stress():
    # force predictor clamping: long runs of max-magnitude nibbles
    header = (0).to_bytes(2, "little", signed=True) + (88).to_bytes(2, "little") \
        + (400).to_bytes(4, "little")
    data = bytes([0x77] * 100 + [0xFF] * 100)  # big + then big -
    chunk = header + data
    got = amv_audio.decode_chunks([chunk])
    want = ref_adpcm.decode_chunk(chunk)
    np.testing.assert_array_equal(got, want)


def test_encode_bit_exact():
    rng = np.random.default_rng(3)
    t = np.arange(50000)
    sig = (6000 * np.sin(2 * np.pi * 300 * t / 22050)
           + 1500 * rng.standard_normal(len(t))).astype(np.int16)
    got = amv_audio.encode_stream(sig, frame_size=1378, sample_rate=22050)
    want = ref_adpcm.encode(sig, frame_size=1378, sample_rate=22050)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g == w


def test_encode_odd_frame_size():
    sig = (1000 * np.sin(np.arange(30000) / 5.0)).astype(np.int16)
    got = amv_audio.encode_stream(sig, frame_size=1333, sample_rate=16000)
    want = ref_adpcm.encode(sig, frame_size=1333, sample_rate=16000)
    assert [len(c) for c in got] == [len(c) for c in want]
    for g, w in zip(got, want):
        assert g == w
