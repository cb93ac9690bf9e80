"""G.729A decoder tests: differential vs the compiled reference oracle."""

import numpy as np
import pytest

from amv_tpu.containers import act
from amv_tpu.verify.ref_g729 import G729Decoder, bytes2parm, parity_check

from g729_oracle_build import build_oracle

MAGIC = 0x6996966996696996


def make_frame(rng, p1_range=(60, 197), bad_parity=False):
    bits = []

    def put(v, n):
        bits.extend((int(v) >> (n - 1 - i)) & 1 for i in range(n))

    put(rng.integers(0, 2), 1)
    put(rng.integers(0, 128), 7)
    put(rng.integers(0, 32), 5)
    put(rng.integers(0, 32), 5)
    P1 = int(rng.integers(*p1_range))
    put(P1, 8)
    P0 = ((MAGIC >> (P1 >> 2)) & 1) ^ 1
    if bad_parity:
        P0 ^= 1
    put(P0, 1)
    put(rng.integers(0, 1 << 13), 13)
    put(rng.integers(0, 16), 4)
    put(rng.integers(0, 8), 3)
    put(rng.integers(0, 16), 4)
    put(rng.integers(0, 32), 5)
    put(rng.integers(0, 1 << 13), 13)
    put(rng.integers(0, 16), 4)
    put(rng.integers(0, 8), 3)
    put(rng.integers(0, 16), 4)
    b = bytearray(10)
    for i, bit in enumerate(bits):
        b[i >> 3] |= bit << (7 - (i & 7))
    return bytes(b)


def run_oracle(frames):
    import subprocess
    oracle = build_oracle()
    if oracle is None:
        pytest.skip("reference G.729 sources unavailable")
    out = subprocess.run([oracle], input=b"".join(frames), capture_output=True)
    return np.frombuffer(out.stdout, dtype="<i2")


def run_ours(frames):
    dec = G729Decoder()
    return np.concatenate([dec.decode_frame(f) for f in frames])


def test_bit_exact_valid_frames():
    rng = np.random.default_rng(1)
    frames = [make_frame(rng) for _ in range(60)]
    np.testing.assert_array_equal(run_ours(frames), run_oracle(frames))


def test_bit_exact_with_erasures():
    rng = np.random.default_rng(2)
    frames = [make_frame(rng) for _ in range(30)]
    # note: an erasure BEFORE any good frame triggers out-of-bounds reads in
    # the reference (UB, see ref_g729.G729Decoder.__init__) — start at 3
    for i in (3, 7, 8, 9, 25):
        frames[i] = bytes(10)
    np.testing.assert_array_equal(run_ours(frames), run_oracle(frames))


def test_bit_exact_minimum_pitch_delay():
    """P1 = 0 forces the minimum pitch delay (pd 19+1/3) — the fractional
    interpolation corner the CLI adversarial probes exercise (verify
    skill: clearing P1@18:8).  Differential vs the compiled reference."""
    rng = np.random.default_rng(5)
    frames = []
    for i in range(24):
        frames.append(make_frame(rng, p1_range=(0, 4) if i % 3 else
                                 (0, 1)))
    np.testing.assert_array_equal(run_ours(frames), run_oracle(frames))


def test_bit_exact_high_pitch_and_bad_parity():
    rng = np.random.default_rng(3)
    frames = []
    for i in range(40):
        if i % 5 == 3:
            frames.append(make_frame(rng, p1_range=(197, 256)))
        elif i % 7 == 5:
            frames.append(make_frame(rng, bad_parity=True))
        else:
            frames.append(make_frame(rng))
    np.testing.assert_array_equal(run_ours(frames), run_oracle(frames))


def test_parity_and_unpack():
    rng = np.random.default_rng(4)
    f = make_frame(rng)
    parm, erased = bytes2parm(f)
    assert not erased
    assert parity_check(parm["ac_index"][0], parm["parity"]) == 1
    assert bytes2parm(bytes(10))[1] is True


def test_act_container_roundtrip():
    rng = np.random.default_rng(5)
    frames = [make_frame(rng) for _ in range(120)]
    data = act.mux(frames, sample_rate=8000)
    assert act.probe(data)
    got, rate, dur = act.demux(data)
    assert rate == 8000
    assert got[:len(frames)] == frames
    # trailing padding frames are all-zero (erasures), per reference behavior
    assert all(f == bytes(10) for f in got[len(frames):])


def test_act_itu_bitstream():
    rng = np.random.default_rng(6)
    frames = [make_frame(rng) for _ in range(3)]
    bit = act.to_itu_bitstream(frames)
    assert len(bit) == 3 * (2 + 2 + 160)
    words = np.frombuffer(bit, dtype="<u2")
    assert words[0] == 0x6B21 and words[1] == 80
    # soft bits decode back to the frame bits
    f0bits = [(frames[0][i >> 3] >> (7 - (i & 7))) & 1 for i in range(80)]
    assert all((words[2 + i] == 0x81) == bool(f0bits[i]) for i in range(80))


def test_act_decode_pipeline():
    """ACT file -> G.729A decode -> PCM (the ffmpeg -i test.act path)."""
    rng = np.random.default_rng(7)
    frames = [make_frame(rng) for _ in range(51)]  # exactly one chunk
    data = act.mux(frames, sample_rate=8000)
    got_frames, rate, _ = act.demux(data)
    pcm = run_ours(got_frames[:51])
    assert pcm.shape == (51 * 80,)
    assert pcm.dtype == np.int16
