#!/usr/bin/env python
"""Benchmark harness: TPU AMV codec vs single-core C reference.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric (BASELINE.json): AMV frames/sec/chip for bit-exact
decode+encode.  vs_baseline anchors against the single-core C
implementation of the same reference algorithms (amv_tpu/native/entropy.c),
per BASELINE.md's instruction to establish the "1x single-core C" anchor
locally (the reference publishes no numbers).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def best_time(fn, iters=3, warmup=1):
    for _ in range(warmup):
        fn()
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import jax
    from amv_tpu.containers import riff
    from amv_tpu.codecs import amv_video, amv_audio
    from amv_tpu.bitstream.entropy import huffman_decode_frames
    from amv_tpu.codecs.amv_video import decode_transform, encode_transform
    import jax.numpy as jnp

    sample = "/root/reference/C-AMVDecoder/bin/AMV1.amv"
    s = riff.read(sample)
    w, h = s.info.width, s.info.height
    mb_w, mb_h = (w + 15) // 16, (h + 15) // 16
    payloads = s.video_chunks
    F = len(payloads)

    # ---------------- TPU pipeline: full decode (host entropy + device) ----
    def tpu_decode():
        levels = huffman_decode_frames(payloads, mb_w * mb_h)
        y, cb, cr = decode_transform(jnp.asarray(levels), mb_w, mb_h, w, h)
        jax.block_until_ready((y, cb, cr))
        return y, cb, cr

    t_dec = best_time(tpu_decode)
    y, cb, cr = tpu_decode()
    yh, cbh, crh = np.asarray(y), np.asarray(cb), np.asarray(cr)

    # ---------------- TPU pipeline: full encode ----------------------------
    from amv_tpu.bitstream.entropy import huffman_encode_frame

    yj, cbj, crj = jnp.asarray(yh), jnp.asarray(cbh), jnp.asarray(crh)

    def tpu_encode():
        lv = encode_transform(yj, cbj, crj, mb_w, mb_h, 2)
        lv_np = np.asarray(lv)
        return [huffman_encode_frame(lv_np[f]) for f in range(F)]

    t_enc = best_time(tpu_encode)
    tpu_payloads = tpu_encode()

    # ---------------- single-core C anchor ---------------------------------
    try:
        from amv_tpu.native import entropy_native as native
    except Exception as e:  # pragma: no cover
        print(json.dumps({"metric": "decode+encode frames/sec/chip",
                          "value": round(2 * F / (t_dec + t_enc), 2),
                          "unit": "frames/s",
                          "vs_baseline": None,
                          "error": f"native anchor unavailable: {e}"}))
        return

    def c_decode():
        for p in payloads:
            native.ref_decode_frame(p, w, h)

    def c_encode():
        for f in range(F):
            native.ref_encode_frame(yh[f], cbh[f], crh[f], 2)

    tc_dec = best_time(c_decode, iters=2)
    tc_enc = best_time(c_encode, iters=2)

    # bit-exactness gates (the metric is only valid if outputs match C)
    ry, rcb, rcr = native.ref_decode_frame(payloads[0], w, h)
    assert np.array_equal(ry, yh[0]) and np.array_equal(rcb, cbh[0]) \
        and np.array_equal(rcr, crh[0]), "TPU decode != C reference"
    assert tpu_payloads[0] == native.ref_encode_frame(yh[0], cbh[0], crh[0], 2), \
        "TPU encode != C reference"

    # ---------------- ADPCM ------------------------------------------------
    achunks = s.audio_chunks
    n_samples = sum(2 * (len(c) - 8) for c in achunks)

    def tpu_adpcm():
        return amv_audio.decode_chunks(achunks)

    t_aud = best_time(tpu_adpcm)

    import struct
    def c_adpcm():
        for c in achunks:
            native.ref_adpcm_decode(c[8:], struct.unpack_from("<h", c, 0)[0],
                                    struct.unpack_from("<H", c, 2)[0])
    tc_aud = best_time(c_adpcm, iters=2)

    fps_tpu = 2 * F / (t_dec + t_enc)          # decode+encode per frame
    fps_c = 2 * F / (tc_dec + tc_enc)
    out = {
        "metric": "AMV decode+encode frames/sec/chip (bit-exact, 128x96 corpus)",
        "value": round(fps_tpu, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps_tpu / fps_c, 2),
        "detail": {
            "decode_fps_tpu": round(F / t_dec, 2),
            "encode_fps_tpu": round(F / t_enc, 2),
            "decode_fps_c1core": round(F / tc_dec, 2),
            "encode_fps_c1core": round(F / tc_enc, 2),
            "adpcm_msamples_tpu": round(n_samples / t_aud / 1e6, 3),
            "adpcm_msamples_c1core": round(n_samples / tc_aud / 1e6, 3),
            "frames": F,
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
