"""TPU A/B: bench's 160x120 and 320x240 complete sections at sb widths.

Replicates bench.py's synthetic batches (same seeds/shapes) and times
transcode_complete_async at sb=8/16/32, with host-readback equality
across widths.  The 320x240 path exercises HBM-streamed decode + the
4-segment lane-parallel encode at the wider tiles (VMEM pressure is the
open question there — the encoder's output block is w_out*sb*128*4 B)."""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from amv_tpu.containers import riff
from amv_tpu.native import entropy_native as native
from amv_tpu.bitstream.entropy import huffman_encode_frame
from amv_tpu.codecs.amv_video import _encoder_quant_qmat_np
from amv_tpu.pipeline.transcode import (transcode_complete_async,
                                        pick_segments)

SAMPLE = "/root/reference/C-AMVDecoder/bin/AMV1.amv"


def best_time(fn, iters=5):
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[0], ts[len(ts) // 2]


def run_section(tag, rows_np, M, qk, w_out, segs, variants):
    rw = jax.device_put(jnp.asarray(rows_np))
    jax.block_until_ready(rw)
    FK = rows_np.shape[0]
    ref = None
    for sb in variants:
        name = f"{tag}.sb{sb}"
        try:
            @jax.jit
            def chain(rw, salt, sb=sb):
                words, bits, ok = transcode_complete_async(
                    rw, M, qk, w_out=w_out, win_fetch=64, win_emit=64,
                    segs=segs, enc="async", sb=sb)
                return ok, words, bits, (jnp.sum(words[::31, ::17]) +
                                         jnp.sum(bits) + salt)

            t0 = time.perf_counter()
            ok, w_d, b_d, _ = chain(rw, jnp.int32(0))
            jax.block_until_ready(b_d)
            tc = time.perf_counter() - t0
            wb = (np.asarray(w_d), np.asarray(b_d))
            del w_d, b_d
            if ref is None:
                ref, eq = wb, True
            else:
                eq = bool(np.array_equal(wb[0], ref[0]) and
                          np.array_equal(wb[1], ref[1]))
            del wb
            okb = bool(ok[...])
            tmin, tmed = best_time(lambda: int(chain(
                rw, jnp.int32(np.random.randint(1000)))[3][...]))
            print(f"{name}: {FK / tmin:.1f} fps ({tmin * 1e3:.2f} ms min /"
                  f" {tmed * 1e3:.2f} med) ok={okb} exact={eq} "
                  f"(compile {tc:.0f}s)", flush=True)
            del chain
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:160]}",
                  flush=True)


def main():
    print(f"# devices: {jax.devices()}", flush=True)
    s = riff.read(SAMPLE)
    w, h = s.info.width, s.info.height
    M = ((w + 15) // 16) * ((h + 15) // 16)
    qk = tuple(int(v) for v in _encoder_quant_qmat_np(2))
    payloads = s.video_chunks
    F = len(payloads)
    from amv_tpu.bitstream.entropy import huffman_decode_frames
    levels = np.asarray(huffman_decode_frames(payloads, M))

    which = os.environ.get("SECTIONS", "160,320").split(",")

    if "160" in which:
        M160, F160, K160 = 80, 1024, 8
        rng160 = np.random.default_rng(7)
        lv_pool = levels.reshape(F * M, 6, 64)
        lv160c = lv_pool[rng160.integers(0, F * M, (64, M160))]
        pay160 = [huffman_encode_frame(lv160c[f]) for f in range(64)]
        rows160, _ = native.unescape_frames(pay160 * (F160 // 64))
        rows160 = np.asarray(rows160)
        lens160 = np.array([len(p) for p in pay160] * (F160 // 64))
        ordk160 = np.argsort(np.tile(lens160, K160), kind="stable")
        rows160_k = np.tile(rows160, (K160, 1))[ordk160]
        print(f"# 160x120: F={rows160_k.shape[0]} M={M160}", flush=True)
        run_section("c160", rows160_k, M160, qk, 1664, 1, [8, 16, 32])

    if "320" in which:
        M320, F320 = 300, 1024
        segs320 = pick_segments(M320)
        rng320 = np.random.default_rng(11)
        lv_pool = levels.reshape(F * M, 6, 64)
        lv320c = lv_pool[rng320.integers(0, F * M, (64, M320))]
        pay320 = [huffman_encode_frame(lv320c[f]) for f in range(64)]
        rows320, _ = native.unescape_frames(pay320 * (F320 // 64))
        rows320 = np.asarray(rows320)
        lens320 = np.array([len(p) for p in pay320] * (F320 // 64))
        ord320 = np.lexsort((np.tile(np.arange(64), F320 // 64), lens320))
        rows320_s = rows320[ord320]
        ms320 = M320 // segs320
        wout320 = min(1664, 1024 * ((ms320 + 47) // 48))
        print(f"# 320x240: F={F320} M={M320} segs={segs320} "
              f"w_out={wout320}", flush=True)
        run_section("c320", rows320_s, M320, qk, wout320, segs320,
                    [8, 16, 32])


if __name__ == "__main__":
    main()
