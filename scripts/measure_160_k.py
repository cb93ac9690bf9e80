"""TPU probe: 160x120 complete async chain vs batch size (K160).

bench.py's 160x120 section runs K160=8 (8192 frames, sb=32); this
probes larger batches to amortize the ~22-32 ms relay dispatch —
K160=12 (983K frame*MCU) and K160=16 (1.31M, just under the
remote-compile wall the headline chain measured at ~1.35-1.5M).
Byte gate: first 64 unique frames vs the host re-encode.
"""
import json
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from amv_tpu.containers import riff
from amv_tpu.native import entropy_native as native
from amv_tpu.bitstream.entropy import (huffman_encode_frame,
                                       huffman_decode_frames)
from amv_tpu.codecs.amv_video import _encoder_quant_qmat_np
from amv_tpu.pipeline.transcode import (transcode_complete_async,
                                        transcode_levels_fused, pick_sb)

SAMPLE = "/root/reference/C-AMVDecoder/bin/AMV1.amv"


def best_time(fn, iters=5):
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[0], ts[len(ts) // 2]


def main():
    print(f"# devices: {jax.devices()}", flush=True)
    s = riff.read(SAMPLE)
    w, h = s.info.width, s.info.height
    M = ((w + 15) // 16) * ((h + 15) // 16)
    qk = tuple(int(v) for v in _encoder_quant_qmat_np(2))
    payloads = s.video_chunks
    F = len(payloads)
    levels = np.asarray(huffman_decode_frames(payloads, M))

    M160, F160 = 80, 1024
    rng160 = np.random.default_rng(7)
    lv_pool = levels.reshape(F * M, 6, 64)
    lv160c = lv_pool[rng160.integers(0, F * M, (64, M160))]
    pay160 = [huffman_encode_frame(lv160c[f]) for f in range(64)]
    rows160, _ = native.unescape_frames(pay160 * (F160 // 64))
    rows160 = np.asarray(rows160)
    lens160 = np.array([len(p) for p in pay160] * (F160 // 64))

    lvdec160 = np.asarray(huffman_decode_frames(pay160, M160))
    lv2_160 = np.asarray(transcode_levels_fused(jnp.asarray(lvdec160), 2)[0])
    want160 = [huffman_encode_frame(lv2_160[f]) for f in range(64)]

    for K160 in json.loads(os.environ.get("KS", "[8, 12, 16]")):
        name = f"K{K160}"
        try:
            FK = F160 * K160
            sb = pick_sb(FK)
            ordk = np.argsort(np.tile(lens160, K160), kind="stable")
            invk = np.argsort(ordk)
            rows_k = np.tile(rows160, (K160, 1))[ordk]

            @jax.jit
            def chain(rw, salt, sb=sb):
                words, bits, ok = transcode_complete_async(
                    rw, M160, qk, w_out=1664, win_fetch=64, win_emit=64,
                    enc="async", sb=sb)
                return ok, words, bits, (jnp.sum(words[::31, ::17]) +
                                         jnp.sum(bits) + salt)

            rw = jax.device_put(jnp.asarray(rows_k))
            jax.block_until_ready(rw)
            t0 = time.perf_counter()
            ok, w_d, b_d, _ = chain(rw, jnp.int32(0))
            jax.block_until_ready(b_d)
            tc = time.perf_counter() - t0
            wn = np.asarray(w_d)[invk][:64]
            bn = np.asarray(b_d)[invk][:64]
            del w_d, b_d
            got = native.escape_frames(wn, bn)
            eq = got == want160
            okb = bool(ok[...])
            tmin, tmed = best_time(lambda: int(chain(
                rw, jnp.int32(np.random.randint(1000)))[3][...]))
            print(f"{name}: {FK / tmin:.1f} fps ({tmin * 1e3:.2f} ms min / "
                  f"{tmed * 1e3:.2f} med) sb={sb} ok={okb} exact={eq} "
                  f"(compile {tc:.0f}s)", flush=True)
            del chain, rw
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
