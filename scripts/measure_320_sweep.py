"""TPU sweep: 320x240 complete async transcode vs batch size and sublane.

The bench's 320x240 section runs F=1024 at sb=8 and sits just under the
16K-fps round bar; each timed call pays the ~22-32 ms axon dispatch RTT
once, so larger device-resident batches amortize it.  This sweeps
F in {1024, 2048, 4096} x sb in {8, 16} (env CONFIGS overrides), with
the bench harness's strided-checksum readback and a one-time host
readback byte gate (64 unique frames vs the host re-encode).
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
                                        transcode_levels_fused,
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


def main():
    print(f"# devices: {jax.devices()}", flush=True)
    s = riff.read(SAMPLE)
    w, h = s.info.width, s.info.height
    M = ((w + 15) // 16) * ((h + 15) // 16)
    qk = tuple(int(v) for v in _encoder_quant_qmat_np(2))
    payloads = s.video_chunks
    F = len(payloads)
    levels = huffman_decode_frames(payloads, M)

    M320 = 300
    segs320 = pick_segments(M320)
    rng320 = np.random.default_rng(11)
    lv_pool = np.asarray(levels).reshape(F * M, 6, 64)
    lv320c = lv_pool[rng320.integers(0, F * M, (64, M320))]
    pay320 = [huffman_encode_frame(lv320c[f]) for f in range(64)]
    ms320 = M320 // segs320
    wout320 = min(1664, 1024 * ((ms320 + 47) // 48))

    lvdec320 = np.asarray(huffman_decode_frames(pay320, M320))
    lv2_320 = np.asarray(transcode_levels_fused(jnp.asarray(lvdec320), 2)[0])
    want320 = [huffman_encode_frame(lv2_320[f]) for f in range(64)]

    configs = json.loads(os.environ.get(
        "CONFIGS", "[[1024, 8], [2048, 8], [2048, 16], [4096, 8], [4096, 16]]"))
    for F320, sb in configs:
        name = f"F{F320}.sb{sb}"
        try:
            rows320, _ = native.unescape_frames(pay320 * (F320 // 64))
            lens320 = np.array([len(p) for p in pay320] * (F320 // 64))
            ord320 = np.lexsort((np.tile(np.arange(64), F320 // 64), lens320))
            inv320 = np.argsort(ord320)

            @jax.jit
            def complete320(rw, salt, sb=sb):
                words, bits, ok = transcode_complete_async(
                    rw, M320, qk, w_out=wout320, win_fetch=64, win_emit=64,
                    segs=segs320, enc="async", sb=sb)
                return words, bits, (jnp.sum(words[::31, ::17]) +
                                     jnp.sum(bits) +
                                     jnp.where(ok, 0, 1 << 30) + salt)

            rows320_d = jax.device_put(jnp.asarray(rows320[ord320]))
            jax.block_until_ready(rows320_d)
            t0 = time.perf_counter()
            w320, b320, _ = complete320(rows320_d, jnp.int32(0))
            jax.block_until_ready(b320)
            tc = time.perf_counter() - t0
            w320n = np.asarray(w320).reshape(F320, segs320, -1)[inv320][:64]
            b320n = np.asarray(b320).reshape(F320, segs320)[inv320][:64]
            del w320, b320
            got320 = native.concat_escape_frames(
                w320n.reshape(-1, w320n.shape[2]), b320n.reshape(-1), segs320)
            eq = got320 == want320
            tmin, tmed = best_time(lambda: int(complete320(
                rows320_d, jnp.int32(np.random.randint(1000)))[2][...]))
            print(f"{name}: {F320 / tmin:.1f} fps ({tmin * 1e3:.2f} ms min / "
                  f"{tmed * 1e3:.2f} med) exact={eq} (compile {tc:.0f}s)",
                  flush=True)
            del complete320, rows320_d
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
