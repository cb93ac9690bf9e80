"""TPU probe: pipelined dispatch depth on the async complete chain.

bench.py times the chain one blocking call at a time, so every timed
call pays the ~22-32 ms relay dispatch RTT (memory/axon-tpu-environment
.md).  JAX dispatch is async: issuing D calls before blocking on the
last SHOULD overlap call N+1's client->relay->device dispatch with call
N's execution, amortizing the RTT over D batches without growing the
compiled batch (the remote-compile wall sits at ~1.35-1.5M frame*MCU,
so KC/K160/F320 cannot grow further — but depth can).

Probes the 160x120 shape (dispatch is the largest fraction of its wall:
8192 frames at 116.2K fps = 70.5 ms/call, ~25 ms of it RTT) at depths
1/2/4/8.  Salt differs per call (repeated identical dispatches mis-time
through the relay).  Result feeds bench.py's timing mode if positive.
"""
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
from amv_tpu.pipeline.transcode import transcode_complete_async, pick_sb

SAMPLE = "/root/reference/C-AMVDecoder/bin/AMV1.amv"


def main():
    print(f"# devices: {jax.devices()}", flush=True)
    s = riff.read(SAMPLE)
    w, h = s.info.width, s.info.height
    M = ((w + 15) // 16) * ((h + 15) // 16)
    qk = tuple(int(v) for v in _encoder_quant_qmat_np(2))
    payloads = s.video_chunks
    F = len(payloads)
    levels = np.asarray(huffman_decode_frames(payloads, M))

    M160, F160, K160 = 80, 1024, 8
    rng160 = np.random.default_rng(7)
    lv_pool = levels.reshape(F * M, 6, 64)
    lv160c = lv_pool[rng160.integers(0, F * M, (64, M160))]
    pay160 = [huffman_encode_frame(lv160c[f]) for f in range(64)]
    rows160, _ = native.unescape_frames(pay160 * (F160 // 64))
    rows160 = np.asarray(rows160)
    lens160 = np.array([len(p) for p in pay160] * (F160 // 64))

    FK = F160 * K160
    sb = pick_sb(FK)
    ordk = np.argsort(np.tile(lens160, K160), kind="stable")
    rows_k = jax.device_put(jnp.asarray(np.tile(rows160, (K160, 1))[ordk]))
    jax.block_until_ready(rows_k)

    @jax.jit
    def chain(rw, salt):
        words, bits, ok = transcode_complete_async(
            rw, M160, qk, w_out=1664, win_fetch=64, win_emit=64,
            enc="async", sb=sb)
        return (jnp.sum(words[::31, ::17]) + jnp.sum(bits) +
                jnp.where(ok, 0, 1 << 30) + salt)

    t0 = time.perf_counter()
    _ = int(chain(rows_k, jnp.int32(0))[...])
    print(f"# compiled in {time.perf_counter() - t0:.0f}s "
          f"(FK={FK}, sb={sb})", flush=True)

    rng = np.random.default_rng(3)
    for depth in [1, 2, 4, 8, 1]:          # re-probe depth 1 last (drift check)
        ts = []
        for _ in range(5):
            salts = rng.integers(0, 100000, depth)
            t0 = time.perf_counter()
            hs = [chain(rows_k, jnp.int32(int(sv))) for sv in salts]
            jax.block_until_ready(hs[-1])
            ts.append(time.perf_counter() - t0)
            # drain all handles so queued work never leaks across trials
            for hd in hs:
                int(hd[...])
        ts.sort()
        tmin, tmed = ts[0], ts[len(ts) // 2]
        print(f"depth={depth}: {FK * depth / tmin:.1f} fps min "
              f"({tmin * 1e3 / depth:.2f} ms/call min, "
              f"{tmed * 1e3 / depth:.2f} med)", flush=True)


if __name__ == "__main__":
    main()
