"""TPU A/B: complete transcode chain — lockstep vs async variants."""
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
from amv_tpu.codecs.amv_video import _encoder_quant_qmat_np
from amv_tpu.pipeline.transcode import (transcode_complete_layout,
                                        transcode_complete_async)

SAMPLE = "/root/reference/C-AMVDecoder/bin/AMV1.amv"
K = int(os.environ.get("K", "64"))


def best_time(fn, iters=int(os.environ.get("ITERS", "3"))):
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    print(f"# devices: {jax.devices()}", flush=True)
    s = riff.read(SAMPLE)
    w, h = s.info.width, s.info.height
    M = ((w + 15) // 16) * ((h + 15) // 16)
    payloads = s.video_chunks
    F = len(payloads)
    rows, _ = native.unescape_frames(payloads)
    rows = np.asarray(rows)
    lens = np.array([len(p) for p in payloads])
    ordk = np.argsort(np.tile(lens, K), kind="stable")
    rows_k = np.tile(rows, (K, 1))[ordk]
    FK = F * K
    qk = tuple(int(v) for v in _encoder_quant_qmat_np(2))
    rw = jax.device_put(jnp.asarray(rows_k))
    jax.block_until_ready(rw)
    print(f"# F={FK} M={M}", flush=True)

    @jax.jit
    def lockstep(rw_, salt):
        words, bits = transcode_complete_layout(rw_, M, qk, w_out=1024,
                                                win_fetch=64, win_emit=64)
        return words, bits, (jnp.sum(words[::31, ::17]) + jnp.sum(bits) +
                             salt)

    w_ref, b_ref, _ = lockstep(rw, jnp.int32(0))
    jax.block_until_ready(w_ref)
    t = best_time(lambda: int(lockstep(
        rw, jnp.int32(np.random.randint(1000)))[2][...]))
    print(f"complete_lockstep: {FK / t:.1f} fps ({t * 1e3:.2f} ms)",
          flush=True)

    variants = json.loads(os.environ.get("VARIANTS", json.dumps([
        ["dense-dec + lockstep-enc", dict(enc="lockstep")],
        ["dense-dec + dense-enc", dict(enc="async")],
    ])))
    for name, kw in variants:
        try:
            @jax.jit
            def chain(rw_, salt, kw=tuple(sorted(kw.items()))):
                words, bits, ok = transcode_complete_async(
                    rw_, M, qk, w_out=1024, **dict(kw))
                return words, bits, ok, (jnp.sum(words[::31, ::17]) +
                                         jnp.sum(bits) + salt)

            t0 = time.perf_counter()
            w_n, b_n, ok, _ = chain(rw, jnp.int32(0))
            jax.block_until_ready(w_n)
            tc = time.perf_counter() - t0
            eq = bool(jnp.array_equal(w_n, w_ref)[...]) and \
                bool(jnp.array_equal(b_n, b_ref)[...])
            t = best_time(lambda: int(chain(
                rw, jnp.int32(np.random.randint(1000)))[3][...]))
            print(f"{name}: {FK / t:.1f} fps ({t * 1e3:.2f} ms) "
                  f"ok={bool(ok[...])} bitexact={eq} (compile {tc:.0f}s)",
                  flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
