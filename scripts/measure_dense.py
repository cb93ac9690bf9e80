"""TPU timing for decode_scans_async_dense vs lockstep decode."""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from amv_tpu.containers import riff
from amv_tpu.native import entropy_native as native
from amv_tpu.kernels.entropy_decode_pallas import (scan_words_layout,
                                                   _decode_layout)
from amv_tpu.kernels.entropy_async_pallas import (decode_scans_async_dense,
                                                  default_t_max_dense)

SAMPLE = "/root/reference/C-AMVDecoder/bin/AMV1.amv"
K = int(os.environ.get("K", "64"))


def best_time(fn, iters=3):
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
    nb = M * 6
    payloads = s.video_chunks
    F = len(payloads)
    rows, _ = native.unescape_frames(payloads)
    rows = np.asarray(rows)
    lens = np.array([len(p) for p in payloads])
    ordk = np.argsort(np.tile(lens, K), kind="stable")
    rows_k = np.tile(rows, (K, 1))[ordk]
    FK = (F * K + 1023) // 1024 * 1024
    rows_k = np.concatenate(
        [rows_k, np.tile(rows_k[-1:], (FK - F * K, 1))], axis=0)
    t_dn = default_t_max_dense(nb, rows_k.shape[1])
    rw = jax.device_put(jnp.asarray(rows_k))
    jax.block_until_ready(rw)
    print(f"# F={FK} nb={nb} t_dense={t_dn}", flush=True)

    # reference output (lockstep) for the equality gate
    @jax.jit
    def dec_lock(salt):
        wl = scan_words_layout(rw)
        lv = _decode_layout(wl, nb, win=64, unroll=4)
        return lv, jnp.sum(lv[:, ::7, ::5].astype(jnp.int32)) + salt

    lv_ref, _ = dec_lock(jnp.int32(0))
    jax.block_until_ready(lv_ref)
    t = best_time(lambda: int(dec_lock(
        jnp.int32(np.random.randint(1000)))[1][...]))
    print(f"decode_lockstep: {FK / t:.1f} fps ({t * 1e3:.2f} ms)",
          flush=True)

    import json
    variants = json.loads(os.environ.get("VARIANTS", json.dumps([
        ["u4 p16", dict(win=64, unroll=4, pmax=16)],
        ["u8 p16", dict(win=64, unroll=8, pmax=16)],
        ["u8 p32", dict(win=64, unroll=8, pmax=32)],
        ["u8 p32 wb4", dict(win=64, unroll=8, pmax=32, wb=4, adv=2)],
    ])))
    for name, kw in variants:
        try:
            @jax.jit
            def dense(salt, kw=tuple(sorted(kw.items()))):
                wl = scan_words_layout(rw)
                slab, ok, st = decode_scans_async_dense(
                    wl, nb, t_dn, return_status=True, **dict(kw))
                return slab, ok, st, (jnp.sum(slab[:, ::7, ::5]
                                              .astype(jnp.int32)) + salt)

            t0 = time.perf_counter()
            slab, ok, st, _ = dense(jnp.int32(0))
            jax.block_until_ready(slab)
            tc = time.perf_counter() - t0
            eq = bool(jnp.array_equal(slab, lv_ref)[...])
            okb = bool(ok[...])
            iters = int(np.asarray(st)[:, 1, 0, 0].sum())
            t = best_time(lambda: int(dense(
                jnp.int32(np.random.randint(1000)))[3][...]))
            print(f"{name}: {FK / t:.1f} fps ({t * 1e3:.2f} ms) "
                  f"ok={okb} bitexact={eq} iters={iters} "
                  f"(compile {tc:.0f}s)", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
