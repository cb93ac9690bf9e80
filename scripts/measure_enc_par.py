"""TPU timing: fully parallel (where-reduce) entropy encoder vs the
lockstep packer and the async dense kernel, bench corpus (K x AMV1,
sorted)."""
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
from amv_tpu.bitstream import jpeg_tables as T
from amv_tpu.codecs.amv_video import _encoder_quant_qmat_np
from amv_tpu.kernels.entropy_decode_pallas import (scan_words_layout,
                                                   _decode_layout)
from amv_tpu.kernels.entropy_encode_pallas import _encode_layout
from amv_tpu.kernels.entropy_encode_parallel import (encode_layout_parallel,
                                                     _slot_records)

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
    qk = tuple(int(v) for v in _encoder_quant_qmat_np(2))
    rw = jax.device_put(jnp.asarray(rows_k))
    jax.block_until_ready(rw)
    cb = FK // 1024

    from amv_tpu.kernels.transcode_layout_pallas import transcode_mcu_layout

    @jax.jit
    def make_lv2(rw_):
        wl = scan_words_layout(rw_)
        lv = _decode_layout(wl, nb, win=64, unroll=4)
        lvl = lv.reshape(cb, M, 6, 64, 8, 128)
        qdc_l = int(T.SP5X_QUANT_LUMA_ZZ[0])
        qdc_c = int(T.SP5X_QUANT_CHROMA_ZZ[0])
        d = lvl[:, :, :, 0].astype(jnp.int32)
        dy = (jnp.cumsum(d[:, :, :4].reshape(cb, M * 4, 8, 128) * qdc_l,
                         axis=1).reshape(cb, M, 4, 8, 128) + 1024)
        dcb = jnp.cumsum(d[:, :, 4] * qdc_c, axis=1) + 1024
        dcr = jnp.cumsum(d[:, :, 5] * qdc_c, axis=1) + 1024
        dc = jnp.concatenate([dy, dcb[:, :, None], dcr[:, :, None]],
                             axis=2)
        return transcode_mcu_layout(lvl, dc, qk).reshape(
            cb, nb, 64, 8, 128)

    lv2 = make_lv2(rw)
    jax.block_until_ready(lv2)
    print(f"# F={FK} nb={nb}", flush=True)

    # window requirements of this corpus (one diagnostic dispatch)
    @jax.jit
    def windows(lv2_):
        dc0 = jnp.full((cb, 3, 8, 128), 128, jnp.int32)
        code, ln = _slot_records(lv2_, dc0)
        cum = jnp.cumsum(ln, axis=2)
        bbits = cum[:, :, 63]
        base = jnp.cumsum(bbits, axis=1) - bbits
        bw = jnp.max((base % 32 + bbits + 31) // 32)
        base_w = base >> 5
        db = (base_w.reshape(cb, nb // 8, 8, 8, 128)
              - base_w[:, ::8][:, :, None])
        gb = base_w[:, ::8]
        dgp = (gb.reshape(cb, -1, 6, 8, 128) - gb[:, ::6][:, :, None])
        return bw, jnp.max(db), jnp.max(dgp), jnp.max(base + bbits)

    bw, dbm, dgm, totb = (int(x[...]) for x in windows(lv2))
    print(f"# corpus: max block words {bw}, db {dbm}, dg {dgm}, "
          f"total bits {totb} ({(totb + 31) // 32} words)", flush=True)

    @jax.jit
    def enc_lock(lv2_, salt):
        words, bits = _encode_layout(lv2_, 1024, win_rows=64, unroll=2)
        return words, bits, (jnp.sum(words[:, ::31]) + jnp.sum(bits) +
                             salt)

    w_ref, b_ref, _ = enc_lock(lv2, jnp.int32(0))
    jax.block_until_ready(w_ref)
    t = best_time(lambda: int(enc_lock(
        lv2, jnp.int32(np.random.randint(1000)))[2][...]))
    print(f"encode_lockstep u2: {FK / t:.1f} fps ({t * 1e3:.2f} ms)",
          flush=True)

    variants = json.loads(os.environ.get("VARIANTS", json.dumps([
        ["rechunk wl16 win128 u1", dict(_k="rechunk", wl=16)],
        ["rechunk wl16 win128 u2", dict(_k="rechunk", wl=16, unroll=2)],
        ["rechunk wl16 win64 u1", dict(_k="rechunk", wl=16, win_rows=64)],
        ["par wl16 g8 wg80 ws288", dict(wl=16, wg=80, ws=288)],
    ])))
    from amv_tpu.kernels.entropy_encode_parallel import \
        encode_layout_rechunk
    for name, kw in variants:
        try:
            kind = kw.pop("_k", "par")

            @jax.jit
            def enc_par(lv2_, salt, kw=tuple(sorted(kw.items())),
                        kind=kind):
                f = (encode_layout_rechunk if kind == "rechunk"
                     else encode_layout_parallel)
                words, bits, ok = f(lv2_, 1024, **dict(kw))
                return words, bits, ok, (jnp.sum(words[:, ::31]) +
                                         jnp.sum(bits) + salt)

            t0 = time.perf_counter()
            w_n, b_n, ok, _ = enc_par(lv2, jnp.int32(0))
            jax.block_until_ready(w_n)
            tc = time.perf_counter() - t0
            eq = bool(jnp.array_equal(w_n, w_ref)[...]) and \
                bool(jnp.array_equal(b_n.reshape(b_ref.shape), b_ref)[...])
            okb = bool(ok[...])
            t = best_time(lambda: int(enc_par(
                lv2, jnp.int32(np.random.randint(1000)))[3][...]))
            print(f"{name}: {FK / t:.1f} fps ({t * 1e3:.2f} ms) ok={okb} "
                  f"bitexact={eq} (compile {tc:.0f}s)", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
