"""TPU timing: async dense encoder vs lockstep packer."""
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
from amv_tpu.kernels.entropy_encode_async_pallas import (
    encode_layout_async_dense, default_t_max_enc)
from amv_tpu.kernels.transcode_layout_pallas import transcode_mcu_layout

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
    t_enc = default_t_max_enc(nb) * 2
    print(f"# F={FK} nb={nb} t_enc={t_enc}", flush=True)

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
        ["u1 p16", dict(win_rows=64, unroll=1, pmax=16)],
        ["u4 p16", dict(win_rows=64, unroll=4, pmax=16)],
        ["u8 p8", dict(win_rows=64, unroll=8, pmax=8)],
        ["u8 p8 wb8", dict(win_rows=64, unroll=8, pmax=8, wb=8, adv=4)],
    ])))
    for name, kw in variants:
        try:
            @jax.jit
            def enc_async(lv2_, salt, kw=tuple(sorted(kw.items()))):
                words, bits, ok, st = encode_layout_async_dense(
                    lv2_, 1024, t_enc, return_status=True, **dict(kw))
                return words, bits, ok, st, (jnp.sum(words[:, ::31]) +
                                             jnp.sum(bits) + salt)

            t0 = time.perf_counter()
            w_n, b_n, ok, st, _ = enc_async(lv2, jnp.int32(0))
            jax.block_until_ready(w_n)
            tc = time.perf_counter() - t0
            eq = bool(jnp.array_equal(w_n, w_ref)[...]) and \
                bool(jnp.array_equal(b_n, b_ref)[...])
            okb = bool(ok[...])
            iters = int(np.asarray(st)[:, 1, 0, 0].sum())
            t = best_time(lambda: int(enc_async(
                lv2, jnp.int32(np.random.randint(1000)))[4][...]))
            print(f"{name}: {FK / t:.1f} fps ({t * 1e3:.2f} ms) ok={okb} "
                  f"bitexact={eq} iters={iters} (compile {tc:.0f}s)",
                  flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
