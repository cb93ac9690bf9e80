"""Split timing of the rechunk encoder: XLA prep (slot records,
cumsums, block pack, record extract) vs the _pack_records splice."""
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
from amv_tpu.kernels.entropy_encode_parallel import (RBITS, _slot_records)
from amv_tpu.kernels.entropy_encode_async_pallas import _pack_records

SAMPLE = "/root/reference/C-AMVDecoder/bin/AMV1.amv"
K = int(os.environ.get("K", "64"))
WL = 16


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
        wl_ = scan_words_layout(rw_)
        lv = _decode_layout(wl_, nb, win=64, unroll=4)
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

    @jax.jit
    def recsonly(lv2_, salt):
        dc0 = jnp.full((cb, 3, 8, 128), 128, jnp.int32)
        code, ln = _slot_records(lv2_, dc0)
        return jnp.sum(code[:, ::7, ::5].astype(jnp.int32)) + \
            jnp.sum(ln[:, ::7, ::5]) + salt

    _ = int(recsonly(lv2, jnp.int32(0))[...])
    t = best_time(lambda: int(recsonly(
        lv2, jnp.int32(np.random.randint(1000)))[...]))
    print(f"slot_records only: {t * 1e3:.2f} ms", flush=True)

    @jax.jit
    def prep(lv2_, salt):
        dc0 = jnp.full((cb, 3, 8, 128), 128, jnp.int32)
        code, ln = _slot_records(lv2_, dc0)
        cum = jnp.cumsum(ln, axis=2)
        bbits = cum[:, :, 63]
        start = cum - ln
        b = (start & 31).astype(jnp.uint32)
        lnu = ln.astype(jnp.uint32)
        fits = b + lnu <= 32
        sh0 = jnp.minimum(jnp.where(fits, 32 - b - lnu, 0), 31)
        c0 = jnp.where(fits, code << sh0,
                       code >> jnp.where(fits, jnp.uint32(0),
                                         b + lnu - 32))
        c1 = jnp.where(fits, jnp.uint32(0),
                       code << jnp.where(fits, jnp.uint32(0),
                                         64 - b - lnu))
        live = ln > 0
        c0 = jnp.where(live, c0, 0).astype(jnp.int32)
        c1 = jnp.where(live, c1, 0).astype(jnp.int32)
        li = jnp.where(live, start >> 5, -1)
        j = jnp.arange(WL, dtype=jnp.int32).reshape(1, 1, 1, WL, 1, 1)
        bw = (jnp.sum(jnp.where(li[:, :, :, None] == j,
                                c0[:, :, :, None], 0), axis=2)
              + jnp.sum(jnp.where((li + 1)[:, :, :, None] == j,
                                  c1[:, :, :, None], 0), axis=2))
        bwu = bw.astype(jnp.uint32)
        R = -(-(32 * WL) // RBITS)
        recs = []
        for r in range(R):
            o = RBITS * r
            i, a = o >> 5, o & 31
            hi = bwu[:, :, i] << a if a else bwu[:, :, i]
            lo = (bwu[:, :, i + 1] >> (32 - a)) if (a and i + 1 < WL) \
                else 0
            field = ((hi | lo) >> (32 - RBITS)).astype(jnp.int32)
            len_r = jnp.clip(bbits - o, 0, RBITS)
            val = jnp.where(len_r > 0,
                            field >> (RBITS - jnp.maximum(len_r, 1)), 0)
            recs.append((val << 5) | len_r)
        recs = jnp.stack(recs, axis=2)
        return recs.reshape(cb, nb * R, 8, 128), salt

    R = -(-(32 * WL) // RBITS)
    recs, _ = prep(lv2, jnp.int32(0))
    jax.block_until_ready(recs)
    t = best_time(lambda: jax.block_until_ready(prep(
        lv2, jnp.int32(np.random.randint(1000)))[0]))
    print(f"xla prep total: {t * 1e3:.2f} ms", flush=True)

    @jax.jit
    def splice(recs_, salt):
        totals = jnp.full((cb, 1, 8, 128), nb * R, jnp.int32)
        words, bits = _pack_records(recs_, totals, 1024, win_rows=128,
                                    unroll=2)
        return jnp.sum(words[:, ::31]) + jnp.sum(bits) + salt

    _ = int(splice(recs, jnp.int32(0))[...])
    t = best_time(lambda: int(splice(
        recs, jnp.int32(np.random.randint(1000)))[...]))
    print(f"pallas splice ({nb * R} recs): {t * 1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
