"""TPU sweep: encoder ring width / unroll and decoder unroll, plus the
best-combo complete chain.

Rationale: the packed-ring negatives proved both async kernels are
latency-bound on their serial chains — parallel vector work in the
service pass is ~free.  The encoder's +33%-over-ideal stall floor is
input-ring-window spread, so widening its ring (wb 8->16/32) should cut
stall iterations while the added wb-way one-hot select rides the free
vector slots.  (The decoder's wb sweep was ~1:1, but that rings the
OUTPUT flush, a different trade.)

Usage: nohup python tools/ab_sweep2.py > /tmp/ab_sweep2.log 2>&1 &
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from amv_tpu.containers import riff
from amv_tpu.codecs.amv_video import _encoder_quant_qmat_np
from amv_tpu.native import entropy_native as native

SAMPLE = "/root/reference/C-AMVDecoder/bin/AMV1.amv"
K = 64
N_TIMES = 7


def times_n(fn, iters=N_TIMES):
    out = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        out.append(time.perf_counter() - t0)
    return sorted(out)


def main():
    s = riff.read(SAMPLE)
    w, h = s.info.width, s.info.height
    M = ((w + 15) // 16) * ((h + 15) // 16)
    payloads = s.video_chunks
    F = len(payloads)
    qk = tuple(int(v) for v in _encoder_quant_qmat_np(2))

    rows_c1, _ = native.unescape_frames(payloads)
    lens_c1 = np.array([len(p) for p in payloads])
    ord_k = np.argsort(np.tile(lens_c1, K), kind="stable")
    rows_np = np.tile(rows_c1, (K, 1))[ord_k]
    FC = F * K
    FR = (FC + 1023) // 1024 * 1024
    rows_np = np.concatenate(
        [rows_np, np.tile(rows_np[:1], (FR - FC, 1))], axis=0)
    rows_ct = jax.device_put(jnp.asarray(rows_np))
    jax.block_until_ready(rows_ct)

    from amv_tpu.kernels.entropy_async_pallas import (
        decode_scans_async_dense, default_t_max_dense)
    from amv_tpu.kernels.entropy_encode_async_pallas import (
        encode_layout_async_dense, default_t_max_enc)
    from amv_tpu.kernels.entropy_decode_pallas import scan_words_layout
    from amv_tpu.kernels.transcode_layout_pallas import transcode_mcu_layout
    from amv_tpu.bitstream import jpeg_tables as T

    nb = M * 6
    t_max_dec = default_t_max_dense(nb, rows_ct.shape[1])
    t_max_enc = default_t_max_enc(nb) * 2   # headroom for wide sweeps

    @jax.jit
    def front(rw):
        wl = scan_words_layout(rw)
        slab, ok = decode_scans_async_dense(
            wl, nb, t_max_dec, win=64, unroll=8, wb=8, adv=4,
            pmax=8, press=64)
        cb = rw.shape[0] // 1024
        lvl = slab.reshape(cb, M, 6, 64, 8, 128)
        qdc_l = int(T.SP5X_QUANT_LUMA_ZZ[0])
        qdc_c = int(T.SP5X_QUANT_CHROMA_ZZ[0])
        d = lvl[:, :, :, 0].astype(jnp.int32)
        dy = (jnp.cumsum(d[:, :, :4].reshape(cb, M * 4, 8, 128) * qdc_l,
                         axis=1).reshape(cb, M, 4, 8, 128) + 1024)
        dcb = jnp.cumsum(d[:, :, 4] * qdc_c, axis=1) + 1024
        dcr = jnp.cumsum(d[:, :, 5] * qdc_c, axis=1) + 1024
        dc = jnp.concatenate([dy, dcb[:, :, None], dcr[:, :, None]], axis=2)
        lv2 = transcode_mcu_layout(lvl, dc, qk)
        return lv2.reshape(cb, nb, 64, 8, 128), ok

    t0 = time.perf_counter()
    lv2_r, ok_f = front(rows_ct)
    lv2_r = jax.device_put(lv2_r)
    jax.block_until_ready(lv2_r)
    print(f"front ok={bool(ok_f[...])} ({time.perf_counter()-t0:.0f}s)",
          flush=True)

    ref_words = None

    def enc_case(tag, **kw):
        nonlocal ref_words

        @jax.jit
        def enc_stage(lv2s, salt):
            words, bits, ok, st = encode_layout_async_dense(
                lv2s, 1024, t_max_enc, return_status=True, **kw)
            return words, bits, ok, st, (jnp.sum(words[:, ::31, 0, ::17]) +
                                         jnp.sum(bits) + salt)

        t0 = time.perf_counter()
        wds, _, ok, st, _ = enc_stage(lv2_r, jnp.int32(0))
        wds = np.asarray(wds)
        iters = int(np.asarray(st)[:, 1, 0, 0].sum())
        if ref_words is None:
            ref_words = wds
        else:
            assert np.array_equal(ref_words, wds), f"{tag}: bytes differ!"
        ts = times_n(lambda: int(enc_stage(
            lv2_r, jnp.int32(np.random.randint(1000)))[4][...]))
        print(f"enc {tag}: min {ts[0]*1e3:.1f} ms median "
              f"{ts[len(ts)//2]*1e3:.1f} ms iters={iters} ok={bool(ok[...])} "
              f"(compile {time.perf_counter()-t0:.0f}s)", flush=True)
        return ts[0]

    base = dict(win_rows=64, unroll=8, pmax=8, wb=8, adv=4)
    enc_case("wb8.u8 (base)", **base)
    enc_case("wb16.u8", **{**base, "wb": 16, "adv": 8})
    enc_case("wb32.u8", **{**base, "wb": 32, "adv": 8})
    enc_case("wb16.u12", **{**base, "wb": 16, "adv": 8, "unroll": 12,
                            "pmax": 4})

    # decoder unroll depth
    @jax.jit
    def prep(rw):
        return scan_words_layout(rw)

    wl_r = jax.device_put(prep(rows_ct))
    jax.block_until_ready(wl_r)
    ref_slab = None

    def dec_case(tag, **kw):
        nonlocal ref_slab

        @jax.jit
        def dec_stage(wl, salt):
            slab, ok, st = decode_scans_async_dense(
                wl, nb, t_max_dec, return_status=True, **kw)
            return slab, ok, st, (jnp.sum(slab[:, ::7, ::5]
                                          .astype(jnp.int32)) + salt)

        t0 = time.perf_counter()
        slab, ok, st, _ = dec_stage(wl_r, jnp.int32(0))
        slab = np.asarray(slab)
        iters = int(np.asarray(st)[:, 1, 0, 0].sum())
        if ref_slab is None:
            ref_slab = slab
        else:
            assert np.array_equal(ref_slab, slab), f"{tag}: slab differs!"
        ts = times_n(lambda: int(dec_stage(
            wl_r, jnp.int32(np.random.randint(1000)))[3][...]))
        print(f"dec {tag}: min {ts[0]*1e3:.1f} ms median "
              f"{ts[len(ts)//2]*1e3:.1f} ms iters={iters} ok={bool(ok[...])} "
              f"(compile {time.perf_counter()-t0:.0f}s)", flush=True)
        return ts[0]

    dbase = dict(win=64, unroll=8, wb=8, adv=4, pmax=8, press=64)
    dec_case("u8 (base)", **dbase)
    dec_case("u16", **{**dbase, "unroll": 16})
    dec_case("wb16.u8", **{**dbase, "wb": 16, "adv": 8})


if __name__ == "__main__":
    main()
