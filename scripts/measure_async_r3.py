"""Round-3 stage timing: lockstep vs async entropy pair on the real TPU.

Times (salt-varied, checksum readback, device-resident inputs):
  1. complete lockstep chain      (baseline, ~122K fps expected)
  2. complete async chain         (committed scaffold)
  3. decode: phase-1 records only
  4. decode: async full (records + regroup + expand)
  5. decode: lockstep
  6. encode: tokenizer only (XLA)
  7. encode: async full (tokenizer + packer)
  8. encode: lockstep
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
from amv_tpu.codecs.amv_video import _encoder_quant_qmat_np
from amv_tpu.pipeline.transcode import (transcode_complete_layout,
                                        transcode_complete_async,
                                        decode_scans_layout)
from amv_tpu.kernels.entropy_decode_pallas import (scan_words_layout,
                                                   _decode_layout)
from amv_tpu.kernels.entropy_async_pallas import (_decode_records,
                                                  decode_scans_async_layout,
                                                  default_t_max)
from amv_tpu.kernels.entropy_encode_async_pallas import (
    tokenize_levels_layout, encode_layout_async, default_t_max_enc)
from amv_tpu.kernels.entropy_encode_pallas import WIN_O
from amv_tpu.pipeline.transcode import _segment_encode_layout
from amv_tpu.kernels.transcode_layout_pallas import transcode_mcu_layout
from amv_tpu.bitstream import jpeg_tables as T

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
    t_dec = default_t_max(nb, rows_k.shape[1])
    t_enc = default_t_max_enc(nb)
    print(f"# F={FK} M={M} nb={nb} t_dec={t_dec} t_enc={t_enc}", flush=True)

    results = {}
    SKIP = set(os.environ.get("SKIP", "").split(","))

    def bench(name, fn, frames=FK):
        if name in SKIP:
            print(f"# {name}: skipped", flush=True)
            return
        t0 = time.perf_counter()
        _ = int(fn(jnp.int32(0))[...])
        tc = time.perf_counter() - t0
        t = best_time(lambda: int(fn(jnp.int32(np.random.randint(1000)))[...]))
        results[name] = frames / t
        print(f"{name}: {frames / t:.1f} fps  ({t * 1e3:.2f} ms, "
              f"compile+first {tc:.1f} s)", flush=True)

    # 1. complete lockstep
    @jax.jit
    def complete_lock(salt):
        words, bits = transcode_complete_layout(rw, M, qk, w_out=1024,
                                                win_fetch=64, win_emit=64)
        return jnp.sum(words[::31, ::17]) + jnp.sum(bits) + salt

    bench("complete_lockstep", complete_lock)

    # 2. complete async
    @jax.jit
    def complete_async(salt):
        words, bits, ok = transcode_complete_async(rw, M, qk, w_out=1024)
        return (jnp.sum(words[::31, ::17]) + jnp.sum(bits) +
                ok.astype(jnp.int32) + salt)

    bench("complete_async", complete_async)

    # 3. decode records only
    @jax.jit
    def dec_records(salt):
        wl = scan_words_layout(rw)
        recs, st = _decode_records(wl, nb, t_dec)
        return jnp.sum(recs[:, ::37]) + jnp.sum(st) + salt

    bench("decode_phase1_records", dec_records)

    # 4. decode async full
    @jax.jit
    def dec_async(salt):
        wl = scan_words_layout(rw)
        slab, ok = decode_scans_async_layout(wl, nb, t_dec)
        return (jnp.sum(slab[:, ::7, ::5].astype(jnp.int32)) +
                ok.astype(jnp.int32) + salt)

    bench("decode_async_full", dec_async)

    # 5. decode lockstep
    @jax.jit
    def dec_lock(salt):
        wl = scan_words_layout(rw)
        lv = _decode_layout(wl, nb, win=64, unroll=4)
        return jnp.sum(lv[:, ::7, ::5].astype(jnp.int32)) + salt

    bench("decode_lockstep", dec_lock)

    # lv2 slab for the encode-side benches (computed once on device)
    @jax.jit
    def make_lv2():
        wl = scan_words_layout(rw)
        lv = _decode_layout(wl, nb, win=64, unroll=4)
        cb = FK // 1024
        lvl = lv.reshape(cb, M, 6, 64, 8, 128)
        qdc_l = int(T.SP5X_QUANT_LUMA_ZZ[0])
        qdc_c = int(T.SP5X_QUANT_CHROMA_ZZ[0])
        d = lvl[:, :, :, 0].astype(jnp.int32)
        dy = (jnp.cumsum(d[:, :, :4].reshape(cb, M * 4, 8, 128) * qdc_l,
                         axis=1).reshape(cb, M, 4, 8, 128) + 1024)
        dcb = jnp.cumsum(d[:, :, 4] * qdc_c, axis=1) + 1024
        dcr = jnp.cumsum(d[:, :, 5] * qdc_c, axis=1) + 1024
        dc = jnp.concatenate([dy, dcb[:, :, None], dcr[:, :, None]], axis=2)
        return transcode_mcu_layout(lvl, dc, qk)

    lv2 = make_lv2()
    jax.block_until_ready(lv2)
    lv2r = lv2.reshape(FK // 1024, nb, 64, 8, 128)
    print("# lv2 slab ready", flush=True)

    # 6. tokenizer only (lv2 passed as an arg: a closed-over 600 MB
    # constant would blow the remote-compile request limit)
    @jax.jit
    def tok_only(lv2r_, salt):
        recs, totals, off, ok = tokenize_levels_layout(lv2r_, M, t_enc)
        return (jnp.sum(recs[:, ::37]) + jnp.sum(totals) +
                ok.astype(jnp.int32) + salt)

    bench("encode_tokenizer_xla", lambda s: tok_only(lv2r, s))

    # 7. encode async full
    @jax.jit
    def enc_async(lv2r_, salt):
        words, bits, ok = encode_layout_async(lv2r_, 1024, t_enc)
        return (jnp.sum(words[:, ::31]) + jnp.sum(bits) +
                ok.astype(jnp.int32) + salt)

    bench("encode_async_full", lambda s: enc_async(lv2r, s))

    # 8. encode lockstep
    @jax.jit
    def enc_lock(lv2_, salt):
        words, bits = _segment_encode_layout(lv2_, M, 1, 1024, False, 64,
                                             unroll=2)
        return jnp.sum(words[:, ::31]) + jnp.sum(bits) + salt

    bench("encode_lockstep", lambda s: enc_lock(lv2, s))

    print("RESULTS " + repr(results), flush=True)


if __name__ == "__main__":
    main()
