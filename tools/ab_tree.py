"""TPU A/B: tree-reduced vs sequential table reductions in the dense
async entropy kernels.

Run once against the working tree and once against a HEAD copy
(PYTHONPATH=/tmp/abold), sequentially, best-of-N — same harness as
tools/ab_enc_packed.py (device-resident input, scalar checksum
readback, varying salt).

Usage: nohup python tools/ab_tree.py > /tmp/ab_tree_new.log 2>&1 &
       PYTHONPATH=/tmp/abold:/root/.axon_site nohup python \
           tools/ab_tree.py > /tmp/ab_tree_old.log 2>&1 &
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from amv_tpu.containers import riff
from amv_tpu.bitstream.entropy import huffman_decode_frames, \
    huffman_encode_frame
from amv_tpu.codecs.amv_video import _encoder_quant_qmat_np
from amv_tpu.native import entropy_native as native

SAMPLE = "/root/reference/C-AMVDecoder/bin/AMV1.amv"
K = int(sys.argv[1]) if len(sys.argv) > 1 else 64
N_TIMES = 7


def times_n(fn, iters=N_TIMES):
    out = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        out.append(time.perf_counter() - t0)
    return sorted(out)


def main():
    import amv_tpu
    print(f"tree A/B: amv_tpu from {amv_tpu.__file__}", flush=True)
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
    t_max_enc = default_t_max_enc(nb) * 3 // 2

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

    @jax.jit
    def prep(rw):
        return scan_words_layout(rw)

    wl_r = jax.device_put(prep(rows_ct))
    jax.block_until_ready(wl_r)

    @jax.jit
    def dec_stage(wl, salt):
        slab, ok, st = decode_scans_async_dense(
            wl, nb, t_max_dec, win=64, unroll=8, wb=8, adv=4,
            pmax=8, press=64, return_status=True)
        return slab, ok, st, (jnp.sum(slab[:, ::7, ::5]
                                      .astype(jnp.int32)) + salt)

    t0 = time.perf_counter()
    slab, ok, st, _ = dec_stage(wl_r, jnp.int32(0))
    iters = int(np.asarray(st)[:, 1, 0, 0].sum())
    print(f"dec ok={bool(ok[...])} iters={iters} "
          f"(compile+run {time.perf_counter()-t0:.0f}s)", flush=True)
    ts = times_n(lambda: int(dec_stage(
        wl_r, jnp.int32(np.random.randint(1000)))[3][...]))
    print(f"dec: min {ts[0]*1e3:.1f} ms median "
          f"{ts[len(ts)//2]*1e3:.1f} ms", flush=True)

    @jax.jit
    def enc_stage(lv2s, salt):
        words, bits, ok, st = encode_layout_async_dense(
            lv2s, 1024, t_max_enc, win_rows=64, unroll=8,
            pmax=8, wb=8, adv=4, return_status=True)
        return words, bits, ok, st, (jnp.sum(words[:, ::31, 0, ::17]) +
                                     jnp.sum(bits) + salt)

    t0 = time.perf_counter()
    wds, bts, ok, st, _ = enc_stage(lv2_r, jnp.int32(0))
    iters = int(np.asarray(st)[:, 1, 0, 0].sum())
    print(f"enc ok={bool(ok[...])} iters={iters} "
          f"(compile+run {time.perf_counter()-t0:.0f}s)", flush=True)
    ts = times_n(lambda: int(enc_stage(
        lv2_r, jnp.int32(np.random.randint(1000)))[4][...]))
    print(f"enc: min {ts[0]*1e3:.1f} ms median "
          f"{ts[len(ts)//2]*1e3:.1f} ms ({FC/ts[0]:.0f} fps standalone)",
          flush=True)

    # ---- complete chain + byte gate ----
    from amv_tpu.pipeline.transcode import transcode_complete_async

    @jax.jit
    def complete(rw, salt):
        words, bits, ok = transcode_complete_async(
            rw, M, qk, w_out=1024, win_fetch=64, win_emit=64, enc="async")
        return words, bits, ok, (jnp.sum(words[::31, ::17]) +
                                 jnp.sum(bits) + salt)

    t0 = time.perf_counter()
    wds1, bts1, ok1, _ = complete(rows_ct, jnp.int32(0))
    print(f"chain ok={bool(ok1[...])} "
          f"(compile+run {time.perf_counter()-t0:.0f}s)", flush=True)
    ts = times_n(lambda: int(complete(
        rows_ct, jnp.int32(np.random.randint(1000)))[3][...]))
    print(f"chain: min {ts[0]*1e3:.1f} ms median "
          f"{ts[len(ts)//2]*1e3:.1f} ms -> {FC/ts[0]:.0f} fps min, "
          f"{FC/ts[len(ts)//2]:.0f} fps median", flush=True)

    inv_k = np.argsort(ord_k)
    got = native.escape_frames(np.asarray(wds1)[inv_k][:F],
                               np.asarray(bts1)[inv_k][:F])
    levels = huffman_decode_frames(payloads, M)
    from amv_tpu.pipeline.transcode import transcode_levels_fused
    lv2_host = np.asarray(transcode_levels_fused(jnp.asarray(levels), 2)[0])
    want = [huffman_encode_frame(lv2_host[f]) for f in range(F)]
    assert got == want, "chain bytes != host re-encode"
    print("chain byte gate: OK", flush=True)


if __name__ == "__main__":
    main()
