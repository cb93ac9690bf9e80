"""Decompose the bench headline's fused-transcode time: Pallas kernel vs
XLA glue (jnp.tile batch replication, DC cumsum, checksum assembly).

The headline program (bench.py:make_fused) per KT_INNER=128 subtile does:
  tile cm0 x128 -> DC cumsum -> transcode_zz -> pixel assembly of 1/97
  frames -> strided checksum reductions.
This script times, on the real chip (best-of-5, salt-varied, scalar
readback):
  A  full subtile program (K=128, kt_outer=1 -- exactly one headline
     subtile)
  B  transcode_zz alone on a pre-tiled device-resident slab + cheap sum
  C  tile+cumsum only (no kernel): sum of the tiled input + dc
so  glue ~= A - B - (C - read cost), kernel ~= B.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/measure_fused_parts.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from amv_tpu.containers import riff
from amv_tpu.native import entropy_native as native
from amv_tpu.bitstream.entropy import huffman_decode_frames_soa
from amv_tpu.codecs.amv_video import _encoder_quant_qmat_np
from amv_tpu.kernels.transcode_pallas import transcode_zz
from amv_tpu.bitstream import jpeg_tables as T

REF_AMV = "/root/reference/C-AMVDecoder/bin/AMV1.amv"


def best_time(fn, n=5):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts), sorted(ts)[len(ts) // 2]


def main():
    s = riff.read(REF_AMV)
    w, h = s.info.width, s.info.height
    mb_w, mb_h = (w + 15) // 16, (h + 15) // 16
    M = mb_w * mb_h
    F = 64
    payloads = s.video_chunks[:F]
    K = 128
    FT = F * K

    qk = tuple(int(v) for v in _encoder_quant_qmat_np(2))
    qdc_l = int(T.SP5X_QUANT_LUMA_ZZ[0])
    qdc_c = int(T.SP5X_QUANT_CHROMA_ZZ[0])

    cm_host = huffman_decode_frames_soa(payloads, M)
    cm_dev = jax.device_put(jnp.asarray(cm_host))
    jax.block_until_ready(cm_dev)
    n_blocks = FT * M * 6
    print(f"F={F} K={K} frames={FT} blocks={n_blocks} "
          f"slab={64 * n_blocks * 2 / 1e6:.0f} MB", flush=True)

    def dc_resolve(cm):
        dcd = cm[0].astype(jnp.int32).reshape(FT, M, 6)
        dy = (jnp.cumsum(dcd[:, :, :4].reshape(FT, M * 4) * qdc_l,
                         axis=1).reshape(FT, M, 4) + 1024)
        dcb = jnp.cumsum(dcd[:, :, 4] * qdc_c, axis=1) + 1024
        dcr = jnp.cumsum(dcd[:, :, 5] * qdc_c, axis=1) + 1024
        return jnp.concatenate([dy, dcb[..., None], dcr[..., None]],
                               axis=-1).reshape(FT * M * 6)

    # ---- A: full headline subtile ------------------------------------
    @jax.jit
    def full(cm0, salt):
        cm = jnp.tile(cm0, (1, K)) + salt.astype(jnp.int16) * 0
        dc = dc_resolve(cm)
        pix, lv2 = transcode_zz(cm, dc, qk)
        fsel = jnp.arange(0, FT, 97)
        Fs = fsel.shape[0]
        pf = pix.reshape(64, FT, M * 6)[:, fsel]
        p = pf.reshape(8, 8, Fs, mb_h, mb_w, 6)
        yp = p[:, :, :, :, :, :4].reshape(8, 8, Fs, mb_h, mb_w, 2, 2)
        yc = yp.transpose(2, 3, 5, 0, 4, 6, 1).reshape(Fs, 16 * mb_h,
                                                       16 * mb_w)
        yv = yc[:, h - 1::-1, :w]
        return (jnp.sum(lv2[:, ::37].astype(jnp.int32)) +
                jnp.sum(yv[:, ::13, ::17].astype(jnp.int32)) + salt)

    # ---- B: kernel only on pre-tiled input ---------------------------
    cm_big = jax.device_put(jnp.tile(jnp.asarray(cm_host), (1, K)))
    dc_big = jax.jit(dc_resolve)(cm_big)
    jax.block_until_ready((cm_big, dc_big))

    @jax.jit
    def kern_only(cm, dc, salt):
        pix, lv2 = transcode_zz(cm + salt.astype(jnp.int16) * 0, dc, qk)
        return (jnp.sum(lv2[:, ::37].astype(jnp.int32)) +
                jnp.sum(pix[::13, ::17].astype(jnp.int32)) + salt)

    # ---- C: tile + cumsum only ---------------------------------------
    @jax.jit
    def glue_only(cm0, salt):
        cm = jnp.tile(cm0, (1, K)) + salt.astype(jnp.int16) * 0
        dc = dc_resolve(cm)
        return (jnp.sum(cm[:, ::37].astype(jnp.int32)) +
                jnp.sum(dc[::13]) + salt)

    # Loop-amortized versions: REPS iterations of the body inside ONE
    # jit (per-iteration salt defeats CSE/LICM), so the ~22-32 ms relay
    # dispatch — whose run-to-run variance exceeds the A/B/C deltas —
    # is paid once and divided by REPS (same trick as
    # measure_g729_stages2.py).
    REPS = 10

    def loopify(body):
        def run(salt, *ops):
            def step(i, acc):
                return acc + body(salt + i, *ops)
            return jax.lax.fori_loop(0, REPS, step, jnp.int32(0))
        return jax.jit(run)

    LA = loopify(lambda s, cm0: full.__wrapped__(cm0, s))
    LB = loopify(lambda s, cm, dc: kern_only.__wrapped__(cm, dc, s))
    LC = loopify(lambda s, cm0: glue_only.__wrapped__(cm0, s))

    for name, fn in (("A_full", lambda s: LA(jnp.int32(s), cm_dev)),
                     ("B_kernel", lambda s: LB(jnp.int32(s), cm_big,
                                               dc_big)),
                     ("C_tile_cumsum", lambda s: LC(jnp.int32(s),
                                                    cm_dev))):
        t0 = time.perf_counter()
        _ = int(fn(0)[...])
        print(f"{name}: compile+first {time.perf_counter() - t0:.1f}s",
              flush=True)
        tmin, tmed = best_time(lambda: int(fn(np.random.randint(1000))[...]))
        tmin, tmed = tmin / REPS, tmed / REPS
        print(f"{name}: min {tmin * 1e3:.2f} ms  med {tmed * 1e3:.2f} ms  "
              f"({FT / tmin:.0f} fps)  [x{REPS} loop, dispatch excluded]",
              flush=True)


if __name__ == "__main__":
    main()
