"""Fused-transform decomposition, v3: hoist-proof loop amortization.

measure_fused_parts.py's loop salt (`salt*0`) was constant-foldable, so
XLA hoisted the whole body out of the fori_loop — its "amortized"
numbers were single-body walls.  Here every iteration perturbs one
element of the SOURCE array (`.at[0,0].add(s % 3)`) before the tile, so
nothing upstream of the checksums is loop-invariant, and the tiled slab
sits behind an optimization_barrier so partial fusion into the checksum
can't dead-code the materialization.

Stages (each REPS=8 iterations in ONE jit, per-iteration time):
  T  tile only              (302 MB slab write + strided checksum read)
  D  tile + DC cumsum
  K  tile + cumsum + transcode_zz kernel (cheap strided output sums)
  F  full headline subtile  (adds 1/97 pixel-plane assembly + the
                             headline's exact checksum set)
so  cumsum = D-T, kernel = K-D, assembly+checksums = F-K.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/measure_fused_parts3.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from amv_tpu.containers import riff
from amv_tpu.bitstream.entropy import huffman_decode_frames_soa
from amv_tpu.codecs.amv_video import _encoder_quant_qmat_np
from amv_tpu.kernels.transcode_pallas import transcode_zz
from amv_tpu.bitstream import jpeg_tables as T

REF_AMV = "/root/reference/C-AMVDecoder/bin/AMV1.amv"
REPS = 8


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
          f"slab={64 * n_blocks * 2 / 1e6:.0f} MB reps={REPS}", flush=True)

    def dc_resolve(cm):
        dcd = cm[0].astype(jnp.int32).reshape(FT, M, 6)
        dy = (jnp.cumsum(dcd[:, :, :4].reshape(FT, M * 4) * qdc_l,
                         axis=1).reshape(FT, M, 4) + 1024)
        dcb = jnp.cumsum(dcd[:, :, 4] * qdc_c, axis=1) + 1024
        dcr = jnp.cumsum(dcd[:, :, 5] * qdc_c, axis=1) + 1024
        return jnp.concatenate([dy, dcb[..., None], dcr[..., None]],
                               axis=-1).reshape(FT * M * 6)

    def tiled(cm0, s_i):
        # iteration-dependent source perturbation: nothing downstream
        # is loop-invariant, and the barrier forces the 302 MB slab to
        # actually materialize every iteration
        cm0_i = cm0.at[0, 0].add((s_i % 3).astype(jnp.int16))
        return jax.lax.optimization_barrier(jnp.tile(cm0_i, (1, K)))

    def body_T(cm0, s_i):
        cm = tiled(cm0, s_i)
        return jnp.sum(cm[:, ::1024].astype(jnp.int32))

    def body_D(cm0, s_i):
        cm = tiled(cm0, s_i)
        dc = dc_resolve(cm)
        return jnp.sum(cm[:, ::1024].astype(jnp.int32)) + jnp.sum(dc[::1024])

    def body_K(cm0, s_i):
        cm = tiled(cm0, s_i)
        dc = dc_resolve(cm)
        pix, lv2 = transcode_zz(cm, dc, qk)
        return (jnp.sum(lv2[:, ::1024].astype(jnp.int32)) +
                jnp.sum(pix[:, ::1024].astype(jnp.int32)))

    def body_F(cm0, s_i):
        cm = tiled(cm0, s_i)
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
                jnp.sum(yv[:, ::13, ::17].astype(jnp.int32)))

    def loopify(body):
        @jax.jit
        def run(salt, cm0):
            def step(i, acc):
                return acc + body(cm0, salt + i)
            return jax.lax.fori_loop(0, REPS, step, jnp.int32(0))
        return run

    for name, body in (("T_tile", body_T), ("D_tile_cumsum", body_D),
                       ("K_plus_kernel", body_K), ("F_full", body_F)):
        fn = loopify(body)
        t0 = time.perf_counter()
        _ = int(fn(jnp.int32(0), cm_dev)[...])
        print(f"{name}: compile+first {time.perf_counter() - t0:.1f}s",
              flush=True)
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            _ = int(fn(jnp.int32(np.random.randint(1000)), cm_dev)[...])
            ts.append((time.perf_counter() - t0) / REPS)
        tmin, tmed = min(ts), sorted(ts)[2]
        print(f"{name}: min {tmin * 1e3:.2f} ms  med {tmed * 1e3:.2f} ms  "
              f"({FT / tmin:.0f} fps/iter)", flush=True)


if __name__ == "__main__":
    main()
