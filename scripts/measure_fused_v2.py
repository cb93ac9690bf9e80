"""Restructured fused-transform headline candidates, exactness-gated.

measure_fused_parts3.py decomposed the current headline subtile
(13.7 ms / 8192 frames): tile 3.9 + DC cumsum 2.0 + kernel 4.6 +
assembly/strided checksums 3.2.  Only the kernel is the benchmarked
work; the tile is batch STAGING (every other bench section stages its
device-resident batch outside the timed region), and the checksum can
be both stronger and cheaper as an unstrided full sum.

Variants (all: fori_loop of REPS iterations over ONE device-resident
pre-tiled subtile, barrier-tied to the carry so the body cannot be
hoisted — the same anti-LICM pattern bench.py already uses):
  V1  resident subtile + current cumsum + CURRENT heavy checksum set
      (isolates the tile removal)
  V2  V1 with full-sum checksums sum(lv2)+sum(pix) (drops assembly)
  V3  V2 with the DC cumsums as triangular f32 matmuls (MXU; exact —
      max |partial sum| = mm*4*2047*qdc < 2^24)
Every variant asserts its checksum against a host-computed expectation
from C-verified outputs before timing.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/measure_fused_v2.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax
import jax.numpy as jnp

from amv_tpu.containers import riff
from amv_tpu.bitstream.entropy import huffman_decode_frames_soa
from amv_tpu.codecs.amv_video import (decode_transform, encode_transform,
                                      _encoder_quant_qmat_np)
from amv_tpu.kernels.transcode_pallas import transcode_zz
from amv_tpu.bitstream import jpeg_tables as T
from amv_tpu.native import entropy_native as native

REF_AMV = "/root/reference/C-AMVDecoder/bin/AMV1.amv"
REPS = 8
KI = 128                      # kt_inner: corpus copies per resident subtile


def main():
    s = riff.read(REF_AMV)
    w, h = s.info.width, s.info.height
    mb_w, mb_h = (w + 15) // 16, (h + 15) // 16
    M = mb_w * mb_h
    payloads = s.video_chunks[:64]
    F = len(payloads)
    FT = F * KI

    qk = tuple(int(v) for v in _encoder_quant_qmat_np(2))
    qdc_l = int(T.SP5X_QUANT_LUMA_ZZ[0])
    qdc_c = int(T.SP5X_QUANT_CHROMA_ZZ[0])

    # C-verified host outputs for the expectations
    planes_c = [native.ref_decode_frame(p, w, h) for p in payloads]
    yh = np.stack([pl[0] for pl in planes_c])
    cbh = np.stack([pl[1] for pl in planes_c])
    crh = np.stack([pl[2] for pl in planes_c])
    lv_enc = np.asarray(encode_transform(jnp.asarray(yh), jnp.asarray(cbh),
                                         jnp.asarray(crh), mb_w, mb_h, 2))

    cm_host = huffman_decode_frames_soa(payloads, M)
    cm_dev = jax.device_put(jnp.asarray(cm_host))
    cm_sub = jax.jit(lambda c: jnp.tile(c, (1, KI)))(cm_dev)
    jax.block_until_ready(cm_sub)
    n_sub = FT * M * 6
    print(f"F={F} KI={KI} frames/iter={FT} blocks={n_sub} "
          f"slab={64 * n_sub * 2 / 1e6:.0f} MB reps={REPS}", flush=True)

    # ---------------- expectations (mod 2**32, int32 two's complement) ---
    def wrap(v):
        return int((int(v) + 2**31) % 2**32 - 2**31)

    lv64 = lv_enc.astype(np.int64)
    block_sums = lv64.sum(axis=-1).reshape(F * M * 6)
    sel = np.arange(0, n_sub, 37) % (F * M * 6)
    cs_levels_strided = int(block_sums[sel].sum())
    fsel_np = np.arange(0, FT, 97) % F
    cs_pixels_strided = int(yh[fsel_np, ::13, ::17].astype(np.int64).sum())
    exp_v1 = wrap(REPS * (cs_levels_strided + cs_pixels_strided))

    cs_levels_full = int(lv64.sum()) * KI
    cs_pixels_full = (int(yh.astype(np.int64).sum()) +
                      int(cbh.astype(np.int64).sum()) +
                      int(crh.astype(np.int64).sum())) * KI
    exp_v23 = wrap(REPS * (cs_levels_full + cs_pixels_full))

    # ---------------- shared pieces --------------------------------------
    def dc_cumsum(cm):
        dcd = cm[0].astype(jnp.int32).reshape(FT, M, 6)
        dy = (jnp.cumsum(dcd[:, :, :4].reshape(FT, M * 4) * qdc_l,
                         axis=1).reshape(FT, M, 4) + 1024)
        db = jnp.cumsum(dcd[:, :, 4] * qdc_c, axis=1) + 1024
        dr = jnp.cumsum(dcd[:, :, 5] * qdc_c, axis=1) + 1024
        return jnp.concatenate([dy, db[..., None], dr[..., None]],
                               axis=-1).reshape(FT * M * 6)

    triu_l = jnp.triu(jnp.ones((M * 4, M * 4), jnp.float32))
    triu_c = jnp.triu(jnp.ones((M, M), jnp.float32))

    def dc_matmul(cm):
        # cumsum(x)[j] = sum_{i<=j} x[i] = (x @ triu)[j]; products stay
        # < mm*4*2047*qdc ~ 5.1M < 2^24, so f32 accumulate is exact
        dcd = cm[0].astype(jnp.float32).reshape(FT, M, 6)
        dy = jax.lax.dot(dcd[:, :, :4].reshape(FT, M * 4), triu_l,
                         precision=jax.lax.Precision.HIGHEST)
        dy = (dy * qdc_l).astype(jnp.int32).reshape(FT, M, 4) + 1024
        dcc = jnp.concatenate([dcd[:, :, 4:5], dcd[:, :, 5:6]],
                              axis=0).reshape(2 * FT, M)
        dcc = jax.lax.dot(dcc, triu_c,
                          precision=jax.lax.Precision.HIGHEST)
        dcc = (dcc * jnp.float32(qdc_c)).astype(jnp.int32) + 1024
        db = dcc[:FT][..., None]
        dr = dcc[FT:][..., None]
        return jnp.concatenate([dy, db, dr], axis=-1).reshape(FT * M * 6)

    def cs_heavy(pix, lv2):
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

    def cs_full(pix, lv2):
        return (jnp.sum(lv2.astype(jnp.int32)) +
                jnp.sum(pix.astype(jnp.int32)))

    def make(dc_fn, cs_fn):
        def body(cm):
            dc = dc_fn(cm)
            pix, lv2 = transcode_zz(cm, dc, qk)
            return cs_fn(pix, lv2)

        @jax.jit
        def run(cm0, salt):
            def step(i, a):
                cmb, ab = jax.lax.optimization_barrier((cm0, a))
                return ab + body(cmb)
            return jax.lax.fori_loop(0, REPS, step, jnp.int32(0)) + salt
        return run

    variants = (("V1_resident_heavycs", make(dc_cumsum, cs_heavy), exp_v1),
                ("V2_fullsum_cs", make(dc_cumsum, cs_full), exp_v23),
                ("V3_matmul_dc", make(dc_matmul, cs_full), exp_v23))

    for name, fn, exp in variants:
        t0 = time.perf_counter()
        got = int(fn(cm_sub, jnp.int32(0))[...])
        print(f"{name}: compile+first {time.perf_counter() - t0:.1f}s",
              flush=True)
        assert got == exp, f"{name} checksum mismatch: {got} != {exp}"
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            _ = int(fn(cm_sub, jnp.int32(np.random.randint(1000)))[...])
            ts.append((time.perf_counter() - t0) / REPS)
        tmin, tmed = min(ts), sorted(ts)[2]
        print(f"{name}: min {tmin * 1e3:.2f} ms  med {tmed * 1e3:.2f} ms  "
              f"({FT / tmin:.0f} fps/iter)  checksum OK", flush=True)


if __name__ == "__main__":
    main()
