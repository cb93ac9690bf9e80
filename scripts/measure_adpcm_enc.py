"""TPU probe: ADPCM *encode* blocking throughput vs tile factor KE_T
(r4 verdict item 1 — apply decode's tile + wrap-input levers to
kernels/adpcm_encode_pallas.py and capture a driver-grade number).

Same harness shape as measure_adpcm_k.py: corpus audio chunks decoded
to PCM rows by the C reference, encoded KE_T logical copies per
dispatch (pre-tile 252 -> 63 exact lane blocks, encode_layout_wrap for
the rest), checksum = sum(bytes) + sum(step-index bytes) over the valid
region, gated against the scalar reference encoder
(verify/ref_adpcm.compress_sample) at every swept point.

Memory at KE_T=4096: base inputs 462 MB int16 + 231 MB reset, outputs
2 x 252*4096 x 896 B ~ 1.85 GB — fine on the 16 GB chip.

RESULTS (2026-08-20, all checksum-OK, with the depth-5 parallel
quantizer in _compress): KE_T=1024 -> 77.5 ms = 4.44 Gs/s, 2048 ->
118.2 = 5.82, 4096 -> 197.2 = **6.98 Gs/s blocking**; pipelined
depth-8 at 4096 = **8.01 Gs/s** — decode-class (decode: 6.98..7.77
blocking / 8.97 pipelined), r4 verdict item 1's >=5 Gs/s bar cleared.
bench.py's adpcm_encode section defaults AMV_BENCH_ADPCM_ENC_K=4096.

Usage: python scripts/measure_adpcm_enc.py [KE_T ...]
"""
import struct
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from amv_tpu.containers import riff
from amv_tpu.native import entropy_native as native
from amv_tpu.kernels import adpcm_encode_pallas as KPE
from amv_tpu.verify.ref_adpcm import compress_sample

SAMPLE = "/root/reference/C-AMVDecoder/bin/AMV1.amv"


def times_n(fn, iters=5):
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return sorted(ts)


def main():
    ks = [int(a) for a in sys.argv[1:]] or [2048, 4096]
    s = riff.read(SAMPLE)
    achunks = s.audio_chunks
    alens = np.array([len(c) - 8 for c in achunks])
    pred = np.array([struct.unpack_from("<h", c, 0)[0] for c in achunks],
                    np.int32)
    sidx = np.array([min(struct.unpack_from("<H", c, 2)[0], 88)
                     for c in achunks], np.int32)
    maxlen = int(alens.max())
    nrow = 2 * maxlen
    C = len(achunks)
    rows_pcm = np.zeros((C, nrow), np.int16)
    for i, c in enumerate(achunks):
        pcm_i = native.ref_adpcm_decode(c[8:], int(pred[i]), int(sidx[i]))
        rows_pcm[i, :2 * alens[i]] = pcm_i[:2 * alens[i]]

    exp_b = exp_s = 0
    for i in range(C):
        p_, st = int(rows_pcm[i, 0]), int(sidx[i])
        row = rows_pcm[i]
        for t in range(0, nrow, 2):
            exp_s += st
            n0, p_, st = compress_sample(p_, st, int(row[t]))
            n1, p_, st = compress_sample(p_, st, int(row[t + 1]))
            exp_b += (n0 << 4) | n1

    reset_row = np.zeros((C, nrow), np.uint8)
    reset_row[:, 0] = 1
    xa = jax.device_put(jnp.asarray(rows_pcm))
    ra = jax.device_put(jnp.asarray(reset_row))
    sa = jax.device_put(jnp.asarray(sidx))
    jax.block_until_ready(xa)
    nb_valid = maxlen

    for KE_T in ks:
        exp_cs = (((exp_b + exp_s) * KE_T) + 2**31) % 2**32 - 2**31
        n_samples = int(2 * alens.sum()) * KE_T

        @jax.jit
        def fused(x, r, s0, salt, KE_T=KE_T):
            lanes = KPE.SB * 128
            r_pre = lanes // int(np.gcd(x.shape[0], lanes))
            rep = KE_T // r_pre if KE_T % r_pre == 0 else 1
            if rep == 1:
                r_pre = KE_T
            x2 = jnp.tile(x, (r_pre, 1))
            r2 = jnp.tile(r, (r_pre, 1))
            s2 = jnp.tile(s0, (r_pre,)) + salt * 0
            xl, rl, sl = KPE.to_layout_enc(x2, r2, s2)
            ob, osx = KPE.encode_layout_wrap(xl, rl, sl, repeat=rep)
            s_all = (jnp.sum(ob.astype(jnp.int32)) +
                     jnp.sum(osx.astype(jnp.int32)))
            s_pad = (jnp.sum(ob[:, nb_valid:].astype(jnp.int32)) +
                     jnp.sum(osx[:, nb_valid:].astype(jnp.int32)))
            return s_all - s_pad + salt

        t0 = time.perf_counter()
        cs = int(fused(xa, ra, sa, jnp.int32(0))[...])
        t_compile = time.perf_counter() - t0
        ok = cs == exp_cs
        ts = times_n(lambda: int(fused(
            xa, ra, sa, jnp.int32(np.random.randint(1000)))[...]))
        gs = n_samples / ts[0] / 1e9
        print(f"KE_T={KE_T:5d}  compile {t_compile:6.1f}s  "
              f"min {ts[0]*1e3:7.1f} ms  med {ts[len(ts)//2]*1e3:7.1f} ms  "
              f"{gs:5.2f} Gs/s  checksum {'OK' if ok else 'FAIL'}",
              flush=True)
        assert ok, f"checksum {cs} != {exp_cs}"

        # depth-8 pipelined steady state at the largest point
        if KE_T == ks[-1]:
            rng = np.random.default_rng(17)
            best = 0.0
            for _ in range(3):
                salts = rng.integers(0, 1 << 20, 8)
                t0 = time.perf_counter()
                hs = [fused(xa, ra, sa, jnp.int32(int(v))) for v in salts]
                jax.block_until_ready(hs[-1])
                dt = time.perf_counter() - t0
                for hd in hs:
                    hd.block_until_ready()
                best = max(best, n_samples * 8 / dt)
            print(f"KE_T={KE_T:5d}  pipelined depth-8: "
                  f"{best/1e9:5.2f} Gs/s", flush=True)


if __name__ == "__main__":
    main()
