"""A/B the ADPCM bench body: materialized KA_T-times jnp.tile + to_layout
vs decode_layout_wrap (wrapping chunk-block index maps).

Both bodies are checksum-gated against the single-core C reference
expectation (bench.py's exp_adpcm_cs, layout-invariant).  Run AFTER any
other TPU job finishes — never concurrently.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/measure_adpcm_wrap.py
"""
import os
import sys
import struct
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from amv_tpu.containers import riff
from amv_tpu.kernels import adpcm_pallas as KPA
from amv_tpu.native import entropy_native as native

REF_AMV = "/root/reference/C-AMVDecoder/bin/AMV1.amv"
KA_T = int(os.environ.get("AMV_BENCH_ADPCM_K", "4096"))


def main():
    s = riff.read(REF_AMV)
    achunks = s.audio_chunks
    alens = np.array([len(c) - 8 for c in achunks])
    pred = np.array([struct.unpack_from("<h", c, 0)[0] for c in achunks],
                    np.int32)
    sidx = np.array([min(struct.unpack_from("<H", c, 2)[0], 88)
                     for c in achunks], np.int32)
    maxlen = int(alens.max())
    payload_a = np.zeros((len(achunks), maxlen), np.uint8)
    for i, c in enumerate(achunks):
        payload_a[i, :alens[i]] = np.frombuffer(c, np.uint8)[8:]
    n_samples = int(2 * alens.sum()) * KA_T

    csum_host = 0
    for i in range(len(achunks)):
        pcm_i = native.ref_adpcm_decode(payload_a[i].tobytes(),
                                        int(pred[i]), int(sidx[i]))
        csum_host += int(pcm_i.astype(np.int64).sum())
    exp_cs = ((csum_host * KA_T) + 2**31) % 2**32 - 2**31
    nb_valid = 2 * payload_a.shape[1]
    print(f"C={len(achunks)} maxlen={maxlen} KA_T={KA_T} "
          f"samples={n_samples / 1e9:.2f}G", flush=True)

    @jax.jit
    def body_old(pl, pr, si, salt):
        pl2 = jnp.tile(pl, (KA_T, 1))
        pr2 = jnp.tile(pr, (KA_T,)) + salt * 0
        si2 = jnp.tile(si, (KA_T,))
        bts, prl, sil = KPA.to_layout(pl2, pr2, si2)
        out = KPA.decode_layout(bts, prl, sil)
        return (jnp.sum(out.astype(jnp.int32)) -
                jnp.sum(out[:, nb_valid:].astype(jnp.int32)) + salt)

    @jax.jit
    def body_new(pl, pr, si, salt):
        # pre-tile to an exact SB*128 lane-block multiple, wrap the rest
        # (mirrors bench.py's fused_adpcm_pallas after the r4 ADVICE fix)
        lanes = KPA.SB * 128
        r_pre = lanes // int(np.gcd(pl.shape[0], lanes))
        rep = KA_T // r_pre if KA_T % r_pre == 0 else 1
        if rep == 1:
            r_pre = KA_T
        pl2 = jnp.tile(pl, (r_pre, 1))
        pr2 = jnp.tile(pr, (r_pre,)) + salt * 0
        si2 = jnp.tile(si, (r_pre,))
        bts, prl, sil = KPA.to_layout(pl2, pr2, si2)
        out = KPA.decode_layout_wrap(bts, prl, sil, repeat=rep)
        return (jnp.sum(out.astype(jnp.int32)) -
                jnp.sum(out[:, nb_valid:].astype(jnp.int32)) + salt)

    pa, pp, ps = (jax.device_put(jnp.asarray(x))
                  for x in (payload_a, pred, sidx))
    jax.block_until_ready((pa, pp, ps))
    for name, fn in (("OLD_tile", body_old), ("NEW_wrap", body_new)):
        t0 = time.time()
        cs = int(fn(pa, pp, ps, jnp.int32(0))[...])
        print(f"{name}: checksum {'OK' if cs == exp_cs else 'MISMATCH'} "
              f"({cs} vs {exp_cs}), compile+warm {time.time() - t0:.0f}s",
              flush=True)
        assert cs == exp_cs, name
        best = 1e9
        for it in range(5):
            t0 = time.perf_counter()
            int(fn(pa, pp, ps, jnp.int32(1000 + it))[...])
            best = min(best, time.perf_counter() - t0)
        print(f"{name}: {best * 1e3:.1f} ms  "
              f"{n_samples / best / 1e9:.2f} Gs/s", flush=True)


if __name__ == "__main__":
    main()
