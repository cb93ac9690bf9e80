"""TPU probe: ADPCM decode blocking throughput vs tile factor KA_T.

bench.py's ADPCM section tiled the corpus audio x256 (~88M samples,
~37 ms/call) — at that size the ~22-32 ms relay dispatch is still
~40% of the blocking wall (pipelined reads 6.26 Gs/s vs 2.34
blocking).  Probe larger tiles to amortize it; checksum-gated against
the C reference at every point (the checksum scales linearly with the
tile factor).  HBM check: KA_T=4096 stages ~3.6 GB of nibbles + PCM —
well under the 16 GB chip.

RESULTS (2026-08-19, all OK): 256 -> 33.3 ms = 2.58 Gs/s,
512 -> 43.2 = 3.98, 1024 -> 64.7 = 5.32, 2048 -> 109.7 = 6.28,
4096 -> 191.9 = 7.18.  Marginal device rate (2048->4096 delta) is
~8.4 Gs/s — the remaining dispatch share at 4096 is ~12%.  bench.py
now defaults AMV_BENCH_ADPCM_K=4096.
"""
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
from amv_tpu.kernels import adpcm_pallas as KPA

SAMPLE = "/root/reference/C-AMVDecoder/bin/AMV1.amv"


def times_n(fn, iters=5):
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return sorted(ts)


def main():
    print(f"# devices: {jax.devices()}", flush=True)
    s = riff.read(SAMPLE)
    achunks = s.audio_chunks
    alens = np.array([len(c) - 8 for c in achunks])
    pred = np.array([int.from_bytes(c[0:2], "little", signed=True)
                     for c in achunks], np.int32)
    sidx = np.array([min(int.from_bytes(c[2:4], "little"), 88)
                     for c in achunks], np.int32)
    maxlen = int(alens.max())
    payload_a = np.zeros((len(achunks), maxlen), np.uint8)
    for i, c in enumerate(achunks):
        payload_a[i, :alens[i]] = np.frombuffer(c, np.uint8)[8:]
    nb_valid = 2 * payload_a.shape[1]

    csum_host = 0
    for i in range(len(achunks)):
        pcm_i = native.ref_adpcm_decode(payload_a[i].tobytes(),
                                        int(pred[i]), int(sidx[i]))
        csum_host += int(pcm_i.astype(np.int64).sum())

    pa, pp, ps = (jax.device_put(jnp.asarray(x))
                  for x in (payload_a, pred, sidx))
    jax.block_until_ready(pa)

    for KA_T in json.loads(os.environ.get("KS", "[256, 512, 1024]")):
        n_samples = int(2 * alens.sum()) * KA_T
        exp_cs = ((csum_host * KA_T) + 2**31) % 2**32 - 2**31

        @jax.jit
        def fused(pl, pr, si, salt):
            pl2 = jnp.tile(pl, (KA_T, 1))
            pr2 = jnp.tile(pr, (KA_T,)) + salt * 0
            si2 = jnp.tile(si, (KA_T,))
            bts, prl, sil = KPA.to_layout(pl2, pr2, si2)
            out = KPA.decode_layout(bts, prl, sil)
            s_all = jnp.sum(out.astype(jnp.int32))
            s_pad = jnp.sum(out[:, nb_valid:].astype(jnp.int32))
            return s_all - s_pad + salt

        try:
            t0 = time.perf_counter()
            cs0 = int(fused(pa, pp, ps, jnp.int32(0))[...])
            print(f"KA_T={KA_T}: compile+first {time.perf_counter()-t0:.1f}s",
                  flush=True)
            assert cs0 == exp_cs, f"checksum {cs0} != C {exp_cs}"
            ts = times_n(lambda: int(fused(
                pa, pp, ps, jnp.int32(np.random.randint(1000)))[...]))
            gsps = n_samples / ts[0] / 1e9
            print(f"KA_T={KA_T}: min {ts[0]*1e3:.1f} ms  med "
                  f"{ts[len(ts)//2]*1e3:.1f}  -> {gsps:.2f} Gs/s  "
                  f"(n={n_samples/1e6:.0f}M)  OK", flush=True)
        except Exception as e:
            print(f"KA_T={KA_T}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
