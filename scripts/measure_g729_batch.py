"""TPU probe: G.729A decode/encode blocking throughput vs stream batch B.

bench.py runs B=1024: decode T=64 chains read ~160 ms/call blocking with
the ~22-32 ms relay dispatch still ~15% of the wall; the encoder's
Te=16 calls are ~77 ms with ~32% dispatch.  Larger B amortizes the same
way the ADPCM tile sweep did (scripts/measure_adpcm_k.py).  Kernel code
is unchanged — batch only — so bit-exactness rides on the existing test
gates; this probe is throughput-only.

Usage: DEC_BS='[2048,4096]' ENC_BS='[2048,4096]' python scripts/measure_g729_batch.py
"""
import json
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from amv_tpu.codecs import g729a


def main():
    print(f"# devices: {jax.devices()}", flush=True)
    for B in json.loads(os.environ.get("DEC_BS", "[2048, 4096]")):
        T_ = 64
        rng = np.random.default_rng(0)
        frames = rng.integers(0, 256, (T_, B, 10), dtype=np.uint8)
        frames[..., 2] = 0x40
        parms_d = jax.device_put(jnp.asarray(g729a.unpack_frames(frames)))

        @jax.jit
        def dec_device(parms_all, salt):
            st = g729a.init_state(B)
            p = parms_all.at[0, :, 13].set(
                (parms_all[0, :, 13] + salt) % 16)
            _, pcm_ = g729a.decode_frames_scan(st, p)
            return jnp.sum(pcm_[:, :, ::17].astype(jnp.int32))

        try:
            t0 = time.perf_counter()
            _ = int(dec_device(parms_d, jnp.int32(0))[...])
            print(f"dec B={B}: compile+first {time.perf_counter()-t0:.1f}s",
                  flush=True)
            best = np.inf
            for it in range(5):
                t0 = time.perf_counter()
                _ = int(dec_device(parms_d, jnp.int32(it + 1))[...])
                best = min(best, time.perf_counter() - t0)
            print(f"dec B={B}: min {best*1e3:.1f} ms -> "
                  f"{T_*B/best/1e3:.1f}K f/s", flush=True)
        except Exception as e:
            print(f"dec B={B}: FAILED {type(e).__name__}: {e}", flush=True)

    for Be in json.loads(os.environ.get("ENC_BS", "[2048, 4096]")):
        from amv_tpu.codecs.g729a_encoder_tpu import encode_frames_scan
        Te = 16
        rng2 = np.random.default_rng(1)
        sig = jnp.asarray((3000 * rng2.standard_normal(
            (Te, Be, 80))).astype(np.float32))
        try:
            ste = g729a.init_state(Be)
            hh = jnp.zeros((Be, 160))
            t0 = time.perf_counter()
            ste, hh, pm = encode_frames_scan(ste, hh, sig)
            _ = np.asarray(pm[-1])
            print(f"enc B={Be}: compile+first {time.perf_counter()-t0:.1f}s",
                  flush=True)
            best = np.inf
            for _ in range(4):
                t0 = time.perf_counter()
                ste, hh, pm = encode_frames_scan(ste, hh, sig)
                _ = np.asarray(pm[-1, :, 0])
                best = min(best, (time.perf_counter() - t0) / Te)
            print(f"enc B={Be}: min {best*1e3:.2f} ms/frame-step -> "
                  f"{Be/best/1e3:.1f}K f/s", flush=True)
        except Exception as e:
            print(f"enc B={Be}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
