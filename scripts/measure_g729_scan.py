"""G.729A encoder throughput with the lax.scan frame chain (one
dispatch per T frames) vs the per-frame dispatch loop."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from amv_tpu.codecs import g729a as G
from amv_tpu.codecs.g729a_encoder_tpu import (encode_frame_batch,
                                              encode_frames_scan)

print(f"# devices: {jax.devices()}", flush=True)
B, T = 1024, 16
rng = np.random.default_rng(1)
sig = (3000 * rng.standard_normal((T, B, 80))).astype(np.float32)
st = G.init_state(B)
hist = jnp.zeros((B, 160))
x = jnp.asarray(sig)

# scan chain: warm, then best-of-5 steady (state feeds back)
st2, h2, pm = encode_frames_scan(st, hist, x)
_ = np.asarray(pm[-1])
best = np.inf
for rep in range(5):
    t0 = time.perf_counter()
    st2, h2, pm = encode_frames_scan(st2, h2, x)
    _ = np.asarray(pm[-1, :, 0])
    best = min(best, time.perf_counter() - t0)
print(f"scan T={T}: {T * B / best:.1f} f/s ({best / T * 1e3:.2f} ms/frame)",
      flush=True)

# per-frame loop, same work
ste, hh = G.init_state(B), jnp.zeros((B, 160))
ste, hh, pm = encode_frame_batch(ste, hh, x[0])
_ = np.asarray(pm)
best = np.inf
for rep in range(3):
    t0 = time.perf_counter()
    for t in range(T):
        ste, hh, pm = encode_frame_batch(ste, hh, x[t])
    _ = np.asarray(pm[:, 0])
    best = min(best, time.perf_counter() - t0)
print(f"loop T={T}: {T * B / best:.1f} f/s ({best / T * 1e3:.2f} ms/frame)",
      flush=True)
