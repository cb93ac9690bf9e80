"""TPU timing for G.729A decode chain + encoder steady-state step."""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from amv_tpu.codecs import g729a
from amv_tpu.codecs.g729a_encoder_tpu import encode_frame_batch

print(f"# devices: {jax.devices()}", flush=True)
rng = np.random.default_rng(0)
T_, B = 64, 1024
frames = rng.integers(0, 256, (T_, B, 10), dtype=np.uint8)
frames[..., 2] = 0x40
pcm = g729a.decode_streams(frames)
t_g729 = np.inf
for it in range(3):
    f2 = frames.copy()
    f2[..., 9] ^= it + 1
    t0 = time.perf_counter()
    pcm = g729a.decode_streams(f2)
    t_g729 = min(t_g729, time.perf_counter() - t0)
print(f"g729_decode: {T_ * B / t_g729:.1f} f/s", flush=True)

Be = 1024
rng2 = np.random.default_rng(1)
sig = (3000 * rng2.standard_normal((Be, 880))).astype(np.float32)
ste = g729a.init_state(Be)
hh = jnp.zeros((Be, 160))
ste, hh, pm = encode_frame_batch(ste, hh, jnp.asarray(sig[:, :80]))
_ = np.asarray(pm)
t0 = time.perf_counter()
for fi in range(1, 11):
    ste, hh, pm = encode_frame_batch(
        ste, hh, jnp.asarray(sig[:, fi * 80:(fi + 1) * 80]))
_ = np.asarray(pm)
t_enc10 = (time.perf_counter() - t0) / 10
print(f"g729_encode: {Be / t_enc10:.1f} f/s", flush=True)
