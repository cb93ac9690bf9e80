"""G.729A decode: device-resident timing vs the old full-PCM-readback
loop (the 10.5MB d2h through the 30MB/s relay was inside the old
timing)."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from amv_tpu.codecs import g729a

print(f"# devices: {jax.devices()}", flush=True)
rng = np.random.default_rng(0)
T_, B = 64, 1024
frames = rng.integers(0, 256, (T_, B, 10), dtype=np.uint8)
frames[..., 2] = 0x40

pcm = g729a.decode_streams(frames)   # warm all chunk signatures
t_old = np.inf
for it in range(3):
    f2 = frames.copy()
    f2[..., 9] ^= it + 1
    t0 = time.perf_counter()
    pcm = g729a.decode_streams(f2)
    t_old = min(t_old, time.perf_counter() - t0)
print(f"old (full PCM d2h): {T_ * B / t_old:.1f} f/s ({t_old * 1e3:.1f} ms)",
      flush=True)

parms_d = jax.device_put(jnp.asarray(g729a.unpack_frames(frames)))


def dec_device(parms_all, salt):
    st = g729a.init_state(B)
    acc = jnp.int32(0)
    p = parms_all.at[0, :, 13].set((parms_all[0, :, 13] + salt) % 16)
    for t0_ in range(0, T_, g729a.DECODE_CHUNK):
        st, pcm_ = g729a._decode_chain(st, p[t0_:t0_ + g729a.DECODE_CHUNK])
        acc = acc + jnp.sum(pcm_[-1, :, ::17].astype(jnp.int32))
    return acc


_ = int(dec_device(parms_d, jnp.int32(0))[...])
t_new = np.inf
for it in range(4):
    t0 = time.perf_counter()
    _ = int(dec_device(parms_d, jnp.int32(it + 1))[...])
    t_new = min(t_new, time.perf_counter() - t0)
print(f"device-resident: {T_ * B / t_new:.1f} f/s ({t_new * 1e3:.1f} ms)",
      flush=True)
