"""Interpret-mode correctness check for encode_layout_async_dense."""
import sys
import time

import jax

jax.config.update('jax_platforms', 'cpu')
import numpy as np
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from amv_tpu.bitstream.entropy import huffman_encode_frame
from amv_tpu.codecs.amv_video import (decode_transform, encode_transform)
from amv_tpu.bitstream.entropy import huffman_decode_frames
from amv_tpu.containers import riff
from amv_tpu.kernels.entropy_encode_pallas import _encode_layout
from amv_tpu.kernels.entropy_encode_async_pallas import (
    encode_layout_async_dense, default_t_max_enc)

SAMPLE = "/root/reference/C-AMVDecoder/bin/AMV1.amv"

s = riff.read(SAMPLE)
w, h = s.info.width, s.info.height
mb_w, mb_h = (w + 15) // 16, (h + 15) // 16
M = mb_w * mb_h
n = 6
levels = huffman_decode_frames(s.video_chunks[:n], M)
y, cb, cr = decode_transform(jnp.asarray(levels), mb_w, mb_h, w, h)
lv2 = np.asarray(encode_transform(y, cb, cr, mb_w, mb_h, 2))  # [n,M,6,64]
NB = M * 6
F = 1024
lv2p = np.zeros((F, NB, 64), np.int16)
lv2p[:n] = lv2.reshape(n, NB, 64)
# pad lanes: empty blocks (all-zero levels encode fine: DC diff + EOB)
# lanes with varied sparse content to vary per-lane token counts
rng = np.random.default_rng(7)
lv2p[n:, :, 0] = rng.integers(100, 160, (F - n, NB))
sel = rng.random((F - n, NB)) < 0.5
lv2p[n:, :, 3] = np.where(sel, rng.integers(-9, 9, (F - n, NB)), 0)
# slab layout [1, NB, 64, 8, 128]
slab = jnp.asarray(lv2p.reshape(8, 128, NB, 64).transpose(2, 3, 0, 1)
                   [None])

t0 = time.time()
w_ref, b_ref = _encode_layout(slab, 1024, interpret=True, win_rows=64)
w_ref, b_ref = np.asarray(w_ref), np.asarray(b_ref)
print("lockstep done", round(time.time() - t0, 1), flush=True)

t_max = default_t_max_enc(NB) * 2
t0 = time.time()
w_new, b_new, ok, st = encode_layout_async_dense(
    slab, 1024, t_max, interpret=True, win_rows=64, return_status=True)
w_new, b_new = np.asarray(w_new), np.asarray(b_new)
print("async done", round(time.time() - t0, 1), "ok:", bool(ok),
      "iters:", int(np.asarray(st)[0, 1, 0, 0]), flush=True)
print("bits match:", np.array_equal(b_ref, b_new), flush=True)
print("words match:", np.array_equal(w_ref, w_new), flush=True)
if not np.array_equal(w_ref, w_new):
    d = np.argwhere(w_ref != w_new)
    print("first diffs:", d[:5])
    for r, c, sb, ln in d[:3]:
        print("lane", (sb, ln), "row", c,
              hex(w_ref[r, c, sb, ln] & 0xFFFFFFFF),
              hex(w_new[r, c, sb, ln] & 0xFFFFFFFF))
    bd = np.argwhere(b_ref != b_new)
    print("bit diffs:", bd[:5], b_ref[tuple(bd[0])] if len(bd) else "")
