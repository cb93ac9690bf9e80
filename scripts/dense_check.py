"""Quick interpret-mode correctness check for decode_scans_async_dense."""
import sys
import time

import jax

jax.config.update('jax_platforms', 'cpu')
import numpy as np
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from amv_tpu.bitstream.entropy import (huffman_encode_frame,
                                       huffman_decode_frames)
from amv_tpu.codecs.amv_video import _unescape_pack
from amv_tpu.kernels.entropy_decode_pallas import scan_words_layout
from amv_tpu.kernels.entropy_async_pallas import (decode_scans_async_dense,
                                                  default_t_max_dense)

rng = np.random.default_rng(3)
F, M = 1024, 4
nb = M * 6
lv = np.zeros((F, M, 6, 64), np.int16)
lv[..., 0] = rng.integers(-30, 60, (F, M, 6))
lv[..., 1] = rng.integers(-8, 8, (F, M, 6))
lv[:, :, :, 5] = rng.integers(-4, 4, (F, M, 6))
# a few empty-block-heavy frames to exercise defers
lv[:32, 1:] = 0
pays = [huffman_encode_frame(lv[f]) for f in range(F)]
rows = _unescape_pack(pays)
wl = scan_words_layout(jnp.asarray(rows))
t_max = default_t_max_dense(nb, rows.shape[1])
t0 = time.time()
slab, ok = decode_scans_async_dense(wl, nb, t_max, interpret=True)
slab = np.asarray(slab)
print("ok flag:", bool(ok), "elapsed:", round(time.time() - t0, 1), flush=True)
want = np.asarray(huffman_decode_frames(pays, M))
got = slab.transpose(0, 3, 4, 1, 2).reshape(F, nb, 64).reshape(F, M, 6, 64)
print("match:", np.array_equal(got, want), flush=True)
if not np.array_equal(got, want):
    bad = np.argwhere((got != want).any(axis=(1, 2, 3)))[:10].ravel()
    print("bad frames:", bad)
    f = int(bad[0])
    db, ds = np.argwhere((got[f] != want[f]).any(axis=-1))[0]
    print("frame", f, "block", db, ds)
    print("got ", got[f, db, ds][:20])
    print("want", want[f, db, ds][:20])
