"""TPU check+timing of the 320x240 async chain (bench section mirror)."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from amv_tpu.containers import riff
from amv_tpu.native import entropy_native as native
from amv_tpu.bitstream.entropy import (huffman_decode_frames,
                                       huffman_encode_frame)
from amv_tpu.codecs.amv_video import _encoder_quant_qmat_np
from amv_tpu.pipeline.transcode import (transcode_complete_async,
                                        transcode_complete_layout,
                                        transcode_levels_fused,
                                        pick_segments)

SAMPLE = "/root/reference/C-AMVDecoder/bin/AMV1.amv"

print(f"# devices: {jax.devices()}", flush=True)
s = riff.read(SAMPLE)
M = 48
levels = huffman_decode_frames(s.video_chunks, M)
F = len(s.video_chunks)
qk = tuple(int(v) for v in _encoder_quant_qmat_np(2))

M320, F320 = 300, 1024
segs320 = pick_segments(M320)
rng320 = np.random.default_rng(11)
lv_pool = np.asarray(levels).reshape(F * M, 6, 64)
lv320c = lv_pool[rng320.integers(0, F * M, (64, M320))]
pay320 = [huffman_encode_frame(lv320c[f]) for f in range(64)]
rows320, _ = native.unescape_frames(pay320 * (F320 // 64))
lens320 = np.array([len(p) for p in pay320] * (F320 // 64))
ord320 = np.lexsort((np.tile(np.arange(64), F320 // 64), lens320))
inv320 = np.argsort(ord320)
ms320 = M320 // segs320
wout320 = min(1664, 1024 * ((ms320 + 47) // 48))
print(f"# segs={segs320} w_out={wout320} rows={rows320.shape}", flush=True)

want320 = None


def gate(words, bits, name):
    wn = np.asarray(words).reshape(F320, segs320, -1)[inv320][:64]
    bn = np.asarray(bits).reshape(F320, segs320)[inv320][:64]
    got = native.concat_escape_frames(
        wn.reshape(-1, wn.shape[2]), bn.reshape(-1), segs320)
    global want320
    if want320 is None:
        lvdec = np.asarray(huffman_decode_frames(pay320, M320))
        lv2 = np.asarray(transcode_levels_fused(jnp.asarray(lvdec), 2)[0])
        want320 = [huffman_encode_frame(lv2[f]) for f in range(64)]
    print(f"{name} bytes match: {got == want320}", flush=True)


rows_d = jax.device_put(jnp.asarray(rows320[ord320]))
jax.block_until_ready(rows_d)

import json, os
VAR = json.loads(os.environ.get("VARIANTS", "null"))
cases = [
    ("lockstep320", lambda rw: transcode_complete_layout(
        rw, M320, qk, w_out=wout320, win_fetch=64, win_emit=64,
        segs=segs320) + (jnp.bool_(True),)),
    ("async320", lambda rw: transcode_complete_async(
        rw, M320, qk, w_out=wout320, win_fetch=64, win_emit=64,
        segs=segs320, enc="async")),
]
if VAR:
    cases = [(nm, lambda rw, kw=kw: transcode_complete_async(
        rw, M320, qk, w_out=wout320, win_emit=64, segs=segs320,
        enc="async", **kw)) for nm, kw in VAR]
for name, fn in cases:
    try:
        @jax.jit
        def run(rw, salt, fn=fn):
            words, bits, ok = fn(rw)
            return words, bits, ok, (jnp.sum(words[::31, ::17]) +
                                     jnp.sum(bits) + salt)

        t0 = time.perf_counter()
        w, b, ok, _ = run(rows_d, jnp.int32(0))
        jax.block_until_ready(w)
        print(f"{name}: compile+first {time.perf_counter() - t0:.0f}s "
              f"ok={bool(ok[...])}", flush=True)
        gate(w, b, name)
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            _ = int(run(rows_d, jnp.int32(np.random.randint(1000)))[3][...])
            best = min(best, time.perf_counter() - t0)
        print(f"{name}: {F320 / best:.1f} fps ({best * 1e3:.2f} ms)",
              flush=True)
    except Exception as e:
        print(f"{name} FAILED: {type(e).__name__}: {e}", flush=True)
