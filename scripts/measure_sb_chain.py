"""TPU A/B: complete async transcode chain at sb=8/16/32.

Times transcode_complete_async (decode + transform + encode, all on
device) at each sublane width with the bench harness's checksum
readback; cross-width equality via an order-sensitive digest of the
frame-major (words, bits) outputs (which are layout-invariant by
contract — tests/test_sb_width.py pins this in interpret mode)."""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from amv_tpu.containers import riff
from amv_tpu.native import entropy_native as native
from amv_tpu.codecs.amv_video import _encoder_quant_qmat_np
from amv_tpu.pipeline.transcode import transcode_complete_async

SAMPLE = "/root/reference/C-AMVDecoder/bin/AMV1.amv"
K = int(os.environ.get("K", "64"))


def best_time(fn, iters=5):
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[0], ts[len(ts) // 2]


def main():
    print(f"# devices: {jax.devices()}", flush=True)
    s = riff.read(SAMPLE)
    w, h = s.info.width, s.info.height
    M = ((w + 15) // 16) * ((h + 15) // 16)
    qk = tuple(int(v) for v in _encoder_quant_qmat_np(2))
    payloads = s.video_chunks
    F = len(payloads)
    rows, _ = native.unescape_frames(payloads)
    rows = np.asarray(rows)
    lens = np.array([len(p) for p in payloads])
    ordk = np.argsort(np.tile(lens, K), kind="stable")
    rows_k = np.tile(rows, (K, 1))[ordk]
    FK = rows_k.shape[0]
    rw = jax.device_put(jnp.asarray(rows_k))
    jax.block_until_ready(rw)
    print(f"# F={FK} M={M}", flush=True)

    dig_ref = None
    import json
    variants = json.loads(os.environ.get("VARIANTS", "[8, 16, 32]"))
    for sb in variants:
        name = f"sb{sb}"
        try:
            # NOTE: any position-weighted on-device digest (3-term
            # global or per-frame row reduce) fused into the sb=16/32
            # chain module reliably crashed the remote compile helper
            # (HTTP 500, subprocess exit 1) while compiling fine at
            # sb=8 and in the standalone kernel sweeps — so the timed
            # checksum is the bench harness's plain strided sum and
            # exactness rides on a one-time full host readback of the
            # frame-major (words, bits) outputs.
            @jax.jit
            def chain(rw, salt, sb=sb):
                words, bits, ok = transcode_complete_async(
                    rw, M, qk, w_out=1024, win_fetch=64, win_emit=64,
                    enc="async", sb=sb)
                return ok, words, bits, (jnp.sum(words[::31, ::17]) +
                                         jnp.sum(bits) + salt)

            t0 = time.perf_counter()
            ok, w_d, b_d, _ = chain(rw, jnp.int32(0))
            jax.block_until_ready(b_d)
            tc = time.perf_counter() - t0
            wb_h = (np.asarray(w_d), np.asarray(b_d))
            del w_d, b_d
            if dig_ref is None:
                dig_ref = wb_h
                eq = True
            else:
                eq = bool(np.array_equal(wb_h[0], dig_ref[0]) and
                          np.array_equal(wb_h[1], dig_ref[1]))
            del wb_h
            okb = bool(ok[...])
            tmin, tmed = best_time(lambda: int(chain(
                rw, jnp.int32(np.random.randint(1000)))[3][...]))
            print(f"{name}: {FK / tmin:.1f} fps ({tmin * 1e3:.2f} ms min / "
                  f"{tmed * 1e3:.2f} med) ok={okb} exact={eq} "
                  f"(compile {tc:.0f}s)", flush=True)
            del chain
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
