"""TPU A/B: dense async ENCODE lane width (sb=8 vs 16 vs 32).

Counterpart of measure_sb.py for the emit direction: the level slab is
produced once by the sb=8 production decode, then XLA-regrouped to the
wider layouts (frame f sits at chunk f//(sb*128), sublane
(f%(sb*128))//128, lane f%128 for every sb, so the regroup is a pure
reshape/transpose).  Output equality across widths is checked with an
order-sensitive on-device digest over (words, bits) — the word slabs
themselves never leave HBM (materializing them as jit outputs aborts
the relay runtime; see measure_sb.py)."""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from amv_tpu.containers import riff
from amv_tpu.native import entropy_native as native
from amv_tpu.kernels.entropy_decode_pallas import scan_words_layout
from amv_tpu.kernels.entropy_async_pallas import (decode_scans_async_dense,
                                                  default_t_max_dense)
from amv_tpu.kernels.entropy_encode_async_pallas import (
    encode_layout_async_dense, default_t_max_enc)

SAMPLE = "/root/reference/C-AMVDecoder/bin/AMV1.amv"
K = int(os.environ.get("K", "64"))
W_OUT = 1024


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
    nb = M * 6
    payloads = s.video_chunks
    F = len(payloads)
    rows, _ = native.unescape_frames(payloads)
    rows = np.asarray(rows)
    lens = np.array([len(p) for p in payloads])
    ordk = np.argsort(np.tile(lens, K), kind="stable")
    rows_k = np.tile(rows, (K, 1))[ordk]
    FK = (F * K + 4095) // 4096 * 4096      # divisible by every sb*128
    rows_k = np.concatenate(
        [rows_k, np.tile(rows_k[-1:], (FK - F * K, 1))], axis=0)
    t_dn = default_t_max_dense(nb, rows_k.shape[1])
    t_en = default_t_max_enc(nb)
    rw = jax.device_put(jnp.asarray(rows_k))
    jax.block_until_ready(rw)
    print(f"# F={FK} nb={nb} t_enc={t_en}", flush=True)

    # stage the level slab once (sb=8 production decode, stays on device)
    @jax.jit
    def stage():
        wl = scan_words_layout(rw, sb=8)
        slab, ok = decode_scans_async_dense(
            wl, nb, t_dn, sb=8, win=64, unroll=8, pmax=8, wb=8, adv=4,
            press=64)
        return slab, ok

    slab8, ok = stage()
    jax.block_until_ready(slab8)
    assert bool(ok[...]), "staging decode tripped its ok gate"

    dig_ref = None
    import json
    variants = json.loads(os.environ.get("VARIANTS", json.dumps([
        ["sb8", 8], ["sb16", 16], ["sb32", 32],
    ])))
    for name, sb in variants:
        try:
            g = sb // 8
            cb8 = slab8.shape[0]

            # regroup once outside the timed loop — the production chain
            # writes the wide slab natively (the transform stage is
            # sb-parameterized), so the transpose is not a real cost
            @jax.jit
            def regroup(s8, g=g, sb=sb):
                if g == 1:
                    return s8
                return s8.reshape(cb8 // g, g, nb, 64, 8, 128) \
                    .transpose(0, 2, 3, 1, 4, 5) \
                    .reshape(cb8 // g, nb, 64, sb, 128)

            lv_v = regroup(slab8)
            jax.block_until_ready(lv_v)

            @jax.jit
            def enc(lv, salt, sb=sb):
                words, bits, ok = encode_layout_async_dense(
                    lv, W_OUT, t_en, win_rows=64, unroll=8, pmax=8,
                    wb=8, adv=2)
                # layout-invariant digest: flatten back to frame-major
                wf = words.transpose(0, 2, 3, 1) \
                    .reshape(cb8 * 8 * 128, W_OUT)
                bf = bits[:, 0].reshape(cb8 * 8 * 128)
                pos_f = (jnp.arange(wf.shape[0], dtype=jnp.int32)
                         * 1000003 + 97) % 65521
                pos_c = (jnp.arange(W_OUT, dtype=jnp.int32)
                         * 40503 + 11) % 8191
                nw = (bf + 31) // 32
                keep = (jnp.arange(W_OUT, dtype=jnp.int32)[None, :]
                        < nw[:, None])
                v = jnp.where(keep, wf, 0)
                dig = jnp.sum(v * pos_f[:, None] * pos_c[None, :]) \
                    + 7 * jnp.sum(v * pos_c[None, :]) \
                    + jnp.sum(bf * pos_f) + jnp.sum(bf)
                return ok, dig, dig + salt

            t0 = time.perf_counter()
            ok, dig, _ = enc(lv_v, jnp.int32(0))
            jax.block_until_ready(dig)
            tc = time.perf_counter() - t0
            dig = int(dig[...])
            if dig_ref is None:
                dig_ref = dig
                eq = True
            else:
                eq = dig == dig_ref
            okb = bool(ok[...])
            tmin, tmed = best_time(lambda: int(enc(
                lv_v, jnp.int32(np.random.randint(1000)))[2][...]))
            print(f"{name}: {FK / tmin:.1f} fps ({tmin * 1e3:.2f} ms min / "
                  f"{tmed * 1e3:.2f} med) ok={okb} exact={eq} "
                  f"(compile {tc:.0f}s)", flush=True)
            del enc, lv_v
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
