"""TPU A/B: 320x240 complete transcode with lane-parallel segmented
DECODE (segs_dec=4) vs the r4 production chain (serial decode per lane,
segmented encode only).

r4 verdict item 3: the 320x240 decode stage walks one ~4.4 KB serial
token stream per lane — the intrinsic per-lane stream-length cost the
r2 sweep identified.  segs_dec=4 gives each lane a bit-aligned 75-MCU
segment (native.unescape_segment_frames), ~1.1 KB streams, with DC
state re-linked by lane-indexed gathers.  Host index-pass cost is
timed separately (it token-walks each unique frame once).

Byte gate: unique frames spliced via concat_escape_frames must equal
the host re-encode, both arms.

RESULTS (2026-08-20, TPU v5e, byte-exact at every point):
* F=4096 (lane-SATURATED, sb=32 both arms): baseline 133.5 ms =
  30,689 fps vs segs_dec=4 142.7 ms = 28,703 — a 6.5% NEGATIVE.
  Root cause: with all sb*128 lanes full, cutting each stream 4x just
  multiplies chunk-blocks 4x (grid iterations are sequential), so the
  total serial token count is CONSERVED; the extra chunk transitions
  and window startups are pure overhead.  The r2 finding stands:
  at saturation the decode wall is total lockstep token work, not
  per-lane stream length.
* F=1024 (latency tier): baseline (sb=8, 1024 full-length lanes)
  70.0 ms vs segs_dec=4 (4096 quarter-length rows saturating one
  sb=32 chunk) 55.6 ms = **+26%** — segmentation converts SPARE lane
  capacity into stream-length cuts.  The 4x iteration cut nets 1.26x
  because sb 8->32 costs ~1.7x per-iteration per doubling (the known
  sublane-width tradeoff, scripts/measure_sb.py).
* Host index+split pass (walk_boundaries + bit-aligned emit):
  3,800-4,200 fps at 320x240 on the single host core — amortized over
  batch replication in serving, or ~26% of a 64-frame batch's device
  wall when cold.

Conclusion: keep segs_dec for latency-tier batches (F*segs <= sb*128
lanes); the bench 320x240 throughput section stays on the r4 chain.

Usage: python scripts/measure_320_segdec.py [F320] [sweep: segs_dec...]
"""
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
from amv_tpu.pipeline.transcode import (transcode_complete_async,
                                        transcode_levels_fused,
                                        pick_segments, pick_sb)
from amv_tpu.codecs.amv_video import _encoder_quant_qmat_np

SAMPLE = "/root/reference/C-AMVDecoder/bin/AMV1.amv"


def times_n(fn, iters=5):
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return sorted(ts)


def main():
    F320 = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    seg_list = [int(a) for a in sys.argv[2:]] or [4]
    M320 = 300
    qk = tuple(int(v) for v in _encoder_quant_qmat_np(2))
    s = riff.read(SAMPLE)
    levels = huffman_decode_frames(s.video_chunks, 48)
    rng = np.random.default_rng(11)
    pool = np.asarray(levels).reshape(-1, 6, 64)
    lv320c = pool[rng.integers(0, len(pool), (64, M320))]
    pay320 = [huffman_encode_frame(lv320c[f]) for f in range(64)]
    reps = F320 // 64

    # host expectation for the byte gate
    lvdec = np.asarray(huffman_decode_frames(pay320, M320))
    lv2 = np.asarray(transcode_levels_fused(jnp.asarray(lvdec), 2)[0])
    want = [huffman_encode_frame(lv2[f]) for f in range(64)]

    sb = pick_sb(F320)
    segs_e = pick_segments(M320)
    ms = M320 // segs_e
    wout = min(1664, 1024 * ((ms + 47) // 48))

    # ---------------- baseline arm (r4 production) ----------------------
    rows, _ = native.unescape_frames(pay320 * reps)
    lens = np.array([len(p) for p in pay320] * reps)
    ordb = np.lexsort((np.tile(np.arange(64), reps), lens))

    @jax.jit
    def base_full(rw, salt):
        words, bits, ok = transcode_complete_async(
            rw, M320, qk, w_out=wout, win_fetch=64, win_emit=64,
            segs=segs_e, enc="async", sb=sb)
        return words, bits, (jnp.sum(words[::31, ::17]) + jnp.sum(bits) +
                             jnp.where(ok, 0, 1 << 30) + salt)

    rows_d = jax.device_put(jnp.asarray(rows[ordb]))
    jax.block_until_ready(rows_d)
    t0 = time.perf_counter()
    w0, b0, _ = base_full(rows_d, jnp.int32(0))
    print(f"baseline compile+run {time.perf_counter()-t0:.1f}s", flush=True)
    uf, up = np.unique(ordb % 64, return_index=True)
    w0u = np.asarray(w0.reshape(F320, segs_e, -1)[jnp.asarray(up)])
    b0u = np.asarray(b0.reshape(F320, segs_e)[jnp.asarray(up)])
    got0 = native.concat_escape_frames(
        w0u.reshape(-1, w0u.shape[2]), b0u.reshape(-1), segs_e)
    assert got0 == want, "baseline byte gate FAILED"
    ts = times_n(lambda: int(base_full(
        rows_d, jnp.int32(np.random.randint(1000)))[2][...]))
    print(f"baseline      : min {ts[0]*1e3:7.1f} ms = "
          f"{F320/ts[0]:7.0f} fps  (med {F320/ts[len(ts)//2]:7.0f})",
          flush=True)
    del rows_d, w0, b0

    # ---------------- segmented-decode arm -------------------------------
    for segs_d in seg_list:
        t0 = time.perf_counter()
        rows_su, lens_su = native.unescape_segment_frames(
            pay320, M320, segs_d)
        t_index = time.perf_counter() - t0
        print(f"segs_dec={segs_d}: host index+split pass "
              f"{64/t_index:,.0f} fps 320x240", flush=True)
        rows_s = np.tile(rows_su, (reps, 1))
        lens_s = np.tile(lens_su, reps)
        L = len(rows_s)
        order = np.argsort(lens_s, kind="stable")
        iperm = np.argsort(order).astype(np.int32)
        sb_s = pick_sb(L)   # segment rows saturate wider lane tiles

        # per-segment word budget: segments are ~scan/segs_d bytes, so
        # the full-frame wout (1664) triples what a lane needs AND blows
        # the 16M scoped-vmem limit at sb=32 (s32[*,1664,32,128] output
        # block = 27 MB); 512 words = 2 KB/segment, ok-gated
        wout_s = max(128, min(wout, 512))

        @jax.jit
        def seg_full(rw, sp, si, salt, segs_d=segs_d, wout_s=wout_s):
            words, bits, ok = transcode_complete_async(
                rw, M320, qk, w_out=wout_s, win_fetch=64, win_emit=64,
                enc="async", sb=sb_s, segs_dec=segs_d,
                seg_perm=sp, seg_iperm=si)
            return words, bits, (jnp.sum(words[::31, ::17]) +
                                 jnp.sum(bits) +
                                 jnp.where(ok, 0, 1 << 30) + salt)

        rows_sd = jax.device_put(jnp.asarray(rows_s[order]))
        spd = jax.device_put(jnp.asarray(iperm))
        sid = jax.device_put(jnp.asarray(order.astype(np.int32)))
        jax.block_until_ready(rows_sd)
        t0 = time.perf_counter()
        w1, b1, cs = seg_full(rows_sd, spd, sid, jnp.int32(0))
        print(f"  compile+run {time.perf_counter()-t0:.1f}s", flush=True)
        # byte gate on the unique frames (row r holds fk order[r])
        wf = np.asarray(w1)[iperm]
        bf = np.asarray(b1)[iperm]
        gotk = native.concat_escape_frames(
            wf[:64 * segs_d], bf[:64 * segs_d], segs_d)
        assert gotk == want, f"segs_dec={segs_d} byte gate FAILED"
        ts = times_n(lambda: int(seg_full(
            rows_sd, spd, sid, jnp.int32(np.random.randint(1000)))[2][...]))
        print(f"segs_dec={segs_d:2d}  : min {ts[0]*1e3:7.1f} ms = "
              f"{F320/ts[0]:7.0f} fps  (med {F320/ts[len(ts)//2]:7.0f})",
              flush=True)
        del rows_sd, w1, b1


if __name__ == "__main__":
    main()
