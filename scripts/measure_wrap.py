"""A/B the fused-transform headline subtile: materialized jnp.tile input
vs transcode_zz_wrap (wrapping BlockSpec index map, no big-slab write).

measure_fused_parts3.py decomposed the 13.7 ms subtile as tile 3.9 +
cumsum 2.0 + kernel 4.6 + assembly/checksums 3.2 — the tile stage is
pure harness replication.  The wrap variant keeps full per-frame work
(FT-frame DC cumsum, full-volume kernel input reads via (64,8,tile)
block fetches, full-size outputs, same checksum set) and drops only the
302 MB tiled-slab materialization.

Gate: the wrap body's checksum must equal the same checksum computed on
a device-materialized lane-tiled slab fed through plain transcode_zz.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/measure_wrap.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from amv_tpu.containers import riff
from amv_tpu.bitstream.entropy import huffman_decode_frames_soa
from amv_tpu.codecs.amv_video import _encoder_quant_qmat_np
from amv_tpu.kernels.transcode_pallas import transcode_zz, transcode_zz_wrap
from amv_tpu.bitstream import jpeg_tables as T

REF_AMV = "/root/reference/C-AMVDecoder/bin/AMV1.amv"
REPS = 8


def main():
    s = riff.read(REF_AMV)
    w, h = s.info.width, s.info.height
    mb_w, mb_h = (w + 15) // 16, (h + 15) // 16
    M = mb_w * mb_h
    F = 64
    K = 128
    FT = F * K
    payloads = s.video_chunks[:F]

    qk = tuple(int(v) for v in _encoder_quant_qmat_np(2))
    qdc_l = int(T.SP5X_QUANT_LUMA_ZZ[0])
    qdc_c = int(T.SP5X_QUANT_CHROMA_ZZ[0])

    cm_host = huffman_decode_frames_soa(payloads, M)
    cm_dev = jax.device_put(jnp.asarray(cm_host))
    jax.block_until_ready(cm_dev)
    n_base = F * M * 6
    nm_base = n_base // 8
    nm_full = nm_base * K
    mm6 = M * 6
    print(f"F={F} K={K} frames={FT} n_base={n_base} nm_base={nm_base}",
          flush=True)

    def dc_resolve_flat(row0):
        dcd = row0.astype(jnp.int32).reshape(FT, M, 6)
        dy = (jnp.cumsum(dcd[:, :, :4].reshape(FT, M * 4) * qdc_l,
                         axis=1).reshape(FT, M, 4) + 1024)
        dcb = jnp.cumsum(dcd[:, :, 4] * qdc_c, axis=1) + 1024
        dcr = jnp.cumsum(dcd[:, :, 5] * qdc_c, axis=1) + 1024
        return jnp.concatenate([dy, dcb[..., None], dcr[..., None]],
                               axis=-1).reshape(FT * M * 6)

    def checksum(pix, lv2):
        fsel = jnp.arange(0, FT, 97)
        Fs = fsel.shape[0]
        pf = pix.reshape(64, FT, mm6)[:, fsel]
        p = pf.reshape(8, 8, Fs, mb_h, mb_w, 6)
        yp = p[:, :, :, :, :, :4].reshape(8, 8, Fs, mb_h, mb_w, 2, 2)
        yc = yp.transpose(2, 3, 5, 0, 4, 6, 1).reshape(Fs, 16 * mb_h,
                                                       16 * mb_w)
        yv = yc[:, h - 1::-1, :w]
        return (jnp.sum(lv2[:, ::37].astype(jnp.int32)) +
                jnp.sum(yv[:, ::13, ::17].astype(jnp.int32)))

    # -- OLD: bench.py's current subtile (frame-replica jnp.tile) ----------
    def body_old(cm0, s_i):
        cm0_i = cm0.at[0, 0].add((s_i % 3).astype(jnp.int16))
        cm = jax.lax.optimization_barrier(jnp.tile(cm0_i, (1, K)))
        dc = dc_resolve_flat(cm[0])
        pix, lv2 = transcode_zz(cm, dc, qk)
        return checksum(pix, lv2)

    # -- NEW: wrap kernel; logical slab is the LANE-tiled replication ------
    def row0_lane_tiled(cm0_row0):
        return jnp.tile(cm0_row0.reshape(8, nm_base), (1, K)).reshape(-1)

    def body_new(cm0, s_i):
        cm0_i = jax.lax.optimization_barrier(
            cm0.at[0, 0].add((s_i % 3).astype(jnp.int16)))
        dc = dc_resolve_flat(row0_lane_tiled(cm0_i[0]))
        pix, lv2 = transcode_zz_wrap(cm0_i, dc, qk, repeat=K)
        return checksum(pix, lv2)

    # -- exactness gate: wrap == materialized lane-tiled, on device --------
    @jax.jit
    def gate_pair(cm0):
        dc = dc_resolve_flat(row0_lane_tiled(cm0[0]))
        tiled = jnp.tile(cm0.reshape(64, 8, nm_base), (1, 1, K)).reshape(64, -1)
        p_ref, l_ref = transcode_zz(tiled, dc, qk)
        c_ref = checksum(p_ref, l_ref)
        p_w, l_w = transcode_zz_wrap(cm0, dc, qk, repeat=K)
        c_w = checksum(p_w, l_w)
        eq = (jnp.all(p_ref == p_w) & jnp.all(l_ref == l_w))
        return c_ref, c_w, eq

    t0 = time.time()
    c_ref, c_w, eq = (int(x) for x in jax.block_until_ready(gate_pair(cm_dev)))
    print(f"gate: ref={c_ref} wrap={c_w} all_equal={bool(eq)} "
          f"(compile+run {time.time() - t0:.0f}s)", flush=True)
    assert eq and c_ref == c_w, "wrap kernel mismatch vs materialized"

    def loopify(body):
        @jax.jit
        def run(salt, cm0):
            def step(i, acc):
                return acc + body(cm0, salt + i)
            return jax.lax.fori_loop(0, REPS, step, jnp.int32(0))
        return run

    for name, body in (("OLD_tile", body_old), ("NEW_wrap", body_new)):
        fn = loopify(body)
        t0 = time.time()
        jax.block_until_ready(fn(jnp.int32(0), cm_dev))
        print(f"{name}: compile+warm {time.time() - t0:.0f}s", flush=True)
        best = 1e9
        for it in range(5):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(jnp.int32(1000 + it), cm_dev))
            dt = (time.perf_counter() - t0) / REPS
            best = min(best, dt)
        print(f"{name}: {best * 1e3:.2f} ms/subtile  "
              f"{FT / best / 1e3:.1f}K fps", flush=True)


if __name__ == "__main__":
    main()
