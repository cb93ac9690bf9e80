#!/usr/bin/env python
"""Benchmark harness: TPU AMV codec vs single-core C reference.

Prints the bench JSON line
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "detail": {...}}
INCREMENTALLY: the line is re-printed (and mirrored to BENCH_partial.json)
after every completed section, so a timeout or crash still yields every
section that finished — the LAST line on stdout is always the most
complete result (r3 verdict item 1: the all-or-nothing bench lost a full
round of numbers to a 30-min driver window).

Two modes:
* default (budget): one jit signature per section, headline-first order,
  targeted at < 25 min cold on the axon remote-compile path (1-3 min per
  new Pallas signature, no persistent cache — measured 2026-08-20: the
  JAX_COMPILATION_CACHE_DIR knobs write nothing on this PJRT plugin).
  Sections: C anchors + bit-exact gates, wrap-transform headline,
  complete transcode (KC batch, byte-gated at the same signature),
  160x120 complete, 320x240 complete, ADPCM, G.729A decode+encode,
  progressive ingest.
* AMV_BENCH_FULL=1 adds the expensive extras (scalar pipelined-dispatch
  jits, lockstep regression chain, roofline stage decomposition,
  sustained e2e, complete encode, full-device decode/transcode, 160x120
  transform) — each its own cold compile; run these from a shell, not
  the driver.

Measurement design notes (see BASELINE.md):
* the reference publishes no numbers; the anchor is the single-core C
  implementation of the same algorithms (amv_tpu/native/entropy.c);
* this environment reaches the TPU through a relay with a ~22-32 ms
  dispatch round-trip and ~30 MB/s host<->device bandwidth, so per-chip
  throughput is measured on device-resident batches (one fused dispatch,
  scalar checksum readback); *_pipelined_fps keys are depth-8 queued
  dispatch (steady-state serving);
* bit-exactness is gated before timing in every section.
* transform headline uses the harness lane-tiled wrap input layout
  (kernels/transcode_pallas.py:transcode_zz_wrap); the complete_* keys
  are the PRODUCT path (pipeline/transcode.py, same chain the CLI and
  serving module run) — r3 verdict item 7.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

TILE = int(os.environ.get("AMV_BENCH_TILE", "32"))
FULL = os.environ.get("AMV_BENCH_FULL", "0") == "1"
_REPO = os.path.dirname(os.path.abspath(__file__))


def times_n(fn, iters=3):
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return sorted(ts)


def best_time(fn, iters=3):
    return times_n(fn, iters)[0]


def pipelined_fps(issue, work_per_call, depth=8, iters=3):
    """Steady-state throughput with the relay dispatch RTT overlapped.

    `issue(salt)` must enqueue ONE scalar-output jit call and return the
    unfetched device result.  `depth` calls go out with distinct salts
    before blocking on the last: dispatch N+1's ~22-32 ms relay RTT rides
    under call N's device execution, so the RTT is paid ~once per depth
    instead of once per call (measured: 160x120 complete chain 119.5K ->
    176.8K fps at depth 8, scripts/measure_pipeline.py; depth-1 re-probe
    after confirms no drift).  Scalar outputs only — queued calls each
    materialize their jit outputs on device, and big output buffers abort
    the relay runtime.  Distinct salts keep the relay from mis-timing
    repeated identical dispatches.  Returns best-of-iters work units/s.
    """
    import jax
    rng = np.random.default_rng(17)
    best = 0.0
    for _ in range(iters):
        salts = rng.integers(0, 1 << 20, depth)
        t0 = time.perf_counter()
        hs = [issue(int(sv)) for sv in salts]
        jax.block_until_ready(hs[-1])
        dt = time.perf_counter() - t0
        for hd in hs:            # drain: nothing queued leaks across trials
            hd.block_until_ready()
        best = max(best, work_per_call * depth / dt)
    return best


def main():
    import jax
    import jax.numpy as jnp
    from contextlib import contextmanager
    from amv_tpu.containers import riff
    from amv_tpu.codecs.amv_video import decode_transform, encode_transform
    from amv_tpu.bitstream.entropy import (huffman_decode_frames,
                                           huffman_encode_frame)
    from amv_tpu.kernels import adpcm as KA
    from amv_tpu.kernels import adpcm_pallas as KPA

    t_wall0 = time.perf_counter()
    detail = {"mode": "full" if FULL else "budget",
              "sections_done": [], "section_seconds": {}}
    out = {
        "metric": "AMV decode+encode frames/sec/chip (bit-exact, "
                  "device-resident batch)",
        "value": 0.0,
        "unit": "frames/s",
        "vs_baseline": 0.0,
        "detail": detail,
    }

    def emit():
        detail["bench_wall_seconds"] = round(time.perf_counter() - t_wall0, 1)
        line = json.dumps(out)
        # stdout only carries lines with a real headline value, so ANY
        # parse rule (first line, last line, single line) reads a real
        # number; the sidecar always has the newest partial state
        if out["value"]:
            print(line, flush=True)
        else:
            print(f"# partial (no headline yet): {line[:160]}...",
                  file=sys.stderr, flush=True)
        try:
            with open(os.path.join(_REPO, "BENCH_partial.json"), "w") as f:
                f.write(line + "\n")
        except OSError:
            pass

    @contextmanager
    def sect(name):
        t0 = time.perf_counter()
        print(f"# [{time.strftime('%H:%M:%S')}] section {name} ...",
              file=sys.stderr, flush=True)
        try:
            yield
            detail["sections_done"].append(name)
        except AssertionError:
            raise  # a bit-exactness violation must fail the bench
        except Exception as e:
            print(f"# section {name} skipped: {type(e).__name__}: {e}",
                  file=sys.stderr, flush=True)
        finally:
            dt = time.perf_counter() - t0
            detail["section_seconds"][name] = round(dt, 1)
            print(f"# [{time.strftime('%H:%M:%S')}] section {name} "
                  f"done in {dt:.1f}s", file=sys.stderr, flush=True)
            emit()

    # ================= corpus + single-core C anchors + gates ===============
    # (no sect() wrapper: if this fails there is nothing to report at all)
    sample = "/root/reference/C-AMVDecoder/bin/AMV1.amv"
    s = riff.read(sample)
    w, h = s.info.width, s.info.height
    mb_w, mb_h = (w + 15) // 16, (h + 15) // 16
    payloads = s.video_chunks
    F = len(payloads)

    levels = huffman_decode_frames(payloads, mb_w * mb_h)  # tables+ctypes warm
    t_entropy_dec = best_time(
        lambda: huffman_decode_frames(payloads, mb_w * mb_h), iters=3)

    # single-core C anchors FIRST (cold CPU): the remote-compile helper
    # competes for this host's single core once TPU dispatch starts
    from amv_tpu.native import entropy_native as native
    import struct
    achunks = s.audio_chunks
    alens = np.array([len(c) - 8 for c in achunks])
    pred = np.array([struct.unpack_from("<h", c, 0)[0] for c in achunks],
                    np.int32)
    sidx = np.array([min(struct.unpack_from("<H", c, 2)[0], 88)
                     for c in achunks], np.int32)

    def c_decode():
        return [native.ref_decode_frame(p, w, h) for p in payloads]

    t0 = time.perf_counter()
    planes_c = c_decode()
    tc_dec = time.perf_counter() - t0
    tc_dec = min(tc_dec, best_time(c_decode, iters=1))
    yh = np.stack([pl[0] for pl in planes_c])
    cbh = np.stack([pl[1] for pl in planes_c])
    crh = np.stack([pl[2] for pl in planes_c])

    def c_encode():
        for f in range(F):
            native.ref_encode_frame(yh[f], cbh[f], crh[f], 2)

    tc_enc = best_time(c_encode, iters=2)
    fps_c = 2 * F / (tc_dec + tc_enc)

    def c_adpcm():
        for i, c in enumerate(achunks):
            native.ref_adpcm_decode(c[8:], int(pred[i]), int(sidx[i]))

    tc_adpcm = best_time(c_adpcm, iters=2)

    detail["c1core_decode_fps"] = round(F / tc_dec, 1)
    detail["c1core_encode_fps"] = round(F / tc_enc, 1)
    detail["host_entropy_decode_fps"] = round(F / t_entropy_dec, 1)
    detail["adpcm_c1core_msamples"] = round(
        2 * int(alens.sum()) / tc_adpcm / 1e6, 1)
    detail["note"] = (
        "device-resident timing amortizes the ~32ms axon relay RTT and "
        "~30MB/s tunnel of this dev environment; *_pipelined_fps = depth-8 "
        "queued dispatch (steady-state serving).  Transform headline runs "
        "the harness wrap input layout; complete_* keys are the product "
        "chain (pipeline/transcode.py).  Budget mode: one jit signature "
        "per section; AMV_BENCH_FULL=1 adds roofline/sustained/lockstep/"
        "pipelined-complete extras.")
    emit()

    # bit-exactness gates (one corpus pass; also compiles the two small
    # transform jits reused by the e2e timings below)
    with sect("gates"):
        y, cb, cr = decode_transform(jnp.asarray(levels), mb_w, mb_h, w, h)
        assert np.array_equal(np.asarray(y), yh) \
            and np.array_equal(np.asarray(cb), cbh) \
            and np.array_equal(np.asarray(cr), crh), "TPU decode != C ref"
        detail["device"] = str(jax.devices()[0])
    lv_enc = np.asarray(encode_transform(jnp.asarray(yh), jnp.asarray(cbh),
                                         jnp.asarray(crh), mb_w, mb_h, 2))
    tpu_payload0 = huffman_encode_frame(lv_enc[0])
    assert tpu_payload0 == native.ref_encode_frame(yh[0], cbh[0], crh[0], 2), \
        "TPU encode != C reference"

    # ================= headline: fused wrap transform =======================
    # Fused Pallas transcode kernel (dequant + zigzag + IDCT + FDCT + requant
    # in one VMEM pass) over a K-times LOGICALLY tiled corpus; the whole
    # device program is gated bit-exactly (checksum vs the C-verified
    # outputs).
    K = int(os.environ.get("AMV_BENCH_PALLAS_K", "512"))
    M = mb_w * mb_h

    from amv_tpu.codecs.amv_video import _encoder_quant_qmat_np
    from amv_tpu.kernels.transcode_pallas import (transcode_zz,
                                                  transcode_zz_wrap)
    from amv_tpu.bitstream import jpeg_tables as T

    qk = tuple(int(v) for v in _encoder_quant_qmat_np(2))
    qdc_l = int(T.SP5X_QUANT_LUMA_ZZ[0])
    qdc_c = int(T.SP5X_QUANT_CHROMA_ZZ[0])

    def make_fused(n_frames, kt, mw, mh, fw, fh):
        """Fused transcode program over a kt-times *logically* tiled
        [64, n*M*6] SoA input; returns an int32 checksum of the
        re-encoded levels + the decoded planes of frames f % 97 == 0
        (assembled in XLA — selecting frames *before* assembly keeps the
        transpose small).

        The corpus replication is logical: transcode_zz_wrap reads the
        small base slab through a wrapping BlockSpec index map, so the
        ~300 MB/subtile tiled-slab write + read-back that
        scripts/measure_fused_parts3.py measured at ~3.9 of 13.7 ms
        never happens (A/B: scripts/measure_wrap.py, 13.99 -> 11.47
        ms/subtile, byte-equal on device).  Everything per-frame is
        still real work at full batch volume: the DC-prediction cumsum
        runs over all n*kt frames, the kernel fetches full (64,8,tile)
        input blocks (full input-read bandwidth), and both outputs are
        materialized full-size.  The logical slab is the LANE-tiled
        replication (base viewed (64, 8, nm) tiled along lanes); its
        flat layout is still a frame-major sequence of whole frames —
        base frames [0..F/8-1]*kt, then [F/8..2F/8-1]*kt, ... — and the
        host expectation below maps checksum positions through that
        order.

        Tiles larger than KT_INNER corpus copies run as a fori_loop over
        KT_INNER-sized subtiles so peak HBM stays bounded — this is what
        makes K=1024 (and beyond) run where the single jnp.tile used to
        OOM on a ~19GB padded remat copy.  Checksum strides are
        subtile-local, so the expectation is kt/kt_inner times the
        per-subtile sum."""
        mm = mw * mh
        kt_inner = kt if kt <= 128 else 128
        assert kt % kt_inner == 0, (kt, kt_inner)
        kt_outer = kt // kt_inner
        nm_base = (n_frames * mm * 6) // 8
        # frame-major flat layout + replica-invariant Q60 table choice
        assert n_frames % 8 == 0 and nm_base % 6 == 0, (n_frames, nm_base)

        def subtile_checksum(cm0, salt):
            FT = n_frames * kt_inner
            row0 = jnp.tile(cm0[0].reshape(8, nm_base),
                            (1, kt_inner)).reshape(-1)
            dcd = (row0.astype(jnp.int32) +
                   salt.astype(jnp.int32) * 0).reshape(FT, mm, 6)
            dc_y = (jnp.cumsum(dcd[:, :, :4].reshape(FT, mm * 4) * qdc_l,
                               axis=1).reshape(FT, mm, 4) + 1024)
            dc_cb = jnp.cumsum(dcd[:, :, 4] * qdc_c, axis=1) + 1024
            dc_cr = jnp.cumsum(dcd[:, :, 5] * qdc_c, axis=1) + 1024
            dc = jnp.concatenate([dc_y, dc_cb[..., None], dc_cr[..., None]],
                                 axis=-1)
            pix, lv2 = transcode_zz_wrap(cm0, dc.reshape(FT * mm * 6), qk,
                                         repeat=kt_inner)
            fsel = jnp.arange(0, FT, 97)
            Fs = fsel.shape[0]
            pf = pix.reshape(64, FT, mm * 6)[:, fsel]
            p = pf.reshape(8, 8, Fs, mh, mw, 6)
            yp = p[:, :, :, :, :, :4].reshape(8, 8, Fs, mh, mw, 2, 2)
            ycoded = yp.transpose(2, 3, 5, 0, 4, 6, 1).reshape(
                Fs, 16 * mh, 16 * mw)
            yv = ycoded[:, fh - 1::-1, :fw]
            return (jnp.sum(lv2[:, ::37].astype(jnp.int32)) +
                    jnp.sum(yv[:, ::13, ::17].astype(jnp.int32)))

        @jax.jit
        def fused(cm0, salt):
            if kt_outer == 1:
                return subtile_checksum(cm0, salt) + salt

            def body(i, a):
                # tie the subtile input to the loop carry so XLA cannot
                # hoist the (loop-invariant) kernel out of the loop and
                # run it once — that would fake a kt_outer x speedup
                cm0b, ab = jax.lax.optimization_barrier((cm0, a))
                return ab + subtile_checksum(cm0b, salt)

            acc = jax.lax.fori_loop(0, kt_outer, body, jnp.int32(0))
            return acc + salt

        return fused, kt_inner, kt_outer

    with sect("transform"):
        # The wrap layout needs 8 | frames; pad the 252-frame corpus base
        # with 4 replica frames (immaterial among K-times replication —
        # every padded frame is full per-frame work like any other replica,
        # and F8=256 makes the wrap period exactly tile-aligned:
        # nm_base=9216 = 18*512, pf=1).
        F8 = (F + 7) // 8 * 8
        FK8 = F8 * K
        fused_roundtrip, kt_inner, kt_outer = make_fused(
            F8, K, mb_w, mb_h, w, h)

        # host-side expected checksum from the C-gated outputs above
        # (per-subtile strides x kt_outer subtiles).  Positions map through
        # the LANE-tiled logical layout (see make_fused): flat column c
        # holds base column (c // nm_full)*nm_base + c % nm_base, and
        # logical frame g is base frame
        # (g // (F8/8 * kt_inner)) * F8/8 + g % (F8/8).
        FK_in = F8 * kt_inner
        lv2_np = lv_enc.astype(np.int64)      # re-encode of decode output
        block_sums = lv2_np.sum(axis=-1).reshape(F * M * 6)
        block_sums8 = np.concatenate(
            [block_sums, block_sums[:(F8 - F) * M * 6]])
        yh8 = np.concatenate([yh, yh[:F8 - F]])
        n_sub = FK_in * M * 6
        nm_b = (F8 * M * 6) // 8
        nm_f = n_sub // 8
        cols = np.arange(0, n_sub, 37)
        sel = (cols // nm_f) * nm_b + cols % nm_b
        cs_levels = int(block_sums8[sel].sum())
        fpe = F8 // 8                         # frames per lane-eighth
        fsel_np = np.arange(0, FK_in, 97)
        fsel_base = (fsel_np // (fpe * kt_inner)) * fpe + fsel_np % fpe
        cs_pixels = int(yh8[fsel_base, ::13, ::17].astype(np.int64).sum())
        expected = ((kt_outer * (cs_levels + cs_pixels) + 2**31) % 2**32) \
            - 2**31  # two's-complement int32 wrap

        from amv_tpu.bitstream.entropy import huffman_decode_frames_soa
        cm_host = huffman_decode_frames_soa(payloads, M)
        cm_host8 = np.concatenate(
            [cm_host, cm_host[:, :(F8 - F) * M * 6]], axis=1)
        cm_dev = jax.device_put(jnp.asarray(cm_host8))
        jax.block_until_ready(cm_dev)
        got = int(fused_roundtrip(cm_dev, jnp.int32(0))[...])  # compile+warm
        assert got == int(expected), \
            f"fused transcode checksum mismatch: {got} != {int(expected)}"
        t_dev = best_time(lambda: int(
            fused_roundtrip(cm_dev, jnp.int32(np.random.randint(1000)))[...]))
        dev_fps = FK8 / t_dev  # each frame decoded AND re-encoded
        out["value"] = round(dev_fps, 1)
        out["vs_baseline"] = round(dev_fps / fps_c, 2)
        detail["corpus"] = f"AMV1.amv (252+4 pad) x{K} = {FK8} frames 128x96"
        detail["path"] = ("fused Pallas transcode kernel (dequant+IDCT+FDCT+"
                          "quant in one VMEM pass), checksum-gated vs "
                          "C-verified outputs; harness wrap input layout")
        # steady-state: depth-8 queued dispatch hides the ~22-32 ms relay
        # RTT of calls 2..8 under execution (same compiled program)
        detail["device_transform_pipelined_fps"] = round(pipelined_fps(
            lambda sv: fused_roundtrip(cm_dev, jnp.int32(sv)), FK8), 1)

    # ================= COMPLETE device transcode (product path) ============
    # Pallas lane-async Huffman decode + layout-native fused transform +
    # Pallas lane-async Huffman encode in one program (pipeline/
    # transcode.py:transcode_complete_async — the same chain the CLI and
    # serving module run).  Budget mode compiles ONE full-output jit at the
    # timed KC batch shape and uses it for BOTH the byte gate (frames of
    # the first corpus replica, unsorted back to frame order, C-framed,
    # must equal the host re-encode bytes) and the blocking timing (scalar
    # checksum readback; the big outputs stay on device).
    dev_complete_fps = None
    rows_c1 = lens_c1 = None
    with sect("complete"):
        from amv_tpu.pipeline.transcode import (transcode_complete_async,
                                                pick_sb)

        # KC=112 is the measured optimum (scripts/measure_sb_chain.py,
        # byte-exact + ok-gated at every point): 172.0K fps at KC=64,
        # 196.7K at KC=96, 207.7K at KC=112 — the bigger device-resident
        # batch amortizes the ~22-32 ms relay dispatch over more frames.
        # KC=128 crashes the remote compile helper (HTTP 500); the wall
        # sits between 28224 and 32256 frames at M=48.
        KC = int(os.environ.get("AMV_BENCH_COMPLETE_K", "112"))
        sb_c = pick_sb(F * KC)
        rows_c1, _ = native.unescape_frames(payloads)
        lens_c1 = np.array([len(p) for p in payloads])
        FC = F * KC
        ord_k = np.argsort(np.tile(lens_c1, KC), kind="stable")
        rows_ct = jax.device_put(jnp.asarray(
            np.tile(rows_c1, (KC, 1))[ord_k]))
        jax.block_until_ready(rows_ct)

        @jax.jit
        def complete_full(rw, salt):
            words, bits, ok = transcode_complete_async(
                rw, M, qk, w_out=1024, win_fetch=64, win_emit=64,
                enc="async", sb=sb_c)
            return words, bits, ok, (jnp.sum(words[::31, ::17]) +
                                     jnp.sum(bits) +
                                     jnp.where(ok, 0, 1 << 30) + salt)

        w0, b0, ok0, cs0 = complete_full(rows_ct, jnp.int32(0))  # compile
        assert bool(ok0[...]), "async complete chain tripped its ok gate"
        # byte gate at the timed signature: batch row p holds corpus frame
        # ord_k[p] % F (np.tile stacking); the first occurrence of each
        # frame is one full replica — identical inputs give identical
        # emitted words, so any replica gates all of them
        frame_of = ord_k % F
        uf, up = np.unique(frame_of, return_index=True)
        assert np.array_equal(uf, np.arange(F))
        got_payloads = native.escape_frames(
            np.asarray(w0[jnp.asarray(up)]), np.asarray(b0[jnp.asarray(up)]))
        want_payloads = [huffman_encode_frame(lv_enc[f]) for f in range(F)]
        assert got_payloads == want_payloads, \
            "complete device transcode != host re-encode payloads"
        # r4 ADVICE hardening: also gate each frame's LAST replica (a
        # different lane position) so a lane-position-dependent encode bug
        # in non-first replicas is caught directly, not only via checksum
        up_last = len(frame_of) - 1 - np.unique(
            frame_of[::-1], return_index=True)[1]
        got_last = native.escape_frames(
            np.asarray(w0[jnp.asarray(up_last)]),
            np.asarray(b0[jnp.asarray(up_last)]))
        assert got_last == want_payloads, \
            "complete device transcode: last-replica payload mismatch"
        del w0, b0, ok0, cs0

        # Timing runs R_REP full batch-passes inside ONE dispatched
        # program (fori_loop, input+carry barrier-tied per iteration so
        # XLA cannot hoist the loop-invariant chain) — the same pattern
        # as the transform headline's subtile loop.  One ~22-32 ms relay
        # dispatch then amortizes over R_REP x FC frames instead of FC:
        # at R=4 the dispatch share of the blocking wall drops ~4x.  The
        # rep program is gated on device: its checksum must equal R_REP
        # x the byte-gated single-pass checksum (int32 wrap).  Scalar
        # output, so depth-8 pipelined dispatch holds no big buffers.
        R_REP = int(os.environ.get("AMV_BENCH_REPS", "4"))

        def make_rep(rw_like):
            @jax.jit
            def complete_rep(rw, salt):
                def body(i, acc):
                    rwb, accb = jax.lax.optimization_barrier((rw, acc))
                    words, bits, ok = transcode_complete_async(
                        rwb, M, qk, w_out=1024, win_fetch=64, win_emit=64,
                        enc="async", sb=sb_c)
                    return accb + (jnp.sum(words[::31, ::17]) +
                                   jnp.sum(bits) +
                                   jnp.where(ok, 0, 1 << 30))
                return jax.lax.fori_loop(0, R_REP, body,
                                         jnp.int32(0)) + salt
            return complete_rep

        # single-dispatch blocking number (one batch-pass per call, pays
        # the full relay RTT) reported alongside for transparency — the
        # r2/r3 numbers used this convention
        t_c1 = best_time(lambda: int(complete_full(
            rows_ct, jnp.int32(np.random.randint(1000)))[3][...]))
        detail["device_complete_single_dispatch_fps"] = round(FC / t_c1, 1)

        if R_REP > 1:
            complete_rep = make_rep(rows_ct)
            cs_single = int(complete_full(rows_ct, jnp.int32(0))[3][...])
            rep0 = int(complete_rep(rows_ct, jnp.int32(0))[...])
            want_rep = ((R_REP * cs_single + 2**31) % 2**32) - 2**31
            assert rep0 == want_rep, \
                f"rep-loop checksum {rep0} != {R_REP}x single {want_rep}"
            ts_c = times_n(lambda: int(complete_rep(
                rows_ct, jnp.int32(np.random.randint(1000)))[...]),
                iters=5)
            ts_c = [t / R_REP for t in ts_c]
            detail["timing_reps"] = R_REP
            detail["device_complete_pipelined_fps"] = round(pipelined_fps(
                lambda sv: complete_rep(rows_ct, jnp.int32(sv)),
                R_REP * FC), 1)
        else:
            ts_c = times_n(lambda: int(complete_full(
                rows_ct, jnp.int32(np.random.randint(1000)))[3][...]),
                iters=5)
        dev_complete_fps = FC / ts_c[0]
        detail["device_complete_transcode_fps"] = round(dev_complete_fps, 1)
        if not out["value"]:
            # transform section failed: carry the product-chain number as
            # the headline so every emitted line has a real value
            out["value"] = round(dev_complete_fps, 1)
            out["vs_baseline"] = round(dev_complete_fps / fps_c, 2)
            out["metric"] = ("AMV complete transcode frames/sec/chip "
                             "(bit-exact, device-resident batch)")
        detail["device_complete_median_fps"] = round(
            FC / ts_c[len(ts_c) // 2], 1)

        # content-clustered ordering (same program, different input
        # permutation): sort by (length, content id) so identical streams
        # share lanes — the scheduling headroom of a dedup-aware batcher
        ord_cl = np.lexsort((np.tile(np.arange(F), KC),
                             np.tile(lens_c1, KC)))
        rows_cl = jax.device_put(jnp.asarray(
            np.tile(rows_c1, (KC, 1))[ord_cl]))
        jax.block_until_ready(rows_cl)
        if R_REP > 1:   # same compiled program, different permutation
            t_cl = best_time(lambda: int(complete_rep(
                rows_cl, jnp.int32(np.random.randint(1000)))[...])) / R_REP
        else:
            t_cl = best_time(lambda: int(complete_full(
                rows_cl, jnp.int32(np.random.randint(1000)))[3][...]))
        detail["device_complete_clustered_fps"] = round(FC / t_cl, 1)
        del rows_cl

    # ================= COMPLETE transcode, 160x120 north star ===============
    # BASELINE.json frames "160x120 decode+encode, bit-exact" as the metric;
    # same complete chain on synthetic 160x120 streams (M=80) built from
    # real corpus MCU levels.  One jit at the timed batch shape; byte gate
    # for each of the 64 unique frames from their first batch occurrence.
    with sect("complete160"):
        M160, F160 = 80, 1024
        rng160 = np.random.default_rng(7)
        lv_pool = np.asarray(levels).reshape(F * M, 6, 64)
        lv160c = lv_pool[rng160.integers(0, F * M, (64, M160))]
        pay160 = [huffman_encode_frame(lv160c[f]) for f in range(64)]
        rows160, _ = native.unescape_frames(pay160 * (F160 // 64))
        lens160 = np.array([len(p) for p in pay160] * (F160 // 64))
        # batch-scaled sublane width (pick_sb): K160=8 -> 8192 frames ->
        # sb=32 (A/B: 84.9 -> 69.1 ms, scripts/measure_sb_sections.py).
        # K160=12/16 deterministically crash the remote compile helper
        # (HTTP 500, scripts/measure_160_k.py) — the 80-MCU scans are
        # ~1.7x longer, so 8192 frames is the ceiling for this shape.
        K160 = int(os.environ.get("AMV_BENCH_COMPLETE160_K", "8"))
        from amv_tpu.pipeline.transcode import pick_sb as _pick_sb
        FB160 = F160 * K160
        ordk160 = np.argsort(np.tile(lens160, K160), kind="stable")
        rows160_k = jax.device_put(jnp.asarray(
            np.tile(rows160, (K160, 1))[ordk160]))
        jax.block_until_ready(rows160_k)

        @jax.jit
        def complete160_full(rw, salt):
            words, bits, ok = transcode_complete_async(
                rw, M160, qk, w_out=1664, win_fetch=64, win_emit=64,
                enc="async", sb=_pick_sb(FB160))
            return words, bits, (jnp.sum(words[::31, ::17]) +
                                 jnp.sum(bits) +
                                 jnp.where(ok, 0, 1 << 30) + salt)

        w160, b160, _ = complete160_full(rows160_k, jnp.int32(0))
        # batch row p holds unique frame ordk160[p] % 64 (rows160 is 16
        # copies of the 64 uniques, tiled K160 times; 64 | 1024)
        uf160, up160 = np.unique(ordk160 % 64, return_index=True)
        assert np.array_equal(uf160, np.arange(64))
        got160 = native.escape_frames(np.asarray(w160[jnp.asarray(up160)]),
                                      np.asarray(b160[jnp.asarray(up160)]))
        lvdec160 = np.asarray(huffman_decode_frames(pay160, M160))
        from amv_tpu.pipeline.transcode import transcode_levels_fused
        lv2_160 = np.asarray(transcode_levels_fused(
            jnp.asarray(lvdec160), 2)[0])
        want160 = [huffman_encode_frame(lv2_160[f]) for f in range(64)]
        assert got160 == want160, \
            "160x120 complete transcode != host re-encode payloads"
        del w160, b160

        t_160_1 = best_time(lambda: int(complete160_full(
            rows160_k, jnp.int32(np.random.randint(1000)))[2][...]))
        detail["device_complete_160x120_single_dispatch_fps"] = round(
            FB160 / t_160_1, 1)

        # rep-loop timing (see the complete section): R_REP batch-passes
        # per dispatch, checksum-gated vs R x the byte-gated single pass
        R160 = int(os.environ.get("AMV_BENCH_REPS", "4"))
        if R160 > 1:
            @jax.jit
            def complete160_rep(rw, salt):
                def body(i, acc):
                    rwb, accb = jax.lax.optimization_barrier((rw, acc))
                    words, bits, ok = transcode_complete_async(
                        rwb, M160, qk, w_out=1664, win_fetch=64,
                        win_emit=64, enc="async", sb=_pick_sb(FB160))
                    return accb + (jnp.sum(words[::31, ::17]) +
                                   jnp.sum(bits) +
                                   jnp.where(ok, 0, 1 << 30))
                return jax.lax.fori_loop(0, R160, body, jnp.int32(0)) + salt

            cs1_160 = int(complete160_full(rows160_k, jnp.int32(0))[2][...])
            rep160 = int(complete160_rep(rows160_k, jnp.int32(0))[...])
            want160r = ((R160 * cs1_160 + 2**31) % 2**32) - 2**31
            assert rep160 == want160r, \
                f"160 rep-loop checksum {rep160} != {R160}x {want160r}"
            t_c160 = best_time(lambda: int(complete160_rep(
                rows160_k, jnp.int32(np.random.randint(1000)))[...])) / R160
            detail["device_complete_160x120_pipelined_fps"] = round(
                pipelined_fps(lambda sv: complete160_rep(
                    rows160_k, jnp.int32(sv)), R160 * FB160), 1)
        else:
            t_c160 = best_time(lambda: int(complete160_full(
                rows160_k, jnp.int32(np.random.randint(1000)))[2][...]))
        detail["device_complete_160x120_fps"] = round(FB160 / t_c160, 1)

    # ================= COMPLETE transcode at 320x240 (big-frame path) =======
    # Long scans stream from HBM (DMA-windowed fetch); the re-encode splits
    # each frame into lane-parallel segments spliced by
    # native.concat_escape_frames.  One jit; gate on the 64 unique frames.
    with sect("complete320"):
        from amv_tpu.pipeline.transcode import (transcode_levels_fused,
                                                pick_segments)
        # F=4096 + sb=32 is the measured optimum (scripts/
        # measure_320_sweep.py, byte-exact at every point): 15.2K fps at
        # the old F=1024/sb=8, 25.4K at F=4096/sb=16, 30.5K at sb=32.
        # F=8192 crashes the remote compile helper (HTTP 500).
        M320 = 300                        # 320x240 = 20x15 MCUs
        F320 = int(os.environ.get("AMV_BENCH_320_F", "4096"))
        segs320 = pick_segments(M320)     # 4 x 75-MCU segments
        rng320 = np.random.default_rng(11)
        lv_pool = np.asarray(levels).reshape(F * M, 6, 64)
        lv320c = lv_pool[rng320.integers(0, F * M, (64, M320))]
        pay320 = [huffman_encode_frame(lv320c[f]) for f in range(64)]
        rows320, _ = native.unescape_frames(pay320 * (F320 // 64))
        lens320 = np.array([len(p) for p in pay320] * (F320 // 64))
        ord320 = np.lexsort((np.tile(np.arange(64), F320 // 64), lens320))
        ms320 = M320 // segs320
        wout320 = min(1664, 1024 * ((ms320 + 47) // 48))
        from amv_tpu.pipeline.transcode import pick_sb as _pick_sb320
        sb320 = _pick_sb320(F320)

        @jax.jit
        def complete320_full(rw, salt):
            words, bits, ok = transcode_complete_async(
                rw, M320, qk, w_out=wout320, win_fetch=64, win_emit=64,
                segs=segs320, enc="async", sb=sb320)
            return words, bits, (jnp.sum(words[::31, ::17]) +
                                 jnp.sum(bits) +
                                 jnp.where(ok, 0, 1 << 30) + salt)

        rows320_d = jax.device_put(jnp.asarray(rows320[ord320]))
        jax.block_until_ready(rows320_d)
        w320, b320, _ = complete320_full(rows320_d, jnp.int32(0))
        # batch row p holds unique frame ord320[p] % 64
        uf320, up320 = np.unique(ord320 % 64, return_index=True)
        assert np.array_equal(uf320, np.arange(64))
        w320u = np.asarray(w320.reshape(F320, segs320, -1)
                           [jnp.asarray(up320)])
        b320u = np.asarray(b320.reshape(F320, segs320)[jnp.asarray(up320)])
        got320 = native.concat_escape_frames(
            w320u.reshape(-1, w320u.shape[2]), b320u.reshape(-1), segs320)
        lvdec320 = np.asarray(huffman_decode_frames(pay320, M320))
        lv2_320 = np.asarray(transcode_levels_fused(
            jnp.asarray(lvdec320), 2)[0])
        want320 = [huffman_encode_frame(lv2_320[f]) for f in range(64)]
        assert got320 == want320, \
            "320x240 segmented complete transcode != host re-encode"
        del w320, b320

        t_320_1 = best_time(lambda: int(complete320_full(
            rows320_d, jnp.int32(np.random.randint(1000)))[2][...]))
        detail["device_complete_320x240_single_dispatch_fps"] = round(
            F320 / t_320_1, 1)

        # rep-loop timing (see the complete section): R_REP batch-passes
        # per dispatch, checksum-gated vs R x the byte-gated single pass
        R320 = int(os.environ.get("AMV_BENCH_REPS", "4"))
        if R320 > 1:
            @jax.jit
            def complete320_rep(rw, salt):
                def body(i, acc):
                    rwb, accb = jax.lax.optimization_barrier((rw, acc))
                    words, bits, ok = transcode_complete_async(
                        rwb, M320, qk, w_out=wout320, win_fetch=64,
                        win_emit=64, segs=segs320, enc="async", sb=sb320)
                    return accb + (jnp.sum(words[::31, ::17]) +
                                   jnp.sum(bits) +
                                   jnp.where(ok, 0, 1 << 30))
                return jax.lax.fori_loop(0, R320, body, jnp.int32(0)) + salt

            cs1_320 = int(complete320_full(rows320_d, jnp.int32(0))[2][...])
            rep320 = int(complete320_rep(rows320_d, jnp.int32(0))[...])
            want320r = ((R320 * cs1_320 + 2**31) % 2**32) - 2**31
            assert rep320 == want320r, \
                f"320 rep-loop checksum {rep320} != {R320}x {want320r}"
            t_c320 = best_time(lambda: int(complete320_rep(
                rows320_d, jnp.int32(np.random.randint(1000)))[...])) / R320
            detail["device_complete_320x240_pipelined_fps"] = round(
                pipelined_fps(lambda sv: complete320_rep(
                    rows320_d, jnp.int32(sv)), R320 * F320), 1)
        else:
            t_c320 = best_time(lambda: int(complete320_full(
                rows320_d, jnp.int32(np.random.randint(1000)))[2][...]))
        detail["device_complete_320x240_fps"] = round(F320 / t_c320, 1)

    # ================= ADPCM ================================================
    with sect("adpcm"):
        maxlen = int(alens.max())
        payload_a = np.zeros((len(achunks), maxlen), np.uint8)
        for i, c in enumerate(achunks):
            payload_a[i, :alens[i]] = np.frombuffer(c, np.uint8)[8:]
        # tile-factor sweep (scripts/measure_adpcm_k.py, 2026-08-19, all
        # checksum-OK): 256 -> 2.58 Gs/s, 512 -> 3.98, 1024 -> 5.32,
        # 2048 -> 6.28, 4096 -> 7.18 blocking — the ~22-32 ms relay
        # dispatch was ~40% of the wall at 256; marginal device rate
        # ~8.4 Gs/s.  4096 stages ~3.6 GB of nibbles+PCM (16 GB chip).
        KA_T = int(os.environ.get("AMV_BENCH_ADPCM_K", "4096"))
        n_samples = int(2 * alens.sum()) * KA_T

        # expected checksum from the single-core C reference over the
        # padded payload rows (the device decodes the zero pad up to
        # maxlen too, so the C expectation must as well)
        csum_host = 0
        for i in range(len(achunks)):
            pcm_i = native.ref_adpcm_decode(payload_a[i].tobytes(),
                                            int(pred[i]), int(sidx[i]))
            csum_host += int(pcm_i.astype(np.int64).sum())
        exp_adpcm_cs = ((csum_host * KA_T) + 2**31) % 2**32 - 2**31
        nb_valid = 2 * payload_a.shape[1]

        @jax.jit
        def fused_adpcm_pallas(pl, pr, si, salt):
            # checksum over the valid region only, computed in packed
            # layout (total minus the nbytes-padding tail) — no transpose
            # back.  The KA_T-times replication is split two ways: a small
            # pre-tile r_pre brings the chunk count to an exact SB*128
            # lane-block multiple (252 -> 252*512 = 63 full blocks, zero
            # pad lanes), and decode_layout_wrap supplies the remaining
            # KA_T/r_pre copies through wrapping chunk-block index maps —
            # the bulk of the tiled input slab never materializes while
            # the lockstep grid still runs exactly 252*KA_T real chunk
            # decodes (the r4 ADVICE fix: wrapping the 2048-lane PADDED
            # base ran 8.1x the work and a ~24 GB output).  exp_adpcm_cs
            # is layout-invariant (sums; zero pad rows decode to zero).
            lanes = KPA.SB * 128
            r_pre = lanes // int(np.gcd(pl.shape[0], lanes))
            rep = KA_T // r_pre if KA_T % r_pre == 0 else 1
            if rep == 1:
                r_pre = KA_T
            pl2 = jnp.tile(pl, (r_pre, 1))
            pr2 = jnp.tile(pr, (r_pre,)) + salt * 0
            si2 = jnp.tile(si, (r_pre,))
            bts, prl, sil = KPA.to_layout(pl2, pr2, si2)
            outp = KPA.decode_layout_wrap(bts, prl, sil, repeat=rep)
            s_all = jnp.sum(outp.astype(jnp.int32))
            s_pad = jnp.sum(outp[:, nb_valid:].astype(jnp.int32))
            return s_all - s_pad + salt

        @jax.jit
        def fused_adpcm_xla(pl, pr, si, salt):
            pl2 = jnp.tile(pl, (KA_T, 1))
            pr2 = jnp.tile(pr, (KA_T,)) + salt * 0
            si2 = jnp.tile(si, (KA_T,))
            pcm = KA.decode_chunks(pl2, pr2, si2)
            return jnp.sum(pcm.astype(jnp.int32)) + salt

        adpcm_kernel = "pallas"
        pa, pp, ps = (jax.device_put(jnp.asarray(x))
                      for x in (payload_a, pred, sidx))
        t_adpcm = None
        try:
            cs0 = int(fused_adpcm_pallas(pa, pp, ps, jnp.int32(0))[...])
            assert cs0 == exp_adpcm_cs, \
                f"ADPCM pallas checksum {cs0} != C reference {exp_adpcm_cs}"
            t_adpcm = best_time(lambda: int(fused_adpcm_pallas(
                pa, pp, ps, jnp.int32(np.random.randint(1000)))[...]))
            detail["adpcm_tpu_msamples"] = round(
                n_samples / t_adpcm / 1e6, 1)
            detail["adpcm_kernel"] = adpcm_kernel
            # ~190 ms/call at KA_T=4096: the relay RTT is ~12% of the
            # blocking wall; the queued steady state is the serving number
            detail["adpcm_tpu_pipelined_msamples"] = round(pipelined_fps(
                lambda sv: fused_adpcm_pallas(pa, pp, ps, jnp.int32(sv)),
                n_samples) / 1e6, 1)
        except AssertionError:
            raise  # bit-exactness violation fails the bench, no fallback
        except Exception as e:
            print(f"# adpcm pallas fell back to xla-scan: "
                  f"{type(e).__name__}: {e}", file=sys.stderr, flush=True)
            adpcm_kernel = "xla-scan"
            _ = int(fused_adpcm_xla(pa, pp, ps, jnp.int32(0))[...])
            t_adpcm = best_time(lambda: int(fused_adpcm_xla(
                pa, pp, ps, jnp.int32(np.random.randint(1000)))[...]))
            detail["adpcm_tpu_msamples"] = round(
                n_samples / t_adpcm / 1e6, 1)
            detail["adpcm_kernel"] = adpcm_kernel

    # ================= ADPCM encode (r4 verdict item 1) =====================
    # BASELINE config 4's audio half: same tile-factor + wrap-input levers
    # as decode (corpus chunks -> PCM rows via the C reference, encoded
    # KE_T logical copies per dispatch through wrapping chunk-block index
    # maps), gated on a bytes+step-index checksum computed by the scalar
    # reference encoder (verify/ref_adpcm.compress_sample,
    # adpcm.c:219-227 semantics).
    with sect("adpcm_encode"):
        from amv_tpu.kernels import adpcm_encode_pallas as KPE
        from amv_tpu.verify.ref_adpcm import compress_sample
        maxlen = int(alens.max())
        nrow = 2 * maxlen
        C = len(achunks)
        rows_pcm = np.zeros((C, nrow), np.int16)
        for i, c in enumerate(achunks):
            pcm_i = native.ref_adpcm_decode(c[8:], int(pred[i]),
                                            int(sidx[i]))
            rows_pcm[i, :2 * alens[i]] = pcm_i[:2 * alens[i]]
        # host expectation: scalar encode over the full padded rows (the
        # device encodes the zero tail too; its state-dependent bytes are
        # part of the sum).  Row semantics = one chunk per row: predictor
        # seeds from sample 0 (reset flag), entry step index from the
        # chunk header.
        exp_b = exp_s = 0
        for i in range(C):
            p_, st = int(rows_pcm[i, 0]), int(sidx[i])
            row = rows_pcm[i]
            for t in range(0, nrow, 2):
                exp_s += st
                n0, p_, st = compress_sample(p_, st, int(row[t]))
                n1, p_, st = compress_sample(p_, st, int(row[t + 1]))
                exp_b += (n0 << 4) | n1
        KE_T = int(os.environ.get("AMV_BENCH_ADPCM_ENC_K", "4096"))
        exp_enc_cs = (((exp_b + exp_s) * KE_T) + 2**31) % 2**32 - 2**31
        n_samples_e = int(2 * alens.sum()) * KE_T
        nb_valid_e = maxlen
        reset_row = np.zeros((C, nrow), np.uint8)
        reset_row[:, 0] = 1

        @jax.jit
        def fused_adpcm_enc(x, r, s0, salt):
            # pre-tile to whole SB*128 lane blocks (252 -> 63 blocks),
            # wrap the rest — mirror of fused_adpcm_pallas above
            lanes = KPE.SB * 128
            r_pre = lanes // int(np.gcd(x.shape[0], lanes))
            rep = KE_T // r_pre if KE_T % r_pre == 0 else 1
            if rep == 1:
                r_pre = KE_T
            x2 = jnp.tile(x, (r_pre, 1))
            r2 = jnp.tile(r, (r_pre, 1))
            s2 = jnp.tile(s0, (r_pre,)) + salt * 0
            xl, rl, sl = KPE.to_layout_enc(x2, r2, s2)
            ob, osx = KPE.encode_layout_wrap(xl, rl, sl, repeat=rep)
            s_all = (jnp.sum(ob.astype(jnp.int32)) +
                     jnp.sum(osx.astype(jnp.int32)))
            s_pad = (jnp.sum(ob[:, nb_valid_e:].astype(jnp.int32)) +
                     jnp.sum(osx[:, nb_valid_e:].astype(jnp.int32)))
            return s_all - s_pad + salt

        xa = jax.device_put(jnp.asarray(rows_pcm))
        ra = jax.device_put(jnp.asarray(reset_row))
        sa = jax.device_put(jnp.asarray(sidx))
        cs0e = int(fused_adpcm_enc(xa, ra, sa, jnp.int32(0))[...])
        assert cs0e == exp_enc_cs, \
            f"ADPCM encode checksum {cs0e} != scalar reference {exp_enc_cs}"
        t_enc_a = best_time(lambda: int(fused_adpcm_enc(
            xa, ra, sa, jnp.int32(np.random.randint(1000)))[...]))
        detail["adpcm_enc_tpu_msamples"] = round(
            n_samples_e / t_enc_a / 1e6, 1)
        detail["adpcm_enc_k"] = KE_T
        detail["adpcm_enc_tpu_pipelined_msamples"] = round(pipelined_fps(
            lambda sv: fused_adpcm_enc(xa, ra, sa, jnp.int32(sv)),
            n_samples_e) / 1e6, 1)

    # ================= G.729A (default on; AMV_BENCH_G729=0 disables) =======
    if os.environ.get("AMV_BENCH_G729", "1") != "0":
        with sect("g729_decode"):
            from amv_tpu.codecs import g729a
            rng = np.random.default_rng(0)
            # batch scaling is the decoder's lever (measured 138.6K
            # @B=1024, 150.9K @B=4096 / T=32); 1024 is the steady-state
            # serving configuration
            T_, B = 64, int(os.environ.get("AMV_BENCH_G729_B", "1024"))
            frames = rng.integers(0, 256, (T_, B, 10), dtype=np.uint8)
            # valid pitch range + parity so no erasure path dominates
            frames[..., 2] = 0x40
            pcm = g729a.decode_streams(frames)  # compile+warm + API check
            # device-resident timing: decode_streams' np.asarray return
            # moves 10.5MB back through the 30MB/s relay INSIDE the old
            # loop — pcm stays on device here, scalar checksum only
            parms_d = jax.device_put(jnp.asarray(g729a.unpack_frames(
                frames)))

            @jax.jit
            def dec_device(parms_all, salt):
                st = g729a.init_state(B)
                p = parms_all.at[0, :, 13].set(
                    (parms_all[0, :, 13] + salt) % 16)   # vary GB index
                _, pcm_ = g729a.decode_frames_scan(st, p)
                return jnp.sum(pcm_[:, :, ::17].astype(jnp.int32))

            _ = int(dec_device(parms_d, jnp.int32(0))[...])
            t_g729 = np.inf
            for it in range(4):
                t0 = time.perf_counter()
                _ = int(dec_device(parms_d, jnp.int32(it + 1))[...])
                t_g729 = min(t_g729, time.perf_counter() - t0)
            detail["g729_tpu_frames_per_s"] = round(T_ * B / t_g729, 1)
            detail["g729_batch"] = f"{B} streams x {T_} frames"
            detail["g729_tpu_pipelined_frames_per_s"] = round(
                pipelined_fps(lambda sv: dec_device(parms_d, jnp.int32(sv)),
                              T_ * B), 1)

        if os.environ.get("AMV_BENCH_G729ENC", "1") != "0":
            with sect("g729_encode"):
                from amv_tpu.codecs import g729a
                from amv_tpu.codecs.g729a_encoder_tpu import \
                    encode_frames_scan
                Be = int(os.environ.get("AMV_BENCH_G729ENC_B", "1024"))
                Te = 16
                rng2 = np.random.default_rng(1)
                # device-resident [T, B, 80] frame stack: the old
                # per-frame staging moved 328KB/frame through the 30MB/s
                # tunnel and hid the true device time (measured 213K f/s
                # clean with the lax.scan chain)
                sig = jnp.asarray((3000 * rng2.standard_normal(
                    (Te, Be, 80))).astype(np.float32))
                ste = g729a.init_state(Be)
                hh = jnp.zeros((Be, 160))
                ste, hh, pm = encode_frames_scan(ste, hh, sig)
                _ = np.asarray(pm[-1])
                t_enc = np.inf
                for rep in range(4):
                    t0 = time.perf_counter()
                    ste, hh, pm = encode_frames_scan(ste, hh, sig)
                    _ = np.asarray(pm[-1, :, 0])
                    t_enc = min(t_enc, (time.perf_counter() - t0) / Te)
                detail["g729_tpu_encode_frames_per_s"] = round(Be / t_enc, 1)
                # chained steady state: the scan re-feeds its own carried
                # state, so 8 queued calls overlap each call's relay
                # dispatch with the previous call's execution
                D_ENC = 8
                t0 = time.perf_counter()
                ste2, hh2, pm2 = ste, hh, pm
                for _ in range(D_ENC):
                    ste2, hh2, pm2 = encode_frames_scan(ste2, hh2, sig)
                jax.block_until_ready(pm2)
                t_pipe = (time.perf_counter() - t0) / (D_ENC * Te)
                detail["g729_tpu_encode_pipelined_frames_per_s"] = round(
                    Be / t_pipe, 1)

    # ================= progressive JPEG ingest (host C) =====================
    with sect("progressive"):
        from amv_tpu.bitstream.jpeg_progressive import (decode_progressive,
                                                        encode_progressive)
        rngp = np.random.default_rng(5)
        lvp = np.zeros((48, 6, 64), np.int16)
        lvp[:, :, 0] = rngp.integers(-60, 60, (48, 6))
        for sl in (1, 2, 5, 9, 17, 30):
            mk = rngp.random((48, 6)) < 0.35
            lvp[:, :, sl] = np.where(mk, rngp.integers(-30, 30, (48, 6)), 0)
        datap = encode_progressive(lvp, (128, 96))
        decode_progressive(datap)                      # warm
        NPROG = 256
        t0 = time.perf_counter()
        for _ in range(NPROG):
            decode_progressive(datap)
        detail["progressive_host_fps"] = round(
            NPROG / (time.perf_counter() - t0), 1)

    # ================= host entropy + link: end-to-end ======================
    with sect("e2e_tunnel"):
        def e2e_decode():
            lv = huffman_decode_frames(payloads, mb_w * mb_h)
            o = decode_transform(jnp.asarray(lv), mb_w, mb_h, w, h)
            return [np.asarray(x) for x in o]

        detail["e2e_tunnel_decode_fps"] = round(
            F / best_time(e2e_decode, iters=2), 1)

        def e2e_encode():
            lv = np.asarray(encode_transform(
                jnp.asarray(yh), jnp.asarray(cbh), jnp.asarray(crh),
                mb_w, mb_h, 2))
            return [huffman_encode_frame(lv[f]) for f in range(F)]

        detail["e2e_tunnel_encode_fps"] = round(
            F / best_time(e2e_encode, iters=2), 1)

    # ======================================================================
    # FULL-mode extras: each is its own cold compile (1-3 min on the
    # remote-compile path) — too expensive for the driver's window, so
    # they only run with AMV_BENCH_FULL=1 from a shell (VERDICT r3 item 1:
    # sweeps and decompositions stay out of the budget run).
    # ======================================================================
    if FULL:
        # ---- pipelined complete chains (scalar-output jits) ----------------
        with sect("full_pipelined_complete"):
            from amv_tpu.pipeline.transcode import transcode_complete_async

            KC = int(os.environ.get("AMV_BENCH_COMPLETE_K", "112"))
            from amv_tpu.pipeline.transcode import pick_sb
            sb_c = pick_sb(F * KC)
            FC = F * KC
            ord_k = np.argsort(np.tile(lens_c1, KC), kind="stable")
            rows_ct = jax.device_put(jnp.asarray(
                np.tile(rows_c1, (KC, 1))[ord_k]))
            jax.block_until_ready(rows_ct)

            @jax.jit
            def complete_t(rw, salt):
                words, bits, ok = transcode_complete_async(
                    rw, M, qk, w_out=1024, win_fetch=64, win_emit=64,
                    enc="async", sb=sb_c)
                return (jnp.sum(words[::31, ::17]) + jnp.sum(bits) +
                        jnp.where(ok, 0, 1 << 30) + salt)

            _ = int(complete_t(rows_ct, jnp.int32(0))[...])
            # distinct key from the budget-mode rep-loop number (r4 ADVICE:
            # same key carried different measurement semantics in FULL runs)
            detail["device_complete_pipelined_single_pass_fps"] = round(
                pipelined_fps(
                    lambda sv: complete_t(rows_ct, jnp.int32(sv)), FC), 1)

        # ---- steady-state serving (AsyncTranscoder, r4 verdict item 6) -----
        # end-to-end product serving rate: host C unescape/escape + padded
        # fixed-shape batches + depth-4 in-flight dispatch.  Includes the
        # host byte stages, so it reads below the device-only complete_*
        # keys by design (it is the cold-stream product number).
        with sect("full_serving"):
            from amv_tpu.pipeline.serving import AsyncTranscoder
            KS = int(os.environ.get("AMV_BENCH_SERVE_K", "16384"))
            bs = 4096
            tr = AsyncTranscoder(M, batch_frames=bs, depth=4,
                                 w_bytes=int(rows_c1.shape[1]))
            pays = (payloads * ((KS + F - 1) // F))[:KS]
            warm = tr.transcode((payloads * ((bs + F - 1) // F))[:bs])
            assert warm[0] == huffman_encode_frame(lv_enc[0]), \
                "serving warm batch != host re-encode"
            t0 = time.perf_counter()
            out_n = sum(1 for _ in tr.stream(iter(pays)))
            dt = time.perf_counter() - t0
            assert out_n == KS
            detail["serving_stream_fps"] = round(KS / dt, 1)

        # ---- round-2 lockstep chain (regression reference), K=64 -----------
        with sect("full_lockstep"):
            from amv_tpu.pipeline.transcode import transcode_complete_layout
            KL = 64
            rows_lk = jax.device_put(jnp.asarray(
                np.tile(rows_c1, (KL, 1))[np.argsort(
                    np.tile(lens_c1, KL), kind="stable")]))
            jax.block_until_ready(rows_lk)

            @jax.jit
            def complete_lock(rw, salt):
                words, bits = transcode_complete_layout(
                    rw, M, qk, w_out=1024, win_fetch=64, win_emit=64)
                return (jnp.sum(words[::31, ::17]) + jnp.sum(bits) + salt)

            _ = int(complete_lock(rows_lk, jnp.int32(0))[...])
            detail["device_complete_lockstep_fps"] = round(
                F * KL / best_time(lambda: int(complete_lock(
                    rows_lk, jnp.int32(np.random.randint(1000)))[...])), 1)

        # ---- 160x120 transform (synthetic levels, wrap kernel) -------------
        with sect("full_transform160"):
            F2, K2 = 128, 256                 # N2 = 128*256*480, % 4096 == 0
            rng = np.random.default_rng(0)
            lv160 = rng.integers(-64, 64, (F2, 80, 6, 64)).astype(np.int16)
            cm160 = jax.device_put(jnp.asarray(
                np.ascontiguousarray(lv160.reshape(-1, 64).T)))
            jax.block_until_ready(cm160)
            fused160, _, _ = make_fused(F2, K2, 10, 8, 160, 120)
            _ = int(fused160(cm160, jnp.int32(0))[...])
            t160 = best_time(lambda: int(
                fused160(cm160, jnp.int32(np.random.randint(1000)))[...]))
            detail["fps_160x120"] = round(F2 * K2 / t160, 1)

        # ---- full-device decode (entropy + transform on device) ------------
        with sect("full_device_decode"):
            t0 = time.perf_counter()
            rows, _ = native.unescape_frames(payloads)
            detail["host_unescape_fps"] = round(
                F / (time.perf_counter() - t0), 1)
            KE = int(os.environ.get("AMV_BENCH_ENTROPY_K", "32"))
            FE = F * KE
            lens_e = np.array([len(p) for p in payloads])
            ids_e = np.tile(np.arange(F), KE)[
                np.argsort(np.tile(lens_e, KE), kind="stable")]
            rows_t = np.tile(rows, (KE, 1))[ids_e]  # length-sorted batch

            from amv_tpu.pipeline.transcode import decode_scans_layout
            from amv_tpu.codecs.amv_video import assemble_planes

            @jax.jit
            def fused_full_decode(rw, salt):
                pix = decode_scans_layout(rw, M, win_fetch=64)
                yy, ccb, ccr = assemble_planes(pix, mb_w, mb_h, w, h)
                return (jnp.sum(yy[::97, ::13, ::17].astype(jnp.int32)) +
                        jnp.sum(ccb[::53, ::7, ::11].astype(jnp.int32)) +
                        jnp.sum(ccr[::53, ::7, ::11].astype(jnp.int32)) +
                        salt)

            exp_full = ((int(yh[ids_e[np.arange(0, FE, 97)], ::13, ::17]
                             .astype(np.int64).sum()) +
                         int(cbh[ids_e[np.arange(0, FE, 53)], ::7, ::11]
                             .astype(np.int64).sum()) +
                         int(crh[ids_e[np.arange(0, FE, 53)], ::7, ::11]
                             .astype(np.int64).sum()) + 2**31)
                        % 2**32 - 2**31)
            rows_dev = jax.device_put(jnp.asarray(rows_t))
            jax.block_until_ready(rows_dev)
            got_full = int(fused_full_decode(rows_dev, jnp.int32(0))[...])
            assert got_full == exp_full, \
                f"full-device decode checksum: {got_full} != {exp_full}"
            t_fulldec = best_time(lambda: int(fused_full_decode(
                rows_dev, jnp.int32(np.random.randint(1000)))[...]))
            detail["device_full_decode_fps"] = round(FE / t_fulldec, 1)

        # ---- full-device transcode (lockstep decode + fused transform) -----
        with sect("full_device_transcode"):
            from amv_tpu.kernels.entropy_decode_pallas import \
                decode_scans_pallas
            rows_ft, _ = native.unescape_frames(payloads)
            KT = int(os.environ.get("AMV_BENCH_FULLTRANS_K", "64"))
            FT2 = F * KT
            lens_ft = np.array([len(p) for p in payloads])
            ids_ft = np.tile(np.arange(F), KT)[
                np.argsort(np.tile(lens_ft, KT), kind="stable")]
            rows_ft_t = np.tile(rows_ft, (KT, 1))[ids_ft]  # length-sorted

            n_ft = FT2 * M * 6
            n_ftp = (n_ft + 4095) // 4096 * 4096  # transcode tile multiple

            @jax.jit
            def full_transcode(rw, salt):
                lv = decode_scans_pallas(rw, M, win=64)
                cmx = lv.reshape(n_ft, 64).T
                dcd = cmx[0].astype(jnp.int32).reshape(FT2, M, 6)
                dc_y = (jnp.cumsum(dcd[:, :, :4].reshape(FT2, M * 4)
                                   * qdc_l, axis=1)
                        .reshape(FT2, M, 4) + 1024)
                dc_cb = jnp.cumsum(dcd[:, :, 4] * qdc_c, axis=1) + 1024
                dc_cr = jnp.cumsum(dcd[:, :, 5] * qdc_c, axis=1) + 1024
                dcx = jnp.concatenate(
                    [dc_y, dc_cb[..., None], dc_cr[..., None]], axis=-1)
                pix, lv2 = transcode_zz(
                    jnp.pad(cmx, ((0, 0), (0, n_ftp - n_ft))),
                    jnp.pad(dcx.reshape(n_ft), (0, n_ftp - n_ft)), qk)
                pix = pix[:, :n_ft]
                lv2 = lv2[:, :n_ft]
                fsel = jnp.arange(0, FT2, 97)
                Fs = fsel.shape[0]
                pf = pix.reshape(64, FT2, M * 6)[:, fsel]
                p = pf.reshape(8, 8, Fs, mb_h, mb_w, 6)
                yp = p[:, :, :, :, :, :4].reshape(8, 8, Fs, mb_h, mb_w,
                                                  2, 2)
                ycoded = yp.transpose(2, 3, 5, 0, 4, 6, 1).reshape(
                    Fs, 16 * mb_h, 16 * mb_w)
                yv = ycoded[:, h - 1::-1, :w]
                return (jnp.sum(lv2[:, ::37].astype(jnp.int32)) +
                        jnp.sum(yv[:, ::13, ::17].astype(jnp.int32)) + salt)

            block_sums = lv_enc.astype(np.int64).sum(axis=-1).reshape(
                F * M * 6)
            bs_sorted = block_sums.reshape(F, M * 6)[ids_ft].reshape(-1)
            sel_ft = np.arange(0, FT2 * M * 6, 37)
            exp_ft = (((int(bs_sorted[sel_ft].sum()) +
                        int(yh[ids_ft[np.arange(0, FT2, 97)], ::13, ::17]
                            .astype(np.int64).sum())) & 0xFFFFFFFF)
                      ^ 0x80000000) - 0x80000000
            rw_dev = jax.device_put(jnp.asarray(rows_ft_t))
            jax.block_until_ready(rw_dev)
            got_ft = int(full_transcode(rw_dev, jnp.int32(0))[...])
            assert got_ft == exp_ft, \
                f"full-device transcode checksum: {got_ft} != {exp_ft}"
            t_ft = best_time(lambda: int(full_transcode(
                rw_dev, jnp.int32(np.random.randint(1000)))[...]))
            detail["device_full_transcode_fps"] = round(FT2 / t_ft, 1)

        # ---- roofline / utilization accounting -----------------------------
        # Per-stage bytes-touched, issued-vector-op estimates and % of the
        # v5e-1 HBM/VPU ceilings; iteration counts are EXACT (read back
        # from the async kernels' status rows, stalls included).
        with sect("full_roofline"):
            roofline = []
            from amv_tpu.utils.roofline import (
                StageRoofline, DECODE_ASYNC_OPS_PER_ITER,
                ENCODE_OPS_PER_ITER, TRANSCODE_OPS_PER_BLOCK)
            from amv_tpu.kernels.entropy_decode_pallas import \
                scan_words_layout
            from amv_tpu.kernels.entropy_async_pallas import (
                decode_scans_async_dense, default_t_max_dense)
            from amv_tpu.kernels.entropy_encode_async_pallas import (
                encode_layout_async_dense, default_t_max_enc)
            from amv_tpu.kernels.transcode_layout_pallas import \
                transcode_mcu_layout
            from amv_tpu.bitstream import jpeg_tables as JT
            from amv_tpu.pipeline.transcode import pick_sb

            KC = int(os.environ.get("AMV_BENCH_COMPLETE_K", "112"))
            sb_c = pick_sb(F * KC)
            nb_r = M * 6
            # single-call stage timings carry the relay's ~22 ms dispatch
            # floor; subtract a measured null dispatch so the roofline
            # reflects device time, not link latency

            @jax.jit
            def _null(salt):
                return salt + 1

            _ = int(_null(jnp.int32(0))[...])
            t_null = best_time(lambda: int(_null(
                jnp.int32(np.random.randint(1000)))[...]))
            # Stage jits run on a KC<=64-equivalent batch: the STANDALONE
            # enc_stage at >4 chunks exceeds the Mosaic scoped-vmem stack
            # (AOT: 34.6M vs the 16M limit at KC=112) though the chained
            # headline compiles; utilization %s are batch-size-invariant
            KR = min(KC, 64)
            FCR = F * KR
            ord_r = np.argsort(np.tile(lens_c1, KR), kind="stable")
            fpc_r = sb_c * 128
            FR = (FCR + fpc_r - 1) // fpc_r * fpc_r
            rows_rf = np.tile(rows_c1, (KR, 1))[ord_r]
            rows_rf = np.concatenate(
                [rows_rf, np.tile(rows_rf[:1], (FR - FCR, 1))], axis=0)
            rw_rf = jax.device_put(jnp.asarray(rows_rf))
            jax.block_until_ready(rw_rf)
            t_dn = default_t_max_dense(nb_r, rows_rf.shape[1])
            cb_r = FR // fpc_r
            tile_r = sb_c // 8

            @jax.jit
            def dec_stage(rw, salt):
                wl = scan_words_layout(rw, sb=sb_c)
                slab, ok, st = decode_scans_async_dense(
                    wl, nb_r, t_dn, win=64, unroll=8, pmax=8, press=64,
                    return_status=True, sb=sb_c)
                return slab, st, (jnp.sum(slab[:, ::7, ::5]
                                          .astype(jnp.int32)) + salt)

            slab_r, st_d, _ = dec_stage(rw_rf, jnp.int32(0))
            jax.block_until_ready(slab_r)
            t_ds = max(best_time(lambda: int(dec_stage(
                rw_rf, jnp.int32(np.random.randint(1000)))[2][...]))
                - t_null, 1e-6)
            it_dec = int(np.asarray(st_d)[:, 1, 0, 0].sum())
            slab_bytes = FR * nb_r * 64 * 2
            roofline.append(StageRoofline(
                "entropy_decode_async", t_ds,
                rows_rf.nbytes + slab_bytes,
                DECODE_ASYNC_OPS_PER_ITER * it_dec * tile_r).report())

            @jax.jit
            def tf_stage(slab, salt):
                lvl = slab.reshape(cb_r, M, 6, 64, sb_c, 128)
                d = lvl[:, :, :, 0].astype(jnp.int32)
                dy = (jnp.cumsum(d[:, :, :4].reshape(cb_r, M * 4, sb_c,
                                                     128)
                                 * int(JT.SP5X_QUANT_LUMA_ZZ[0]), axis=1)
                      .reshape(cb_r, M, 4, sb_c, 128) + 1024)
                dcb = jnp.cumsum(
                    d[:, :, 4] * int(JT.SP5X_QUANT_CHROMA_ZZ[0]),
                    axis=1) + 1024
                dcr = jnp.cumsum(
                    d[:, :, 5] * int(JT.SP5X_QUANT_CHROMA_ZZ[0]),
                    axis=1) + 1024
                dc = jnp.concatenate(
                    [dy, dcb[:, :, None], dcr[:, :, None]], axis=2)
                lv2s = transcode_mcu_layout(lvl, dc, qk)
                return lv2s, (jnp.sum(lv2s[:, :, :, 1].astype(jnp.int32))
                              + salt)

            lv2_r, _ = tf_stage(slab_r, jnp.int32(0))
            jax.block_until_ready(lv2_r)
            t_tf = max(best_time(lambda: int(tf_stage(
                slab_r, jnp.int32(np.random.randint(1000)))[1][...]))
                - t_null, 1e-6)
            roofline.append(StageRoofline(
                "transform_dequant_idct_fdct_quant", t_tf, 2 * slab_bytes,
                cb_r * nb_r * TRANSCODE_OPS_PER_BLOCK * tile_r).report())

            t_en = default_t_max_enc(nb_r) * 2

            @jax.jit
            def enc_stage(lv2s, salt):
                words, bits, ok, st = encode_layout_async_dense(
                    lv2s.reshape(cb_r, nb_r, 64, sb_c, 128), 1024, t_en,
                    win_rows=64, unroll=8, pmax=8, return_status=True)
                return st, (jnp.sum(words[:, ::31]) + jnp.sum(bits) + salt)

            st_e, _ = enc_stage(lv2_r, jnp.int32(0))
            jax.block_until_ready(st_e)
            t_es = max(best_time(lambda: int(enc_stage(
                lv2_r, jnp.int32(np.random.randint(1000)))[1][...]))
                - t_null, 1e-6)
            it_enc = int(np.asarray(st_e)[:, 1, 0, 0].sum())
            roofline.append(StageRoofline(
                "entropy_encode_async", t_es,
                slab_bytes + FR * 1024 * 4,
                ENCODE_OPS_PER_ITER * it_enc * tile_r).report())
            roofline.append({
                "dispatch_floor_ms": round(t_null * 1e3, 2),
                "stage": "complete_chain",
                "ms": (round(FCR / dev_complete_fps * 1e3, 2)
                       if dev_complete_fps else None),
                "stage_sum_ms": round((t_ds + t_tf + t_es) * 1e3, 2),
                "dec_iters": it_dec, "enc_iters": it_enc,
                "note": "all three device stages are compute(VPU)-bound "
                        "far below HBM limits; the entropy kernels' "
                        "ceiling is per-token vector work, not bandwidth",
            })
            detail["roofline"] = roofline

        # ---- sustained end-to-end (bytes -> bytes, host C in the loop) -----
        with sect("full_sustained"):
            from amv_tpu.pipeline.transcode import (transcode_complete_async,
                                                    pick_sb)
            KC = int(os.environ.get("AMV_BENCH_COMPLETE_K", "112"))
            sb_c = pick_sb(F * KC)
            B_SUS = int(os.environ.get("AMV_BENCH_SUSTAIN_BATCHES", "4"))
            ord_s = np.argsort(np.tile(lens_c1, KC), kind="stable")
            inv_s = np.argsort(ord_s)
            rows_host = np.tile(rows_c1, (KC, 1))[ord_s]

            @jax.jit
            def complete_fullout(rw, salt):
                words, bits, ok = transcode_complete_async(
                    rw, M, qk, w_out=1024, win_fetch=64, win_emit=64,
                    enc="async", sb=sb_c)
                return words, bits, ok, (jnp.sum(words[::31, ::17]) +
                                         jnp.sum(bits) + salt)

            warm = complete_fullout(jax.device_put(jnp.asarray(rows_host)),
                                    jnp.int32(0))
            jax.block_until_ready(warm[0])
            del warm

            def one_batch(dev_prev):
                words, bits, _, _ = complete_fullout(jax.device_put(
                    jnp.asarray(rows_host)), jnp.int32(0))
                out_prev = None
                if dev_prev is not None:
                    wp, bp = dev_prev
                    out_prev = native.escape_frames(
                        np.asarray(wp)[inv_s], np.asarray(bp)[inv_s])
                return (words, bits), out_prev

            t0 = time.perf_counter()
            prev = None
            done = 0
            for bi in range(B_SUS):
                # host unescape for the NEXT batch overlaps device work
                _ = native.unescape_frames(payloads * KC)
                prev, got_prev = one_batch(prev)
                if got_prev is not None:
                    done += len(got_prev)
            wp, bp = prev
            last = native.escape_frames(np.asarray(wp)[inv_s],
                                        np.asarray(bp)[inv_s])
            done += len(last)
            t_sus = time.perf_counter() - t0
            detail["sustained_e2e_fps"] = round(done / t_sus, 1)

            # host C stages alone, pipelined rate (no device/link)
            t0 = time.perf_counter()
            _ = native.unescape_frames(payloads * KC)
            t_un = time.perf_counter() - t0
            t0 = time.perf_counter()
            _ = native.escape_frames(np.asarray(wp), np.asarray(bp))
            t_es2 = time.perf_counter() - t0
            detail["sustained_host_fps"] = round(
                (F * KC) / max(t_un, t_es2), 1)

        # ---- complete device encode (pixels -> scan words) -----------------
        with sect("full_complete_encode"):
            from amv_tpu.pipeline.transcode import encode_planes_layout
            want_enc = [huffman_encode_frame(lv_enc[f]) for f in range(F)]
            lens_en = np.array([len(p) for p in want_enc])
            KE2 = int(os.environ.get("AMV_BENCH_COMPLETEENC_K", "32"))
            FE2 = F * KE2
            ids_en = np.tile(np.arange(F), KE2)[
                np.argsort(np.tile(lens_en, KE2), kind="stable")]

            @jax.jit
            def complete_encode(yy, cc, rr, salt):
                yy = (yy.astype(jnp.int32) + salt * 0).astype(jnp.uint8)
                words, bits = encode_planes_layout(
                    yy, cc, rr, mb_w, mb_h, qk, w_out=1024, win_emit=64)
                return words, bits, (jnp.sum(words[::31, ::17]) +
                                     jnp.sum(bits) + salt)

            y1, cb1d, cr1d = (jax.device_put(jnp.asarray(x))
                              for x in (yh, cbh, crh))
            w1, b1, _ = complete_encode(y1, cb1d, cr1d, jnp.int32(0))
            got_enc = native.escape_frames(np.asarray(w1), np.asarray(b1))
            assert got_enc == want_enc, \
                "complete device encode != host encoder payloads"

            ys, cbs, crs = (jax.device_put(jnp.asarray(
                np.tile(x, (KE2, 1, 1))[ids_en])) for x in (yh, cbh, crh))
            jax.block_until_ready((ys, cbs, crs))
            _ = int(complete_encode(ys, cbs, crs, jnp.int32(0))[2][...])
            t_ce = best_time(lambda: int(complete_encode(
                ys, cbs, crs, jnp.int32(np.random.randint(1000)))[2][...]))
            detail["device_complete_encode_fps"] = round(FE2 / t_ce, 1)

        # ---- optional: pure-XLA two-stage path (pre-Pallas headline) -------
        if os.environ.get("AMV_BENCH_XLA") == "1":
            with sect("full_xla_two_stage"):
                KX = TILE

                @jax.jit
                def xla_roundtrip(lv0, salt):
                    lv = (jnp.tile(lv0, (KX, 1, 1, 1)) +
                          salt.astype(jnp.int16) * 0)
                    yy, ccb, ccr = decode_transform(lv, mb_w, mb_h, w, h)
                    lv2 = encode_transform(yy, ccb, ccr, mb_w, mb_h, 2)
                    return (jnp.sum(lv2.astype(jnp.int32)) +
                            jnp.sum(yy[::97, ::13, ::17].astype(jnp.int32))
                            + salt)

                levels_dev = jax.device_put(jnp.asarray(levels))
                _ = int(xla_roundtrip(levels_dev, jnp.int32(0))[...])
                t_xla = best_time(lambda: int(xla_roundtrip(
                    levels_dev, jnp.int32(np.random.randint(1000)))[...]))
                detail["xla_two_stage_fps"] = round(F * KX / t_xla, 1)

        # ---- optional: device-entropy e2e encode ---------------------------
        if os.environ.get("AMV_BENCH_DEVENT") == "1":
            with sect("full_e2e_device_entropy"):
                from amv_tpu.kernels.entropy_encode import \
                    encode_frames_device

                def e2e_encode_devent():
                    lv = encode_transform(
                        jnp.asarray(yh), jnp.asarray(cbh), jnp.asarray(crh),
                        mb_w, mb_h, 2)
                    payload, lens = encode_frames_device(lv, max_bytes=4096)
                    payload, lens = np.asarray(payload), np.asarray(lens)
                    return [payload[f, :lens[f]].tobytes()
                            for f in range(F)]

                enc_devent = e2e_encode_devent()  # compile+warm
                assert enc_devent[0] == tpu_payload0, \
                    "device entropy != host entropy"
                detail["e2e_tunnel_encode_device_entropy_fps"] = round(
                    F / best_time(e2e_encode_devent, iters=2), 1)

    # fall back the headline to the product chain if the transform
    # section failed (the driver JSON must always carry a number)
    if not out["value"] and dev_complete_fps:
        out["value"] = round(dev_complete_fps, 1)
        out["vs_baseline"] = round(dev_complete_fps / fps_c, 2)
        out["metric"] = ("AMV complete transcode frames/sec/chip "
                         "(bit-exact, device-resident batch)")
    emit()


if __name__ == "__main__":
    main()
