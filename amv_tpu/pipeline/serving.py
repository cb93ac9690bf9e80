"""Steady-state AMV transcode serving: fixed-shape batches, deep dispatch.

`transcode_bytes` (pipeline/transcode.py) runs a whole file as ONE
device batch, which is right for a single short file and wrong for a
production stream of inputs: every new input length is a new jit
signature (a 1-3 min remote compile in this environment), very long
inputs exceed the remote compile wall (~1.4M frame*MCU — measured:
28224 frames at M=48 compiles, 32256 crashes the compile helper), and
each blocking call pays the full dispatch round-trip (~22-32 ms on the
axon relay).  `AsyncTranscoder` fixes all three at once:

* ONE fixed (batch_frames, w_bytes) jit signature serves any stream
  length — the last batch is padded with repeats of its shortest
  payload (valid scans, so pad lanes terminate; zero rows never would)
  and the pad outputs are dropped;
* `depth` batches stay in flight: JAX dispatch is async, so batch
  i+1's host unescape (C), host->device transfer and dispatch RTT all
  ride under batch i's device execution, and the host escape (C) of
  batch i-depth overlaps the same way (measured +48%: 119.5K ->
  176.8K fps at depth 8 on the 160x120 complete chain,
  scripts/measure_pipeline.py);
* frames are length-sorted WITHIN each batch (the async kernels'
  iteration count is the chunk max of per-lane token totals) and the
  original order is restored on emit.

The per-batch ok gate falls back to the host re-encode for that batch
only (bad VLC data or an iteration-budget overflow never voids the
rest of the stream).  Reference semantics unchanged:
mjpegdec.c:376-430 decode, mjpegenc.c:379-450 encode.
"""
from __future__ import annotations

import collections

import numpy as np
import jax
import jax.numpy as jnp

from .transcode import (transcode_complete_async, transcode_levels_fused,
                        pick_sb, pick_segments)
from ..native import entropy_native as native
from ..bitstream.entropy import huffman_decode_frames, huffman_encode_frame
from ..codecs.amv_video import _encoder_quant_qmat_np


class AsyncTranscoder:
    """Order-preserving AMV scan transcoder over fixed-shape batches.

    Parameters
    ----------
    n_mcu : MCUs per frame (frame geometry is fixed per instance).
    qscale : re-encode quantizer scale (reference default 2).
    batch_frames : frames per device batch = the one compiled shape.
    depth : batches kept in flight before blocking on the oldest.
    w_bytes : fixed unescaped-row width.  None = set from the first
        batch (or, via `transcode`, from the whole input); a later
        batch with longer scans then raises — pass an explicit bound
        for open-ended streams.
    interpret : run the Pallas kernels in interpret mode (CPU tests);
        the outer jit is skipped there (single-device path only).
    mesh : optional jax.sharding.Mesh — each batch's frames shard over
        the whole mesh (frames are independent bitstreams: zero
        collectives, parallel/sharding.sharded_complete_transcode_async);
        batch_frames must divide by mesh.size and the sublane width is
        sized on the PER-SHARD frame count.
    """

    def __init__(self, n_mcu: int, qscale: int = 2,
                 batch_frames: int = 4096, depth: int = 4,
                 w_bytes: int | None = None, sb: int | None = None,
                 interpret: bool = False, mesh=None,
                 win_fetch: int = 64, win_emit: int = 64,
                 w_out: int | None = None):
        segs = pick_segments(n_mcu)
        if not segs:
            raise ValueError(f"no usable device segmentation for {n_mcu} "
                             "MCUs; use the host entropy path")
        self.n_mcu = n_mcu
        self.qscale = qscale
        self.segs = segs
        ms = n_mcu // segs
        # w_out override: tiny-geometry gates (dryrun) shrink the word
        # budget so interpret-mode compiles stay cheap
        self.w_out = (min(1664, 1024 * ((ms + 47) // 48))
                      if w_out is None else w_out)
        self.batch_frames = batch_frames
        self.depth = max(1, depth)
        self.w_bytes = w_bytes
        self.mesh = mesh
        self.qk = tuple(int(v) for v in _encoder_quant_qmat_np(qscale))

        if mesh is not None:
            if batch_frames % mesh.size:
                raise ValueError(f"batch_frames={batch_frames} must divide "
                                 f"by mesh.size={mesh.size}")
            from ..parallel.sharding import sharded_complete_transcode_async
            self.sb = (pick_sb(batch_frames // mesh.size) if sb is None
                       else sb)
            self._chain = sharded_complete_transcode_async(
                mesh, n_mcu, self.qk, w_out=self.w_out,
                interpret=interpret, win_fetch=win_fetch,
                win_emit=win_emit, segs=segs, sb=self.sb)
            return
        self.sb = pick_sb(batch_frames) if sb is None else sb

        def chain(rw):
            return transcode_complete_async(
                rw, n_mcu, self.qk, w_out=self.w_out, win_fetch=win_fetch,
                win_emit=win_emit, segs=segs, enc="async", sb=self.sb,
                interpret=interpret)

        # interpret-mode Pallas runs as a plain eval (no outer jit, no
        # dispatch pipelining — CPU correctness tests only)
        self._chain = chain if interpret else jax.jit(chain)

    # ------------------------------------------------------------------
    def _issue(self, payloads):
        """Enqueue one batch; returns unfetched device handles + meta."""
        n = len(payloads)
        pad_src = min(payloads, key=len)
        batch = list(payloads) + [pad_src] * (self.batch_frames - n)
        rows, _ = native.unescape_frames(batch)
        if self.w_bytes is None:
            self.w_bytes = rows.shape[1]
        if rows.shape[1] > self.w_bytes:
            raise ValueError(
                f"batch scan width {rows.shape[1]} exceeds the compiled "
                f"row width {self.w_bytes}; construct AsyncTranscoder with "
                "a w_bytes bound for this stream")
        if rows.shape[1] < self.w_bytes:
            rows = np.pad(rows, ((0, 0), (0, self.w_bytes - rows.shape[1])))
        lens = np.array([len(p) for p in batch])
        order = np.argsort(lens, kind="stable")
        inv = np.argsort(order)
        arr = jnp.asarray(rows[order])
        if self.mesh is None:
            arr = jax.device_put(arr)  # mesh mode: jit shards placement
        words, bits, ok = self._chain(arr)
        return words, bits, ok, inv, n, payloads

    def _drain(self, entry):
        """Block on one batch's handles; return payload bytes in order."""
        words, bits, ok, inv, n, payloads = entry
        # single-device: scalar bool; mesh: int32 [n_shards], all must be 1
        if bool(np.asarray(ok).all()):
            w = np.asarray(words).reshape(
                self.batch_frames, self.segs, -1)[inv][:n]
            b = np.asarray(bits).reshape(
                self.batch_frames, self.segs)[inv][:n]
            try:
                if self.segs == 1:
                    return native.escape_frames(w[:, 0], b[:, 0])
                return native.concat_escape_frames(
                    w.reshape(-1, w.shape[2]), b.reshape(-1), self.segs)
            except ValueError:
                pass  # a segment overflowed the word budget
        return self._host_fallback(payloads)

    def _host_fallback(self, payloads):
        """Bit-exact host re-encode for one batch (bad data / overflow)."""
        lv = huffman_decode_frames(payloads, self.n_mcu)
        lv2 = np.asarray(transcode_levels_fused(
            jnp.asarray(lv), self.qscale)[0])
        return [huffman_encode_frame(lv2[f]) for f in range(len(payloads))]

    # ------------------------------------------------------------------
    def stream(self, payload_iter):
        """Yield re-encoded payloads in input order; `depth` batches of
        `batch_frames` frames stay queued on the device ahead of the
        oldest one being collected."""
        inflight = collections.deque()
        buf = []
        for p in payload_iter:
            buf.append(p)
            if len(buf) == self.batch_frames:
                inflight.append(self._issue(buf))
                buf = []
                if len(inflight) >= self.depth:
                    yield from self._drain(inflight.popleft())
        if buf:
            inflight.append(self._issue(buf))
        while inflight:
            yield from self._drain(inflight.popleft())

    def transcode(self, payloads) -> list[bytes]:
        """Transcode a known-size payload list (row width bounded up
        front, so any batch mix compiles once)."""
        payloads = list(payloads)
        if not payloads:
            return []
        if self.w_bytes is None:
            # escaped length bounds unescaped length (native stride rule)
            self.w_bytes = (max(len(p) for p in payloads) + 3) & ~3
        return list(self.stream(payloads))
