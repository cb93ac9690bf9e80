"""Pallas device-side JPEG entropy decoder: block-synchronized, 1024-way.

The XLA symbol-sequential decoder (kernels/entropy_decode.py) tops out
at ~2.6K frames/s — each of its ~5K while-loop steps pays HBM-sized
gathers and emit-buffer updates.  This kernel keeps everything in
vector registers and VMEM:

* 1024 frames decode in lockstep on one (8, 128) vreg slab; the grid
  walks (frame-chunk, block-index) and per-lane bitreader state
  persists across block steps in VMEM scratch (TPU grids iterate
  sequentially).
* Blocks are the synchronization points: every frame has exactly
  n_mcu*6 blocks, and a block's component type is its index mod 6 —
  so Huffman table selection is a *scalar*, not per-lane, decision.
* Each block decodes as straight-line DC (K.3 DC values are the
  identity permutation, so no value table at all) plus a bounded
  while-loop over AC symbols (position strictly advances, <= 64 iters).
* Canonical-code length decode: len = popcount of (peek16 >= bound[l])
  over the 16 length boundaries (monotone by canonicity; asserted at
  table build).  The 162-entry K.3 AC value table is an unrolled
  masked-select tree (Mosaic has no dynamic vector gather).
* The per-lane byte fetch — the classic blocker for SIMD Huffman — is
  a masked reduction over the time-major word planes: lane cursors
  select their word via compare+select against a row iota.  Costly per
  fetch, but one fetch serves all 1024 lanes and a 64-bit bit-buffer
  amortizes it to one 32-bit refill per ~4 symbols.

Semantics match bitstream/entropy.py + kernels/entropy_decode.py on
valid streams (mjpegdec.c:376-430 decode_block): levels in zigzag
order, slot 0 = DC *difference* (prediction resolved downstream).
Invalid streams produce bounded garbage instead of an error (the host
path is the validating one).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..bitstream import jpeg_tables as T

SB = 8  # sublanes: (8, 128) -> 1024 frames per chunk


def _canonical(bits, vals):
    """bound[16] (uint32, peek16-aligned), mincode[17], valptr[17]."""
    bits = [int(b) for b in bits[1:17]] if len(bits) == 17 else \
        [int(b) for b in bits]
    code, k = 0, 0
    bound = np.zeros(17, np.int64)
    mincode = np.zeros(17, np.int64)
    valptr = np.zeros(17, np.int64)
    for l in range(1, 17):
        mincode[l] = code
        valptr[l] = k
        code += bits[l - 1]
        k += bits[l - 1]
        bound[l] = code << (16 - l)
        code <<= 1
    assert all(bound[l + 1] >= bound[l] for l in range(1, 16)), \
        "canonical boundaries must be monotone"
    return bound[1:17], mincode, valptr


def _tables():
    dcl = _canonical(list(T.BITS_DC_LUMA), None)
    dcc = _canonical(list(T.BITS_DC_CHROMA), None)
    acl = _canonical(list(T.BITS_AC_LUMA), None)
    acc = _canonical(list(T.BITS_AC_CHROMA), None)
    assert list(T.VALS_DC_LUMA) == list(range(12))
    assert list(T.VALS_DC_CHROMA) == list(range(12))
    return (dcl, dcc, acl, acc,
            [int(v) for v in T.VALS_AC_LUMA],
            [int(v) for v in T.VALS_AC_CHROMA])


_DCL, _DCC, _ACL, _ACC, _AC_VALS_L, _AC_VALS_C = _tables()


def _bitslice_masks(vals, n_words):
    """Pack table `vals` (8-bit entries) into per-output-bit 32-entry
    bitmask words: masks[b][w] bit j = bit b of vals[w*32+j].  A lookup
    is then 8x (word select + variable shift) instead of a len(vals)-way
    masked-select tree."""
    m = [[0] * n_words for _ in range(8)]
    for k, v in enumerate(vals):
        for b in range(8):
            if (v >> b) & 1:
                m[b][k >> 5] |= 1 << (k & 31)
    # int32-representable (Mosaic scalars are signed)
    return [[w - (1 << 32) if w >= (1 << 31) else w for w in row]
            for row in m]


_ACW = 6  # ceil(162/32)
_ACM_L = _bitslice_masks(_AC_VALS_L, _ACW)
_ACM_C = _bitslice_masks(_AC_VALS_C, _ACW)


WIN = 256  # default windowed-fetch rows (1 KB of stream per round)


def _make_kernel(w_rows: int, n_blocks: int, win: int = WIN):
    WIN = win

    def fetch_word(words_ref, wc, need, soft):
        """Per-lane word at row cursor wc for lanes in `need`, plus
        opportunistic service of `soft` lanes whose row falls in a
        visited window.

        Masked reduction (exactly one row matches, so sum == select);
        Mosaic has no dynamic vector gather and no unsigned reductions,
        so the sum runs on the int32 bit view.  Instead of reducing over
        all w_rows every time, reduce over a WIN-row window anchored at
        the minimum unserved `need` cursor; a while-loop re-anchors for
        stragglers.  Serving every in-window `soft` lane in the same
        pass re-synchronizes the slab: lanes leave each pass topped up,
        so the next pass is several symbols away instead of immediate.

        Returns (word, got): got lanes received a word (their state
        must advance); `soft` lanes past the stream end are reported
        got with a zero word in BOTH branches (the stream is zero-
        padded, so absorbing 32 zero bits is exact either way)."""
        if w_rows <= WIN:
            words = words_ref[0]
            it = jax.lax.broadcasted_iota(jnp.int32, (w_rows, SB, 128), 0)
            sel = jnp.where((it == wc[None]) & soft[None], words,
                            jnp.int32(0))
            return (jnp.sum(sel, axis=0).astype(jnp.uint32),
                    soft)  # full view: every soft lane is served

        def cond(st):
            return jnp.sum(st[2]) > 0

        def body(st):
            w, got, unserved = st
            wcn = jnp.where(unserved != 0, wc, jnp.int32(0x7FFFFFFF))
            lo0 = jnp.clip(jnp.min(wcn), 0, w_rows - WIN)
            win = words_ref[0, pl.ds(lo0, WIN)]            # [WIN, SB, 128]
            it = lo0 + jax.lax.broadcasted_iota(jnp.int32, (WIN, SB, 128), 0)
            hit = (it == wc[None]) & (soft & (got == 0))[None]
            w = w | jnp.sum(jnp.where(hit, win, jnp.int32(0)), axis=0)
            inwin = (wc >= lo0) & (wc < lo0 + WIN)
            got = got | (soft & inwin).astype(jnp.int32)
            unserved = jnp.where(inwin, 0, unserved)
            return w, got, unserved

        w0 = jnp.zeros((SB, 128), jnp.int32)
        g0 = jnp.zeros((SB, 128), jnp.int32)
        u0 = (need & (wc < w_rows)).astype(jnp.int32)
        w, got, _ = jax.lax.while_loop(cond, body, (w0, g0, u0))
        return w.astype(jnp.uint32), (got != 0) | (soft & (wc >= w_rows))

    def ensure(words_ref, hi, lo, nb, wc):
        """Refill one 32-bit word into lanes holding < 27 bits; lanes
        with buffer room (nb <= 31) top up for free when a fetch pass
        covers their cursor."""
        need = nb < 27
        soft = nb <= 31
        w, got = fetch_word(words_ref, wc, need, soft)
        w = jnp.where(got, w, jnp.uint32(0))
        sh = jnp.clip(nb, 0, 31).astype(jnp.uint32)
        hi = hi | (w >> sh)
        lo = lo | jnp.where(nb > 0,
                            w << ((32 - nb) & 31).astype(jnp.uint32),
                            jnp.uint32(0))
        nb = nb + jnp.where(got, 32, 0)
        wc = wc + jnp.where(got, 1, 0)
        return hi, lo, nb, wc

    def consume(hi, lo, nb, c):
        cu = c.astype(jnp.uint32)
        spill = jnp.where(c > 0,
                          lo >> ((32 - c) & 31).astype(jnp.uint32),
                          jnp.uint32(0))
        hi = (hi << cu) | spill
        lo = lo << cu
        return hi, lo, nb - c

    def dec_len(p16, bound):
        """bound: list of 16 traced scalars -> code length [8,128].

        len = 1 + (number of length boundaries the peek passed); the
        boundaries are monotone by canonicity, so the count is the
        smallest l with peek < bound[l]."""
        ln = jnp.zeros(p16.shape, jnp.int32)
        for l in range(16):
            ln = ln + (p16 >= bound[l]).astype(jnp.int32)
        return jnp.clip(ln + 1, 1, 16)

    def sel_by_len(ln, consts):
        """consts: list of 17 traced scalars indexed by code length."""
        out = jnp.zeros(ln.shape, jnp.int32)
        for l in range(1, 17):
            out = out | jnp.where(ln == l, consts[l], 0)
        return out

    def extend(mant, size):
        neg = mant < (jnp.uint32(1) << jnp.clip(size - 1, 0, 31)
                      .astype(jnp.uint32))
        full = jnp.left_shift(jnp.int32(1), size) - 1
        m = mant.astype(jnp.int32)
        return jnp.where(size == 0, 0, jnp.where(neg, m - full, m))

    def kernel(words_ref, out_ref, hi_ref, lo_ref, nb_ref, wc_ref):
        b = pl.program_id(1)

        @pl.when(b == 0)
        def _init():
            hi_ref[:, :] = jnp.zeros((SB, 128), jnp.uint32)
            lo_ref[:, :] = jnp.zeros((SB, 128), jnp.uint32)
            nb_ref[:, :] = jnp.zeros((SB, 128), jnp.int32)
            wc_ref[:, :] = jnp.zeros((SB, 128), jnp.int32)

        luma = (b % 6) < 4  # scalar: block type is synchronized
        sw = lambda a, c: jnp.where(luma, a, c)  # scalar table select

        # delta[l] = valptr[l] - mincode[l]: one select gives the
        # canonical index as peek + delta instead of two table passes
        dc_bound = [sw(int(_DCL[0][l]), int(_DCC[0][l])) for l in range(16)]
        dc_delta = [sw(int(_DCL[2][l] - _DCL[1][l]),
                       int(_DCC[2][l] - _DCC[1][l])) for l in range(17)]
        ac_bound = [sw(int(_ACL[0][l]), int(_ACC[0][l])) for l in range(16)]
        ac_delta = [sw(int(_ACL[2][l] - _ACL[1][l]),
                       int(_ACC[2][l] - _ACC[1][l])) for l in range(17)]
        ac_mask = [[sw(_ACM_L[b][w], _ACM_C[b][w]) for w in range(_ACW)]
                   for b in range(8)]

        hi, lo = hi_ref[:, :], lo_ref[:, :]
        nb, wc = nb_ref[:, :], wc_ref[:, :]

        # ---------------- DC ----------------
        hi, lo, nb, wc = ensure(words_ref, hi, lo, nb, wc)
        p16 = (hi >> 16).astype(jnp.int32)
        ln = dec_len(p16, dc_bound)
        code = p16 >> (16 - ln)
        size = jnp.clip(code + sel_by_len(ln, dc_delta), 0, 11)
        hi, lo, nb = consume(hi, lo, nb, ln)
        mant = jnp.where(size > 0,
                         hi >> ((32 - size) & 31).astype(jnp.uint32),
                         jnp.uint32(0))
        diff = extend(mant, size)
        hi, lo, nb = consume(hi, lo, nb, size)

        out_ref[0, 0, 0] = diff.astype(jnp.int16)

        # ---------------- AC loop ----------------
        # Levels accumulate into 32 pair-packed int32 carries (two
        # 16-bit halves; each position is written at most once, so OR
        # is exact) — ~3x cheaper per token than a 63-row VMEM RMW.
        def cond(st):
            it, posd = st[0], st[1]
            # done is encoded as pos > 63; all-done <=> min(pos) > 63
            return (it < 64) & (jnp.min(posd) <= 63)

        def body(st):
            (it, posd, hi, lo, nb, wc), acc = st[:6], list(st[6])
            pos = posd
            done = posd > 63  # local bool mask (i1 carries don't lower)
            hi, lo, nb, wc = ensure(words_ref, hi, lo, nb, wc)
            p16 = (hi >> 16).astype(jnp.int32)
            ln = dec_len(p16, ac_bound)
            idx = jnp.clip((p16 >> (16 - ln)) +
                           sel_by_len(ln, ac_delta), 0, 161)
            # bit-sliced table lookup: per output bit, select the
            # 32-entry mask word then variable-shift by idx&31
            wsel = idx >> 5
            shv = (idx & 31).astype(jnp.uint32)
            sym = jnp.zeros(idx.shape, jnp.int32)
            for b in range(8):
                word = jnp.zeros(idx.shape, jnp.int32)
                for w_ in range(_ACW):
                    word = word | jnp.where(wsel == w_, ac_mask[b][w_], 0)
                bit = (word.astype(jnp.uint32) >> shv) & jnp.uint32(1)
                sym = sym | (bit.astype(jnp.int32) << b)
            run = sym >> 4
            size = sym & 0xF
            eob = sym == 0
            zrl = sym == 0xF0
            wpos = pos + run
            write = (~done) & (~eob) & (~zrl) & (wpos <= 63)
            c1 = jnp.where(done, 0, ln)
            hi, lo, nb = consume(hi, lo, nb, c1)
            mant = jnp.where(size > 0,
                             hi >> ((32 - size) & 31).astype(jnp.uint32),
                             jnp.uint32(0))
            level = extend(mant, size)
            c2 = jnp.where(done, 0, size)
            hi, lo, nb = consume(hi, lo, nb, c2)
            lv16 = jnp.where(write, level & 0xFFFF, 0)
            contrib = jnp.where((wpos & 1) != 0, lv16 << 16, lv16)
            half = wpos >> 1
            for j in range(32):
                acc[j] = acc[j] | jnp.where(write & (half == j), contrib, 0)
            pos = jnp.where(done, pos,
                            jnp.where(eob, 64,
                                      jnp.where(zrl, pos + 16, wpos + 1)))
            return (it + 1, pos, hi, lo, nb, wc, tuple(acc))

        zpair = tuple(jnp.zeros((SB, 128), jnp.int32) for _ in range(32))
        st0 = (jnp.int32(0), jnp.ones((SB, 128), jnp.int32),
               hi, lo, nb, wc, zpair)
        out_st = jax.lax.while_loop(cond, body, st0)
        hi, lo, nb, wc, acc = out_st[2], out_st[3], out_st[4], out_st[5], \
            out_st[6]
        out_ref[0, 0, 1] = (acc[0] >> 16).astype(jnp.int16)
        for j in range(1, 32):
            out_ref[0, 0, 2 * j] = (acc[j] & 0xFFFF).astype(jnp.int16)
            out_ref[0, 0, 2 * j + 1] = (acc[j] >> 16).astype(jnp.int16)

        hi_ref[:, :] = hi
        lo_ref[:, :] = lo
        nb_ref[:, :] = nb
        wc_ref[:, :] = wc

    return kernel


@partial(jax.jit, static_argnames=("n_blocks", "interpret", "win"))
def _decode_layout(words, n_blocks: int, interpret: bool = False,
                   win: int = WIN):
    """words uint32 [CB, W, 8, 128] -> levels int16 [CB, n_blocks, 64, 8, 128].

    `win` sizes the fetch window: lanes whose stream cursors cluster
    (e.g. length-sorted batches) can use a much smaller window."""
    cbn, w_rows = words.shape[0], words.shape[1]
    kernel = _make_kernel(w_rows, n_blocks, win=win)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((cbn, n_blocks, 64, SB, 128),
                                       jnp.int16),
        grid=(cbn, n_blocks),
        in_specs=[pl.BlockSpec((1, w_rows, SB, 128),
                               lambda i, j: (i, 0, 0, 0))],
        out_specs=pl.BlockSpec((1, 1, 64, SB, 128),
                               lambda i, j: (i, j, 0, 0, 0)),
        scratch_shapes=[pltpu.VMEM((SB, 128), jnp.uint32),
                        pltpu.VMEM((SB, 128), jnp.uint32),
                        pltpu.VMEM((SB, 128), jnp.int32),
                        pltpu.VMEM((SB, 128), jnp.int32)],
        interpret=interpret,
    )(words)


def _pad(n, m):
    return (n + m - 1) // m * m


def scan_words_layout(scans: jnp.ndarray) -> jnp.ndarray:
    """scans uint8 [F, max_bytes] (unescaped, zero-padded) ->
    big-endian word slabs int32 [CB, W, 8, 128] for _decode_layout
    (frame f lives at chunk f//1024, sublane (f%1024)//128, lane f%128)."""
    F, max_bytes = scans.shape
    fp = _pad(F, SB * 128)
    bp = _pad(max_bytes, 4)
    s = jnp.pad(scans, ((0, fp - F), (0, bp - max_bytes))).astype(jnp.uint32)
    words = ((s[:, 0::4] << 24) | (s[:, 1::4] << 16) |
             (s[:, 2::4] << 8) | s[:, 3::4]).astype(jnp.int32)  # [Fp, W]
    w_rows = words.shape[1]
    cbn = fp // (SB * 128)
    return words.reshape(cbn, SB, 128, w_rows).transpose(0, 3, 1, 2)


@partial(jax.jit, static_argnames=("n_mcu", "interpret", "win"))
def decode_scans_pallas(scans: jnp.ndarray, n_mcu: int,
                        interpret: bool = False,
                        win: int = WIN) -> jnp.ndarray:
    """scans uint8 [F, max_bytes] (unescaped, zero-padded) ->
    levels int16 [F, n_mcu, 6, 64] (zigzag, slot0 = DC difference).

    Drop-in for kernels.entropy_decode.decode_scans_device.  `win`
    sizes the fetch window (see _decode_layout).
    """
    F = scans.shape[0]
    n_blocks = n_mcu * 6
    fp = _pad(F, SB * 128)
    wl = scan_words_layout(scans)
    out = _decode_layout(wl, n_blocks, interpret=interpret, win=win)
    # [CB, nb, 64, 8, 128] -> [F, n_mcu, 6, 64]
    lv = out.transpose(0, 3, 4, 1, 2).reshape(fp, n_blocks, 64)
    return lv[:F].reshape(F, n_mcu, 6, 64)
