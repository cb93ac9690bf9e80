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


def _make_kernel(w_rows: int, n_blocks: int, win: int = WIN,
                 hbm: bool = False, unroll: int = 1, acc_regs: int = 32):
    WIN = win

    WIN = min(WIN, w_rows)

    def _insert(hi, lo, l2, l3, nb, w, srv):
        """OR a fetched word into the 128-bit (hi, lo, l2, l3) buffer at
        bit offset nb (0..95; callers guarantee room) for lanes in srv."""
        w = jnp.where(srv, w, jnp.uint32(0))
        s = (nb & 31).astype(jnp.uint32)
        whi = w >> s
        wlo = jnp.where((nb & 31) > 0,
                        w << ((32 - nb) & 31).astype(jnp.uint32),
                        jnp.uint32(0))
        w0 = nb < 32
        w1 = (nb >= 32) & (nb < 64)
        w2 = (nb >= 64) & (nb < 96)
        z = jnp.uint32(0)
        hi = hi | jnp.where(w0, whi, z)
        lo = lo | jnp.where(w0, wlo, jnp.where(w1, whi, z))
        l2 = l2 | jnp.where(w1, wlo, jnp.where(w2, whi, z))
        l3 = l3 | jnp.where(w2, wlo, z)
        return hi, lo, l2, l3

    def ensure(words_ref, hi, lo, l2, l3, nb, wc, aux=None):
        """Refill lanes holding < 27 bits; every lane with buffer room
        (nb <= 95) in a visited window tops up opportunistically with up
        to THREE 32-bit words per pass.

        The per-lane word gather is a masked reduction over a WIN-row
        window anchored at the minimum unserved cursor (Mosaic has no
        dynamic vector gather); a while-loop re-anchors for stragglers.
        The 128-bit buffer is what makes the window passes affordable:
        with 1024 lanes consuming ~6 bits/token in lockstep, a 64-bit
        buffer re-triggers a pass nearly every token, while topping
        everyone up to ~128 bits spaces passes many tokens apart.

        hbm=True keeps the stream in HBM (memory-space ANY) and DMAs
        each window into a VMEM scratch buffer, caching the last anchor
        in SMEM — arbitrarily long scans decode without a VMEM-resident
        stream slab, and re-anchoring is deadlock-free at any lane
        spread because reads are re-fetchable.

        Lanes past the stream end absorb zero words (the stream is
        zero-padded, so that is exact)."""
        need = nb < 27

        def cond(st):
            return jnp.sum(st[6]) > 0

        def body(st):
            hi, lo, l2, l3, nb, wc, unserved = st
            wcn = jnp.where(unserved != 0, wc, jnp.int32(0x7FFFFFFF))
            lo0 = jnp.clip(jnp.min(wcn), 0, w_rows - WIN)
            if hbm:
                fbuf, flo_ref, sem, ci = aux

                @pl.when(flo_ref[0] != lo0)
                def _load():
                    cp = pltpu.make_async_copy(
                        words_ref.at[ci, pl.ds(lo0, WIN)], fbuf, sem)
                    cp.start()
                    cp.wait()
                    flo_ref[0] = lo0

                winv = fbuf[...]
            else:
                winv = words_ref[0, pl.ds(lo0, WIN)]       # [WIN, SB, 128]
            it = lo0 + jax.lax.broadcasted_iota(jnp.int32, (WIN, SB, 128), 0)
            for _ in range(3):                             # three words/pass
                room = nb <= 95
                inwin = (wc >= lo0) & (wc < lo0 + WIN)
                srv = room & (inwin | (wc >= w_rows))
                w = jnp.sum(jnp.where((it == wc[None]) & srv[None], winv,
                                      jnp.int32(0)), axis=0) \
                    .astype(jnp.uint32)
                hi, lo, l2, l3 = _insert(hi, lo, l2, l3, nb, w, srv)
                nb = nb + jnp.where(srv, 32, 0)
                wc = wc + jnp.where(srv, 1, 0)
            unserved = jnp.where(nb >= 27, 0, unserved)
            return hi, lo, l2, l3, nb, wc, unserved

        u0 = need.astype(jnp.int32)
        hi, lo, l2, l3, nb, wc, _ = jax.lax.while_loop(
            cond, body, (hi, lo, l2, l3, nb, wc, u0))
        return hi, lo, l2, l3, nb, wc

    def consume(hi, lo, l2, l3, nb, c):
        cu = c.astype(jnp.uint32)
        nz = c > 0
        sh = ((32 - c) & 31).astype(jnp.uint32)
        sp1 = jnp.where(nz, lo >> sh, jnp.uint32(0))
        sp2 = jnp.where(nz, l2 >> sh, jnp.uint32(0))
        sp3 = jnp.where(nz, l3 >> sh, jnp.uint32(0))
        hi = (hi << cu) | sp1
        lo = (lo << cu) | sp2
        l2 = (l2 << cu) | sp3
        l3 = l3 << cu
        return hi, lo, l2, l3, nb - c

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

    def kernel(words_ref, out_ref, hi_ref, lo_ref, l2_ref, l3_ref, nb_ref,
               wc_ref, *hbm_scratch):
        b = pl.program_id(1)
        aux = None
        if hbm:
            fbuf, flo_ref, sem = hbm_scratch
            aux = (fbuf, flo_ref, sem, pl.program_id(0))

        @pl.when(b == 0)
        def _init():
            hi_ref[:, :] = jnp.zeros((SB, 128), jnp.uint32)
            lo_ref[:, :] = jnp.zeros((SB, 128), jnp.uint32)
            l2_ref[:, :] = jnp.zeros((SB, 128), jnp.uint32)
            l3_ref[:, :] = jnp.zeros((SB, 128), jnp.uint32)
            nb_ref[:, :] = jnp.zeros((SB, 128), jnp.int32)
            wc_ref[:, :] = jnp.zeros((SB, 128), jnp.int32)
            if hbm:
                flo_ref[0] = -1  # fetch cache anchor: invalid

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

        hi, lo, l2 = hi_ref[:, :], lo_ref[:, :], l2_ref[:, :]
        l3 = l3_ref[:, :]
        nb, wc = nb_ref[:, :], wc_ref[:, :]

        # ---------------- DC ----------------
        hi, lo, l2, l3, nb, wc = ensure(words_ref, hi, lo, l2, l3, nb, wc,
                                        aux)
        p16 = (hi >> 16).astype(jnp.int32)
        ln = dec_len(p16, dc_bound)
        code = p16 >> (16 - ln)
        size = jnp.clip(code + sel_by_len(ln, dc_delta), 0, 11)
        hi, lo, l2, l3, nb = consume(hi, lo, l2, l3, nb, ln)
        mant = jnp.where(size > 0,
                         hi >> ((32 - size) & 31).astype(jnp.uint32),
                         jnp.uint32(0))
        diff = extend(mant, size)
        hi, lo, l2, l3, nb = consume(hi, lo, l2, l3, nb, size)

        out_ref[0, 0, 0] = diff.astype(jnp.int16)

        # ---------------- AC loop ----------------
        # Levels accumulate into 32 pair-packed int32 carries (two
        # 16-bit halves; each position is written at most once, so OR
        # is exact) — ~3x cheaper per token than a 63-row VMEM RMW.
        # The body decodes `unroll` tokens per iteration: per-block
        # lockstep iterations are the per-chunk MAX token count (mean
        # ~11, p50 of max ~22 on the corpus), so unrolling divides the
        # divergence tax's iteration count while fixed per-iteration
        # costs (cond reduce, carry traffic) amortize.
        def tok(posd, hi, lo, l2, l3, nb, wc, acc):
            done = posd > 63  # local bool mask (i1 carries don't lower)
            # NOTE: a scalar skip-counter around ensure() (lax.cond fast
            # path for provably-unneeded refills) was MEASURED 12% slower
            # on TPU — Mosaic scalar branches around large vector bodies
            # cost more than the empty ensure's compare+reduce.
            hi, lo, l2, l3, nb, wc = ensure(words_ref, hi, lo, l2, l3, nb,
                                            wc, aux)
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
            wpos = posd + run
            write = (~done) & (~eob) & (~zrl) & (wpos <= 63)
            c1 = jnp.where(done, 0, ln)
            hi, lo, l2, l3, nb = consume(hi, lo, l2, l3, nb, c1)
            mant = jnp.where(size > 0,
                             hi >> ((32 - size) & 31).astype(jnp.uint32),
                             jnp.uint32(0))
            level = extend(mant, size)
            c2 = jnp.where(done, 0, size)
            hi, lo, l2, l3, nb = consume(hi, lo, l2, l3, nb, c2)
            lv16 = jnp.where(write, level & 0xFFFF, 0)
            contrib = jnp.where((wpos & 1) != 0, lv16 << 16, lv16)
            half = wpos >> 1
            for j in range(acc_regs):   # < 32 only for perf experiments
                acc[j] = acc[j] | jnp.where(write & (half == j), contrib, 0)
            posd = jnp.where(done, posd,
                             jnp.where(eob, 64,
                                       jnp.where(zrl, posd + 16, wpos + 1)))
            return posd, hi, lo, l2, l3, nb, wc, acc

        max_it = (64 + unroll - 1) // unroll + 1

        def cond(st):
            it, posd = st[0], st[1]
            # done is encoded as pos > 63; all-done <=> min(pos) > 63
            return (it < max_it) & (jnp.min(posd) <= 63)

        def body(st):
            (it, posd, hi, lo, l2, l3, nb, wc), acc = st[:8], list(st[8])
            for _ in range(unroll):
                posd, hi, lo, l2, l3, nb, wc, acc = tok(
                    posd, hi, lo, l2, l3, nb, wc, acc)
            return (it + 1, posd, hi, lo, l2, l3, nb, wc, tuple(acc))

        zpair = tuple(jnp.zeros((SB, 128), jnp.int32)
                      for _ in range(acc_regs))
        st0 = (jnp.int32(0), jnp.ones((SB, 128), jnp.int32),
               hi, lo, l2, l3, nb, wc, zpair)
        out_st = jax.lax.while_loop(cond, body, st0)
        hi, lo, l2, l3, nb, wc, acc = (out_st[2], out_st[3], out_st[4],
                                       out_st[5], out_st[6], out_st[7],
                                       out_st[8])
        out_ref[0, 0, 1] = (acc[0] >> 16).astype(jnp.int16)
        for j in range(1, acc_regs):
            out_ref[0, 0, 2 * j] = (acc[j] & 0xFFFF).astype(jnp.int16)
            out_ref[0, 0, 2 * j + 1] = (acc[j] >> 16).astype(jnp.int16)

        hi_ref[:, :] = hi
        lo_ref[:, :] = lo
        l2_ref[:, :] = l2
        l3_ref[:, :] = l3
        nb_ref[:, :] = nb
        wc_ref[:, :] = wc

    return kernel


# above this many word rows (4KB each) the stream slab stays in HBM and
# fetch windows are DMAed on demand (see fetch_word hbm path)
HBM_STREAM_ROWS = 1536


@partial(jax.jit, static_argnames=("n_blocks", "interpret", "win", "hbm",
                                   "unroll", "acc_regs"))
def _decode_layout(words, n_blocks: int, interpret: bool = False,
                   win: int = WIN, hbm: bool | None = None,
                   unroll: int = 1, acc_regs: int = 32):
    """words uint32 [CB, W, 8, 128] -> levels int16 [CB, n_blocks, 64, 8, 128].

    `win` sizes the fetch window: lanes whose stream cursors cluster
    (e.g. length-sorted batches) can use a much smaller window.  `hbm`
    keeps the stream in HBM with DMAed fetch windows (auto-enabled for
    streams too long for a VMEM-resident slab)."""
    cbn, w_rows = words.shape[0], words.shape[1]
    if hbm is None:
        hbm = w_rows > HBM_STREAM_ROWS
    kernel = _make_kernel(w_rows, n_blocks, win=win, hbm=hbm,
                          unroll=unroll, acc_regs=acc_regs)
    if hbm:
        in_specs = [pl.BlockSpec(memory_space=pltpu.ANY)]
        scratch = [pltpu.VMEM((SB, 128), jnp.uint32),
                   pltpu.VMEM((SB, 128), jnp.uint32),
                   pltpu.VMEM((SB, 128), jnp.uint32),
                   pltpu.VMEM((SB, 128), jnp.uint32),
                   pltpu.VMEM((SB, 128), jnp.int32),
                   pltpu.VMEM((SB, 128), jnp.int32),
                   pltpu.VMEM((min(win, words.shape[1]), SB, 128),
                              jnp.int32),
                   pltpu.SMEM((1,), jnp.int32),
                   pltpu.SemaphoreType.DMA]
    else:
        in_specs = [pl.BlockSpec((1, w_rows, SB, 128),
                                 lambda i, j: (i, 0, 0, 0))]
        scratch = [pltpu.VMEM((SB, 128), jnp.uint32),
                   pltpu.VMEM((SB, 128), jnp.uint32),
                   pltpu.VMEM((SB, 128), jnp.uint32),
                   pltpu.VMEM((SB, 128), jnp.uint32),
                   pltpu.VMEM((SB, 128), jnp.int32),
                   pltpu.VMEM((SB, 128), jnp.int32)]
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((cbn, n_blocks, 64, SB, 128),
                                       jnp.int16),
        grid=(cbn, n_blocks),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, 64, SB, 128),
                               lambda i, j: (i, j, 0, 0, 0)),
        scratch_shapes=scratch,
        interpret=interpret,
    )(words)


def _pad(n, m):
    return (n + m - 1) // m * m


def scan_words_layout(scans: jnp.ndarray, sb: int = SB) -> jnp.ndarray:
    """scans uint8 [F, max_bytes] (unescaped, zero-padded) ->
    big-endian word slabs int32 [CB, W, sb, 128] for _decode_layout
    (frame f lives at chunk f//(sb*128), sublane (f%(sb*128))//128,
    lane f%128; sb=8 is the production layout, wider sb packs several
    8-sublane groups into one kernel chunk for the lane-width sweep)."""
    F, max_bytes = scans.shape
    fp = _pad(F, sb * 128)
    bp = _pad(max_bytes, 4)
    s = jnp.pad(scans, ((0, fp - F), (0, bp - max_bytes))).astype(jnp.uint32)
    words = ((s[:, 0::4] << 24) | (s[:, 1::4] << 16) |
             (s[:, 2::4] << 8) | s[:, 3::4]).astype(jnp.int32)  # [Fp, W]
    w_rows = words.shape[1]
    cbn = fp // (sb * 128)
    return words.reshape(cbn, sb, 128, w_rows).transpose(0, 3, 1, 2)


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
