"""Lane-async JPEG entropy decode (production: the single-pass DENSE
kernel at the bottom of this module; the token-record IR above it is
kept as a measured negative).

The block-lockstep decoder (entropy_decode_pallas.py) synchronizes all
1024 lanes at every block: its iteration count is the sum over blocks of
the per-chunk MAX token count — measured 1.93x the mean on the corpus
(CLAUDE.md round-2 findings).  Both designs here remove that barrier;
they differ in how the dense coefficient slab gets written:

* Record IR (`_decode_records` + `decode_scans_async_layout`) — the
  round-2 flagged redesign: lanes emit one 32-bit token record per
  iteration at a statically-indexed row (row == iteration), so the
  per-lane-dynamic write problem never arises, and the Pallas phase
  runs at the chunk max of per-lane TOTALS (1.06x mean; 273.8K fps
  standalone on TPU).  MEASURED NEGATIVE: the XLA regroup/expand glue
  that turns records into dense blocks is gather-bound (~30 ns/element
  for every formulation tried — vmapped searchsorted, bit-descent
  probes, contiguous-run slice gathers; 12.9 s vs the lockstep chain's
  64.8 ms).  Kept for the record and its tests.
* DENSE single pass (`decode_scans_async_dense`) — the production
  kernel: same async Huffman core, but lanes densify in-register (32
  pair-packed accumulators) and completed blocks leave through a
  pending slot + ring-buffered output window (amortized one-hot
  service flush, fixed-quantum DMA drain to HBM once every lane has
  deposited the departing blocks).  No XLA glue at all; byte-exact
  with the lockstep decoder, 59.1 ms vs 64.8 on the bench corpus and
  the win compounds in the complete chain (145.6K vs 125.2K fps).

Semantics of both match kernels/entropy_decode_pallas
.decode_scans_pallas (mjpegdec.c:376-430 decode_block): levels in
zigzag order, slot 0 = DC difference.  Invalid streams produce bounded
garbage; per-lane status rows let callers detect short decodes and
fall back to the validating host path.

Ring/unroll sweep on TPU (2026-08-18, F=16384 sorted, byte gates OK) —
all MEASURED NEGATIVE vs defaults (u8: 60.2 ms min, 67,832 iters):
unroll 16 = 65.1 ms @ 84,144 iters (deeper unroll pads the per-lane
tail, iterations INCREASE); output ring 16 = 64.5 ms @ 65,344 (4%
fewer stall iterations, +7% time in flush work).  Together with the
pend-in-registers (+34%), scalar flush gates (+30%) and packed-ring
negatives this pins the kernel at its serial-dependency latency floor;
further gains need a shorter token-cycle critical path, not fewer
iterations.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .entropy_decode_pallas import (_DCL, _DCC, _ACL, _ACC, _ACM_L, _ACM_C,
                                    _ACW, scan_words_layout, _pad,
                                    HBM_STREAM_ROWS)

SB = 8
TROW = 256          # record rows emitted per grid step
WIN = 256           # default windowed-fetch rows


def _b_insert(hi, lo, l2, l3, nb, w, srv):
    """OR word w into the 128-bit (hi, lo, l2, l3) buffer at bit offset
    nb for lanes in srv (callers guarantee nb <= 95)."""
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


def _b_consume(hi, lo, l2, l3, nb, c):
    """Advance the 128-bit buffer by c bits (c <= 31 per call)."""
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


def _b_extend(mant, size):
    """JPEG EXTEND (T.81 F.12): mantissa + size -> signed level."""
    neg = mant < (jnp.uint32(1) << jnp.clip(size - 1, 0, 31)
                  .astype(jnp.uint32))
    full = jnp.left_shift(jnp.int32(1), size) - 1
    m = mant.astype(jnp.int32)
    return jnp.where(size == 0, 0, jnp.where(neg, m - full, m))


def _lsel4(isdc, luma, vdl, vdc, val, vac):
    """(is_dc, luma) -> 4-way table-constant select."""
    d = vdl if vdl == vdc else jnp.where(luma, vdl, vdc)
    a = val if val == vac else jnp.where(luma, val, vac)
    return jnp.where(isdc, d, a)


def tree_sum(xs):
    """Balanced-tree sum: log2(n) dependency depth instead of the n-deep
    chain a sequential loop emits.  The async kernels are LATENCY-bound
    on their token-to-token dependency cycle (measured: removing ~4x of
    the service pass's parallel vector work changed nothing at equal
    iteration counts), so reduction depth on the peek->length->consume
    path is time, op count is not."""
    xs = list(xs)
    while len(xs) > 1:
        nxt = [xs[i] + xs[i + 1] for i in range(0, len(xs) - 1, 2)]
        if len(xs) & 1:
            nxt.append(xs[-1])
        xs = nxt
    return xs[0]


def tree_or(xs):
    """Balanced-tree bitwise OR (see tree_sum)."""
    xs = list(xs)
    while len(xs) > 1:
        nxt = [xs[i] | xs[i + 1] for i in range(0, len(xs) - 1, 2)]
        if len(xs) & 1:
            nxt.append(xs[-1])
        xs = nxt
    return xs[0]


def _token_tables(hi, is_dc, luma):
    """One Huffman symbol from the buffer top: peek16 -> canonical code
    length, then the (run, size) fields via the bit-sliced K.3 AC value
    table (mjpegdec.c:376-430 decode_block table semantics).

    All table reductions are balanced trees (tree_sum/tree_or): this
    computation sits on the serial token-to-token cycle, where
    dependency depth is the measured cost model.

    Returns (ln, size, run, eob, zrl)."""
    p16 = (hi >> 16).astype(jnp.int32)
    ln = tree_sum([
        (p16 >= _lsel4(is_dc, luma, int(_DCL[0][l]), int(_DCC[0][l]),
                       int(_ACL[0][l]), int(_ACC[0][l])))
        .astype(jnp.int32) for l in range(16)])
    ln = jnp.clip(ln + 1, 1, 16)
    dsel = tree_or([
        jnp.where(ln == l,
                  _lsel4(is_dc, luma,
                         int(_DCL[2][l] - _DCL[1][l]),
                         int(_DCC[2][l] - _DCC[1][l]),
                         int(_ACL[2][l] - _ACL[1][l]),
                         int(_ACC[2][l] - _ACC[1][l])), 0)
        for l in range(1, 17)])
    idx = (p16 >> (16 - ln)) + dsel
    idx_ac = jnp.clip(idx, 0, 161)
    wsel = idx_ac >> 5
    shv = (idx_ac & 31).astype(jnp.uint32)
    bits = []
    for b in range(8):
        word = tree_or([
            jnp.where(wsel == w_,
                      (_ACM_L[b][w_] if _ACM_L[b][w_] == _ACM_C[b][w_]
                       else jnp.where(luma, _ACM_L[b][w_], _ACM_C[b][w_])),
                      0)
            for w_ in range(_ACW)])
        bit = (word.astype(jnp.uint32) >> shv) & jnp.uint32(1)
        bits.append(bit.astype(jnp.int32) << b)
    sym = tree_or(bits)
    run = sym >> 4
    size = jnp.where(is_dc, jnp.clip(idx, 0, 11), sym & 0xF)
    eob = (~is_dc) & (sym == 0)
    zrl = (~is_dc) & (sym == 0xF0)
    return ln, size, run, eob, zrl


def _make_ensure(w_rows: int, win: int, hbm: bool, sb: int = SB):
    """Refill closure: identical discipline to
    entropy_decode_pallas.ensure (128-bit buffer, up to three words
    served per window pass), gated by `alive` so finished lanes stop
    touching the stream."""

    def ensure(words_ref, hi, lo, l2, l3, nb, wc, alive, aux=None):
        need = (nb < 27) & alive

        def cond(st):
            return jnp.sum(st[6]) > 0

        def body(st):
            hi, lo, l2, l3, nb, wc, unserved = st
            wcn = jnp.where(unserved != 0, wc, jnp.int32(0x7FFFFFFF))
            lo0 = jnp.clip(jnp.min(wcn), 0, w_rows - win)
            if hbm:
                fbuf, flo_ref, sem, ci = aux

                @pl.when(flo_ref[0] != lo0)
                def _load():
                    cp = pltpu.make_async_copy(
                        words_ref.at[ci, pl.ds(lo0, win)], fbuf, sem)
                    cp.start()
                    cp.wait()
                    flo_ref[0] = lo0

                winv = fbuf[...]
            else:
                winv = words_ref[0, pl.ds(lo0, win)]
            it = lo0 + jax.lax.broadcasted_iota(jnp.int32, (win, sb, 128), 0)
            for _ in range(3):
                room = (nb <= 95) & alive
                inwin = (wc >= lo0) & (wc < lo0 + win)
                srv = room & (inwin | (wc >= w_rows))
                w = jnp.sum(jnp.where((it == wc[None]) & srv[None], winv,
                                      jnp.int32(0)), axis=0) \
                    .astype(jnp.uint32)
                hi, lo, l2, l3 = _b_insert(hi, lo, l2, l3, nb, w, srv)
                nb = nb + jnp.where(srv, 32, 0)
                wc = wc + jnp.where(srv, 1, 0)
            unserved = jnp.where(nb >= 27, 0, unserved)
            return hi, lo, l2, l3, nb, wc, unserved

        u0 = need.astype(jnp.int32)
        hi, lo, l2, l3, nb, wc, _ = jax.lax.while_loop(
            cond, body, (hi, lo, l2, l3, nb, wc, u0))
        return hi, lo, l2, l3, nb, wc

    return ensure


def _make_rec_kernel(w_rows: int, n_blocks: int, t_rows: int,
                     win: int = WIN, hbm: bool = False, unroll: int = 1):
    win = min(win, w_rows)
    assert t_rows % unroll == 0
    ensure = _make_ensure(w_rows, win, hbm)

    def kernel(words_ref, out_ref, st_ref, hi_ref, lo_ref, l2_ref, l3_ref,
               nb_ref, wc_ref, pos_ref, blk_ref, c6_ref, nr_ref,
               *hbm_scratch):
        j = pl.program_id(1)
        n_steps = pl.num_programs(1)
        aux = None
        if hbm:
            fbuf, flo_ref, sem = hbm_scratch
            aux = (fbuf, flo_ref, sem, pl.program_id(0))

        @pl.when(j == 0)
        def _init():
            zu = jnp.zeros((SB, 128), jnp.uint32)
            zi = jnp.zeros((SB, 128), jnp.int32)
            hi_ref[:, :] = zu
            lo_ref[:, :] = zu
            l2_ref[:, :] = zu
            l3_ref[:, :] = zu
            nb_ref[:, :] = zi
            wc_ref[:, :] = zi
            pos_ref[:, :] = zi
            blk_ref[:, :] = zi
            c6_ref[:, :] = zi
            nr_ref[:, :] = zi
            if hbm:
                flo_ref[0] = -1

        blk0 = blk_ref[:, :]

        @pl.when(jnp.min(blk0) < n_blocks)
        def _run():
            hi, lo, l2 = hi_ref[:, :], lo_ref[:, :], l2_ref[:, :]
            l3 = l3_ref[:, :]
            nb, wc = nb_ref[:, :], wc_ref[:, :]
            pos, blk, c6 = pos_ref[:, :], blk_ref[:, :], c6_ref[:, :]
            nrec = nr_ref[:, :]

            def rec_step(tl, hi, lo, l2, l3, nb, wc, pos, blk, c6, nrec):
                alive = blk < n_blocks
                hi, lo, l2, l3, nb, wc = ensure(words_ref, hi, lo, l2, l3,
                                                nb, wc, alive, aux)
                is_dc = pos == 0
                luma = c6 < 4
                ln, size, run, eob, zrl = _token_tables(hi, is_dc, luma)
                c1 = jnp.where(alive, ln, 0)
                hi, lo, l2, l3, nb = _b_consume(hi, lo, l2, l3, nb, c1)
                mant = jnp.where(size > 0,
                                 hi >> ((32 - size) & 31).astype(jnp.uint32),
                                 jnp.uint32(0))
                level = _b_extend(mant, size)
                c2 = jnp.where(alive, size, 0)
                hi, lo, l2, l3, nb = _b_consume(hi, lo, l2, l3, nb, c2)

                wpos = jnp.where(is_dc, 0, pos + run)
                write = alive & (is_dc |
                                 ((~eob) & (~zrl) & (wpos <= 63)))
                newpos = jnp.where(is_dc, 1,
                                   jnp.where(eob, 64,
                                             jnp.where(zrl, pos + 16,
                                                       wpos + 1)))
                rec = ((level << 16) |
                       (is_dc.astype(jnp.int32) << 7) |
                       (write.astype(jnp.int32) << 6) |
                       jnp.clip(wpos, 0, 63))
                rec = jnp.where(alive, rec, 0)
                out_ref[0, pl.ds(tl, 1)] = rec[None]
                blk_end = alive & (~is_dc) & (newpos >= 64)
                blk = blk + blk_end.astype(jnp.int32)
                c6n = c6 + blk_end.astype(jnp.int32)
                c6 = jnp.where(c6n >= 6, 0, c6n)
                pos = jnp.where(blk_end, 0,
                                jnp.where(alive, newpos, pos))
                nrec = nrec + alive.astype(jnp.int32)
                return hi, lo, l2, l3, nb, wc, pos, blk, c6, nrec

            def cond(st):
                return (st[0] < t_rows) & (jnp.min(st[8]) < n_blocks)

            def body(st):
                tl = st[0]
                rest = st[1:]
                for k in range(unroll):
                    rest = rec_step(tl + k, *rest)
                return (tl + unroll,) + rest

            st = (jnp.int32(0), hi, lo, l2, l3, nb, wc, pos, blk, c6, nrec)
            st = jax.lax.while_loop(cond, body, st)
            (_, hi, lo, l2, l3, nb, wc, pos, blk, c6, nrec) = st
            hi_ref[:, :] = hi
            lo_ref[:, :] = lo
            l2_ref[:, :] = l2
            l3_ref[:, :] = l3
            nb_ref[:, :] = nb
            wc_ref[:, :] = wc
            pos_ref[:, :] = pos
            blk_ref[:, :] = blk
            c6_ref[:, :] = c6
            nr_ref[:, :] = nrec

        @pl.when(j == n_steps - 1)
        def _status():
            st_ref[0, 0] = blk_ref[:, :]
            st_ref[0, 1] = nr_ref[:, :]

    return kernel


@partial(jax.jit, static_argnames=("n_blocks", "t_max", "interpret", "win",
                                   "hbm", "unroll"))
def _decode_records(words, n_blocks: int, t_max: int,
                    interpret: bool = False, win: int = WIN,
                    hbm: bool | None = None, unroll: int = 1):
    """words int32 [CB, W, 8, 128] -> (records int32 [CB, T, 8, 128],
    status int32 [CB, 2, 8, 128] = (blocks_done, n_records) per lane).

    T = t_max rounded up to a TROW multiple.  A lane that exhausts t_max
    rows before finishing reports blocks_done < n_blocks (caller falls
    back to the host decoder for that chunk)."""
    cbn, w_rows = words.shape[0], words.shape[1]
    if hbm is None:
        hbm = w_rows > HBM_STREAM_ROWS
    t_rows = TROW
    tc = _pad(t_max, t_rows) // t_rows
    kernel = _make_rec_kernel(w_rows, n_blocks, t_rows, win=win, hbm=hbm,
                              unroll=unroll)
    scratch = ([pltpu.VMEM((SB, 128), jnp.uint32)] * 4 +
               [pltpu.VMEM((SB, 128), jnp.int32)] * 6)
    if hbm:
        in_specs = [pl.BlockSpec(memory_space=pltpu.ANY)]
        scratch += [pltpu.VMEM((min(win, w_rows), SB, 128), jnp.int32),
                    pltpu.SMEM((1,), jnp.int32),
                    pltpu.SemaphoreType.DMA]
    else:
        in_specs = [pl.BlockSpec((1, w_rows, SB, 128),
                                 lambda i, j: (i, 0, 0, 0))]
    return pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((cbn, tc * t_rows, SB, 128),
                                        jnp.int32),
                   jax.ShapeDtypeStruct((cbn, 2, SB, 128), jnp.int32)),
        grid=(cbn, tc),
        in_specs=in_specs,
        out_specs=(pl.BlockSpec((1, t_rows, SB, 128),
                                lambda i, j: (i, j, 0, 0)),
                   pl.BlockSpec((1, 2, SB, 128), lambda i, j: (i, 0, 0, 0))),
        scratch_shapes=scratch,
        interpret=interpret,
    )(words)


# ---------------------------------------------------------------------------
# Phase 2: record expander (lanes = blocks)
# ---------------------------------------------------------------------------

def _make_expand_kernel(rmax: int, acc_regs: int = 32):
    def kernel(recs_ref, cnt_ref, out_ref):
        cnt = cnt_ref[0, 0]
        cmax = jnp.max(cnt)

        def cond(st):
            return st[0] < cmax

        def body(st):
            t = st[0]
            acc = list(st[1:])
            rec = recs_ref[0, pl.ds(t, 1)][0]
            w = (t < cnt) & (((rec >> 6) & 1) != 0)
            level = rec >> 16                      # arithmetic: sign ok
            wpos = rec & 63
            lv16 = jnp.where(w, level & 0xFFFF, 0)
            contrib = jnp.where((wpos & 1) != 0, lv16 << 16, lv16)
            half = wpos >> 1
            for k in range(acc_regs):
                acc[k] = acc[k] | jnp.where(w & (half == k), contrib, 0)
            return (t + 1,) + tuple(acc)

        z = tuple(jnp.zeros((SB, 128), jnp.int32) for _ in range(acc_regs))
        st = jax.lax.while_loop(cond, body, (jnp.int32(0),) + z)
        acc = st[1:]
        for k in range(acc_regs):
            out_ref[0, 2 * k] = (acc[k] & 0xFFFF).astype(jnp.int16)
            out_ref[0, 2 * k + 1] = (acc[k] >> 16).astype(jnp.int16)

    return kernel


@partial(jax.jit, static_argnames=("rmax", "interpret"))
def _expand_records(recs, cnt, rmax: int, interpret: bool = False):
    """recs int32 [NCH, rmax, 8, 128] (per-block record rows), cnt int32
    [NCH, 1, 8, 128] -> levels int16 [NCH, 64, 8, 128] (zigzag, slot 0 =
    DC difference)."""
    nch = recs.shape[0]
    return pl.pallas_call(
        _make_expand_kernel(rmax),
        out_shape=jax.ShapeDtypeStruct((nch, 64, SB, 128), jnp.int16),
        grid=(nch,),
        in_specs=[pl.BlockSpec((1, rmax, SB, 128), lambda i: (i, 0, 0, 0)),
                  pl.BlockSpec((1, 1, SB, 128), lambda i: (i, 0, 0, 0))],
        out_specs=pl.BlockSpec((1, 64, SB, 128), lambda i: (i, 0, 0, 0)),
        interpret=interpret,
    )(recs, cnt)


# ---------------------------------------------------------------------------
# XLA glue
# ---------------------------------------------------------------------------

RMAX = 64  # records per block never exceed 64 (distinct zigzag slots +
           # ZRL/EOB markers can't outnumber the 64 slots they advance)


def _searchsorted_rows(a, v):
    """Batched searchsorted-left: a [N, T] row-sorted, v [B] -> [N, B].

    Bit-descent probes with take_along_axis (contiguous small gathers);
    vmapped jnp.searchsorted lowers to a pathologically slow gather
    chain on TPU (measured ~30x the whole decode kernel)."""
    N, T = a.shape
    B = v.shape[0]
    nbits = max(1, (T - 1).bit_length())
    q = jnp.broadcast_to(v[None, :], (N, B))
    lo = jnp.zeros((N, B), jnp.int32)
    for s in reversed(range(nbits)):
        cand = lo + (1 << s)
        probe = jnp.take_along_axis(a, jnp.clip(cand - 1, 0, T - 1), axis=1)
        ok = (cand <= T) & (probe < q)
        lo = jnp.where(ok, cand, lo)
    return lo


def _gather_runs(a, starts, run: int):
    """out[n, b, :] = a[n, starts[n, b] : starts[n, b] + run] — gather of
    CONTIGUOUS runs (lowered as a slice gather, the only gather shape
    the TPU executes at bandwidth; per-element take_along_axis is ~30x
    slower)."""
    def one(row, s):
        return jax.lax.dynamic_slice_in_dim(row, s, run)

    return jax.vmap(jax.vmap(one, in_axes=(None, 0)))(a, starts)


def _take_rows(a, idx):
    """out[n, b] = a[n, idx[n, b]] for a [N, B, K] (row gather: each
    gathered unit is a contiguous K-vector)."""
    return jax.vmap(lambda rows, i: jnp.take(rows, i, axis=0))(a, idx)


@partial(jax.jit, static_argnames=("n_blocks", "t_max", "interpret", "win",
                                   "unroll", "rank_sort"))
def decode_scans_async_layout(words, n_blocks: int, t_max: int,
                              interpret: bool = False, win: int = WIN,
                              unroll: int = 1, rank_sort: bool = True):
    """words int32 [CB, W, 8, 128] -> (levels int16
    [CB, n_blocks, 64, 8, 128], ok bool []) via the record IR.

    `ok` is False when any lane ran out of record rows or finished short
    (malformed stream); levels are then garbage and the caller must use
    the host path.  rank_sort orders expander lanes by per-frame record-
    count rank so each expander chunk sees near-uniform counts."""
    cbn = words.shape[0]
    fp = cbn * SB * 128
    recs, status = _decode_records(words, n_blocks, t_max,
                                   interpret=interpret, win=win,
                                   unroll=unroll)
    T = recs.shape[1]
    ok = jnp.all(status[:, 0] == n_blocks)
    # [CB, SB, 128] flattens to the same frame order scan_words_layout
    # packs: frame f = (f // 1024, (f % 1024) // 128, f % 128)
    nrec = status[:, 1].reshape(fp)
    rec_fm = recs.transpose(0, 2, 3, 1).reshape(fp, T)
    isdc = (rec_fm >> 7) & 1
    bid = jnp.cumsum(isdc, axis=1) - 1
    start = _searchsorted_rows(bid, jnp.arange(n_blocks, dtype=jnp.int32))
    ends = jnp.concatenate([start[:, 1:], nrec[:, None]], axis=1)
    counts = ends - start                                 # [fp, B]
    if rank_sort:
        perm = jnp.argsort(-counts, axis=1)               # rank 0 = busiest
    else:
        perm = jnp.broadcast_to(jnp.arange(n_blocks), (fp, n_blocks))
    st_p = jnp.take_along_axis(start, perm, axis=1)
    ct_p = jnp.take_along_axis(counts, perm, axis=1)
    # gather records per (frame, rank): [fp, B, RMAX] contiguous runs
    rec_pad = jnp.pad(rec_fm, ((0, 0), (0, RMAX)))
    rec_g = _gather_runs(rec_pad, jnp.clip(st_p, 0, T - 1), RMAX)
    # chunk rank-major: [B, fp, RMAX] -> [nch, 1024, RMAX] -> kernel slab
    nch = n_blocks * fp // 1024
    rk = rec_g.transpose(1, 0, 2).reshape(nch, 1024, RMAX) \
        .transpose(0, 2, 1).reshape(nch, RMAX, SB, 128)
    ck = ct_p.T.reshape(nch, 1024, 1).transpose(0, 2, 1) \
        .reshape(nch, 1, SB, 128)
    lv = _expand_records(rk, ck, RMAX, interpret=interpret)
    # [nch, 64, SB, 128] -> [B(rank), fp, 64] -> unsort -> slab
    lv_rank = lv.reshape(nch, 64, 1024).transpose(0, 2, 1) \
        .reshape(n_blocks, fp, 64).transpose(1, 0, 2)     # [fp, rank, 64]
    iperm = jnp.argsort(perm, axis=1)
    lv_fm = _take_rows(lv_rank, iperm)
    slab = lv_fm.reshape(cbn, SB, 128, n_blocks, 64) \
        .transpose(0, 3, 4, 1, 2)
    return slab, ok


def default_t_max(n_blocks: int, max_bytes: int) -> int:
    """Record-row budget: generous vs the corpus (~12 records/block mean,
    <= 64 hard), capped by the information-theoretic bound of 2 bits per
    record.  Overflow is detected (status) and falls back to host."""
    return int(min(n_blocks * 64 + 8, 16 * n_blocks + 512,
                   max(max_bytes * 4, 1024)))


import functools


@functools.lru_cache(maxsize=8)
def empty_scan_bytes(n_mcu: int) -> bytes:
    """Unescaped scan of n_mcu empty MCUs (DC diff 0 + EOB per block):
    the pad-lane filler.  Zero padding would decode as an endless run of
    AC (0,1) symbols ('00' is NOT EOB in K.3 luma) and drag every lane
    of the chunk to the full record budget."""
    from ..bitstream import jpeg_tables as T
    dc_l = T.build_huffman_codes(T.BITS_DC_LUMA, T.VALS_DC_LUMA)
    dc_c = T.build_huffman_codes(T.BITS_DC_CHROMA, T.VALS_DC_CHROMA)
    ac_l = T.build_huffman_codes(T.BITS_AC_LUMA, T.VALS_AC_LUMA)
    ac_c = T.build_huffman_codes(T.BITS_AC_CHROMA, T.VALS_AC_CHROMA)
    acc_bits, nb_acc, out = 0, 0, bytearray()
    for b in range(n_mcu * 6):
        luma = (b % 6) < 4
        for tab, sym in (((dc_l if luma else dc_c), 0),
                         ((ac_l if luma else ac_c), 0)):
            sizes, codes = tab
            acc_bits = (acc_bits << int(sizes[sym])) | int(codes[sym])
            nb_acc += int(sizes[sym])
            while nb_acc >= 8:
                nb_acc -= 8
                out.append((acc_bits >> nb_acc) & 0xFF)
    if nb_acc:
        out.append(((acc_bits << (8 - nb_acc)) | ((1 << (8 - nb_acc)) - 1))
                   & 0xFF)
    return bytes(out)


@partial(jax.jit, static_argnames=("n_mcu", "interpret", "win", "t_max",
                                   "unroll", "rank_sort"))
def decode_scans_async(scans, n_mcu: int, t_max: int,
                       interpret: bool = False, win: int = WIN,
                       unroll: int = 1, rank_sort: bool = True):
    """scans uint8 [F, max_bytes] (unescaped, zero-padded) -> (levels
    int16 [F, n_mcu, 6, 64] zigzag with slot 0 = DC difference, ok).

    Drop-in for decode_scans_pallas, built on the async record IR."""
    F = scans.shape[0]
    n_blocks = n_mcu * 6
    fp = _pad(F, SB * 128)
    if fp > F:
        pad = np.frombuffer(empty_scan_bytes(n_mcu), np.uint8)
        width = max(scans.shape[1], len(pad))
        prow = np.zeros((1, width), np.uint8)
        prow[0, :len(pad)] = pad
        scans = jnp.concatenate(
            [jnp.pad(scans, ((0, 0), (0, width - scans.shape[1]))),
             jnp.broadcast_to(jnp.asarray(prow), (fp - F, width))], axis=0)
    wl = scan_words_layout(scans)
    slab, ok = decode_scans_async_layout(wl, n_blocks, t_max,
                                         interpret=interpret, win=win,
                                         unroll=unroll, rank_sort=rank_sort)
    lv = slab.transpose(0, 3, 4, 1, 2).reshape(fp, n_blocks, 64)
    return lv[:F].reshape(F, n_mcu, 6, 64), ok


# ---------------------------------------------------------------------------
# Single-pass lane-async DENSE decoder: windowed block emit, no record IR
# ---------------------------------------------------------------------------
#
# The record-IR pair above proves the async Huffman core (chunk-max-of-
# totals iteration count, ~1.06x mean) but its XLA regroup/expand glue
# is gather-bound on TPU (measured seconds vs the 35 ms lockstep chain).
# This kernel keeps everything in one pass: lanes decode asynchronously
# and densify in-register (32 pair-packed accumulators, exactly like the
# lockstep kernel), and completed blocks leave through a pending slot +
# ring-buffered output window:
#
# * on block end a lane moves its accumulators to a VMEM pending slot
#   (pend[32] + pend_bid); if the slot is still occupied the lane
#   DEFERS (re-decodes the same token next iteration -- no state
#   committed), which only happens when service is overdue;
# * every `pmax` iterations a service pass flushes every pending block
#   whose bid lies in the current WB-block output window into the ring
#   (per-ring-slot compare+select -- the same amortized one-hot trick
#   as the encoder's windowed word emit), then advances the window in
#   ADV-block quanta with a VMEM->HBM DMA once every lane has deposited
#   the blocks leaving it (frontier = min over lanes of the earliest
#   undeposited block);
# * iteration count is therefore the chunk max of per-lane token totals
#   (~1.06x mean on sorted batches) plus bounded stall/service overhead
#   instead of the 1.93x per-block lockstep tax.
#
# Semantics match entropy_decode_pallas._decode_layout (mjpegdec.c:
# 376-430 decode_block): dense zigzag levels, slot 0 = DC difference.

WBD = 8     # output window, blocks (ring; power of two)
ADV = 4     # DMA drain quantum, blocks (WBD/2)


def _make_dense_kernel(w_rows: int, n_blocks: int, nbp: int, t_max: int,
                       win: int = WIN, hbm: bool = False, unroll: int = 1,
                       wb: int = WBD, adv: int = ADV, pmax: int = 16,
                       press: int = 0, packed: bool = False, sb: int = SB):
    win = min(win, w_rows)
    assert wb & (wb - 1) == 0 and adv <= wb and nbp % adv == 0
    assert pmax & (pmax - 1) == 0
    ensure = _make_ensure(w_rows, win, hbm, sb=sb)
    pr = 32 if packed else 64           # output ring rows per block

    def kernel(words_ref, out_ref, st_ref, owin, pend_ref, pv_ref,
               pbid_ref, wb_ref, sem, *hbm_scratch):
        ci = pl.program_id(0)
        aux = None
        if hbm:
            fbuf, flo_ref, hsem = hbm_scratch
            aux = (fbuf, flo_ref, hsem, ci)
            flo_ref[0] = -1
        owin[...] = jnp.zeros((wb * pr, sb, 128),
                              jnp.int32 if packed else jnp.int16)
        pend_ref[...] = jnp.zeros((32, sb, 128), jnp.int32)
        pv_ref[...] = jnp.zeros((sb, 128), jnp.int32)
        pbid_ref[...] = jnp.zeros((sb, 128), jnp.int32)
        wb_ref[0] = 0

        def service(eff_done):
            """Flush in-window pendings into the ring (per-slot scalar
            gate: most ring slots are empty at any service), then
            advance the window in `adv`-block DMA quanta while every
            lane has deposited the blocks leaving it."""

            def cond(go):
                return go > 0

            def body(go):
                wbase = wb_ref[0]
                pvv = pv_ref[...]
                pbb = pbid_ref[...]
                inwin = (pvv != 0) & (pbb >= wbase) & (pbb < wbase + wb)
                # NOTE: a per-slot scalar gate (@pl.when on jnp.max(m))
                # around this flush measured 84.4 ms vs 64.7 ms plain on
                # TPU — Mosaic scalar branches around big vector bodies
                # lose, exactly like the round-2 skip-counter negative.
                if packed:
                    # the pending accumulators already hold pair-packed
                    # int32 rows: the flush is a straight 32-row masked
                    # store (half the RMWs of the int16 split)
                    for slot in range(wb):
                        m = inwin & ((pbb & (wb - 1)) == slot)
                        for r in range(32):
                            owin[slot * 32 + r] = jnp.where(
                                m, pend_ref[r], owin[slot * 32 + r])
                else:
                    for slot in range(wb):
                        m = inwin & ((pbb & (wb - 1)) == slot)
                        for r in range(32):
                            v = pend_ref[r]
                            owin[slot * 64 + 2 * r] = jnp.where(
                                m, (v & 0xFFFF).astype(jnp.int16),
                                owin[slot * 64 + 2 * r])
                            owin[slot * 64 + 2 * r + 1] = jnp.where(
                                m, (v >> 16).astype(jnp.int16),
                                owin[slot * 64 + 2 * r + 1])
                pvv = jnp.where(inwin, 0, pvv)
                pv_ref[...] = pvv
                eff = jnp.where(pvv != 0, pbb, eff_done)
                frontier = jnp.minimum(jnp.min(eff), nbp)
                adv_ok = (frontier - wbase >= adv) & (wbase < nbp)

                @pl.when(adv_ok)
                def _adv():
                    slot0 = wbase & (wb - 1)
                    cp = pltpu.make_async_copy(
                        owin.at[pl.ds(slot0 * pr, adv * pr)],
                        out_ref.at[ci, pl.ds(wbase * pr, adv * pr)], sem)
                    cp.start()
                    cp.wait()
                    wb_ref[0] = wbase + adv

                return jnp.where(adv_ok, jnp.int32(1), jnp.int32(0))

            jax.lax.while_loop(cond, body, jnp.int32(1))

        def token_step(st):
            hi, lo, l2, l3, nbb, wc, pos, bid, c6 = st[:9]
            acc = list(st[9:9 + 32])
            alive = bid < n_blocks
            hi, lo, l2, l3, nbb, wc = ensure(words_ref, hi, lo, l2, l3,
                                             nbb, wc, alive, aux)
            is_dc = pos == 0
            luma = c6 < 4
            ln, size, run, eob, zrl = _token_tables(hi, is_dc, luma)
            wpos = jnp.where(is_dc, 0, pos + run)
            write0 = is_dc | ((~eob) & (~zrl) & (wpos <= 63))
            newpos = jnp.where(is_dc, 1,
                               jnp.where(eob, 64,
                                         jnp.where(zrl, pos + 16,
                                                   wpos + 1)))
            blk_end = (~is_dc) & (newpos >= 64)
            pvv = pv_ref[...]
            # a lane whose pending slot is still occupied commits
            # nothing this iteration and re-decodes the token after the
            # next service pass frees the slot
            defer = alive & blk_end & (pvv != 0)
            commit = alive & ~defer
            # single consume per token: the mantissa sits at bit offset
            # ln of the pre-consume buffer (ln >= 1, so the funnel shift
            # never hits a shift-by-32), and ln + size <= 27 fits one
            # _b_consume call — saves a full 128-bit shift chain per
            # token vs the consume(ln); consume(size) pair
            top = (hi << ln.astype(jnp.uint32)) | \
                (lo >> (32 - ln).astype(jnp.uint32))
            mant = jnp.where(size > 0,
                             top >> ((32 - size) & 31).astype(jnp.uint32),
                             jnp.uint32(0))
            level = _b_extend(mant, size)
            c1 = jnp.where(commit, ln + size, 0)
            hi, lo, l2, l3, nbb = _b_consume(hi, lo, l2, l3, nbb, c1)
            write = commit & write0
            lv16 = jnp.where(write, level & 0xFFFF, 0)
            contrib = jnp.where((wpos & 1) != 0, lv16 << 16, lv16)
            half = jnp.clip(wpos, 0, 63) >> 1
            endc = blk_end & commit
            for r in range(32):
                a = acc[r] | jnp.where(write & (half == r), contrib, 0)
                pend_ref[r] = jnp.where(endc, a, pend_ref[r])
                acc[r] = jnp.where(endc, 0, a)
            pbid_ref[...] = jnp.where(endc, bid, pbid_ref[...])
            pv_ref[...] = jnp.where(endc, 1, pvv)
            bid = bid + endc.astype(jnp.int32)
            c6n = c6 + endc.astype(jnp.int32)
            c6 = jnp.where(c6n >= 6, 0, c6n)
            pos = jnp.where(endc, 0, jnp.where(commit, newpos, pos))
            return (hi, lo, l2, l3, nbb, wc, pos, bid, c6,
                    *acc), defer

        def cond(st):
            return (st[0] < t_max) & (jnp.min(st[8]) < n_blocks)

        def body(st):
            tl = st[0]
            rest = st[1:]
            dfr = jnp.zeros((sb, 128), jnp.bool_)
            for _ in range(unroll):
                rest, d = token_step(rest)
                dfr = dfr | d
            # periodic service; press > 0 adds a defer-count
            # pressure trigger (scalar reduce per group) that cuts
            # stall iterations at the cost of extra service passes.
            # pmax <= ~16 keeps empty-block lanes (a block per ~2
            # tokens, one pending slot) from starving into t_max
            trig = (tl & (pmax - 1)) == 0
            if press:
                trig = trig | (jnp.sum(dfr.astype(jnp.int32)) >= press)

            @pl.when(trig)
            def _svc():
                service(rest[7])

            return (tl + unroll,) + rest

        zu = jnp.zeros((sb, 128), jnp.uint32)
        zi = jnp.zeros((sb, 128), jnp.int32)
        st = (jnp.int32(0), zu, zu, zu, zu, zi, zi, zi, zi, zi) + \
            tuple(zi for _ in range(32))
        st = jax.lax.while_loop(cond, body, st)
        bid_f = st[8]
        st_ref[0, 0] = bid_f
        st_ref[0, 1] = jnp.full((sb, 128), st[0], jnp.int32)
        # final drain: flush the tail pendings and push the window to nbp
        service(jnp.full((sb, 128), nbp, jnp.int32))

    return kernel


@partial(jax.jit, static_argnames=("n_blocks", "t_max", "interpret", "win",
                                   "hbm", "unroll", "wb", "adv", "pmax",
                                   "press", "packed", "return_status",
                                   "sb"))
def decode_scans_async_dense(words, n_blocks: int, t_max: int,
                             interpret: bool = False, win: int = WIN,
                             hbm: bool | None = None, unroll: int = 1,
                             wb: int = WBD, adv: int = ADV,
                             pmax: int = 16, press: int = 0,
                             packed: bool = False,
                             return_status: bool = False, sb: int = SB):
    """words int32 [CB, W, 8, 128] -> (levels int16
    [CB, n_blocks, 64, 8, 128], ok bool []) via the single-pass async
    dense kernel.

    packed: keep the output ring in the pending accumulators'
    pair-packed int32 form (32 rows/block), halving the flush RMWs of
    the service pass, with one XLA unpack pass after.  MEASURED
    NEGATIVE on TPU (2026-08-18, F=16384 sorted corpus): 63.5 ms vs
    60.0 ms unpacked at identical iteration counts — the kernel is
    latency-bound on its serial dependency chains, so removing
    parallel vector work from the service pass buys nothing and the
    unpack pass adds its own cost.  Kept for the record + tests.

    Same output contract as entropy_decode_pallas._decode_layout; `ok`
    False means some lane ran out of its t_max iteration budget
    (malformed stream or extreme stall) and the slab is garbage -> the
    caller must fall back to the lockstep or host path."""
    cbn, w_rows = words.shape[0], words.shape[1]
    assert words.shape[2] == sb, (words.shape, sb)
    if hbm is None:
        # VMEM budget scales with the lane tile: wider sb streams from
        # HBM at proportionally fewer input rows
        hbm = w_rows * sb > HBM_STREAM_ROWS * 8
    nbp = (n_blocks + adv - 1) // adv * adv
    kernel = _make_dense_kernel(w_rows, n_blocks, nbp, t_max, win=win,
                                hbm=hbm, unroll=unroll, wb=wb, adv=adv,
                                pmax=pmax, press=press, packed=packed,
                                sb=sb)
    pr = 32 if packed else 64
    scratch = [pltpu.VMEM((wb * pr, sb, 128),
                          jnp.int32 if packed else jnp.int16),   # owin
               pltpu.VMEM((32, sb, 128), jnp.int32),        # pend
               pltpu.VMEM((sb, 128), jnp.int32),            # pv
               pltpu.VMEM((sb, 128), jnp.int32),            # pbid
               pltpu.SMEM((1,), jnp.int32),                 # wbase
               pltpu.SemaphoreType.DMA]                     # out DMA
    if hbm:
        in_specs = [pl.BlockSpec(memory_space=pltpu.ANY)]
        scratch += [pltpu.VMEM((min(win, w_rows), sb, 128), jnp.int32),
                    pltpu.SMEM((1,), jnp.int32),
                    pltpu.SemaphoreType.DMA]
    else:
        in_specs = [pl.BlockSpec((1, w_rows, sb, 128),
                                 lambda i: (i, 0, 0, 0))]
    out, st = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((cbn, nbp * pr, sb, 128),
                                        jnp.int32 if packed
                                        else jnp.int16),
                   jax.ShapeDtypeStruct((cbn, 2, sb, 128), jnp.int32)),
        grid=(cbn,),
        in_specs=in_specs,
        out_specs=(pl.BlockSpec(memory_space=pltpu.ANY),
                   pl.BlockSpec((1, 2, sb, 128), lambda i: (i, 0, 0, 0))),
        scratch_shapes=scratch,
        interpret=interpret,
    )(words)
    ok = jnp.all(st[:, 0] == n_blocks)
    if packed:
        p = out.reshape(cbn, nbp, 32, sb, 128)[:, :n_blocks]
        lo = ((p << 16) >> 16).astype(jnp.int16)
        hi = (p >> 16).astype(jnp.int16)
        slab = jnp.stack([lo, hi], axis=3) \
            .reshape(cbn, n_blocks, 64, sb, 128)
    else:
        slab = out.reshape(cbn, nbp, 64, sb, 128)[:, :n_blocks]
    if return_status:
        # st[:, 1] = executed iterations per chunk (incl. defer retries)
        return slab, ok, st
    return slab, ok


def default_t_max_dense(n_blocks: int, max_bytes: int) -> int:
    """Iteration budget for the dense async kernel: the record budget
    plus slack for defer/stall retries (measured < 10% on sorted
    batches; 50% margin here).  Overflow is detected and falls back."""
    return (default_t_max(n_blocks, max_bytes) * 3) // 2
