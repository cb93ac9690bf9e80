"""Lane-async JPEG entropy encode (production: the single-pass DENSE
kernel at the bottom of this module; the tokenizer+packer pair above it
is kept as a measured negative).

The block-lockstep packer (entropy_encode_pallas.py) pays the per-block
chunk-MAX token count — measured 2.29x the mean on the corpus.

MEASURED NEGATIVE (record pair): the XLA tokenizer's binary-search
compaction rides per-lane take_along_axis gathers — the same ~30
ns/element wall as the decoder's record regroup — and its HLO at
bench batch sizes exceeded the remote-compile request limit outright.
The production path is `encode_layout_async_dense` below: a mirror of
the dense async decoder where lanes emit one Huffman token per
iteration at their own block position, reading blocks from a VMEM
input ring prefetched out of HBM (service pass stages each lane's next
block; ring advances in fixed DMA quanta).  Byte-exact with the
lockstep packer; 67.8 ms vs 80.5 standalone on the bench corpus.

The retained record pair, for reference — the sequential kernel does
ONLY bit-packing:

* `tokenize_levels_layout` (pure XLA, fully data-parallel, slab layout):
  derives every Huffman token of every block at once — DC differences,
  AC (run, size) symbols, ZRL and EOB markers — as a sparse per-slot
  site array, then compacts it into a per-lane record STREAM with a
  binary-search gather (no scatters).  Key trick: a block's ZRL markers
  are placed at the zero slots 16/32/48 positions after the previous
  nonzero, and its EOB at slot last_nonzero+1 — all distinct, so every
  record of a block owns one of its 64 slots and in-block order is just
  slot order.  Each record becomes (code<<5 | len): code is the Huffman
  code with the mantissa appended (<= 26 bits), len <= 27.
* `_pack_records` (Pallas): lanes = frames consume exactly one record
  per iteration from statically-indexed rows (records are length-
  aligned per lane by construction, so the fetch is out_ref-style
  scalar indexing — no masked window gathers at all), append it to the
  128-bit bit-writer and spill full words through the same lazy window
  emit as the lockstep kernel.  On a sorted batch its iteration count
  is the chunk max of per-lane totals: measured 1.088x mean.

Bit-exact with bitstream/entropy.huffman_encode_frame (mjpegenc.c
encode_block/escape_FF semantics); output feeds native.escape_frames /
concat_escape_frames unchanged.  Segmented big-frame encode reuses the
same records: a segment is a contiguous record range (DC differences
are chain-global, so splitting at block boundaries changes nothing).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..bitstream import jpeg_tables as T
from .entropy_async_pallas import tree_or
from .entropy_encode_pallas import _ET, _ACE_L, _ACE_C, _packed, _pad

SB = 8
WIN_O = 128


# ---------------------------------------------------------------------------
# Tokenizer (XLA)
# ---------------------------------------------------------------------------

def _bitlen(v):
    r = jnp.zeros(v.shape, jnp.int32)
    x = v
    for s in (8, 4, 2, 1):
        m = x >= (1 << s)
        r = r + jnp.where(m, s, 0)
        x = jnp.where(m, x >> s, x)
    return r + (v > 0).astype(jnp.int32)


def _sel_small(idx, consts_l, consts_c, luma):
    """out[...] = (luma ? consts_l : consts_c)[idx] via compare-selects
    (no gathers; the tables are tiny).  Tree-reduced: these selects sit
    on the encoder's serial token-to-token cycle, which is
    latency-bound (see entropy_async_pallas.tree_sum)."""
    return tree_or([
        jnp.where(idx == i,
                  (consts_l[i] if consts_l[i] == consts_c[i]
                   else jnp.where(luma, consts_l[i], consts_c[i])), 0)
        for i in range(len(consts_l))])


def _ac_code_len(rs, luma):
    """Canonical AC (code, len) for rs = run*16 + size via the packed
    ln4/bit-plane tables (entropy_encode_pallas._ac_canonical).  All
    table reductions are balanced trees (latency-bound cycle)."""
    rsx = jnp.clip((rs >> 4) * 10 + (rs & 15) - 1, 0, 159)
    wsel = rsx >> 5
    shv = (rsx & 31).astype(jnp.uint32)
    cbits = []
    for b in range(8):
        wd = tree_or([
            jnp.where(wsel == i,
                      (_ACE_L[1][b][i] if _ACE_L[1][b][i] == _ACE_C[1][b][i]
                       else jnp.where(luma, _ACE_L[1][b][i],
                                      _ACE_C[1][b][i])), 0)
            for i in range(5)])
        bit = (wd.astype(jnp.uint32) >> shv) & jnp.uint32(1)
        cbits.append(bit.astype(jnp.int32) << b)
    cidx = tree_or(cbits)
    w4 = tree_or([
        jnp.where((rsx >> 3) == i,
                  (_ACE_L[0][i] if _ACE_L[0][i] == _ACE_C[0][i]
                   else jnp.where(luma, _ACE_L[0][i], _ACE_C[0][i])), 0)
        for i in range(20)])
    lnc = 2 + ((w4.astype(jnp.uint32) >>
                ((rsx & 7) << 2).astype(jnp.uint32)).astype(jnp.int32) & 15)
    dsel = tree_or([
        jnp.where(lnc == l,
                  (_ACE_L[2][l] if _ACE_L[2][l] == _ACE_C[2][l]
                   else jnp.where(luma, _ACE_L[2][l], _ACE_C[2][l])), 0)
        for l in range(2, 17)])
    return cidx - dsel, lnc


def _lower_bound(cum, q, length):
    """src[..., t] = searchsorted_left(cum[..., :length], q[..., t]) via
    bit-descent probes (take_along_axis only — no scatters, no vmap).
    cum nondecreasing along axis 1 of [CB, length, SB, 128]; q
    [CB, Tq, SB, 128]."""
    nbits = max(1, (length - 1).bit_length())
    lo = jnp.zeros(q.shape, jnp.int32)
    for s in reversed(range(nbits)):
        cand = lo + (1 << s)
        probe = jnp.take_along_axis(cum, jnp.clip(cand - 1, 0, length - 1),
                                    axis=1)
        ok = (cand <= length) & (probe < q)
        lo = jnp.where(ok, cand, lo)
    return lo


@partial(jax.jit, static_argnames=("n_mcu", "t_max"))
def tokenize_levels_layout(lv2, n_mcu: int, t_max: int):
    """lv2 int16 [CB, NB, 64, SB, 128] zigzag (slot0 = ABSOLUTE quantized
    DC) -> (recs int32 [CB, t_max, SB, 128] of (code<<5 | len), totals
    int32 [CB, 1, SB, 128], block_off int32 [CB, NB+1, SB, 128], ok).

    Everything data-parallel; `ok` is False when a lane's record total
    exceeds t_max (caller falls back to the lockstep packer)."""
    cbn, NB = lv2.shape[0], lv2.shape[1]
    M = NB // 6
    v = lv2.astype(jnp.int32)                        # [CB, NB, 64, SB, 128]

    # --- DC differences (chain-global per component) ---
    dc = v[:, :, 0]                                  # [CB, NB, SB, 128]
    dcm = dc.reshape(cbn, M, 6, SB, 128)
    dy = dcm[:, :, :4].reshape(cbn, M * 4, SB, 128)
    py = jnp.concatenate(
        [jnp.full((cbn, 1, SB, 128), 128, jnp.int32), dy[:, :-1]], axis=1)
    diffy = (dy - py).reshape(cbn, M, 4, SB, 128)
    pcb = jnp.concatenate(
        [jnp.full((cbn, 1, SB, 128), 128, jnp.int32), dcm[:, :-1, 4]],
        axis=1)
    pcr = jnp.concatenate(
        [jnp.full((cbn, 1, SB, 128), 128, jnp.int32), dcm[:, :-1, 5]],
        axis=1)
    diffc = jnp.stack([dcm[:, :, 4] - pcb, dcm[:, :, 5] - pcr], axis=2)
    dcdiff = jnp.concatenate([diffy, diffc], axis=2) \
        .reshape(cbn, NB, SB, 128)

    # --- per-slot token sites ---
    k = jnp.arange(64, dtype=jnp.int32).reshape(1, 1, 64, 1, 1)
    nz = (v != 0) & (k > 0)
    nzi = jnp.where(nz, k, 0)
    pn_inc = jax.lax.cummax(nzi, axis=2)
    pn_excl = jnp.concatenate(
        [jnp.zeros_like(pn_inc[:, :, :1]), pn_inc[:, :, :-1]], axis=2)
    lastnz = pn_inc[:, :, 63:64]                     # [CB, NB, 1, SB, 128]
    d = k - pn_excl - 1
    is_dc = k == 0
    is_sym = nz
    is_zrl = (~nz) & (k > 0) & (((d + 1) & 15) == 0) & (k < lastnz)
    is_eob = (k == lastnz + 1)
    valid = is_dc | is_sym | is_zrl | is_eob
    luma6 = (jnp.arange(NB, dtype=jnp.int32) % 6 < 4) \
        .reshape(1, NB, 1, 1, 1)
    value = jnp.where(is_dc, dcdiff[:, :, None], jnp.where(is_sym, v, 0))
    kind = (jnp.where(is_zrl, 1, 0) | jnp.where(is_eob, 2, 0) |
            jnp.where(is_dc, 3, 0))
    luma_b = jnp.broadcast_to(luma6, valid.shape)
    prerec = ((value & 0xFFFF) << 16) | (luma_b.astype(jnp.int32) << 7) | \
        (valid.astype(jnp.int32) << 6) | (kind << 4) | (d & 15)

    # --- block counts / offsets (segmentation + totals) ---
    cnt_b = jnp.sum(valid.astype(jnp.int32), axis=2)  # [CB, NB, SB, 128]
    block_off = jnp.concatenate(
        [jnp.zeros((cbn, 1, SB, 128), jnp.int32),
         jnp.cumsum(cnt_b, axis=1)], axis=1)          # [CB, NB+1, SB, 128]
    totals = block_off[:, NB:]                        # [CB, 1, SB, 128]
    ok = jnp.all(totals <= t_max)

    # --- compaction: t-th record <- slot src[t] (binary search) ---
    nslots = NB * 64
    flat = prerec.reshape(cbn, nslots, SB, 128)
    cum = jnp.cumsum((valid.astype(jnp.int32)).reshape(cbn, nslots, SB, 128),
                     axis=1)
    q = jnp.arange(1, t_max + 1, dtype=jnp.int32).reshape(1, t_max, 1, 1)
    q = jnp.broadcast_to(q, (cbn, t_max, SB, 128))
    src = _lower_bound(cum, q, nslots)
    pre = jnp.take_along_axis(flat, jnp.clip(src, 0, nslots - 1), axis=1)

    # --- Huffman: prerec -> (code<<5 | len) ---
    val = pre >> 16                                   # sign-extended
    pk = (pre >> 4) & 3
    run4 = pre & 15
    pluma = ((pre >> 7) & 1) != 0
    neg = val < 0
    nbv = _bitlen(jnp.abs(val))
    mant = jnp.where(neg, val - 1, val) & ((jnp.int32(1) << nbv) - 1)
    # DC (kind 3): code table over sizes 0..11
    dc_pk = _sel_small(jnp.clip(nbv, 0, 11),
                       [_packed(_ET["dc_l"], n) for n in range(12)],
                       [_packed(_ET["dc_c"], n) for n in range(12)], pluma)
    dc_code = ((dc_pk >> 5) << nbv) | mant
    dc_len = (dc_pk & 31) + nbv
    # AC sym (kind 0)
    acode, alen = _ac_code_len((run4 << 4) | jnp.clip(nbv, 0, 10), pluma)
    sym_code = (acode << nbv) | mant
    sym_len = alen + nbv
    # ZRL / EOB constants
    eob_pk = jnp.where(pluma, _packed(_ET["ac_l"], 0),
                       _packed(_ET["ac_c"], 0))
    zrl_pk = jnp.where(pluma, _packed(_ET["ac_l"], 0xF0),
                       _packed(_ET["ac_c"], 0xF0))
    code = jnp.where(pk == 3, dc_code,
                     jnp.where(pk == 1, zrl_pk >> 5,
                               jnp.where(pk == 2, eob_pk >> 5, sym_code)))
    ln = jnp.where(pk == 3, dc_len,
                   jnp.where(pk == 1, zrl_pk & 31,
                             jnp.where(pk == 2, eob_pk & 31, sym_len)))
    recs = (code << 5) | ln
    return recs, totals, block_off, ok


# ---------------------------------------------------------------------------
# Packer (Pallas)
# ---------------------------------------------------------------------------

TROW = 256


def _make_pack_kernel(w_out: int, t_rows: int, win_rows: int = WIN_O,
                      unroll: int = 1):
    win = min(win_rows, w_out)
    assert w_out % win == 0 and t_rows % unroll == 0

    def emit_if_full(out_ref, hi, lo, l2, l3, nb, wcur, force=False):
        hard = nb >= (32 if force else 101)

        def cond(st):
            return jnp.sum(st[6]) > 0

        def body(st):
            hi, lo, l2, l3, nb, wcur, unserved = st
            wn = jnp.where(unserved != 0, wcur, jnp.int32(0x7FFFFFFF))
            lo0 = jnp.clip(jnp.min(wn), 0, w_out - win)
            wview = out_ref[0, pl.ds(lo0, win)]
            it = lo0 + jax.lax.broadcasted_iota(jnp.int32,
                                                (win, SB, 128), 0)
            for _ in range(3):
                ready = nb >= 32
                inwin = (wcur >= lo0) & (wcur < lo0 + win)
                srv = ready & (inwin | (hard & (wcur >= w_out)))
                hit = (it == wcur[None]) & (srv & inwin)[None]
                wview = jnp.where(hit, hi.astype(jnp.int32)[None], wview)
                hi = jnp.where(srv, lo, hi)
                lo = jnp.where(srv, l2, lo)
                l2 = jnp.where(srv, l3, l2)
                l3 = jnp.where(srv, jnp.uint32(0), l3)
                nb = nb - jnp.where(srv, 32, 0)
                wcur = wcur + jnp.where(srv, 1, 0)
            out_ref[0, pl.ds(lo0, win)] = wview
            unserved = jnp.where(nb < (32 if force else 101), 0, unserved)
            return hi, lo, l2, l3, nb, wcur, unserved

        u0 = hard.astype(jnp.int32)
        hi, lo, l2, l3, nb, wcur, _ = jax.lax.while_loop(
            cond, body, (hi, lo, l2, l3, nb, wcur, u0))
        return hi, lo, l2, l3, nb, wcur

    def append(hi, lo, l2, l3, nb, code, ln, active):
        cu = jnp.where(active, code.astype(jnp.uint32), jnp.uint32(0))
        lna = jnp.where(active, ln, 0)
        s = nb & 31
        sh_hi = 32 - s - lna
        c_a = jnp.where(sh_hi >= 0,
                        cu << (sh_hi & 31).astype(jnp.uint32),
                        cu >> ((-sh_hi) & 31).astype(jnp.uint32))
        c_b = jnp.where(sh_hi < 0,
                        cu << ((32 + sh_hi) & 31).astype(jnp.uint32),
                        jnp.uint32(0))
        w0 = nb < 32
        w1 = (nb >= 32) & (nb < 64)
        w2 = (nb >= 64) & (nb < 96)
        z = jnp.uint32(0)
        hi = hi | jnp.where(w0, c_a, z)
        lo = lo | jnp.where(w0, c_b, jnp.where(w1, c_a, z))
        l2 = l2 | jnp.where(w1, c_b, jnp.where(w2, c_a, z))
        l3 = l3 | jnp.where(w2, c_b, jnp.where(w0 | w1, z, c_a))
        nb = nb + lna
        return hi, lo, l2, l3, nb

    def kernel(tot_ref, rec_ref, out_ref, bits_ref, hi_ref, lo_ref,
               l2_ref, l3_ref, nb_ref, wc_ref, tb_ref):
        j = pl.program_id(1)
        n_steps = pl.num_programs(1)

        @pl.when(j == 0)
        def _init():
            for r in range(0, w_out, win):
                out_ref[0, pl.ds(r, win)] = jnp.zeros((win, SB, 128),
                                                      jnp.int32)
            zu = jnp.zeros((SB, 128), jnp.uint32)
            zi = jnp.zeros((SB, 128), jnp.int32)
            hi_ref[:, :] = zu
            lo_ref[:, :] = zu
            l2_ref[:, :] = zu
            l3_ref[:, :] = zu
            nb_ref[:, :] = zi
            wc_ref[:, :] = zi
            tb_ref[:, :] = zi

        total = tot_ref[0, 0]
        t0 = j * t_rows

        @pl.when(jnp.max(total) > t0)
        def _run():
            hi, lo, l2 = hi_ref[:, :], lo_ref[:, :], l2_ref[:, :]
            l3 = l3_ref[:, :]
            nb, wcur, tbits = nb_ref[:, :], wc_ref[:, :], tb_ref[:, :]

            def step(tl, hi, lo, l2, l3, nb, wcur, tbits):
                rec = rec_ref[0, pl.ds(tl, 1)][0]
                alive = (t0 + tl) < total
                code = (rec >> 5) & 0x7FFFFFF
                ln = rec & 31
                hi, lo, l2, l3, nb = append(hi, lo, l2, l3, nb, code, ln,
                                            alive)
                tbits = tbits + jnp.where(alive, ln, 0)
                hi, lo, l2, l3, nb, wcur = emit_if_full(
                    out_ref, hi, lo, l2, l3, nb, wcur)
                return hi, lo, l2, l3, nb, wcur, tbits

            def cond(st):
                return (st[0] < t_rows) & \
                    (jnp.max(total - t0 - st[0]) > 0)

            def body(st):
                tl = st[0]
                rest = st[1:]
                for k in range(unroll):
                    rest = step(tl + k, *rest)
                return (tl + unroll,) + rest

            st = (jnp.int32(0), hi, lo, l2, l3, nb, wcur, tbits)
            st = jax.lax.while_loop(cond, body, st)
            (_, hi, lo, l2, l3, nb, wcur, tbits) = st
            hi_ref[:, :] = hi
            lo_ref[:, :] = lo
            l2_ref[:, :] = l2
            l3_ref[:, :] = l3
            nb_ref[:, :] = nb
            wc_ref[:, :] = wcur
            tb_ref[:, :] = tbits

        @pl.when(j == n_steps - 1)
        def _flush():
            hi, lo, l2 = hi_ref[:, :], lo_ref[:, :], l2_ref[:, :]
            l3 = l3_ref[:, :]
            nb, wcur = nb_ref[:, :], wc_ref[:, :]
            hi_f, lo_f, l2_f, l3_f, nb_f, wcur_f = emit_if_full(
                out_ref, hi, lo, l2, l3, nb, wcur, force=True)

            def cond_f(st):
                return jnp.sum(st[1]) > 0

            def body_f(st):
                _, unserved = st
                wn = jnp.where(unserved != 0, wcur_f, jnp.int32(0x7FFFFFFF))
                lo0 = jnp.clip(jnp.min(wn), 0, w_out - win)
                wview = out_ref[0, pl.ds(lo0, win)]
                it2 = lo0 + jax.lax.broadcasted_iota(
                    jnp.int32, (win, SB, 128), 0)
                hit = (it2 == wcur_f[None]) & (unserved != 0)[None]
                out_ref[0, pl.ds(lo0, win)] = jnp.where(
                    hit, hi_f.astype(jnp.int32)[None], wview)
                inwin = (wcur_f >= lo0) & (wcur_f < lo0 + win)
                return jnp.int32(0), jnp.where(inwin, 0, unserved)

            u0 = ((nb_f > 0) & (wcur_f < w_out)).astype(jnp.int32)
            jax.lax.while_loop(cond_f, body_f, (jnp.int32(0), u0))
            bits_ref[0, 0] = tb_ref[:, :]

    return kernel


@partial(jax.jit, static_argnames=("w_out", "interpret", "win_rows",
                                   "unroll"))
def _pack_records(recs, totals, w_out: int, interpret: bool = False,
                  win_rows: int = WIN_O, unroll: int = 1):
    """recs int32 [CB, T, SB, 128] (length-aligned per lane), totals
    int32 [CB, 1, SB, 128] -> (words int32 [CB, w_out, SB, 128], bits
    int32 [CB, 1, SB, 128])."""
    cbn, tmax = recs.shape[0], recs.shape[1]
    t_rows = TROW
    tc = _pad(tmax, t_rows) // t_rows
    if recs.shape[1] != tc * t_rows:
        recs = jnp.pad(recs, ((0, 0), (0, tc * t_rows - tmax),
                              (0, 0), (0, 0)))
    kernel = _make_pack_kernel(w_out, t_rows, win_rows=win_rows,
                               unroll=unroll)
    return pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((cbn, w_out, SB, 128), jnp.int32),
                   jax.ShapeDtypeStruct((cbn, 1, SB, 128), jnp.int32)),
        grid=(cbn, tc),
        in_specs=[pl.BlockSpec((1, 1, SB, 128), lambda i, j: (i, 0, 0, 0)),
                  pl.BlockSpec((1, t_rows, SB, 128),
                               lambda i, j: (i, j, 0, 0))],
        out_specs=(pl.BlockSpec((1, w_out, SB, 128),
                                lambda i, j: (i, 0, 0, 0)),
                   pl.BlockSpec((1, 1, SB, 128), lambda i, j: (i, 0, 0, 0))),
        scratch_shapes=[pltpu.VMEM((SB, 128), jnp.uint32)] * 4 +
                       [pltpu.VMEM((SB, 128), jnp.int32)] * 3,
        interpret=interpret,
    )(totals, recs)


def default_t_max_enc(n_blocks: int) -> int:
    """Record budget per frame for the async encoder (measured corpus
    mean ~12/block; hard bound 64/block).  Overflow -> ok False."""
    return int(min(n_blocks * 64, 16 * n_blocks + 512))


@partial(jax.jit, static_argnames=("w_out", "t_max", "interpret",
                                   "win_rows", "unroll", "segs"))
def encode_layout_async(lv2, w_out: int, t_max: int,
                        interpret: bool = False, win_rows: int = WIN_O,
                        unroll: int = 1, segs: int = 1):
    """lv2 int16 [CB, NB, 64, SB, 128] zigzag (slot0 = absolute DC) ->
    (words int32 [CB*segs, w_out, SB, 128], bits [CB*segs, 1, SB, 128],
    ok).

    Async drop-in for entropy_encode_pallas._encode_layout (+ segmented
    mode): tokenize once per frame, pack per (frame, segment) lane
    chunk.  A segment is the record range of its block range; DC
    predictors need no special handling (differences are chain-global).
    """
    cbn, NB = lv2.shape[0], lv2.shape[1]
    recs, totals, block_off, ok = tokenize_levels_layout(lv2, NB // 6,
                                                         t_max)
    if segs == 1:
        words, bits = _pack_records(recs, totals, w_out,
                                    interpret=interpret,
                                    win_rows=win_rows, unroll=unroll)
        return words, bits, ok
    bps = NB // segs
    t_seg = _pad(min(t_max, bps * 64), TROW)
    off_s = block_off[:, ::bps]                       # [CB, segs+1, SB, 128]
    starts = off_s[:, :-1]
    tot_s = off_s[:, 1:] - starts                     # [CB, segs, SB, 128]
    ok = ok & jnp.all(tot_s <= t_seg)
    idx = jnp.clip(starts[:, :, None] +
                   jnp.arange(t_seg, dtype=jnp.int32)[None, None, :, None,
                                                      None],
                   0, recs.shape[1] - 1)
    rec_s = jnp.take_along_axis(recs,
                                idx.reshape(cbn, segs * t_seg, SB, 128),
                                axis=1)
    rec_s = rec_s.reshape(cbn * segs, t_seg, SB, 128)
    tot_k = tot_s.reshape(cbn * segs, 1, SB, 128)
    words, bits = _pack_records(rec_s, tot_k, w_out, interpret=interpret,
                                win_rows=win_rows, unroll=unroll)
    return words, bits, ok


@partial(jax.jit, static_argnames=("w_out", "t_max", "interpret",
                                   "win_rows", "unroll"))
def encode_scans_async(levels_zz, w_out: int = 1024, t_max: int = 0,
                       interpret: bool = False, win_rows: int = WIN_O,
                       unroll: int = 1):
    """levels int16 [F, n_mcu, 6, 64] zigzag (slot0 = absolute DC) ->
    (words int32 [F, w_out], bits int32 [F], ok).  Async drop-in for
    entropy_encode_pallas.encode_scans_pallas."""
    w_out = max(WIN_O, _pad(w_out, WIN_O))
    F, n_mcu = levels_zz.shape[0], levels_zz.shape[1]
    nblk = n_mcu * 6
    if t_max == 0:
        t_max = default_t_max_enc(nblk)
    fp = _pad(F, SB * 128)
    cbn = fp // (SB * 128)
    lv = jnp.pad(levels_zz.reshape(F, nblk, 64),
                 ((0, fp - F), (0, 0), (0, 0)))
    # pad frames: all-zero levels -> DC diff -128 + EOB per block, tiny
    lvl = lv.reshape(cbn, SB, 128, nblk, 64).transpose(0, 3, 4, 1, 2)
    words, bits, ok = encode_layout_async(lvl, w_out, t_max,
                                          interpret=interpret,
                                          win_rows=win_rows, unroll=unroll)
    wout = words.transpose(0, 2, 3, 1).reshape(fp, w_out)[:F]
    bout = bits[:, 0].reshape(fp)[:F]
    return wout, bout, ok


# ---------------------------------------------------------------------------
# Single-pass lane-async DENSE encoder: ring-buffered input window
# ---------------------------------------------------------------------------
#
# Mirror of entropy_async_pallas._make_dense_kernel for the emit
# direction, replacing both the lockstep packer's 2.29x per-block-max
# tax and the record tokenizer's gather-bound XLA compaction: lanes emit
# one Huffman token per iteration at their own block position.  The
# per-lane-dynamic *read* problem (each lane needs its own block's
# coefficients) is the dual of the decoder's write problem and gets the
# dual solution: the lv slab stays in HBM; a VMEM ring window holds WB
# consecutive blocks, DMA-advanced in ADV quanta once every lane has
# moved past them; a periodic service pass stages each lane's NEXT
# block (32 pair-packed value rows + the two nonzero-occupancy masks)
# from the ring into a VMEM `nxt` buffer (amortized one-hot over ring
# slots); lanes swap `nxt` into registers when they finish their
# current block, or stall until the next service if it is not staged
# yet.
#
# Bit-exact with entropy_encode_pallas._encode_layout (mjpegenc.c
# encode_block semantics); Huffman table selection is per-lane (luma =
# cbid % 6 < 4) via the same bit-sliced canonical tables the record
# tokenizer uses.

WBE = 4     # input ring, blocks (power of two)
ADVE = 2    # DMA advance quantum, blocks
# Ring/unroll sweep on TPU (2026-08-18, F=16384 sorted corpus, byte
# gates OK) — all MEASURED NEGATIVE vs the defaults (69.7 ms min,
# 74,632 iters): ring 16 blocks = 71.0 ms @ 70,744 iters; ring 32 =
# 78.4 ms @ 67,192; ring 16 + unroll 12 = 72.7 ms @ 78,912.  Every
# ring doubling buys ~5% fewer stall iterations but costs +6-12% in
# per-pass service/flush work, and deeper unrolls pad the per-lane
# tail (iterations go UP).  The kernel is at its latency floor.

PACK_ROWS = 34  # pair-packed block: 32 value rows + 2 occupancy masks


@jax.jit
def pack_levels_masks(lv):
    """lv int16 [CB, NB, 64, SB, 128] (zigzag, slot0 = absolute DC) ->
    int32 [CB, NB * 34, SB, 128]: per block, rows 0..31 pair-pack slots
    (2j, 2j+1) as (lo16 | hi << 16) and rows 32/33 carry the nonzero-
    occupancy masks (row 32 bit k = slot k nonzero for k in 1..31, row
    33 bit k = slot 32+k nonzero) — exactly the (pv, emlo, emhi) staging
    format the dense async encoder's service pass otherwise rebuilds
    in-kernel from 64 int16 rows per block per service.  Precomputing it
    here is one fully-parallel XLA pass over the slab; the in-kernel
    service shrinks to a plain 34-row one-hot select."""
    cbn, NB = lv.shape[0], lv.shape[1]
    v = lv.astype(jnp.int32)
    pv = (v[:, :, 0::2] & 0xFFFF) | (v[:, :, 1::2] << 16)
    nz = (v != 0).astype(jnp.uint32)
    k = jnp.arange(64, dtype=jnp.uint32).reshape(1, 1, 64, 1, 1)
    bits = nz * jnp.where(k == 0, jnp.uint32(0), jnp.uint32(1) << (k & 31))
    emlo = jax.lax.bitcast_convert_type(
        jnp.sum(bits[:, :, :32], axis=2), jnp.int32)
    emhi = jax.lax.bitcast_convert_type(
        jnp.sum(bits[:, :, 32:], axis=2), jnp.int32)
    out = jnp.concatenate(
        [pv, emlo[:, :, None], emhi[:, :, None]], axis=2)
    return out.reshape(cbn, NB * PACK_ROWS, lv.shape[3], 128)


def _make_enc_dense_kernel(n_blocks: int, nbp: int, w_out: int,
                           t_max: int, win_rows: int = WIN_O,
                           unroll: int = 1, wb: int = WBE,
                           adv: int = ADVE, pmax: int = 16,
                           press: int = 0, packed: bool = False,
                           sb: int = SB):
    win = min(win_rows, w_out)
    assert w_out % win == 0, (w_out, win)
    assert wb & (wb - 1) == 0 and adv <= wb and nbp % adv == 0
    assert pmax & (pmax - 1) == 0

    def emit_if_full(out_ref, hi, lo, l2, l3, nb, wcur, tbits,
                     force=False):
        """Lazy per-lane word flush into a WIN-row output window —
        identical discipline to entropy_encode_pallas.emit_if_full."""
        hard = nb >= (32 if force else 101)

        def cond(st):
            return jnp.sum(st[6]) > 0

        def body(st):
            hi, lo, l2, l3, nb, wcur, unserved = st
            wn = jnp.where(unserved != 0, wcur, jnp.int32(0x7FFFFFFF))
            lo0 = jnp.clip(jnp.min(wn), 0, w_out - win)
            wview = out_ref[0, pl.ds(lo0, win)]
            it = lo0 + jax.lax.broadcasted_iota(jnp.int32,
                                                (win, sb, 128), 0)
            for _ in range(3):
                ready = nb >= 32
                inwin = (wcur >= lo0) & (wcur < lo0 + win)
                srv = ready & (inwin | (hard & (wcur >= w_out)))
                hit = (it == wcur[None]) & (srv & inwin)[None]
                wview = jnp.where(hit, hi.astype(jnp.int32)[None], wview)
                hi = jnp.where(srv, lo, hi)
                lo = jnp.where(srv, l2, lo)
                l2 = jnp.where(srv, l3, l2)
                l3 = jnp.where(srv, jnp.uint32(0), l3)
                nb = nb - jnp.where(srv, 32, 0)
                wcur = wcur + jnp.where(srv, 1, 0)
            out_ref[0, pl.ds(lo0, win)] = wview
            unserved = jnp.where(nb < (32 if force else 101), 0, unserved)
            return hi, lo, l2, l3, nb, wcur, unserved

        u0 = hard.astype(jnp.int32)
        hi, lo, l2, l3, nb, wcur, _ = jax.lax.while_loop(
            cond, body, (hi, lo, l2, l3, nb, wcur, u0))
        return hi, lo, l2, l3, nb, wcur, tbits

    def append(hi, lo, l2, l3, nb, tbits, code, ln, active):
        """MSB-first append at nb <= 100 (entropy_encode_pallas.append;
        the <= 27-bit token invariant is asserted at module load)."""
        cu = jnp.where(active, code.astype(jnp.uint32), jnp.uint32(0))
        lna = jnp.where(active, ln, 0)
        s = nb & 31
        sh_hi = 32 - s - lna
        c_a = jnp.where(sh_hi >= 0,
                        cu << (sh_hi & 31).astype(jnp.uint32),
                        cu >> ((-sh_hi) & 31).astype(jnp.uint32))
        c_b = jnp.where(sh_hi < 0,
                        cu << ((32 + sh_hi) & 31).astype(jnp.uint32),
                        jnp.uint32(0))
        w0 = nb < 32
        w1 = (nb >= 32) & (nb < 64)
        w2 = (nb >= 64) & (nb < 96)
        z = jnp.uint32(0)
        hi = hi | jnp.where(w0, c_a, z)
        lo = lo | jnp.where(w0, c_b, jnp.where(w1, c_a, z))
        l2 = l2 | jnp.where(w1, c_b, jnp.where(w2, c_a, z))
        l3 = l3 | jnp.where(w2, c_b, jnp.where(w0 | w1, z, c_a))
        nb = nb + lna
        tbits = tbits + lna
        return hi, lo, l2, l3, nb, tbits

    def popc(xu):
        xu = xu - ((xu >> 1) & jnp.uint32(0x55555555))
        xu = (xu & jnp.uint32(0x33333333)) + \
            ((xu >> 2) & jnp.uint32(0x33333333))
        xu = (xu + (xu >> 4)) & jnp.uint32(0x0F0F0F0F)
        return ((xu * jnp.uint32(0x01010101)) >> 24).astype(jnp.int32)

    br = PACK_ROWS if packed else 64   # ring rows per block

    def kernel(lv_ref, dc0_ref, out_ref, bits_ref, st_ref, iwin,
               nxt_ref, nv_ref, wb_ref, sem):
        ci = pl.program_id(0)
        for r in range(0, w_out, win):
            out_ref[0, pl.ds(r, win)] = jnp.zeros((win, sb, 128),
                                                  jnp.int32)
        nv_ref[...] = jnp.zeros((sb, 128), jnp.int32)
        wb_ref[0] = 0
        # initial ring fill: blocks [0, wb)
        for q in range(wb // adv):
            cp = pltpu.make_async_copy(
                lv_ref.at[ci, pl.ds(q * adv * br, adv * br)],
                iwin.at[pl.ds(q * adv * br, adv * br)], sem)
            cp.start()
            cp.wait()

        def service(cbid, nxt_want):
            """Stage each waiting lane's next block from the ring into
            nxt (values pair-packed + occupancy masks in rows 32/33),
            then advance the ring window in `adv`-block DMA quanta past
            blocks no lane needs anymore."""

            def cond(go):
                return go > 0

            def body(go):
                wbase = wb_ref[0]
                nv = nv_ref[...]
                tgt = nxt_want                    # = cbid + 1 per lane
                need = (nv == 0) & (tgt < n_blocks) & (tgt >= wbase) & \
                    (tgt < wbase + wb)
                if packed:
                    # pre-packed ring: rows are already the staging
                    # format (32 pair-packed value rows + 2 masks) —
                    # the whole stage is a wb-way one-hot row select
                    pvv = [jnp.zeros((sb, 128), jnp.int32)
                           for _ in range(PACK_ROWS)]
                    for slot in range(wb):
                        m = need & ((tgt & (wb - 1)) == slot)
                        for j in range(PACK_ROWS):
                            pvv[j] = pvv[j] | jnp.where(
                                m, iwin[slot * PACK_ROWS + j], 0)
                    for j in range(PACK_ROWS):
                        nxt_ref[j] = jnp.where(need, pvv[j], nxt_ref[j])
                else:
                    pvv = [jnp.zeros((sb, 128), jnp.int32)
                           for _ in range(32)]
                    emlo = jnp.zeros((sb, 128), jnp.int32)
                    emhi = jnp.zeros((sb, 128), jnp.int32)
                    for slot in range(wb):
                        m = need & ((tgt & (wb - 1)) == slot)
                        for j in range(32):
                            vlo = iwin[slot * 64 + 2 * j] \
                                .astype(jnp.int32) & 0xFFFF
                            vhi = iwin[slot * 64 + 2 * j + 1] \
                                .astype(jnp.int32)
                            pj = vlo | (vhi << 16)
                            pvv[j] = pvv[j] | jnp.where(m, pj, 0)
                            if j > 0:
                                if 2 * j < 32:
                                    emlo = emlo | jnp.where(
                                        m & (vlo != 0),
                                        jnp.int32(1 << (2 * j)), 0)
                                else:
                                    b = 1 << (2 * j - 32)
                                    emhi = emhi | jnp.where(
                                        m & (vlo != 0), jnp.int32(b), 0)
                            ko = 2 * j + 1
                            if ko < 32:
                                bo = 1 << ko
                                emlo = emlo | jnp.where(
                                    m & (vhi != 0),
                                    jnp.int32(bo - (1 << 32) if ko == 31
                                              else bo), 0)
                            else:
                                b = 1 << (ko - 32)
                                emhi = emhi | jnp.where(
                                    m & (vhi != 0),
                                    jnp.int32(b - (1 << 32) if ko == 63
                                              else b), 0)
                    for j in range(32):
                        nxt_ref[j] = jnp.where(need, pvv[j], nxt_ref[j])
                    nxt_ref[32] = jnp.where(need, emlo, nxt_ref[32])
                    nxt_ref[33] = jnp.where(need, emhi, nxt_ref[33])
                nv = jnp.where(need, 1, nv)
                nv_ref[...] = nv
                # ring advance: lowest block any lane still needs
                eff = jnp.where(cbid + 1 + nv >= n_blocks, nbp + wb,
                                cbid + 1 + nv)
                frontier = jnp.minimum(jnp.min(eff), nbp)
                adv_ok = (frontier - wbase >= adv) & (wbase < nbp)

                @pl.when(adv_ok)
                def _adv():
                    slot0 = wbase & (wb - 1)
                    src0 = wbase + wb
                    src0 = jnp.minimum(src0, nbp - adv)
                    cp = pltpu.make_async_copy(
                        lv_ref.at[ci, pl.ds(src0 * br, adv * br)],
                        iwin.at[pl.ds(slot0 * br, adv * br)], sem)
                    cp.start()
                    cp.wait()
                    wb_ref[0] = wbase + adv

                return jnp.where(adv_ok, jnp.int32(1), jnp.int32(0))

            jax.lax.while_loop(cond, body, jnp.int32(1))

        def token_step(st):
            (hi, lo, l2, l3, nb, wcur, tbits, cbid, c6, tphase, prev,
             z, mlo, mhi, ldc0, ldc1, ldc2) = st[:17]
            pv = list(st[17:49])
            # swap: lanes that finished their block take the staged next
            nv = nv_ref[...]
            done = (tphase == 2) & (cbid >= n_blocks - 1)
            take = (tphase == 2) & (~done) & (nv != 0)
            for j in range(32):
                pv[j] = jnp.where(take, nxt_ref[j], pv[j])
            mlo = jnp.where(take, nxt_ref[32], mlo)
            mhi = jnp.where(take, nxt_ref[33], mhi)
            nv_ref[...] = jnp.where(take, 0, nv)
            cbid = cbid + take.astype(jnp.int32)
            c6n = c6 + take.astype(jnp.int32)
            c6 = jnp.where(c6n >= 6, 0, c6n)
            tphase = jnp.where(take, 0, tphase)
            prev = jnp.where(take, 0, prev)
            z = jnp.where(take, 0, z)
            luma = c6 < 4
            is_cr = c6 == 5

            # ---- DC token (tphase 0) ----
            is_dcp = tphase == 0
            dcabs = ((pv[0] & 0xFFFF) ^ 0x8000) - 0x8000
            ldc = jnp.where(luma, ldc0, jnp.where(is_cr, ldc2, ldc1))
            diff = dcabs - ldc
            negd = diff < 0
            nbd = _bitlen(jnp.abs(diff))
            mantd = jnp.where(negd, diff - 1, diff) & \
                ((jnp.int32(1) << nbd) - 1)
            dc_pk = _sel_small(jnp.clip(nbd, 0, 11),
                               [_packed(_ET["dc_l"], n) for n in range(12)],
                               [_packed(_ET["dc_c"], n) for n in range(12)],
                               luma)
            code_d = ((dc_pk >> 5) << nbd) | mantd
            ln_d = (dc_pk & 31) + nbd

            # ---- AC token (tphase 1) ----
            in_ac = (mlo != 0) | (mhi != 0)
            sel_lo = mlo != 0
            wmask = jnp.where(sel_lo, mlo, mhi)
            low = wmask & -wmask
            pos = popc((low - 1).astype(jnp.uint32)) + \
                jnp.where(sel_lo, 0, 32)
            # 32-way one-hot value pick, tree-reduced (the AC value
            # feeds size -> append on the serial cycle)
            half = tree_or([jnp.where((pos >> 1) == j, pv[j], 0)
                            for j in range(32)])
            val = jnp.where((pos & 1) != 0, half >> 16,
                            ((half & 0xFFFF) ^ 0x8000) - 0x8000)
            run = pos - prev - 1 - 16 * z
            is_ac = tphase == 1
            is_zrl = is_ac & in_ac & (run >= 16)
            is_sym = is_ac & in_ac & (run < 16)
            is_eob = is_ac & (~in_ac) & (prev != 63)
            negv = val < 0
            nbv = _bitlen(jnp.abs(val))
            mantv = jnp.where(negv, val - 1, val) & \
                ((jnp.int32(1) << nbv) - 1)
            acode, alen = _ac_code_len(
                (jnp.clip(run, 0, 15) << 4) | jnp.clip(nbv, 1, 10), luma)
            code_s = (acode << nbv) | mantv
            ln_s = alen + nbv
            eob_pk = jnp.where(luma, _packed(_ET["ac_l"], 0),
                               _packed(_ET["ac_c"], 0))
            zrl_pk = jnp.where(luma, _packed(_ET["ac_l"], 0xF0),
                               _packed(_ET["ac_c"], 0xF0))

            code = jnp.where(is_dcp, code_d,
                             jnp.where(is_sym, code_s,
                                       jnp.where(is_zrl, zrl_pk >> 5,
                                                 eob_pk >> 5)))
            ln = jnp.where(is_dcp, ln_d,
                           jnp.where(is_sym, ln_s,
                                     jnp.where(is_zrl, zrl_pk & 31,
                                               eob_pk & 31)))
            act = (is_dcp | is_sym | is_zrl | is_eob) & (cbid >= 0) & \
                (cbid < n_blocks)
            hi, lo, l2, l3, nb, tbits = append(hi, lo, l2, l3, nb, tbits,
                                               code, ln, act)
            hi, lo, l2, l3, nb, wcur, tbits = emit_if_full(
                out_ref, hi, lo, l2, l3, nb, wcur, tbits)

            # ---- state updates ----
            dc_upd = is_dcp & act
            ldc0 = jnp.where(dc_upd & luma, dcabs, ldc0)
            ldc1 = jnp.where(dc_upd & (~luma) & (~is_cr), dcabs, ldc1)
            ldc2 = jnp.where(dc_upd & is_cr, dcabs, ldc2)
            clear_lo = is_sym & sel_lo
            mlo = jnp.where(clear_lo, mlo ^ low, mlo)
            mhi = jnp.where(is_sym & (~sel_lo), mhi ^ low, mhi)
            empty_after = (mlo == 0) & (mhi == 0)
            blk_done = is_eob | (is_sym & empty_after & (pos == 63))
            tphase = jnp.where(is_dcp & act, 1,
                               jnp.where(blk_done, 2, tphase))
            prev = jnp.where(is_sym, pos, prev)
            z = jnp.where(is_sym, 0,
                          jnp.where(is_zrl, z + 1, z))
            return (hi, lo, l2, l3, nb, wcur, tbits, cbid, c6, tphase,
                    prev, z, mlo, mhi, ldc0, ldc1, ldc2, *pv)

        def cond(st):
            tphase, cbid = st[1 + 9], st[1 + 7]
            done = (tphase == 2) & (cbid >= n_blocks - 1)
            return (st[0] < t_max) & \
                (jnp.sum(1 - done.astype(jnp.int32)) > 0)

        def body(st):
            tl = st[0]
            rest = st[1:]
            trig = (tl & (pmax - 1)) == 0
            if press:
                # stall-pressure trigger (the decoder's press, mirrored):
                # lanes waiting in tphase 2 with nothing staged are pure
                # stall — service early when enough of them pile up
                cbid_c, tph_c = rest[7], rest[9]
                stalled = (tph_c == 2) & (cbid_c < n_blocks - 1) & \
                    (nv_ref[...] == 0)
                trig = trig | (jnp.sum(stalled.astype(jnp.int32)) >= press)

            @pl.when(trig)
            def _svc():
                service(rest[7], rest[7] + 1)

            for _ in range(unroll):
                rest = token_step(rest)
            return (tl + unroll,) + rest

        zi = jnp.zeros((sb, 128), jnp.int32)
        zu = jnp.zeros((sb, 128), jnp.uint32)
        st = (jnp.int32(0), zu, zu, zu, zu, zi, zi, zi,
              jnp.full((sb, 128), -1, jnp.int32),          # cbid
              jnp.full((sb, 128), 5, jnp.int32),           # c6 (pre-first)
              jnp.full((sb, 128), 2, jnp.int32),           # tphase: want
              zi, zi, zi, zi,
              dc0_ref[0, 0], dc0_ref[0, 1], dc0_ref[0, 2]) + \
            tuple(zi for _ in range(32))
        st = jax.lax.while_loop(cond, body, st)
        (hi, lo, l2, l3, nb, wcur, tbits) = st[1:8]
        tphase, cbid = st[10], st[8]
        done_f = (tphase == 2) & (cbid >= n_blocks - 1)
        st_ref[0, 0] = jnp.where(done_f, n_blocks, cbid)
        st_ref[0, 1] = jnp.full((sb, 128), st[0], jnp.int32)
        # final drain (mirrors the lockstep kernel's flush)
        hi_f, lo_f, l2_f, l3_f, nb_f, wcur_f, tbits = emit_if_full(
            out_ref, hi, lo, l2, l3, nb, wcur, tbits, force=True)

        def cond_f(s):
            return jnp.sum(s[1]) > 0

        def body_f(s):
            _, unserved = s
            wn = jnp.where(unserved != 0, wcur_f, jnp.int32(0x7FFFFFFF))
            lo0 = jnp.clip(jnp.min(wn), 0, w_out - win)
            wview = out_ref[0, pl.ds(lo0, win)]
            it2 = lo0 + jax.lax.broadcasted_iota(jnp.int32,
                                                 (win, sb, 128), 0)
            hit = (it2 == wcur_f[None]) & (unserved != 0)[None]
            out_ref[0, pl.ds(lo0, win)] = jnp.where(
                hit, hi_f.astype(jnp.int32)[None], wview)
            inwin = (wcur_f >= lo0) & (wcur_f < lo0 + win)
            return jnp.int32(0), jnp.where(inwin, 0, unserved)

        u0 = ((nb_f > 0) & (wcur_f < w_out)).astype(jnp.int32)
        jax.lax.while_loop(cond_f, body_f, (jnp.int32(0), u0))
        bits_ref[0, 0] = tbits

    return kernel


@partial(jax.jit, static_argnames=("w_out", "t_max", "interpret",
                                   "win_rows", "unroll", "wb", "adv",
                                   "pmax", "press", "packed",
                                   "return_status"))
def encode_layout_async_dense(lv, w_out: int, t_max: int,
                              interpret: bool = False,
                              win_rows: int = WIN_O, unroll: int = 1,
                              wb: int = WBE, adv: int = ADVE,
                              pmax: int = 16, press: int = 0, dc0=None,
                              packed: bool = False,
                              return_status: bool = False):
    """lv int16 [CB, NB, 64, SB, 128] zigzag (slot0 = absolute DC) ->
    (words int32 [CB, w_out, SB, 128], bits int32 [CB, 1, SB, 128], ok)
    via the single-pass async encoder.

    packed: pre-pack the level slab to the kernel's staging format with
    pack_levels_masks (one XLA pass), so the service pass stages a
    lane's next block with a 34-row one-hot select instead of
    rebuilding pair-packing + occupancy masks from 64 int16 rows (~4x
    less service vector work).  MEASURED NEGATIVE on TPU (2026-08-18,
    F=16384 sorted corpus): 89.4 ms vs 69.9 ms unpacked at IDENTICAL
    iteration counts (74,632) — the kernel is latency-bound on its
    serial dependency chains (bit buffer, loop control), so the service
    op reduction buys nothing while the XLA pack pass and the int32
    ring's doubled load bytes add real time.  Kept for the record +
    tests; the same finding killed the decoder's packed output ring.

    Bit-exact with entropy_encode_pallas._encode_layout; `ok` False
    means some lane ran out of its t_max iteration budget -> the caller
    must fall back to the lockstep packer.

    The sublane width is taken from lv.shape[3]: sb=8 is the production
    layout; wider slabs (16/32) pack more frames per kernel chunk,
    trading per-iteration vector work for iteration count (the kernel
    is latency-bound on the serial token cycle, so this is a measured
    win on the decode side)."""
    cbn, NB, sb = lv.shape[0], lv.shape[1], lv.shape[3]
    if dc0 is None:
        dc0 = jnp.full((cbn, 3, sb, 128), 128, jnp.int32)
    nbp = max((NB + adv - 1) // adv * adv, wb)
    if nbp > NB:
        lv = jnp.concatenate(
            [lv, jnp.zeros((cbn, nbp - NB, 64, sb, 128), jnp.int16)],
            axis=1)
    kernel = _make_enc_dense_kernel(NB, nbp, w_out, t_max,
                                    win_rows=win_rows, unroll=unroll,
                                    wb=wb, adv=adv, pmax=pmax,
                                    press=press, packed=packed, sb=sb)
    br = PACK_ROWS if packed else 64
    iwin_dt = jnp.int32 if packed else jnp.int16
    scratch = [pltpu.VMEM((wb * br, sb, 128), iwin_dt),     # iwin
               pltpu.VMEM((34, sb, 128), jnp.int32),        # nxt
               pltpu.VMEM((sb, 128), jnp.int32),            # nxt valid
               pltpu.SMEM((1,), jnp.int32),                 # wbase
               pltpu.SemaphoreType.DMA]
    lv_in = (pack_levels_masks(lv) if packed
             else lv.reshape(cbn, nbp * 64, sb, 128))
    words, bits, st = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((cbn, w_out, sb, 128), jnp.int32),
                   jax.ShapeDtypeStruct((cbn, 1, sb, 128), jnp.int32),
                   jax.ShapeDtypeStruct((cbn, 2, sb, 128), jnp.int32)),
        grid=(cbn,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec((1, 3, sb, 128), lambda i: (i, 0, 0, 0))],
        out_specs=(pl.BlockSpec((1, w_out, sb, 128),
                                lambda i: (i, 0, 0, 0)),
                   pl.BlockSpec((1, 1, sb, 128), lambda i: (i, 0, 0, 0)),
                   pl.BlockSpec((1, 2, sb, 128), lambda i: (i, 0, 0, 0))),
        scratch_shapes=scratch,
        interpret=interpret,
    )(lv_in, dc0)
    ok = jnp.all(st[:, 0] == NB)
    if return_status:
        return words, bits, ok, st
    return words, bits, ok
