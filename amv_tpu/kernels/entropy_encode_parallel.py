"""Fully parallel JPEG entropy ENCODE — MEASURED NEGATIVE, kept with
its tests as the record (both variants byte-exact, ok-gated).

TPU numbers (2026-08-18, bench corpus F=16384 sorted, vs lockstep
83.2 ms same-run / async dense ~68 ms):
  * where-reduce hierarchy (encode_layout_parallel, corpus-fitting
    windows wl16/wg80/ws288): 257 ms — the frame-level segment-sums
    run at low VPU efficiency and window budgets scale with content;
  * uniform-record rechunk (encode_layout_rechunk): 129 ms = 90 ms XLA
    prep + 62 ms _pack_records splice.  The profile that kills the
    whole direction (scripts/measure_enc_split.py): dense per-SLOT
    tokenization alone is 62.7 ms — MORE than the fused serial kernel
    end-to-end — because the slot grid carries 64 sites/block where the
    serial kernel touches only the ~11 real tokens (5.8x op inflation,
    plus every XLA intermediate is a 1.2 GB HBM round-trip); and the
    splice still pays 0.67 us/record-iteration with NB*R=5,760 padded
    uniform records vs the async kernel's ~4,664 divergent token
    iterations (uniform padding eats the entire iteration win: mean
    block needs ~3 records, max needs 20, lockstep rows must cover the
    max).  Sparse/compact alternatives all need per-lane gathers
    (~30 ns/element, the round-2/3 measured wall).  Conclusion: with
    known lengths the pack IS embarrassingly parallel in theory, but on
    this target the serial fused kernel's per-token VMEM pipeline beats
    every decomposition that has to materialize dense slot sites.

Original design notes follow.

The async/lockstep Pallas encoders pay a serial per-token (or
per-record) latency chain: one bit-writer append per iteration, ~0.9 us
measured per iteration, 74,632 iterations on the bench chunk = the
measured ~68 ms encode-stage floor (kernels/entropy_encode_async_pallas
ring/unroll sweep).  But — unlike DECODE, where token boundaries are
data-dependent — every token's LENGTH is known as soon as the levels
are tokenized, so the whole bitstream layout is a prefix sum and the
pack is embarrassingly parallel:

  1. per-SLOT Huffman records (code, len) straight on the dense 64-slot
     site grid of tokenize_levels_layout — NO compaction, the
     gather-bound step that killed the record-IR pair is skipped
     entirely (empty slots just carry len = 0);
  2. bit offsets: cumsum of lengths within each block's 64 slots, plus
     a cumsum of block bit totals along the frame;
  3. every slot contributes its code to 1-2 output words (c0 into word
     gstart>>5, c1 spill into the next) — contributions of distinct
     tokens have DISJOINT bits, so int32 `+` IS bitwise-or, exactly;
  4. the scattered adds become a hierarchy of bounded-window
     where-reduces (slots -> per-block word windows aligned to the
     frame word grid -> block-group windows -> supergroup windows ->
     frame words), each one a compare-select-sum the TPU vectorizes
     over all lanes — no gathers, no scatters, no per-lane dynamic
     indexing anywhere;
  5. window budgets (wl/wg/ws words) are corpus-sized, not worst-case:
     `ok` is False when any block/group overflows its window and the
     caller falls back to the serial kernel, the same contract every
     async kernel here uses.

Bit-exact with entropy_encode_pallas._encode_layout (mjpegenc.c
encode_block semantics, escape_FF applied downstream by
native.escape_frames): same (words, bits, ok) contract as
encode_layout_async_dense, zero-filled word tails included.

Reference: AMVmuxer/ffmpeg/libavcodec/mjpegenc.c:379-450 (encode_block,
escape_FF); table data via bitstream/jpeg_tables.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .entropy_encode_async_pallas import _ac_code_len, _bitlen, _sel_small
from .entropy_encode_pallas import _ET, _packed

SB = 8


def _slot_records(lv, dc0):
    """lv int16 [CB, NB, 64, SB, 128] zigzag (slot0 = absolute DC),
    dc0 int32 [CB, 3, SB, 128] initial DC predictors -> per-slot
    (code uint32 [CB, NB, 64, SB, 128], ln int32 same shape, 0 = no
    token at this slot).

    Same site grid as tokenize_levels_layout (DC at slot 0, AC symbols
    at their own slots, ZRL markers at the zero slot 16/32/48 after the
    previous nonzero, EOB at last_nonzero+1), but the Huffman mapping
    runs dense on the slots instead of after a compaction gather."""
    cbn, NB = lv.shape[0], lv.shape[1]
    M = NB // 6
    v = lv.astype(jnp.int32)                         # [CB, NB, 64, SB, 128]

    # --- DC differences (chain-global per component) ---
    dc = v[:, :, 0]                                  # [CB, NB, SB, 128]
    dcm = dc.reshape(cbn, M, 6, SB, 128)
    dy = dcm[:, :, :4].reshape(cbn, M * 4, SB, 128)
    py = jnp.concatenate([dc0[:, 0:1], dy[:, :-1]], axis=1)
    diffy = (dy - py).reshape(cbn, M, 4, SB, 128)
    pcb = jnp.concatenate([dc0[:, 1:2], dcm[:, :-1, 4]], axis=1)
    pcr = jnp.concatenate([dc0[:, 2:3], dcm[:, :-1, 5]], axis=1)
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
    lastnz = pn_inc[:, :, 63:64]
    d = k - pn_excl - 1                              # zero-run before slot
    is_dc = k == 0
    is_sym = nz
    is_zrl = (~nz) & (k > 0) & (((d + 1) & 15) == 0) & (k < lastnz)
    is_eob = (k == lastnz + 1)
    luma = (jnp.arange(NB, dtype=jnp.int32) % 6 < 4) \
        .reshape(1, NB, 1, 1, 1)
    luma = jnp.broadcast_to(luma, v.shape)

    val = jnp.where(is_dc, dcdiff[:, :, None], jnp.where(is_sym, v, 0))
    neg = val < 0
    nbv = _bitlen(jnp.abs(val))
    mant = jnp.where(neg, val - 1, val) & ((jnp.int32(1) << nbv) - 1)
    dc_pk = _sel_small(jnp.clip(nbv, 0, 11),
                       [_packed(_ET["dc_l"], n) for n in range(12)],
                       [_packed(_ET["dc_c"], n) for n in range(12)], luma)
    dc_code = ((dc_pk >> 5) << nbv) | mant
    dc_len = (dc_pk & 31) + nbv
    run4 = d & 15
    acode, alen = _ac_code_len((run4 << 4) | jnp.clip(nbv, 0, 10), luma)
    sym_code = (acode << nbv) | mant
    sym_len = alen + nbv
    eob_pk = jnp.where(luma, _packed(_ET["ac_l"], 0),
                       _packed(_ET["ac_c"], 0))
    zrl_pk = jnp.where(luma, _packed(_ET["ac_l"], 0xF0),
                       _packed(_ET["ac_c"], 0xF0))
    code = jnp.where(is_dc, dc_code,
                     jnp.where(is_zrl, zrl_pk >> 5,
                               jnp.where(is_eob, eob_pk >> 5, sym_code)))
    ln = jnp.where(is_dc, dc_len,
                   jnp.where(is_zrl, zrl_pk & 31,
                             jnp.where(is_eob, eob_pk & 31, sym_len)))
    ln = jnp.where(is_dc | is_sym | is_zrl | is_eob, ln, 0)
    return code.astype(jnp.uint32), ln


@partial(jax.jit, static_argnames=("w_out", "wl", "grp", "wg",
                                   "grp2", "ws"))
def encode_layout_parallel(lv, w_out: int, dc0=None, wl: int = 16,
                           grp: int = 8, wg: int = 64,
                           grp2: int = 6, ws: int = 256):
    """lv int16 [CB, NB, 64, SB, 128] zigzag (slot0 = absolute DC) ->
    (words int32 [CB, w_out, SB, 128], bits int32 [CB, 1, SB, 128], ok)
    — drop-in for encode_layout_async_dense, fully data-parallel.

    wl: per-block word window (block must fit (base&31)+bits <= 32*wl);
    grp/wg: blocks per group / group word window; grp2/ws: groups per
    supergroup / supergroup word window.  `ok` False on any window or
    w_out overflow -> caller falls back to a serial kernel."""
    cbn, NB = lv.shape[0], lv.shape[1]
    if dc0 is None:
        dc0 = jnp.full((cbn, 3, SB, 128), 128, jnp.int32)
    code, ln = _slot_records(lv, dc0)

    # --- bit layout (prefix sums) ---
    cum = jnp.cumsum(ln, axis=2)                     # [CB, NB, 64, SB, 128]
    bbits = cum[:, :, 63]                            # [CB, NB, SB, 128]
    base = jnp.cumsum(bbits, axis=1) - bbits         # exclusive, bits
    total_bits = base[:, NB - 1] + bbits[:, NB - 1]  # [CB, SB, 128]
    gstart = base[:, :, None] + (cum - ln)           # global bit offset
    base_w = base >> 5                               # block base word

    # --- per-slot word contributions (disjoint bits => + is OR) ---
    b = (gstart & 31).astype(jnp.uint32)
    lnu = ln.astype(jnp.uint32)
    fits = b + lnu <= 32
    sh0 = jnp.minimum(jnp.where(fits, 32 - b - lnu, 0), 31)
    c0 = jnp.where(fits, code << sh0,
                   code >> jnp.where(fits, jnp.uint32(0), b + lnu - 32))
    c1 = jnp.where(fits, jnp.uint32(0),
                   code << jnp.where(fits, jnp.uint32(0), 64 - b - lnu))
    live = ln > 0
    c0 = jnp.where(live, c0, 0).astype(jnp.int32)
    c1 = jnp.where(live, c1, 0).astype(jnp.int32)
    li = jnp.where(live, (gstart >> 5) - base_w[:, :, None], -1)

    # --- level 1: slots -> per-block word windows (frame-grid aligned)
    j = jnp.arange(wl, dtype=jnp.int32).reshape(1, 1, 1, wl, 1, 1)
    bw = (jnp.sum(jnp.where(li[:, :, :, None] == j, c0[:, :, :, None], 0),
                  axis=2)
          + jnp.sum(jnp.where((li + 1)[:, :, :, None] == j,
                              c1[:, :, :, None], 0), axis=2))
    ok_blk = jnp.all((base & 31) + bbits <= 32 * wl)

    # --- level 2: blocks -> group windows ---
    NG = -(-NB // grp)
    if NG * grp > NB:
        pad = NG * grp - NB
        bw = jnp.concatenate(
            [bw, jnp.zeros((cbn, pad, wl, SB, 128), jnp.int32)], axis=1)
        base_w = jnp.concatenate(
            [base_w, jnp.broadcast_to(base_w[:, NB - 1:NB],
                                      (cbn, pad, SB, 128))], axis=1)
    gbase_w = base_w[:, ::grp]                       # [CB, NG, SB, 128]
    db = (base_w.reshape(cbn, NG, grp, SB, 128)
          - gbase_w[:, :, None])                     # words into group
    bwg = bw.reshape(cbn, NG, grp, wl, SB, 128)
    jj = jnp.arange(wl, dtype=jnp.int32).reshape(1, 1, 1, wl, 1, 1, 1)
    uu = jnp.arange(wg, dtype=jnp.int32).reshape(1, 1, 1, 1, wg, 1, 1)
    tgt = db[:, :, :, None, None] + jj               # [CB,NG,grp,wl,1,S,128]
    gw = jnp.sum(jnp.where(tgt == uu, bwg[:, :, :, :, None], 0),
                 axis=(2, 3))                        # [CB, NG, wg, SB, 128]
    ok_grp = jnp.all(db + wl <= wg)

    # --- level 3: groups -> supergroup windows ---
    NS = -(-NG // grp2)
    if NS * grp2 > NG:
        pad = NS * grp2 - NG
        gw = jnp.concatenate(
            [gw, jnp.zeros((cbn, pad, wg, SB, 128), jnp.int32)], axis=1)
        gbase_w = jnp.concatenate(
            [gbase_w, jnp.broadcast_to(gbase_w[:, NG - 1:NG],
                                       (cbn, pad, SB, 128))], axis=1)
    sbase_w = gbase_w[:, ::grp2]                     # [CB, NS, SB, 128]
    dg = (gbase_w.reshape(cbn, NS, grp2, SB, 128)
          - sbase_w[:, :, None])
    gws = gw.reshape(cbn, NS, grp2, wg, SB, 128)
    uu2 = jnp.arange(wg, dtype=jnp.int32).reshape(1, 1, 1, wg, 1, 1, 1)
    vv = jnp.arange(ws, dtype=jnp.int32).reshape(1, 1, 1, 1, ws, 1, 1)
    tgt2 = dg[:, :, :, None, None] + uu2             # [CB,NS,g2,wg,1,S,128]
    sw = jnp.sum(jnp.where(tgt2 == vv, gws[:, :, :, :, None], 0),
                 axis=(2, 3))                        # [CB, NS, ws, SB, 128]
    ok_sg = jnp.all(dg + wg <= ws)

    # --- level 4: supergroups -> frame words ---
    vv2 = jnp.arange(ws, dtype=jnp.int32).reshape(1, 1, ws, 1, 1, 1)
    w = jnp.arange(w_out, dtype=jnp.int32).reshape(1, 1, 1, w_out, 1, 1)
    tgt3 = sbase_w[:, :, None, None] + vv2           # [CB, NS, ws, 1, S, 128]
    words = jnp.sum(jnp.where(tgt3 == w, sw[:, :, :, None], 0),
                    axis=(1, 2))                     # [CB, w_out, SB, 128]
    ok = (ok_blk & ok_grp & ok_sg
          & jnp.all((total_bits + 31) >> 5 <= w_out))
    return words, total_bits[:, None], ok


RBITS = 26   # record payload width: the pack kernel appends <= 26 bits


@partial(jax.jit, static_argnames=("w_out", "wl", "interpret",
                                   "win_rows", "unroll", "segs"))
def encode_layout_rechunk(lv, w_out: int, dc0=None, wl: int = 16,
                          interpret: bool = False, win_rows: int = 128,
                          unroll: int = 1, segs: int = 1):
    """lv int16 [CB, NB, 64, SB, 128] zigzag (slot0 = absolute DC) ->
    (words int32 [CB*segs, w_out, SB, 128], bits [CB*segs, 1, SB, 128],
    ok) — parallel XLA pack + uniform-record Pallas splice.

    The v1 where-reduce hierarchy above packs everything in XLA but its
    big frame-level segment-sums run at low VPU efficiency (measured
    174 ms vs the serial kernel's ~70 on the bench corpus).  This
    variant keeps the parallel XLA work where it is CHEAP — per-slot
    Huffman records and a block-LOCAL word pack (window of `wl` words
    per block, bounded reduce over the block's own 64 slots) — then
    re-chunks every block's bitstream into exactly R = ceil(32*wl/26)
    fixed-width 26-bit records (tail record carries the remainder,
    zero-length pads after it) and splices lanes with the existing
    _pack_records kernel.  Records are uniform per block, so lanes run
    in PERFECT lockstep (t_max = NB*R, no divergence, no compaction
    gather) and each iteration moves up to 26 bits instead of one
    ~6-bit token.

    segs > 1 slices the uniform record grid per segment — no
    take_along_axis, unlike encode_layout_async's record slicing.  `ok`
    False when a block overflows wl words -> serial fallback."""
    from .entropy_encode_async_pallas import _pack_records

    cbn, NB = lv.shape[0], lv.shape[1]
    if dc0 is None:
        dc0 = jnp.full((cbn, 3, SB, 128), 128, jnp.int32)
    code, ln = _slot_records(lv, dc0)

    cum = jnp.cumsum(ln, axis=2)                     # [CB, NB, 64, SB, 128]
    bbits = cum[:, :, 63]                            # [CB, NB, SB, 128]
    start = cum - ln                                 # block-local bit offset
    ok = jnp.all(bbits <= 32 * wl)

    # block-local word pack (bounded where-reduce over the 64 slots)
    b = (start & 31).astype(jnp.uint32)
    lnu = ln.astype(jnp.uint32)
    fits = b + lnu <= 32
    sh0 = jnp.minimum(jnp.where(fits, 32 - b - lnu, 0), 31)
    c0 = jnp.where(fits, code << sh0,
                   code >> jnp.where(fits, jnp.uint32(0), b + lnu - 32))
    c1 = jnp.where(fits, jnp.uint32(0),
                   code << jnp.where(fits, jnp.uint32(0), 64 - b - lnu))
    live = ln > 0
    c0 = jnp.where(live, c0, 0).astype(jnp.int32)
    c1 = jnp.where(live, c1, 0).astype(jnp.int32)
    li = jnp.where(live, start >> 5, -1)
    j = jnp.arange(wl, dtype=jnp.int32).reshape(1, 1, 1, wl, 1, 1)
    bw = (jnp.sum(jnp.where(li[:, :, :, None] == j, c0[:, :, :, None], 0),
                  axis=2)
          + jnp.sum(jnp.where((li + 1)[:, :, :, None] == j,
                              c1[:, :, :, None], 0), axis=2))
    bwu = bw.astype(jnp.uint32)                      # [CB, NB, wl, SB, 128]

    # re-chunk to R fixed 26-bit records (static word/bit splits per r)
    R = -(-(32 * wl) // RBITS)
    recs = []
    for r in range(R):
        o = RBITS * r
        i, a = o >> 5, o & 31
        hi = bwu[:, :, i] << a if a else bwu[:, :, i]
        lo = (bwu[:, :, i + 1] >> (32 - a)) if (a and i + 1 < wl) else 0
        field = ((hi | lo) >> (32 - RBITS)).astype(jnp.int32)
        len_r = jnp.clip(bbits - o, 0, RBITS)
        val = jnp.where(len_r > 0,
                        field >> (RBITS - jnp.maximum(len_r, 1)), 0)
        recs.append((val << 5) | len_r)
    recs = jnp.stack(recs, axis=2)                   # [CB, NB, R, SB, 128]

    if segs == 1:
        rec_l = recs.reshape(cbn, NB * R, SB, 128)
        totals = jnp.full((cbn, 1, SB, 128), NB * R, jnp.int32)
    else:
        bps = NB // segs
        rec_l = recs.reshape(cbn * segs, bps * R, SB, 128)
        totals = jnp.full((cbn * segs, 1, SB, 128), bps * R, jnp.int32)
    words, bits = _pack_records(rec_l, totals, w_out, interpret=interpret,
                                win_rows=win_rows, unroll=unroll)
    ok = ok & jnp.all((bits + 31) >> 5 <= w_out)
    return words, bits, ok
