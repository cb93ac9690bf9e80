"""Fully parallel JPEG entropy ENCODE: no Pallas, no serial token cycle.

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
