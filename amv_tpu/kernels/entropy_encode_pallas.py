"""Pallas device-side JPEG entropy *encoder* (Huffman pack on TPU).

Mirror of entropy_decode_pallas.py for the emit direction: 1024 frames
encode in lockstep on one (8, 128) slab, the grid walks (frame-chunk,
block), and per-lane bit-writer state persists in VMEM scratch.  The
block loop is the synchronization point, so Huffman table choice is
scalar; each block runs straight-line DC then a bounded while-loop that
emits one token per iteration (ZRL and EOB are iterations, mirroring
the decoder).  The per-lane *output* cursor — the dual of the decoder's
byte-fetch problem — is handled the same way: emitted 32-bit words
blend into a WIN-row window of the output block anchored at the minimum
emitting cursor (read-modify-write; each word is written exactly once).

The output block itself (index map constant in the block dimension) is
the accumulation buffer: zeroed at block 0, flushed to HBM when the
frame-chunk advances.  The kernel produces big-endian words of the
*unescaped* scan plus per-lane bit counts; the C pass
(native.escape_frames) applies 1-bit stuffing, 0xFF00 escaping and
SOI/EOI framing at memcpy speed.

Bit-exact with bitstream/entropy.huffman_encode_frame (mjpegenc.c
encode_block/escape_FF semantics): last_dc = 128 per component per
frame, negative mantissas emit val-1 masked, run>15 splits into ZRLs,
EOB unless the last nonzero sits at 63.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..bitstream import jpeg_tables as T

SB = 8
WIN_O = 128  # output window rows per emit sweep


def _enc_tables():
    tabs = {}
    for name, bits, vals in (("dc_l", T.BITS_DC_LUMA, T.VALS_DC_LUMA),
                             ("dc_c", T.BITS_DC_CHROMA, T.VALS_DC_CHROMA),
                             ("ac_l", T.BITS_AC_LUMA, T.VALS_AC_LUMA),
                             ("ac_c", T.BITS_AC_CHROMA, T.VALS_AC_CHROMA)):
        sizes, codes = T.build_huffman_codes(bits, vals)
        tabs[name] = (np.asarray(sizes, np.int64), np.asarray(codes, np.int64))
    return tabs


_ET = _enc_tables()

# The bit-writer appends with the 128-bit (hi, lo, l2, l3) buffer
# holding up to 100 bits (the lazy flush in emit_if_full only forces a
# drain at nb >= 101), so every appended token must fit 100 + ln <= 127,
# and the two-word spill arithmetic in `append` needs ln < 32.  K.3
# tokens are code(<=16) + mantissa(<=11 DC / <=10 AC).
_MAX_TOKEN_BITS = max(
    max(int(s) for s in _ET["dc_l"][0][:12]) + 11,
    max(int(s) for s in _ET["dc_c"][0][:12]) + 11,
    max(int(s) for s in _ET["ac_l"][0]) + 10,
    max(int(s) for s in _ET["ac_c"][0]) + 10,
)
assert _MAX_TOKEN_BITS <= 27, (
    "append/emit_if_full invariant broken: a code+mantissa token of "
    f"{_MAX_TOKEN_BITS} bits can overflow the 128-bit buffer at nb == 100 "
    "(lazy-flush threshold 101); shrink the threshold or split the append")


def _packed(table, sym):
    """(code << 5) | size packed into one int (size <= 16, code < 2^16)."""
    s, c = table
    return int((c[sym] << 5) | s[sym])


def _i32(w):
    return w - (1 << 32) if w >= (1 << 31) else w


def _ac_canonical(bits, vals):
    """AC emit tables exploiting canonical codes: for rs = run*10+size-1,
    code = cidx[rs] - delta[ln[rs]] where cidx is the symbol's rank in
    the canonical value order and delta[l] = valptr[l] - mincode[l].

    Returns (ln4: 20 packed words of 4-bit (ln-2) fields,
             cidx_planes: 8 bit-planes x 5 mask words,
             delta: 17 ints indexed by code length)."""
    bits = [int(b) for b in bits[1:17]] if len(bits) == 17 else \
        [int(b) for b in bits]
    code, k = 0, 0
    mincode = [0] * 17
    valptr = [0] * 17
    sizes = [0] * 17
    for l in range(1, 17):
        mincode[l] = code
        valptr[l] = k
        code += bits[l - 1]
        k += bits[l - 1]
        code <<= 1
    vals = [int(v) for v in vals]
    pos_of = {v: i for i, v in enumerate(vals)}
    ln_of_rank = [0] * len(vals)
    for l in range(1, 17):
        for j in range(bits[l - 1]):
            ln_of_rank[valptr[l] + j] = l
    ln4 = [0] * 20
    cidx = [0] * 160
    for r in range(16):
        for s in range(1, 11):
            rs = r * 10 + (s - 1)
            rank = pos_of[(r << 4) | s]
            cidx[rs] = rank
            ln4[rs >> 3] |= (ln_of_rank[rank] - 2) << ((rs & 7) * 4)
    planes = [[0] * 5 for _ in range(8)]
    for rs, v in enumerate(cidx):
        for b in range(8):
            if (v >> b) & 1:
                planes[b][rs >> 5] |= 1 << (rs & 31)
    delta = [valptr[l] - mincode[l] for l in range(17)]
    return ([_i32(w) for w in ln4],
            [[_i32(w) for w in row] for row in planes], delta)


_ACE_L = _ac_canonical(list(T.BITS_AC_LUMA), list(T.VALS_AC_LUMA))
_ACE_C = _ac_canonical(list(T.BITS_AC_CHROMA), list(T.VALS_AC_CHROMA))


def _make_kernel(n_blocks: int, w_out: int, win_rows: int = WIN_O,
                 unroll: int = 1):
    win = min(win_rows, w_out)
    assert w_out % win == 0, (w_out, win)

    def bitlen(v):
        """bit_length of v >= 0 (0 -> 0)."""
        r = jnp.zeros(v.shape, jnp.int32)
        x = v
        for s in (8, 4, 2, 1):
            m = x >= (1 << s)
            r = r + jnp.where(m, s, 0)
            x = jnp.where(m, x >> s, x)
        return r + (v > 0).astype(jnp.int32)

    def emit_if_full(out_ref, hi, lo, l2, l3, nb, wcur, tbits,
                     force=False):
        """Flush ready 32-bit words per lane, lazily: only lanes that
        MUST flush (nb >= 101: the next append could overflow the
        128-bit buffer) anchor a window pass, but every lane with a
        ready word (nb >= 32) whose cursor falls in a visited window
        flushes up to THREE words in the same pass.  The 128-bit
        (hi, lo, l2, l3) writer is what amortizes the window RMW: with
        1024 lanes emitting ~6 bits/token in lockstep, a 64-bit buffer
        re-triggers a pass nearly every token, while draining everyone
        to < 32 bits spaces passes many tokens apart.  `force` flushes
        every ready lane (final drain)."""
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
            for _ in range(3):                     # three words per pass
                ready = nb >= 32
                inwin = (wcur >= lo0) & (wcur < lo0 + win)
                # lanes past the output cap drop the word once flushing
                # becomes mandatory (hard), preserving no-overflow
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
        """Append ln bits of code MSB-first at position nb <= 100.

        The lazy flush (emit_if_full, hard threshold nb >= 101) lets
        appends run at nb up to 100, so correctness relies on
        ln <= _MAX_TOKEN_BITS <= 27: nb + ln <= 127 fits the 128-bit
        (hi, lo, l2, l3) buffer, and the code (< 32 bits) spans at most
        two adjacent words.  The module-level static assert enforces the
        bound against the built tables."""
        cu = jnp.where(active, code.astype(jnp.uint32), jnp.uint32(0))
        s = nb & 31
        sh_hi = 32 - s - ln
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
        nb = nb + jnp.where(active, ln, 0)
        tbits = tbits + jnp.where(active, ln, 0)
        return hi, lo, l2, l3, nb, tbits

    def kernel(dc0_ref, lv_ref, out_ref, bits_ref, ldc0_ref, ldc1_ref,
               ldc2_ref, hi_ref, lo_ref, l2_ref, l3_ref, nb_ref, wc_ref,
               tb_ref):
        b = pl.program_id(1)

        @pl.when(b == 0)
        def _init():
            for r in range(0, w_out, win):
                out_ref[0, pl.ds(r, win)] = jnp.zeros(
                    (win, SB, 128), jnp.int32)
            z = jnp.zeros((SB, 128), jnp.int32)
            # per-lane initial DC predictors: 128 for whole frames
            # (mpegvideo_enc.c:2036), or the preceding segment's last DC
            # when a big frame is split across lanes (pipeline/transcode
            # encode segmentation)
            ldc0_ref[:, :] = dc0_ref[0, 0]
            ldc1_ref[:, :] = dc0_ref[0, 1]
            ldc2_ref[:, :] = dc0_ref[0, 2]
            hi_ref[:, :] = jnp.zeros((SB, 128), jnp.uint32)
            lo_ref[:, :] = jnp.zeros((SB, 128), jnp.uint32)
            l2_ref[:, :] = jnp.zeros((SB, 128), jnp.uint32)
            l3_ref[:, :] = jnp.zeros((SB, 128), jnp.uint32)
            nb_ref[:, :] = z
            wc_ref[:, :] = z
            tb_ref[:, :] = z

        luma = (b % 6) < 4
        is_cr = (b % 6) == 5
        sw = lambda a, c: jnp.where(luma, a, c)

        dc_pack = [sw(_packed(_ET["dc_l"], n), _packed(_ET["dc_c"], n))
                   for n in range(12)]
        # AC canonical-code tables indexed by rs = run*10 + nbits-1
        ac_ln4 = [sw(_ACE_L[0][i], _ACE_C[0][i]) for i in range(20)]
        ac_cplane = [[sw(_ACE_L[1][b][i], _ACE_C[1][b][i]) for i in range(5)]
                     for b in range(8)]
        ac_delta = [sw(_ACE_L[2][l], _ACE_C[2][l]) for l in range(17)]
        eob_pack = sw(_packed(_ET["ac_l"], 0), _packed(_ET["ac_c"], 0))
        zrl_pack = sw(_packed(_ET["ac_l"], 0xF0), _packed(_ET["ac_c"], 0xF0))

        lv = [lv_ref[0, 0, k].astype(jnp.int32) for k in range(64)]
        # (lv_ref block is [1, 1, 64, SB, 128])
        hi, lo, l2 = hi_ref[:, :], lo_ref[:, :], l2_ref[:, :]
        l3 = l3_ref[:, :]
        nb, wcur, tbits = nb_ref[:, :], wc_ref[:, :], tb_ref[:, :]

        # ---------------- DC ----------------
        ldc = jnp.where(luma, ldc0_ref[:, :],
                        jnp.where(is_cr, ldc2_ref[:, :], ldc1_ref[:, :]))
        diff = lv[0] - ldc
        ldc0_ref[:, :] = jnp.where(luma, lv[0], ldc0_ref[:, :])
        ldc1_ref[:, :] = jnp.where(luma | is_cr, ldc1_ref[:, :], lv[0])
        ldc2_ref[:, :] = jnp.where(is_cr, lv[0], ldc2_ref[:, :])
        neg = diff < 0
        nbits = bitlen(jnp.abs(diff))
        mant = jnp.where(neg, diff - 1, diff) & \
            ((jnp.int32(1) << nbits) - 1)
        pk = jnp.zeros((SB, 128), jnp.int32)
        for n in range(12):
            pk = pk | jnp.where(nbits == n, dc_pack[n], 0)
        code = ((pk >> 5) << nbits) | mant
        ln = (pk & 31) + nbits
        act = jnp.ones((SB, 128), jnp.bool_)
        hi, lo, l2, l3, nb, tbits = append(hi, lo, l2, l3, nb, tbits, code,
                                           ln, act)
        hi, lo, l2, l3, nb, wcur, tbits = emit_if_full(
            out_ref, hi, lo, l2, l3, nb, wcur, tbits)

        # ---------------- AC token loop ----------------
        # Nonzero positions live in a 2-word bitmask; each iteration
        # isolates the lowest set bit (pos = popcount(low-1)) and reads
        # the value from 32 pair-packed registers — ~3x cheaper than
        # the 63-row rank-match extraction it replaces.
        mlo = jnp.zeros((SB, 128), jnp.int32)
        mhi = jnp.zeros((SB, 128), jnp.int32)
        for k in range(1, 32):
            mlo = mlo | jnp.where(lv[k] != 0, jnp.int32(1) << k, 0)
        for k in range(32, 64):
            bit = 1 << (k - 32)
            mhi = mhi | jnp.where(lv[k] != 0,
                                  jnp.int32(bit - (1 << 32) if k == 63
                                            else bit), 0)
        pv = [(lv[2 * j] & 0xFFFF) | (lv[2 * j + 1] << 16)
              for j in range(32)]

        def popc(xu):
            xu = xu - ((xu >> 1) & jnp.uint32(0x55555555))
            xu = (xu & jnp.uint32(0x33333333)) + \
                ((xu >> 2) & jnp.uint32(0x33333333))
            xu = (xu + (xu >> 4)) & jnp.uint32(0x0F0F0F0F)
            return ((xu * jnp.uint32(0x01010101)) >> 24).astype(jnp.int32)

        max_it = (70 + unroll - 1) // unroll + 1

        def cond(st):
            it, mlo, mhi, prev, z, eobd = st[:6]
            done = (mlo == 0) & (mhi == 0) & ((eobd != 0) | (prev == 63))
            return (it < max_it) & (jnp.sum(1 - done.astype(jnp.int32)) > 0)

        def tok(mlo, mhi, prev, z, eobd, hi, lo, l2, l3, nb, wcur, tbits):
            in_ac = (mlo != 0) | (mhi != 0)
            sel_lo = mlo != 0
            wmask = jnp.where(sel_lo, mlo, mhi)
            low = wmask & -wmask
            pos = popc((low - 1).astype(jnp.uint32)) + \
                jnp.where(sel_lo, 0, 32)
            half = jnp.zeros((SB, 128), jnp.int32)
            for j in range(32):
                half = half | jnp.where((pos >> 1) == j, pv[j], 0)
            val = jnp.where((pos & 1) != 0, half >> 16,
                            ((half & 0xFFFF) ^ 0x8000) - 0x8000)
            run = pos - prev - 1 - 16 * z
            is_zrl = in_ac & (run >= 16)
            is_sym = in_ac & (run < 16)
            is_eob = (~in_ac) & (eobd == 0) & (prev != 63)
            clear = is_sym & sel_lo
            mlo = jnp.where(clear, mlo ^ low, mlo)
            mhi = jnp.where(is_sym & (~sel_lo), mhi ^ low, mhi)

            negv = val < 0
            nbv = bitlen(jnp.abs(val))
            mantv = jnp.where(negv, val - 1, val) & \
                ((jnp.int32(1) << nbv) - 1)
            rs = jnp.clip(run, 0, 15) * 10 + jnp.clip(nbv - 1, 0, 9)
            # canonical Huffman: code = rank(sym) - (valptr - mincode)[ln]
            wsel = rs >> 5
            shv = (rs & 31).astype(jnp.uint32)
            cidx = jnp.zeros((SB, 128), jnp.int32)
            for b in range(8):
                wd = jnp.zeros((SB, 128), jnp.int32)
                for i in range(5):
                    wd = wd | jnp.where(wsel == i, ac_cplane[b][i], 0)
                bit = (wd.astype(jnp.uint32) >> shv) & jnp.uint32(1)
                cidx = cidx | (bit.astype(jnp.int32) << b)
            w4 = jnp.zeros((SB, 128), jnp.int32)
            for i in range(20):
                w4 = w4 | jnp.where((rs >> 3) == i, ac_ln4[i], 0)
            lnc = 2 + ((w4.astype(jnp.uint32) >>
                        ((rs & 7) << 2).astype(jnp.uint32)).astype(jnp.int32)
                       & 15)
            dsel = jnp.zeros((SB, 128), jnp.int32)
            for l in range(2, 17):
                dsel = dsel | jnp.where(lnc == l, ac_delta[l], 0)
            code_ac = cidx - dsel
            code_s = (code_ac << nbv) | mantv
            ln_s = lnc + nbv

            code = jnp.where(is_sym, code_s,
                             jnp.where(is_zrl, zrl_pack >> 5, eob_pack >> 5))
            ln = jnp.where(is_sym, ln_s,
                           jnp.where(is_zrl, zrl_pack & 31, eob_pack & 31))
            act = is_sym | is_zrl | is_eob
            hi, lo, l2, l3, nb, tbits = append(hi, lo, l2, l3, nb, tbits,
                                               code, ln, act)
            # (a scalar skip-counter around this emit was measured ~12%
            # slower on TPU — see the decoder's matching note)
            hi, lo, l2, l3, nb, wcur, tbits = emit_if_full(
                out_ref, hi, lo, l2, l3, nb, wcur, tbits)

            prev = jnp.where(is_sym, pos, prev)
            z = jnp.where(is_sym, 0, z + is_zrl.astype(jnp.int32))
            eobd = eobd | is_eob.astype(jnp.int32)
            return mlo, mhi, prev, z, eobd, hi, lo, l2, l3, nb, wcur, tbits

        def body(st):
            it, rest = st[0], st[1:]
            # `unroll` tokens per iteration: per-block lockstep
            # iterations are the per-chunk MAX token count, so unrolling
            # divides the divergence tax's iteration count (append/emit
            # stay per-token: the 64-bit writer needs a flush window
            # between appends)
            for _ in range(unroll):
                rest = tok(*rest)
            return (it + 1,) + rest

        zi = jnp.zeros((SB, 128), jnp.int32)
        st = (jnp.int32(0), mlo, mhi, zi, zi, zi, hi, lo, l2, l3, nb, wcur,
              tbits)
        (_, _, _, _, _, _, hi, lo, l2, l3, nb, wcur,
         tbits) = jax.lax.while_loop(cond, body, st)

        @pl.when(b == n_blocks - 1)
        def _flush():
            # drain any full deferred words, then the partial word (bits
            # beyond nb are zero; the C pass 1-pads the last byte)
            hi_f, lo_f, l2_f, l3_f, nb_f, wcur_f, _ = emit_if_full(
                out_ref, hi, lo, l2, l3, nb, wcur, tbits, force=True)

            def cond_f(st):
                _, unserved = st
                return jnp.sum(unserved) > 0

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
            bits_ref[0, 0] = tbits

        hi_ref[:, :] = hi
        lo_ref[:, :] = lo
        l2_ref[:, :] = l2
        l3_ref[:, :] = l3
        nb_ref[:, :] = nb
        wc_ref[:, :] = wcur
        tb_ref[:, :] = tbits

    return kernel


def _pad(n, m):
    return (n + m - 1) // m * m


@partial(jax.jit, static_argnames=("w_out", "interpret", "win_rows",
                                   "unroll"))
def _encode_layout(lv, w_out: int, interpret: bool = False,
                   win_rows: int = WIN_O, dc0=None, unroll: int = 1):
    """lv int16 [CB, n_blocks, 64, SB, 128] zigzag (slot0 = absolute
    quantized DC) -> (words int32 [CB, w_out, SB, 128] big-endian
    unescaped scan, bits int32 [CB, 1, SB, 128]).

    `win_rows` sizes the emit window (must divide w_out); smaller is
    faster when per-lane output cursors cluster (length-sorted batches).
    `dc0` int32 [CB, 3, SB, 128] overrides the per-lane initial DC
    predictors (Y, Cb, Cr); default 128 = whole-frame encode."""
    cbn, nblk = lv.shape[0], lv.shape[1]
    if dc0 is None:
        dc0 = jnp.full((cbn, 3, SB, 128), 128, jnp.int32)
    kernel = _make_kernel(nblk, w_out, win_rows=win_rows, unroll=unroll)
    return pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((cbn, w_out, SB, 128), jnp.int32),
                   jax.ShapeDtypeStruct((cbn, 1, SB, 128), jnp.int32)),
        grid=(cbn, nblk),
        in_specs=[pl.BlockSpec((1, 3, SB, 128), lambda i, j: (i, 0, 0, 0)),
                  pl.BlockSpec((1, 1, 64, SB, 128),
                               lambda i, j: (i, j, 0, 0, 0))],
        out_specs=(pl.BlockSpec((1, w_out, SB, 128),
                                lambda i, j: (i, 0, 0, 0)),
                   pl.BlockSpec((1, 1, SB, 128), lambda i, j: (i, 0, 0, 0))),
        scratch_shapes=[pltpu.VMEM((SB, 128), jnp.int32)] * 3 +
                       [pltpu.VMEM((SB, 128), jnp.uint32)] * 4 +
                       [pltpu.VMEM((SB, 128), jnp.int32)] * 3,
        interpret=interpret,
    )(dc0, lv)


@partial(jax.jit, static_argnames=("w_out", "interpret", "win_rows"))
def encode_scans_pallas(levels_zz: jnp.ndarray, w_out: int = 1024,
                        interpret: bool = False, win_rows: int = WIN_O):
    """levels int16 [F, n_mcu, 6, 64] zigzag (slot0 = absolute quantized
    DC) -> (words int32 [F, w_out] big-endian unescaped scan words,
    bits int32 [F]).

    The C pass native.escape_frames turns (words, bits) into framed
    '00dc' payloads (1-pad, 0xFF00 escape, SOI/EOI).  w_out is rounded
    up to a WIN_O multiple (the emit-window divisibility requirement).
    """
    w_out = max(WIN_O, _pad(w_out, WIN_O))
    F, n_mcu = levels_zz.shape[0], levels_zz.shape[1]
    nblk = n_mcu * 6
    fp = _pad(F, SB * 128)
    cbn = fp // (SB * 128)
    lv = jnp.pad(levels_zz.reshape(F, nblk, 64),
                 ((0, fp - F), (0, 0), (0, 0)))
    lvl = lv.reshape(cbn, SB, 128, nblk, 64).transpose(0, 3, 4, 1, 2)
    words, bits = _encode_layout(lvl, w_out, interpret=interpret,
                                 win_rows=win_rows)
    wout = words.transpose(0, 2, 3, 1).reshape(fp, w_out)[:F]
    bout = bits[:, 0].reshape(fp)[:F]
    return wout, bout
