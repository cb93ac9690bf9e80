"""Pallas IMA-ADPCM (AMV flavor) *encode* kernel.

Mirror of adpcm_pallas.py for the compression direction
(adpcm.c:219-227 adpcm_ima_compress_sample): streams pack onto
(SB, 128) vreg slabs, the per-sample quantizer-feedback recurrence runs
in registers, and state persists across time-block grid steps in VMEM
scratch.  The two table lookups dissolve the same way as in decode
(89-entry step table -> masked-select OR-tree; index table ->
arithmetic), and the quantizer's integer division
``min(7, |delta|*4 / step)`` becomes 7 threshold compares
(q >= k <=> |delta|*4 >= k*step), exact for nonnegative ints.

Per byte step the kernel consumes two samples + two reset flags (chunk
starts re-seed the predictor, adpcm.c:464) and emits the packed nibble
byte plus the pre-sample step index of the even sample (chunk starts
are always sample-even in the AMV layout, so headers read it directly).
Bit-exact vs kernels.adpcm.encode_samples (tests).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..verify.ref_adpcm import STEP_TABLE
from .adpcm_pallas import SB, T_BLOCK, _pad, _step_lookup


def _compress(p, s, sample, reset):
    """One compress step; returns (p, s, nibble, sidx_before).

    The quantizer ``min(7, |delta|*4 // step)`` is 7 *parallel*
    threshold compares (q >= k <=> |delta|*4 >= k*step, exact for
    nonnegative ints) tree-summed in depth 3: the samples are a serial
    recurrence, so per-sample dependency DEPTH is what the kernel pays
    (same latency-bound model as the entropy kernels' tree reductions) —
    the k*step products all issue one multiply after `step`, vs the
    r4-era serial ``acc += step`` chain of depth 14."""
    p = jnp.where(reset, sample, p)
    step = _step_lookup(s)
    delta = sample - p
    neg = delta < 0
    ad4 = jnp.abs(delta) << 2
    cmps = [(ad4 >= step * k).astype(jnp.int32) for k in range(1, 8)]
    while len(cmps) > 1:
        nxt = [cmps[i] + cmps[i + 1] for i in range(0, len(cmps) - 1, 2)]
        if len(cmps) % 2:
            nxt.append(cmps[-1])
        cmps = nxt
    mag = cmps[0]
    nib = mag + jnp.where(neg, 8, 0)
    recon = step * (2 * mag + 1)
    recon = jnp.where(neg, -(recon >> 3), recon >> 3)
    p = jnp.clip(p + recon, -32768, 32767)
    s2 = jnp.clip(s + jnp.where(mag < 4, -1, 2 * mag - 6), 0, 88)
    return p, s2, nib, s


def _kernel(x_ref, r_ref, s0_ref, out_ref, sx_ref, p_ref, s_ref):
    # predictor seeds from the first sample via the reset flags
    @pl.when(pl.program_id(1) == 0)
    def _init():
        p_ref[:, :] = jnp.zeros((SB, 128), jnp.int32)
        s_ref[:, :] = jnp.clip(s0_ref[0], 0, 88)

    def body(t, carry):
        p, s = carry
        x0 = x_ref[0, 2 * t].astype(jnp.int32)
        x1 = x_ref[0, 2 * t + 1].astype(jnp.int32)
        r0 = r_ref[0, 2 * t] != 0
        r1 = r_ref[0, 2 * t + 1] != 0
        p, s, n0, sb0 = _compress(p, s, x0, r0)
        p, s, n1, _ = _compress(p, s, x1, r1)
        out_ref[0, t] = ((n0 << 4) | n1).astype(jnp.uint8)
        sx_ref[0, t] = sb0.astype(jnp.uint8)
        return p, s

    p, s = jax.lax.fori_loop(0, T_BLOCK, body, (p_ref[:, :], s_ref[:, :]))
    p_ref[:, :] = p
    s_ref[:, :] = s


@partial(jax.jit, static_argnames=("interpret",))
def encode_layout(x, r, sidx0, interpret: bool = False):
    """x int16 [CB, 2*NB, SB, 128] samples, r uint8 (reset flags, same
    shape), sidx0 int32 [CB, SB, 128] -> (bytes uint8 [CB, NB, SB, 128],
    sidx_even uint8 [CB, NB, SB, 128])."""
    cb, n2 = x.shape[0], x.shape[1]
    nb = n2 // 2
    return pl.pallas_call(
        _kernel,
        out_shape=(jax.ShapeDtypeStruct((cb, nb, SB, 128), jnp.uint8),
                   jax.ShapeDtypeStruct((cb, nb, SB, 128), jnp.uint8)),
        grid=(cb, nb // T_BLOCK),
        in_specs=[
            pl.BlockSpec((1, 2 * T_BLOCK, SB, 128),
                         lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 2 * T_BLOCK, SB, 128),
                         lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, SB, 128), lambda i, j: (i, 0, 0)),
        ],
        out_specs=(pl.BlockSpec((1, T_BLOCK, SB, 128),
                                lambda i, j: (i, j, 0, 0)),
                   pl.BlockSpec((1, T_BLOCK, SB, 128),
                                lambda i, j: (i, j, 0, 0))),
        scratch_shapes=[pltpu.VMEM((SB, 128), jnp.int32),
                        pltpu.VMEM((SB, 128), jnp.int32)],
        interpret=interpret,
    )(x, r, sidx0)


@partial(jax.jit, static_argnames=("repeat", "interpret"))
def encode_layout_wrap(x, r, sidx0, repeat: int, interpret: bool = False):
    """encode_layout over a *logically* repeat-times chunk-block-tiled
    input, without materializing the tiled slab.

    Bit-identical to
        encode_layout(jnp.tile(x, (repeat, 1, 1, 1)),
                      jnp.tile(r, (repeat, 1, 1, 1)),
                      jnp.tile(sidx0, (repeat, 1, 1)))
    but the input BlockSpecs wrap (i % cb) — the mirror of
    adpcm_pallas.decode_layout_wrap for the compress direction.  The
    replicated sample/reset planes are fetched from the small base; the
    per-sample quantizer-feedback work and the full-size byte/sidx
    outputs are unchanged."""
    cb, n2 = x.shape[0], x.shape[1]
    nb = n2 // 2
    return pl.pallas_call(
        _kernel,
        out_shape=(jax.ShapeDtypeStruct((cb * repeat, nb, SB, 128),
                                        jnp.uint8),
                   jax.ShapeDtypeStruct((cb * repeat, nb, SB, 128),
                                        jnp.uint8)),
        grid=(cb * repeat, nb // T_BLOCK),
        in_specs=[
            pl.BlockSpec((1, 2 * T_BLOCK, SB, 128),
                         lambda i, j: (i % cb, j, 0, 0)),
            pl.BlockSpec((1, 2 * T_BLOCK, SB, 128),
                         lambda i, j: (i % cb, j, 0, 0)),
            pl.BlockSpec((1, SB, 128), lambda i, j: (i % cb, 0, 0)),
        ],
        out_specs=(pl.BlockSpec((1, T_BLOCK, SB, 128),
                                lambda i, j: (i, j, 0, 0)),
                   pl.BlockSpec((1, T_BLOCK, SB, 128),
                                lambda i, j: (i, j, 0, 0))),
        scratch_shapes=[pltpu.VMEM((SB, 128), jnp.int32),
                        pltpu.VMEM((SB, 128), jnp.int32)],
        interpret=interpret,
    )(x, r, sidx0)


@partial(jax.jit, static_argnames=("interpret",))
def to_layout_enc(samples, reset, sidx0, interpret: bool = False):
    """int16 [B, n] + reset uint8/bool [B, n] + int32 [B] -> packed
    encode_layout inputs (x [CB, np, SB, 128], r same, s0 [CB, SB, 128]).
    Mirror of adpcm_pallas.to_layout for the encode input planes."""
    b, n = samples.shape
    bp = _pad(b, SB * 128)
    np_ = _pad(n, 2 * T_BLOCK)
    x = jnp.pad(samples.astype(jnp.int16), ((0, bp - b), (0, np_ - n)))
    r = jnp.pad(reset.astype(jnp.uint8), ((0, bp - b), (0, np_ - n)))
    s0 = jnp.pad(sidx0.astype(jnp.int32), (0, bp - b))
    cbn = bp // (SB * 128)
    xl = x.reshape(cbn, SB, 128, np_).transpose(0, 3, 1, 2)
    rl = r.reshape(cbn, SB, 128, np_).transpose(0, 3, 1, 2)
    return xl, rl, s0.reshape(cbn, SB, 128)


@partial(jax.jit, static_argnames=("interpret",))
def encode_streams_pallas(samples, reset, sidx0, interpret: bool = False):
    """samples int16/int32 [B, n] (n even), reset bool [B, n],
    sidx0 int32 [B] -> (bytes uint8 [B, n//2], sidx_even uint8 [B, n//2]).

    sidx_even[b, t] is the codec step index before sample 2t (what a
    chunk header starting at sample 2t stores).
    """
    b, n = samples.shape
    bp = _pad(b, SB * 128)
    np_ = _pad(n, 2 * T_BLOCK)
    x = jnp.pad(samples.astype(jnp.int16), ((0, bp - b), (0, np_ - n)))
    r = jnp.pad(reset.astype(jnp.uint8), ((0, bp - b), (0, np_ - n)))
    s0 = jnp.pad(sidx0.astype(jnp.int32), (0, bp - b))
    cbn = bp // (SB * 128)
    xl = x.reshape(cbn, SB, 128, np_).transpose(0, 3, 1, 2)
    rl = r.reshape(cbn, SB, 128, np_).transpose(0, 3, 1, 2)
    sl = s0.reshape(cbn, SB, 128)
    ob, os_ = encode_layout(xl, rl, sl, interpret=interpret)
    ob = ob.transpose(0, 2, 3, 1).reshape(bp, np_ // 2)[:b, :n // 2]
    os_ = os_.transpose(0, 2, 3, 1).reshape(bp, np_ // 2)[:b, :n // 2]
    return ob, os_
