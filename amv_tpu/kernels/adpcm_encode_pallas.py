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
    """One compress step; returns (p, s, nibble, sidx_before)."""
    p = jnp.where(reset, sample, p)
    step = _step_lookup(s)
    delta = sample - p
    neg = delta < 0
    ad4 = jnp.abs(delta) << 2
    mag = jnp.zeros_like(s)
    acc = step
    for _ in range(7):
        mag = mag + (ad4 >= acc).astype(jnp.int32)
        acc = acc + step
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
