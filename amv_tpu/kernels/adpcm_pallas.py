"""Pallas IMA-ADPCM (AMV flavor) decode kernel.

The XLA formulations in kernels/adpcm.py top out at ~115 Msamples/s
(lax.scan keeps state in registers but pays per-step dispatch + HBM
traffic for the [C]-wide state on every one of ~2700 sample steps).
This kernel runs the same per-sample recurrence
(AMVmuxer/ffmpeg/libavcodec/adpcm.c:716-740, 1268-1290) entirely inside
VMEM: chunks are packed onto (SB, 128) vreg slabs, the per-sample loop
is a `fori_loop` whose {predictor, step_index} state lives in vector
registers, and the grid walks (chunk-block, time-block) with the state
persisted across time blocks in VMEM scratch (TPU grid iterations are
sequential, so this is a legal software pipeline).

The 89-entry step table (adpcm.c:65) is the classic Mosaic blocker — no
dynamic vector gather on TPU.  Here it is an unrolled masked-select tree:
``step = OR_k (s == k) * STEP_TABLE[k]`` reduced pairwise (log-depth, so
the VPU pipelines it).  The index table (adpcm.c:56) collapses to
arithmetic: ``d < 4 ? -1 : 2*d - 6``.

Layout contract: chunk c lives at (cb, sl, ln) with
c = cb*SB*128 + sl*128 + ln; time-major byte planes so each loop step
loads one [SB, 128] slab.  Bit-exact vs kernels/adpcm.py (tests).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..verify.ref_adpcm import STEP_TABLE

SB = 16          # sublanes per chunk block -> SB*128 chunks in lockstep
T_BLOCK = 128    # bytes (= 256 samples) per grid time-step

_STEP = [int(v) for v in STEP_TABLE]


def _step_lookup(s):
    """step_table[s] for s int32 in [0, 88]: masked-select OR-tree."""
    vals = [jnp.where(s == k, _STEP[k], 0) for k in range(89)]
    while len(vals) > 1:
        nxt = [vals[i] | vals[i + 1] for i in range(0, len(vals) - 1, 2)]
        if len(vals) % 2:
            nxt.append(vals[-1])
        vals = nxt
    return vals[0]


def _sample_update(p, s, nib):
    """One adpcm_ima_expand_nibble(shift=3) step (adpcm.c:716-740)."""
    step = _step_lookup(s)
    diff = ((2 * (nib & 7) + 1) * step) >> 3
    p = jnp.clip(jnp.where((nib & 8) != 0, p - diff, p + diff),
                 -32768, 32767)
    d = nib & 7
    s = jnp.clip(s + jnp.where(d < 4, -1, 2 * d - 6), 0, 88)
    return p, s


def _kernel(b_ref, p0_ref, s0_ref, out_ref, p_ref, s_ref):
    @pl.when(pl.program_id(1) == 0)
    def _init():
        p_ref[:, :] = p0_ref[0]
        s_ref[:, :] = jnp.clip(s0_ref[0], 0, 88)

    def body(t, carry):
        p, s = carry
        byte = b_ref[0, t].astype(jnp.int32)
        p, s = _sample_update(p, s, (byte >> 4) & 0xF)
        out_ref[0, 2 * t] = p.astype(jnp.int16)
        p, s = _sample_update(p, s, byte & 0xF)
        out_ref[0, 2 * t + 1] = p.astype(jnp.int16)
        return p, s

    p, s = jax.lax.fori_loop(0, T_BLOCK, body, (p_ref[:, :], s_ref[:, :]))
    p_ref[:, :] = p
    s_ref[:, :] = s


@partial(jax.jit, static_argnames=("interpret",))
def decode_layout(bts, pred, sidx, interpret: bool = False):
    """Decode in packed layout.

    bts:  uint8 [CB, NB, SB, 128] (time-major byte planes, NB % T_BLOCK == 0)
    pred: int32 [CB, SB, 128]; sidx: int32 [CB, SB, 128]
    returns int16 [CB, 2*NB, SB, 128]
    """
    cb, nb = bts.shape[0], bts.shape[1]
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((cb, 2 * nb, SB, 128), jnp.int16),
        grid=(cb, nb // T_BLOCK),
        in_specs=[
            pl.BlockSpec((1, T_BLOCK, SB, 128), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, SB, 128), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, SB, 128), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 2 * T_BLOCK, SB, 128),
                               lambda i, j: (i, j, 0, 0)),
        scratch_shapes=[pltpu.VMEM((SB, 128), jnp.int32),
                        pltpu.VMEM((SB, 128), jnp.int32)],
        interpret=interpret,
    )(bts, pred, sidx)


@partial(jax.jit, static_argnames=("repeat", "interpret"))
def decode_layout_wrap(bts, pred, sidx, repeat: int, interpret: bool = False):
    """decode_layout over a *logically* repeat-times chunk-block-tiled
    input, without materializing the tiled slab.

    Bit-identical to
        decode_layout(jnp.tile(bts, (repeat, 1, 1, 1)),
                      jnp.tile(pred, (repeat, 1, 1)),
                      jnp.tile(sidx, (repeat, 1, 1)))
    but the input BlockSpec index maps wrap (i % cb), so the replicated
    nibble planes are fetched from the small base instead of a tiled HBM
    copy (full input-read volume per grid step; only the tile write +
    its read-back disappear).  Benchmark harnesses use this for corpus
    replication they only need logically (bench.py ADPCM section); the
    per-sample recurrence work and the full-size PCM output are
    unchanged."""
    cb, nb = bts.shape[0], bts.shape[1]
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((cb * repeat, 2 * nb, SB, 128),
                                       jnp.int16),
        grid=(cb * repeat, nb // T_BLOCK),
        in_specs=[
            pl.BlockSpec((1, T_BLOCK, SB, 128), lambda i, j: (i % cb, j, 0, 0)),
            pl.BlockSpec((1, SB, 128), lambda i, j: (i % cb, 0, 0)),
            pl.BlockSpec((1, SB, 128), lambda i, j: (i % cb, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 2 * T_BLOCK, SB, 128),
                               lambda i, j: (i, j, 0, 0)),
        scratch_shapes=[pltpu.VMEM((SB, 128), jnp.int32),
                        pltpu.VMEM((SB, 128), jnp.int32)],
        interpret=interpret,
    )(bts, pred, sidx)


def _pad(n, m):
    return (n + m - 1) // m * m


@partial(jax.jit, static_argnames=("interpret",))
def to_layout(payload, pred, sidx, interpret: bool = False):
    """uint8 [C, nbytes] + int32 [C] x2 -> packed layout arrays."""
    c, nb = payload.shape
    cp, nbp = _pad(c, SB * 128), _pad(nb, T_BLOCK)
    pl_p = jnp.pad(payload, ((0, cp - c), (0, nbp - nb)))
    pr_p = jnp.pad(pred.astype(jnp.int32), (0, cp - c))
    si_p = jnp.pad(sidx.astype(jnp.int32), (0, cp - c))
    cbn = cp // (SB * 128)
    bts = pl_p.reshape(cbn, SB, 128, nbp).transpose(0, 3, 1, 2)
    return bts, pr_p.reshape(cbn, SB, 128), si_p.reshape(cbn, SB, 128)


@partial(jax.jit, static_argnames=("interpret",))
def decode_chunks_pallas(payload, pred, sidx, interpret: bool = False):
    """Drop-in equivalent of kernels.adpcm.decode_chunks (bit-exact).

    payload uint8 [C, nbytes], pred/sidx int32 [C] -> pcm int16
    [C, 2*nbytes].  Pays two layout transposes; the checksum/bench path
    uses decode_layout directly to skip them.
    """
    c, nb = payload.shape
    bts, pr, si = to_layout(payload, pred, sidx, interpret=interpret)
    out = decode_layout(bts, pr, si, interpret=interpret)
    pcm = out.transpose(0, 2, 3, 1).reshape(-1, out.shape[1])
    return pcm[:c, :2 * nb]
