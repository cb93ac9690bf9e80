"""Pallas TPU kernel for the batched bit-exact simple_idct.

Layout strategy: "coefficient-major" structure-of-arrays — the 64
coefficients of N blocks live as a [64, N] array, so every butterfly
line of the 8x8 transform is a single [TILE_N]-wide VPU op on one row.
The whole dequant+row+column transform runs in VMEM with one HBM read
([64,N] int16) and one write ([64,N] uint8) per tile: the transform is
HBM-bandwidth-bound by construction.

Arithmetic is identical to kernels/idct.py (simple_idct.c semantics:
int16 row storage wrap, DC-only row shortcut, int32 accumulation, >>20,
uint8 clamp).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

W1, W2, W3, W4, W5, W6, W7 = 22725, 21407, 19266, 16383, 12873, 8867, 4520
ROW_SHIFT, COL_SHIFT = 11, 20

TILE_N = 512


def _wrap16(x):
    return ((x + 0x8000) & 0xFFFF) - 0x8000


def _idct_kernel(deq_ref, out_ref):
    # rows: coefficient r*8+i of all blocks in this tile
    rows = [[deq_ref[r * 8 + i, :].astype(jnp.int32) for i in range(8)]
            for r in range(8)]
    mid = [[None] * 8 for _ in range(8)]
    for r in range(8):
        c = rows[r]
        dc_only = (c[1] | c[2] | c[3] | c[4] | c[5] | c[6] | c[7]) == 0
        short = _wrap16(c[0] << 3)
        a0 = W4 * c[0] + (1 << (ROW_SHIFT - 1))
        a1 = a0 + W6 * c[2] - W4 * c[4] - W2 * c[6]
        a2 = a0 - W6 * c[2] - W4 * c[4] + W2 * c[6]
        a3 = a0 - W2 * c[2] + W4 * c[4] - W6 * c[6]
        a0 = a0 + W2 * c[2] + W4 * c[4] + W6 * c[6]
        b0 = W1 * c[1] + W3 * c[3] + W5 * c[5] + W7 * c[7]
        b1 = W3 * c[1] - W7 * c[3] - W1 * c[5] - W5 * c[7]
        b2 = W5 * c[1] - W1 * c[3] + W7 * c[5] + W3 * c[7]
        b3 = W7 * c[1] - W5 * c[3] + W3 * c[5] - W1 * c[7]
        o = [(a0 + b0) >> ROW_SHIFT, (a1 + b1) >> ROW_SHIFT,
             (a2 + b2) >> ROW_SHIFT, (a3 + b3) >> ROW_SHIFT,
             (a3 - b3) >> ROW_SHIFT, (a2 - b2) >> ROW_SHIFT,
             (a1 - b1) >> ROW_SHIFT, (a0 - b0) >> ROW_SHIFT]
        for i in range(8):
            mid[r][i] = jnp.where(dc_only, short, _wrap16(o[i]))
    bias = (1 << (COL_SHIFT - 1)) // W4
    for j in range(8):
        c = [mid[i][j] for i in range(8)]
        a0 = W4 * (c[0] + bias)
        a1 = a0 + W6 * c[2] - W4 * c[4] - W2 * c[6]
        a2 = a0 - W6 * c[2] - W4 * c[4] + W2 * c[6]
        a3 = a0 - W2 * c[2] + W4 * c[4] - W6 * c[6]
        a0 = a0 + W2 * c[2] + W4 * c[4] + W6 * c[6]
        b0 = W1 * c[1] + W3 * c[3] + W5 * c[5] + W7 * c[7]
        b1 = W3 * c[1] - W7 * c[3] - W1 * c[5] - W5 * c[7]
        b2 = W5 * c[1] - W1 * c[3] + W7 * c[5] + W3 * c[7]
        b3 = W7 * c[1] - W5 * c[3] + W3 * c[5] - W1 * c[7]
        o = [(a0 + b0) >> COL_SHIFT, (a1 + b1) >> COL_SHIFT,
             (a2 + b2) >> COL_SHIFT, (a3 + b3) >> COL_SHIFT,
             (a3 - b3) >> COL_SHIFT, (a2 - b2) >> COL_SHIFT,
             (a1 - b1) >> COL_SHIFT, (a0 - b0) >> COL_SHIFT]
        for i in range(8):
            out_ref[i * 8 + j, :] = jnp.clip(o[i], 0, 255).astype(jnp.uint8)


@partial(jax.jit, static_argnames=("interpret",))
def idct_put_soa(deq_cm: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """Coefficient-major IDCT: int16 [64, N] (N % 512 == 0) -> uint8 [64, N]."""
    n = deq_cm.shape[1]
    grid = (n // TILE_N,)
    return pl.pallas_call(
        _idct_kernel,
        out_shape=jax.ShapeDtypeStruct((64, n), jnp.uint8),
        grid=grid,
        in_specs=[pl.BlockSpec((64, TILE_N), lambda i: (0, i))],
        out_specs=pl.BlockSpec((64, TILE_N), lambda i: (0, i)),
        interpret=interpret,
    )(deq_cm)


def idct_put_pallas(blocks: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """Drop-in for kernels.idct.idct_put: int16 [..., 8, 8] -> uint8.

    Internally transposes to coefficient-major, pads N to the tile size,
    runs the Pallas kernel, and transposes back.
    """
    shape = blocks.shape
    n = int(np.prod(shape[:-2]))
    cm = blocks.reshape(n, 64).T  # [64, N]
    n_pad = -n % TILE_N
    if n_pad:
        cm = jnp.pad(cm, ((0, 0), (0, n_pad)))
    out = idct_put_soa(cm, interpret=interpret)
    if n_pad:
        out = out[:, :n]
    return out.T.reshape(shape)
