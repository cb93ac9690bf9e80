"""Pallas TPU kernel for the batched bit-exact FDCT + quantizer.

Coefficient-major twin of idct_pallas.py: pixels of N blocks live as
[64, N] uint8; the jfdctint forward DCT (CONST_BITS=13, PASS1_BITS=4,
int16 inter-pass storage) and the dct_quantize_c intra quantizer
(bias=0, QMAT_SHIFT=22, DC (x+32)>>6, clip +/-1023) run in VMEM per tile.
Bit-exact with kernels/fdct.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

C0298, C0390, C0541, C0765 = 2446, 3196, 4433, 6270
C0899, C1175, C1501, C1847 = 7373, 9633, 12299, 15137
C1961, C2053, C2562, C3072 = 16069, 16819, 20995, 25172
PASS1_BITS = 4

TILE_N = 512


def _wrap16(x):
    return ((x + 0x8000) & 0xFFFF) - 0x8000


def _descale(x, n):
    return (x + (1 << (n - 1))) >> n


def _fdct_1d(c, shift_even, pass1_even):
    t0, t7 = c[0] + c[7], c[0] - c[7]
    t1, t6 = c[1] + c[6], c[1] - c[6]
    t2, t5 = c[2] + c[5], c[2] - c[5]
    t3, t4 = c[3] + c[4], c[3] - c[4]
    t10, t13 = t0 + t3, t0 - t3
    t11, t12 = t1 + t2, t1 - t2
    if pass1_even:
        o0 = _wrap16((t10 + t11) << PASS1_BITS)
        o4 = _wrap16((t10 - t11) << PASS1_BITS)
    else:
        o0 = _wrap16(_descale(t10 + t11, PASS1_BITS))
        o4 = _wrap16(_descale(t10 - t11, PASS1_BITS))
    z1 = (t12 + t13) * C0541
    o2 = _wrap16(_descale(z1 + t13 * C0765, shift_even))
    o6 = _wrap16(_descale(z1 - t12 * C1847, shift_even))
    z1, z2 = t4 + t7, t5 + t6
    z3, z4 = t4 + t6, t5 + t7
    z5 = (z3 + z4) * C1175
    t4 = t4 * C0298
    t5 = t5 * C2053
    t6 = t6 * C3072
    t7 = t7 * C1501
    z1 = z1 * (-C0899)
    z2 = z2 * (-C2562)
    z3 = z3 * (-C1961) + z5
    z4 = z4 * (-C0390) + z5
    o7 = _wrap16(_descale(t4 + z1 + z3, shift_even))
    o5 = _wrap16(_descale(t5 + z2 + z4, shift_even))
    o3 = _wrap16(_descale(t6 + z2 + z3, shift_even))
    o1 = _wrap16(_descale(t7 + z1 + z4, shift_even))
    return [o0, o1, o2, o3, o4, o5, o6, o7]


def _make_kernel(qmat_np):
    q = [int(v) for v in qmat_np]

    def kernel(px_ref, out_ref):
        cols = [[px_ref[r * 8 + i, :].astype(jnp.int32) for i in range(8)]
                for r in range(8)]
        mid = [_fdct_1d(cols[r], 13 - PASS1_BITS, True) for r in range(8)]
        for j in range(8):
            cc = [mid[i][j] for i in range(8)]
            o = _fdct_1d(cc, 13 + PASS1_BITS, False)
            for i in range(8):
                pos = i * 8 + j  # raster index
                coef = o[i]
                if pos == 0:
                    out_ref[0, :] = ((coef + 32) >> 6).astype(jnp.int16)
                else:
                    level = coef * q[pos]
                    qv = jnp.where(level >= 0, level >> 22,
                                   -((-level) >> 22))
                    out_ref[pos, :] = jnp.clip(qv, -1023, 1023).astype(jnp.int16)

    return kernel


@partial(jax.jit, static_argnames=("qmat_key", "interpret"))
def _fdct_quant_soa(px_cm, qmat_key, interpret=False):
    kernel = _make_kernel(qmat_key)
    n = px_cm.shape[1]
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((64, n), jnp.int16),
        grid=(n // TILE_N,),
        in_specs=[pl.BlockSpec((64, TILE_N), lambda i: (0, i))],
        out_specs=pl.BlockSpec((64, TILE_N), lambda i: (0, i)),
        interpret=interpret,
    )(px_cm)


def fdct_quantize_pallas(blocks: jnp.ndarray, qmat_raster: np.ndarray,
                         interpret: bool = False) -> jnp.ndarray:
    """Drop-in for kernels.fdct.fdct_quantize: uint8 [..., 8, 8] ->
    int16 levels [..., 64] raster order."""
    shape = blocks.shape
    n = int(np.prod(shape[:-2]))
    cm = blocks.reshape(n, 64).T
    n_pad = -n % TILE_N
    if n_pad:
        cm = jnp.pad(cm, ((0, 0), (0, n_pad)))
    qmat_key = tuple(int(v) for v in np.asarray(qmat_raster))
    out = _fdct_quant_soa(cm, qmat_key, interpret=interpret)
    if n_pad:
        out = out[:, :n]
    return out.T.reshape(*shape[:-2], 64)
