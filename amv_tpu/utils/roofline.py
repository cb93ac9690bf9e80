"""Utilization accounting against TPU v5e-1 hardware ceilings.

VERDICT round-2 item 2: bench numbers alone cannot say whether a kernel
sits at 5% or 60% of what the hardware permits.  This module pins the
ceilings and turns (stage time, bytes touched, op estimate) triples into
%-of-peak figures and a compute- vs memory-bound verdict.

Ceilings (public figures for TPU v5e, single chip — the bench target):

* HBM bandwidth: 819 GB/s.
* MXU: 197 TFLOP/s bf16 (not the binding ceiling for the entropy
  kernels, which are pure VPU integer code).
* VPU: the vector unit processes (8, 128) int32 vregs with 4 ALUs per
  lane position at ~940 MHz: 8*128*4*0.94e9 = 3.85e12 int-ops/s.
  This is an upper bound — it assumes every ALU slot issues every
  cycle; sustained vector code typically reaches 50-70% of it, so
  "100% of VPU" here means the theoretical ceiling, not the practical
  one.

Op counts for the Pallas entropy kernels are STATIC ESTIMATES: vector
instructions per loop iteration counted from the kernel structure
(selects/shifts/compares each one op on a full vreg), documented next
to each constant.  Iteration counts come from exact host-side token
statistics of the benched corpus, so ops = ops_per_iter x iterations is
a faithful model of issued vector work, not a guess from first
principles.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

HBM_GBPS = 819e9          # bytes/s
MXU_FLOPS = 197e12        # bf16 FLOP/s
VPU_IOPS = 3.85e12        # int vector ops/s (8*128 lanes * 4 ALUs * 940 MHz)

# Vector ops per lockstep-iteration, counted from kernel structure
# (entropy_decode_pallas._make_kernel / entropy_encode_pallas): canonical
# length count 16 cmp+16 add, length-delta select tree 32, AC bit-slice
# 8*(6 sel + shift/or) ~ 80, two 128-bit consumes ~ 30, extend ~ 8,
# accumulate one-hot over 32 regs ~ 64, cursor/flag upkeep ~ 30, refill
# amortized ~ 20.
DECODE_OPS_PER_ITER = 280
# dense async adds pend staging (32), acc clear (32), service amortized
# (~30 at pmax=16) on the same body.
DECODE_ASYNC_OPS_PER_ITER = 375
# encoder iteration: size/bitlen ~ 16, AC code tables ~ 90, 128-bit
# append ~ 25, windowed emit amortized ~ 40, counters ~ 20.
ENCODE_OPS_PER_ITER = 190
# ADPCM: per-sample step/index update + clamp chain (Pallas scan body).
ADPCM_OPS_PER_SAMPLE = 24
# transcode (dequant+IDCT+FDCT+quant) per block: two 8x8 DCT passes
# (~1184 int mul/add in jfdctint/simple_idct counted per block) plus
# dequant/quant/zigzag moves — runs on the VPU as int32.
TRANSCODE_OPS_PER_BLOCK = 2900


VREG_LANES = 8 * 128      # element-ops per vector instruction


@dataclass
class StageRoofline:
    name: str
    seconds: float
    bytes_touched: float
    vector_instrs: float    # full-(8,128)-vreg instructions issued

    def report(self) -> dict:
        bw = self.bytes_touched / self.seconds
        ops = self.vector_instrs * VREG_LANES / self.seconds
        pct_hbm = 100.0 * bw / HBM_GBPS
        pct_vpu = 100.0 * ops / VPU_IOPS
        bound = "compute(VPU)" if pct_vpu >= pct_hbm else "memory(HBM)"
        return {
            "stage": self.name,
            "ms": round(self.seconds * 1e3, 2),
            "GB_per_s": round(bw / 1e9, 1),
            "pct_HBM_ceiling": round(pct_hbm, 1),
            "Gvop_per_s": round(ops / 1e9, 1),
            "pct_VPU_ceiling": round(pct_vpu, 1),
            "bound": bound,
        }


def token_stats(levels: np.ndarray):
    """Exact per-frame/per-block Huffman token counts for a decoded
    corpus batch (levels int16 [F, M, 6, 64], zigzag, slot0 = DC diff).

    A block's token count = 1 (DC) + #AC symbols + #ZRL + (1 if EOB).
    Returns (tok_per_block [F, B], totals [F])."""
    F, M = levels.shape[0], levels.shape[1]
    v = levels.reshape(F, M * 6, 64)
    ac = v[:, :, 1:]
    nz = ac != 0
    nzc = nz.sum(axis=2)
    # ZRL markers: zero-runs of >= 16 before a nonzero
    idx = np.arange(1, 64)
    last_nz = np.where(nz.any(axis=2),
                       64 - 1 - np.argmax(nz[:, :, ::-1], axis=2), 0)
    # count ZRLs exactly: walk runs vectorised over (F, B)
    prev = np.zeros_like(last_nz)
    zrl = np.zeros_like(last_nz)
    # positions of nonzeros ordered: use cumulative trick per block
    for k in idx:
        is_nz = nz[:, :, k - 1]
        run = np.where(is_nz, k - prev - 1, 0)
        zrl += np.where(is_nz, run // 16, 0)
        prev = np.where(is_nz, k, prev)
    eob = (last_nz < 63).astype(np.int64)
    tok = 1 + nzc + zrl + eob
    return tok, tok.sum(axis=1)


def lockstep_iters(tok_per_block: np.ndarray, chunk: int = 1024) -> int:
    """Iteration count of the block-lockstep decoder: sum over blocks of
    the per-chunk max token count."""
    F = tok_per_block.shape[0]
    total = 0
    for c0 in range(0, F, chunk):
        total += int(tok_per_block[c0:c0 + chunk].max(axis=0).sum())
    return total


def async_iters(totals: np.ndarray, chunk: int = 1024) -> int:
    """Iteration count of the lane-async decoder: per-chunk max of
    per-lane totals (stall overhead excluded — reported separately by
    the kernel's measured wall time)."""
    F = totals.shape[0]
    return sum(int(totals[c0:c0 + chunk].max())
               for c0 in range(0, F, chunk))
