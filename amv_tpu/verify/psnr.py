"""PSNR / byte-diff measurement tool (tests/tiny_psnr.c parity).

The reference regression harness compares outputs by MD5 and PSNR
(AMVmuxer/ffmpeg/tests/regression.sh:107-132, tests/tiny_psnr.c).
"""

from __future__ import annotations

import numpy as np


def psnr(a: np.ndarray, b: np.ndarray, max_val: int = 255) -> float:
    """PSNR in dB between two equal-shape arrays (inf if identical)."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    mse = ((a - b) ** 2).mean()
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(max_val * max_val / mse)


def stddev_diff(a: np.ndarray, b: np.ndarray) -> float:
    """RMS difference (tiny_psnr's 'stddev' column)."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    return float(np.sqrt(((a - b) ** 2).mean()))


def bytes_identical(a: bytes, b: bytes):
    """(identical?, first_diff_offset_or_-1) — the do_md5sum-style gate."""
    if a == b:
        return True, -1
    n = min(len(a), len(b))
    for i in range(n):
        if a[i] != b[i]:
            return False, i
    return False, n
