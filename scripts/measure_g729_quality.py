"""G.729A encoder quality ladder (r4 verdict item 2).

Measures full-chain segSNR + correlation against the proper HP-chain
reference (input x0.5 through the decoder's 100 Hz output high-pass,
the metric test_roundtrip_quality_hp_reference established) on two
fixtures: the synthetic speechlike signal and verify.fixtures.speechgen.

The r2 lever notes ("joint top-2 pitch measured worse", "quantized-gain
re-search measured worse") were all measured against the RAW-input
metric, which the filter artifact caps at 8.3 dB — this script re-runs
those levers against the clean metric.

Usage: python scripts/measure_g729_quality.py [lever ...]
  base      — current encoder
  topk=N    — closed-loop pitch: full FC+gain refinement of top-N
  requant   — FC re-search with the quantized pitch gain
  lsf16     — LSF stage-1 search width 8 -> 16
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from amv_tpu.codecs import g729a_encoder as E
from amv_tpu.verify.ref_g729 import G729Decoder


sys.path.insert(0, "/root/repo/tests")
from test_g729_encoder import _speechlike   # noqa: E402 (the gate fixture)


def speechlike(n=4800, seed=7):
    # the same generator the 12.5 dB gate runs on (one source of truth)
    return _speechlike(n, seed)


def hp_reference(sig):
    d = G729Decoder()
    buf = [int(v) >> 1 for v in sig.tolist()]
    ref = []
    for f0 in range(len(buf) // 80):
        ch = buf[f0 * 80:(f0 + 1) * 80]
        d.high_pass_filter(ch)
        ref.extend(ch)
    return np.array(ref, dtype=float)


def metric(sig, out):
    ref = hp_reference(sig)
    a = out[400:len(ref)].astype(float)
    b = ref[400:len(a) + 400]
    corr = float(np.corrcoef(a, b)[0, 1])
    segs = []
    for s0 in range(0, len(a) - 160, 160):
        e = ((a[s0:s0 + 160] - b[s0:s0 + 160]) ** 2).mean()
        p = (b[s0:s0 + 160] ** 2).mean()
        if p > 1e4:
            segs.append(10 * np.log10(max(p, 1) / max(e, 1)))
    return float(np.mean(segs)), corr


def roundtrip(sig, **kw):
    # quality="fast" pins the greedy encoder as the lever baseline —
    # encode_stream's default preset is now "high" (frame-select), and
    # merging kw over it would silently measure preset+lever composites
    frames = E.encode_stream(sig, quality="fast", **kw)
    dec = G729Decoder()
    out = np.concatenate([dec.decode_frame(f) for f in frames])
    return out


def vowelish(n=4800, seed=3):
    """Harmonic vowel-like fixture with drifting pitch (distinct from
    the AR speechlike generator)."""
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    f0 = 110.0 + 30.0 * np.sin(2 * np.pi * t / 2400.0)
    ph = 2 * np.pi * np.cumsum(f0) / 8000.0
    sig = (8000 * np.sin(ph) + 4000 * np.sin(2 * ph + 0.7) +
           2000 * np.sin(3 * ph + 1.3) + rng.standard_normal(n) * 150)
    env = 0.4 + 0.6 * (np.sin(2 * np.pi * t / 1600.0) ** 2)
    return np.clip(sig * env, -20000, 20000).astype(np.int16)


CONFIGS = {
    "base": {},
    "topk2": {"topk": 2},
    "topk3": {"topk": 3},
    "requant": {"requant": True},
    "lsf16": {"lsf_width": 16},
    "topk2+requant": {"topk": 2, "requant": True},
    "all": {"topk": 3, "requant": True, "lsf_width": 16},
    "t3r": {"topk": 3, "requant": True},
    "t2r+span10": {"topk": 2, "requant": True, "ol_span": 10},
    "t2r+spec": {"topk": 2, "requant": True, "olp": "spec"},
    "t2r+both": {"topk": 2, "requant": True, "ol_span": 10, "olp": "spec"},
    "fs2": {"topk": 2, "frame_select": True},
    "fs2r": {"topk": 2, "requant": True, "frame_select": True},
    "fs3r": {"topk": 3, "requant": True, "frame_select": True},
    "fs4r": {"topk": 4, "requant": True, "frame_select": True},
    "fs5r": {"topk": 5, "requant": True, "frame_select": True},
    "fs3r+la0": {"topk": 3, "requant": True, "frame_select": True,
                 "lsf_width": 12},
}


def main():
    names = sys.argv[1:] or ["base"]
    fixtures = [("speechlike", speechlike()),
                ("speechlike23", speechlike(seed=23)),
                ("vowelish", vowelish())]
    for cfg in names:
        kw = CONFIGS[cfg]
        tot = []
        for name, sig in fixtures:
            t0 = time.time()
            out = roundtrip(sig, **kw)
            snr, corr = metric(sig, out)
            tot.append((snr, corr))
            print(f"{cfg:14s} {name:12s}: segSNR {snr:6.2f} dB  "
                  f"corr {corr:.4f}  ({time.time()-t0:.0f}s)", flush=True)
        m = np.mean([s for s, _ in tot])
        print(f"{cfg:14s} MEAN        : segSNR {m:6.2f} dB  "
              f"corr {np.mean([c for _, c in tot]):.4f}", flush=True)


if __name__ == "__main__":
    main()
