"""Trellis (Viterbi) IMA-ADPCM encoder — the reference's `-trellis` feature.

The reference offers an optional trellis quantizer for ADPCM encoding
(adpcm.c:287-443, enabled per-frame at adpcm.c:480-486) that searches over
quantizer decisions instead of greedy nibble choice.  This is our
equivalent: a beam-free Viterbi over the full 89-entry step_index state
space, keeping the best (SSD, predictor) per state per sample.  It is a
cleaner formulation than the reference's heap-based beam search (and finds
lower-distortion paths); the produced bitstream is standard IMA-ADPCM (AMV
flavor), decodable by any conforming decoder.

Vectorized numpy: per sample, all 89 states x 16 nibbles evaluate at once.
"""

from __future__ import annotations

import numpy as np

from ..verify.ref_adpcm import INDEX_TABLE, STEP_TABLE

_N_STATES = 89
# transition tables: for state s and nibble n
_STEP = STEP_TABLE.astype(np.int64)                       # [89]
_NEXT = np.clip(np.arange(_N_STATES)[:, None] + INDEX_TABLE[None, :],
                0, 88)                                    # [89,16]
_SIGN = (np.arange(16) & 8) != 0
_DELTA = np.arange(16) & 7
_DIFF = ((2 * _DELTA[None, :] + 1) * _STEP[:, None]) >> 3  # [89,16]
_SDIFF = np.where(_SIGN[None, :], -_DIFF, _DIFF)           # [89,16]


def trellis_encode(samples: np.ndarray, init_step_index: int = 0,
                   init_predictor: int | None = None):
    """Viterbi-encode int16 samples -> (nibbles uint8[n], final_step_index).

    init_predictor defaults to samples[0] (the AMV chunk convention:
    the chunk header carries the first sample as the seed predictor).
    """
    samples = np.asarray(samples, dtype=np.int64)
    n = len(samples)
    if n == 0:
        return np.zeros(0, np.uint8), init_step_index

    pred0 = int(samples[0]) if init_predictor is None else int(init_predictor)
    INF = np.int64(1) << 60
    ssd = np.full(_N_STATES, INF, np.int64)
    pred = np.zeros(_N_STATES, np.int64)
    ssd[init_step_index] = 0
    pred[init_step_index] = pred0

    choice = np.zeros((n, _N_STATES), np.uint8)   # winning nibble per state
    parent = np.zeros((n, _N_STATES), np.uint8)   # winning prev state

    states = np.arange(_N_STATES)
    for t in range(n):
        # candidate reconstruction for every (state, nibble)
        cand_pred = np.clip(pred[:, None] + _SDIFF, -32768, 32767)  # [89,16]
        err = cand_pred - samples[t]
        cand_ssd = ssd[:, None] + err * err                          # [89,16]
        cand_ssd = np.where(ssd[:, None] >= INF, INF, cand_ssd)
        # scatter-min into next states
        nxt = _NEXT                                                  # [89,16]
        new_ssd = np.full(_N_STATES, INF, np.int64)
        new_pred = np.zeros(_N_STATES, np.int64)
        best_nib = np.zeros(_N_STATES, np.uint8)
        best_par = np.zeros(_N_STATES, np.uint8)
        for s in range(_N_STATES):
            mask = nxt == s
            if not mask.any():
                continue
            vals = np.where(mask, cand_ssd, INF)
            idx = np.unravel_index(np.argmin(vals), vals.shape)
            if vals[idx] < new_ssd[s]:
                new_ssd[s] = vals[idx]
                new_pred[s] = cand_pred[idx]
                best_par[s] = idx[0]
                best_nib[s] = idx[1]
        ssd, pred = new_ssd, new_pred
        choice[t] = best_nib
        parent[t] = best_par

    # backtrack from the best final state
    s = int(np.argmin(ssd))
    final_step = s
    nibbles = np.zeros(n, np.uint8)
    for t in range(n - 1, -1, -1):
        nibbles[t] = choice[t, s]
        s = int(parent[t, s])
    return nibbles, final_step


def trellis_encode_fast(samples: np.ndarray, init_step_index: int = 0,
                        init_predictor: int | None = None):
    """Vectorized Viterbi (precomputed inverse-transition gather).

    ~30x faster than the scatter loop; identical results up to argmin
    tie-breaking order.
    """
    samples = np.asarray(samples, dtype=np.int64)
    n = len(samples)
    if n == 0:
        return np.zeros(0, np.uint8), init_step_index
    pred0 = int(samples[0]) if init_predictor is None else int(init_predictor)

    # inverse transitions: for each destination state, list of (src, nibble)
    inv = [[] for _ in range(_N_STATES)]
    for s in range(_N_STATES):
        for nb in range(16):
            inv[_NEXT[s, nb]].append((s, nb))
    max_in = max(len(v) for v in inv)
    inv_src = np.zeros((_N_STATES, max_in), np.int64)
    inv_nib = np.zeros((_N_STATES, max_in), np.int64)
    inv_valid = np.zeros((_N_STATES, max_in), bool)
    for d, lst in enumerate(inv):
        for k, (s, nb) in enumerate(lst):
            inv_src[d, k] = s
            inv_nib[d, k] = nb
            inv_valid[d, k] = True

    INF = np.int64(1) << 60
    ssd = np.full(_N_STATES, INF, np.int64)
    pred = np.zeros(_N_STATES, np.int64)
    ssd[init_step_index] = 0
    pred[init_step_index] = pred0
    choice = np.zeros((n, _N_STATES), np.uint8)
    parent = np.zeros((n, _N_STATES), np.uint8)

    sdiff_gather = _SDIFF[inv_src, inv_nib]  # [89,max_in]
    for t in range(n):
        cand_pred = np.clip(pred[inv_src] + sdiff_gather, -32768, 32767)
        err = cand_pred - samples[t]
        cand = np.where(inv_valid & (ssd[inv_src] < INF),
                        ssd[inv_src] + err * err, INF)
        k = np.argmin(cand, axis=1)
        rows = np.arange(_N_STATES)
        ssd = cand[rows, k]
        pred = cand_pred[rows, k]
        choice[t] = inv_nib[rows, k]
        parent[t] = inv_src[rows, k]

    s = int(np.argmin(ssd))
    final_step = s
    nibbles = np.zeros(n, np.uint8)
    for t in range(n - 1, -1, -1):
        nibbles[t] = choice[t, s]
        s = int(parent[t, s])
    return nibbles, final_step
