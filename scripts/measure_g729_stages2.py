"""Per-stage G.729A encoder timing, RTT-proof: each truncated stage
prefix runs 10x chained inside ONE jit (salt feedback forces
sequencing), so the ~23 ms relay dispatch floor amortizes away.
Successive diffs = stage costs."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from functools import partial

from amv_tpu.codecs import g729a as G
from amv_tpu.codecs import g729a_encoder_tpu as E
from amv_tpu.codecs.g729a_encoder_tpu import (
    _levinson_batch, _lp_to_lsf_batch, _quantize_lsf_batch,
    _impulse_response, _toeplitz, _zir, _ac_candidates_all, _fc_search,
    _gain_search, _WLP, _LAG_WINDOW, _CAND_T, _CAND_F,
    _CAND_VALID1, SUBFRAME)


def one(st, hist, samples, stage):
    x = samples.astype(jnp.float32) * 0.5
    buf = jnp.concatenate([hist, x], axis=1)[:, -240:]
    wbuf = buf * jnp.asarray(_WLP, jnp.float32)[None, :]
    r = jnp.stack([jnp.einsum("bn,bn->b", wbuf[:, :240 - k], wbuf[:, k:])
                   for k in range(11)], axis=1)
    r = r.at[:, 0].set(jnp.maximum(r[:, 0] * 1.0001 + 10.0, 1e-3))
    r = r * jnp.asarray(_LAG_WINDOW, jnp.float32)[None, :]
    if stage == 1:        # LP autocorrelation only
        return jnp.sum(r)
    a = _levinson_batch(r)
    if stage == 2:        # + Levinson
        return jnp.sum(a)
    lsf = _lp_to_lsf_batch(a)
    if stage == 3:        # + LP->LSF (Chebyshev roots)
        return jnp.sum(lsf)
    L0, L1, L2, L3 = _quantize_lsf_batch(st, lsf)
    if stage == 4:        # + LSF quantization
        return jnp.sum(L1 + L2 + L3 + L0).astype(jnp.float32)
    lsf_q = G.lsf_decode(st, L0, L1, L2, L3)
    lsp = G.lsf2lsp(lsf_q)
    lp1, lp2 = G.lp_decode(st, lsp)
    if stage == 5:        # + LSF->LP reconstruction
        return jnp.sum(lp1) + jnp.sum(lp2)
    cand_t = jnp.asarray(E._CAND_T.astype(np.int32))
    cand_f = jnp.asarray(E._CAND_F.astype(np.int32))
    acc = jnp.float32(0)
    i = 0
    lp_i = lp1
    xs = jax.lax.dynamic_slice_in_dim(x, i * SUBFRAME, SUBFRAME, axis=1)
    h = _impulse_response(lp_i)
    Hmat = _toeplitz(h)
    target = xs - _zir(lp_i, st["syn_filter_data"])
    if stage == 6:        # + impulse response/toeplitz/target (sub 0)
        return jnp.sum(Hmat) + jnp.sum(target)
    valid = jnp.asarray(_CAND_VALID1)[None, :]
    acv = _ac_candidates_all(st["exc"], 0)
    y = jnp.einsum("bnk,bck->bcn", Hmat, acv)
    e = jnp.einsum("bcn,bcn->bc", y, y)
    c = jnp.maximum(jnp.einsum("bcn,bn->bc", y, target), 0.0)
    score = jnp.where(valid & (e > 0), c * c / jnp.maximum(e, 1e-9), -1.0)
    kbest = jnp.argmax(score, axis=1)
    t_int = jnp.take(cand_t, kbest)
    t_frac = jnp.take(cand_f, kbest)
    if stage == 7:        # + exhaustive pitch search (sub 0)
        return jnp.sum(t_int + t_frac).astype(jnp.float32)
    st = dict(st)
    st["exc"] = G.decode_ac_vector(st["exc"], t_int, t_frac, 0)
    acv_x = jax.lax.dynamic_slice_in_dim(
        st["exc"], G.EXC_OFF, SUBFRAME, axis=1).astype(jnp.float32)
    y_ac = jnp.einsum("bnk,bk->bn", Hmat, acv_x)
    e_ac = jnp.einsum("bn,bn->b", y_ac, y_ac)
    gp_f = jnp.clip(jnp.einsum("bn,bn->b", y_ac, target)
                    / jnp.maximum(e_ac, 1e-9), 0.0, 1.2)
    rres = target - gp_f[:, None] * y_ac
    gp_sh = st["pitch_sharp"].astype(jnp.float32) / 16384.0
    nk = jnp.asarray(np.arange(SUBFRAME)[:, None]
                     - np.arange(SUBFRAME)[None, :])
    smat = (nk[None] == t_int[:, None, None]).astype(jnp.float32)
    h2 = h + gp_sh[:, None] * jnp.einsum("bnk,bk->bn", smat, h)
    if stage == 8:        # + exact AC vector + sharpened h2
        return jnp.sum(h2) + jnp.sum(rres)
    fc_idx, signs = _fc_search(rres, h2)
    if stage == 9:        # + fixed-codebook search
        return jnp.sum(fc_idx + signs).astype(jnp.float32)
    fc, _err = G.decode_fc_vector(fc_idx, signs)
    fc = G.fix_fc_vector(fc, t_int, st["pitch_sharp"])
    y_fc = jnp.einsum("bnk,bk->bn", Hmat, fc.astype(jnp.float32))
    ga, gb = _gain_search(st, fc, y_ac, y_fc, target)
    if stage == 10:       # + gain search
        return jnp.sum(ga + gb).astype(jnp.float32)
    gc = G.get_gain_code(st, ga, gb, fc)
    gp = jnp.take(G._CB_GA[:, 0], ga) + jnp.take(G._CB_GB[:, 0], gb)
    st["gain_pitch"] = gp
    st["gain_code"] = gc
    st["pitch_sharp"] = G._clip(gp, G.SHARP_MIN, G.SHARP_MAX)
    st["exc"] = G.mem_update(st["exc"], fc, gp, gc, 0)
    exc_sub = jax.lax.dynamic_slice_in_dim(
        st["exc"], G.EXC_OFF, SUBFRAME, axis=1)
    out1, fd1, ovf = G.lp_synthesis_filter(
        lp_i, exc_sub, st["syn_filter_data"], False)
    if stage == 11:       # + gain code / mem update / synthesis (1 pass)
        return jnp.sum(out1) + jnp.sum(fd1)
    return jnp.float32(0)


@partial(jax.jit, static_argnames=("stage",))
def step10(st, hist, samples, stage):
    def body(_, carry):
        salt, acc = carry
        s = one(st, hist, samples + salt[None, None], stage)
        return s * 1e-30, acc + s
    return jax.lax.fori_loop(0, 10, body,
                             (jnp.float32(0), jnp.float32(0)))[1]


def main():
    print(f"# devices: {jax.devices()}", flush=True)
    B = 1024
    rng = np.random.default_rng(1)
    sig = (3000 * rng.standard_normal((B, 80))).astype(np.float32)
    st = G.init_state(B)
    hist = jnp.zeros((B, 160))
    x = jnp.asarray(sig)
    prev = 0.0
    for stage in range(1, 12):
        _ = float(step10(st, hist, x, stage)[...])
        best = np.inf
        for _ in range(5):
            t0 = time.perf_counter()
            _ = float(step10(st, hist, x, stage)[...])
            best = min(best, time.perf_counter() - t0)
        per = (best - 0.0) / 10 * 1e3
        print(f"stage {stage:2d}: {per:7.3f} ms/step  "
              f"(+{per - prev:6.3f})", flush=True)
        prev = per


if __name__ == "__main__":
    main()
