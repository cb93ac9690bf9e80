"""Layout-native transcode kernel vs transcode_levels_fused (bit-exact)."""

import numpy as np
import jax.numpy as jnp

from amv_tpu.bitstream import jpeg_tables as T
from amv_tpu.codecs.amv_video import _encoder_quant_qmat_np
from amv_tpu.kernels.transcode_layout_pallas import transcode_mcu_layout
from amv_tpu.pipeline.transcode import transcode_levels_fused


def _to_layout(levels):
    """[F, M, 6, 64] -> ([CB, M, 6, 64, 8, 128], dc [CB, M, 6, 8, 128])."""
    F, M = levels.shape[0], levels.shape[1]
    fp = (F + 1023) // 1024 * 1024
    lv = np.zeros((fp, M, 6, 64), np.int16)
    lv[:F] = levels
    cb = fp // 1024
    lvl = lv.reshape(cb, 8, 128, M, 6, 64).transpose(0, 3, 4, 5, 1, 2)
    # resolved DC in-layout: per-component cumsum of DC diffs
    qdc_l = int(T.SP5X_QUANT_LUMA_ZZ[0])
    qdc_c = int(T.SP5X_QUANT_CHROMA_ZZ[0])
    d = lvl[:, :, :, 0].astype(np.int64)            # [cb, M, 6, 8, 128]
    dy = np.cumsum(d[:, :, :4].reshape(cb, M * 4, 8, 128) * qdc_l,
                   axis=1).reshape(cb, M, 4, 8, 128) + 1024
    dcb = np.cumsum(d[:, :, 4] * qdc_c, axis=1) + 1024
    dcr = np.cumsum(d[:, :, 5] * qdc_c, axis=1) + 1024
    dc = np.concatenate([dy, dcb[:, :, None], dcr[:, :, None]], axis=2)
    return lvl, dc.astype(np.int32), fp


def test_complete_layout_chain_byte_exact():
    """Scan bytes -> zero-relayout complete chain -> framed payloads must
    equal the host path (decode -> fused transcode -> host Huffman)."""
    from amv_tpu.bitstream.entropy import (huffman_decode_frames,
                                           huffman_encode_frame)
    from amv_tpu.native import entropy_native as native
    from amv_tpu.pipeline.transcode import transcode_complete_layout
    from amv_tpu.verify.ref_jpeg import unescape_scan

    rng = np.random.default_rng(3)
    F, M = 2, 2
    lv = np.zeros((F, M, 6, 64), np.int16)
    lv[..., 0] = rng.integers(0, 400, (F, M, 6))      # absolute DC
    mask = rng.random((F, M, 6, 63)) < 0.15
    lv[..., 1:] = np.where(mask, rng.integers(-200, 200, (F, M, 6, 63)), 0)
    lv[0, 0, 0, 63] = 5                               # EOB-less block
    payloads = [huffman_encode_frame(lv[f]) for f in range(F)]

    scans = [unescape_scan(p[2:-2]) for p in payloads]
    maxb = (max(len(x) for x in scans) + 3) & ~3
    arr = np.zeros((F, maxb), np.uint8)
    for i, x in enumerate(scans):
        arr[i, :len(x)] = np.frombuffer(x, np.uint8)

    qk = tuple(int(v) for v in _encoder_quant_qmat_np(2))
    words, bits = transcode_complete_layout(
        jnp.asarray(arr), M, qk, w_out=256, interpret=True)
    got = native.escape_frames(np.asarray(words), np.asarray(bits))

    levels = np.asarray(huffman_decode_frames(payloads, M))
    lv2 = np.asarray(transcode_levels_fused(jnp.asarray(levels), 2)[0])
    want = [huffman_encode_frame(lv2[f]) for f in range(F)]
    assert got == want


def test_complete_layout_chain_fuzz():
    """Randomized property check: for any valid stream the chain must
    reproduce the host path byte-for-byte (3 seeds, varied density and
    magnitude, incl. ZRL-heavy and DC-only extremes)."""
    from amv_tpu.bitstream.entropy import (huffman_decode_frames,
                                           huffman_encode_frame)
    from amv_tpu.native import entropy_native as native
    from amv_tpu.pipeline.transcode import transcode_complete_layout
    from amv_tpu.verify.ref_jpeg import unescape_scan

    qk = tuple(int(v) for v in _encoder_quant_qmat_np(2))
    for seed, dens, mag in ((11, 0.02, 500), (12, 0.3, 30), (13, 0.08, 150)):
        rng = np.random.default_rng(seed)
        F, M = 2, 1
        lv = np.zeros((F, M, 6, 64), np.int16)
        lv[..., 0] = rng.integers(-300, 300, (F, M, 6))
        mask = rng.random((F, M, 6, 63)) < dens
        lv[..., 1:] = np.where(mask,
                               rng.integers(-mag, mag, (F, M, 6, 63)), 0)
        lv[0, 0, 1, 1:] = 0                      # DC-only block
        payloads = [huffman_encode_frame(lv[f]) for f in range(F)]
        scans = [unescape_scan(p[2:-2]) for p in payloads]
        maxb = (max(len(x) for x in scans) + 3) & ~3
        arr = np.zeros((F, maxb), np.uint8)
        for i, x in enumerate(scans):
            arr[i, :len(x)] = np.frombuffer(x, np.uint8)
        words, bits = transcode_complete_layout(
            jnp.asarray(arr), M, qk, w_out=256, interpret=True,
            win_fetch=32, win_emit=64)
        got = native.escape_frames(np.asarray(words), np.asarray(bits))
        levels = np.asarray(huffman_decode_frames(payloads, M))
        lv2 = np.asarray(transcode_levels_fused(jnp.asarray(levels), 2)[0])
        want = [huffman_encode_frame(lv2[f]) for f in range(F)]
        assert got == want, f"seed {seed}"


def test_decode_layout_chain_matches_transform():
    """Scan bytes -> slab decode chain pixels == host decode + transform."""
    from amv_tpu.bitstream.entropy import (huffman_decode_frames,
                                           huffman_encode_frame)
    from amv_tpu.codecs.amv_video import assemble_planes, decode_transform
    from amv_tpu.pipeline.transcode import decode_scans_layout
    from amv_tpu.verify.ref_jpeg import unescape_scan

    rng = np.random.default_rng(21)
    F, mbw, mbh = 2, 2, 1
    M = mbw * mbh
    lv = np.zeros((F, M, 6, 64), np.int16)
    lv[..., 0] = rng.integers(0, 300, (F, M, 6))
    mask = rng.random((F, M, 6, 63)) < 0.15
    lv[..., 1:] = np.where(mask, rng.integers(-150, 150, (F, M, 6, 63)), 0)
    payloads = [huffman_encode_frame(lv[f]) for f in range(F)]
    scans = [unescape_scan(p[2:-2]) for p in payloads]
    maxb = (max(len(x) for x in scans) + 3) & ~3
    arr = np.zeros((F, maxb), np.uint8)
    for i, x in enumerate(scans):
        arr[i, :len(x)] = np.frombuffer(x, np.uint8)

    pix = decode_scans_layout(jnp.asarray(arr), M, interpret=True,
                              win_fetch=32)
    w, h = 16 * mbw, 16 * mbh
    got = [np.asarray(p) for p in assemble_planes(pix, mbw, mbh, w, h)]
    levels = np.asarray(huffman_decode_frames(payloads, M))
    want = [np.asarray(p) for p in
            decode_transform(jnp.asarray(levels), mbw, mbh, w, h)]
    for g, wv in zip(got, want):
        np.testing.assert_array_equal(g, wv)


def test_encode_layout_chain_byte_exact():
    """YUV planes -> slab encode chain -> framed payloads must equal the
    host path (encode_transform + host Huffman), incl. the flip and
    edge-replication semantics on a non-aligned height."""
    from amv_tpu.bitstream.entropy import huffman_encode_frame
    from amv_tpu.codecs.amv_video import encode_transform
    from amv_tpu.native import entropy_native as native
    from amv_tpu.pipeline.transcode import encode_planes_layout

    rng = np.random.default_rng(31)
    F, mbw, mbh = 2, 2, 1
    w, h = 32, 12                          # h=12: edge-replicated rows
    y = rng.integers(0, 256, (F, h, w), dtype=np.uint8)
    cb = rng.integers(0, 256, (F, h // 2, w // 2), dtype=np.uint8)
    cr = rng.integers(0, 256, (F, h // 2, w // 2), dtype=np.uint8)

    qk = tuple(int(v) for v in _encoder_quant_qmat_np(2))
    words, bits = encode_planes_layout(
        jnp.asarray(y), jnp.asarray(cb), jnp.asarray(cr), mbw, mbh, qk,
        w_out=256, interpret=True, win_emit=64)
    got = native.escape_frames(np.asarray(words), np.asarray(bits))

    lv = np.asarray(encode_transform(jnp.asarray(y), jnp.asarray(cb),
                                     jnp.asarray(cr), mbw, mbh, 2))
    want = [huffman_encode_frame(lv[f]) for f in range(F)]
    assert got == want


def test_layout_transcode_matches_fused():
    rng = np.random.default_rng(9)
    F, M = 5, 4  # tiny M: interpret-mode cost is per grid step
    levels = np.zeros((F, M, 6, 64), np.int16)
    levels[..., 0] = rng.integers(-40, 40, (F, M, 6))
    mask = rng.random((F, M, 6, 63)) < 0.2
    levels[..., 1:] = np.where(
        mask, rng.integers(-80, 80, (F, M, 6, 63)), 0)

    want = np.asarray(transcode_levels_fused(jnp.asarray(levels), 2)[0])

    lvl, dc, fp = _to_layout(levels)
    qk = tuple(int(v) for v in _encoder_quant_qmat_np(2))
    out = np.asarray(transcode_mcu_layout(
        jnp.asarray(lvl), jnp.asarray(dc), qk, interpret=True))
    got = out.transpose(0, 4, 5, 1, 2, 3).reshape(fp, M, 6, 64)[:F]
    np.testing.assert_array_equal(got, want)
