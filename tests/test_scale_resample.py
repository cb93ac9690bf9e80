"""Rescale (libswscale role) and audio resample (resample2.c role) kernels."""

import numpy as np
import jax.numpy as jnp
import pytest

from amv_tpu.kernels.scale import resize_plane, resize_yuv420
from amv_tpu.kernels.resample import resample_pcm


# ---------------- video rescale ----------------

@pytest.mark.parametrize("filt", ["bilinear", "bicubic", "point", "area",
                                  "lanczos"])
def test_resize_identity(filt):
    rng = np.random.default_rng(0)
    x = rng.integers(0, 256, (2, 24, 32), dtype=np.uint8)
    out = np.asarray(resize_plane(jnp.asarray(x), 24, 32, filt))
    np.testing.assert_array_equal(out, x)


def test_resize_point_is_nearest():
    # SWS_POINT: exact nearest-neighbour pick, no blending anywhere
    rng = np.random.default_rng(4)
    x = rng.integers(0, 256, (1, 13, 17), dtype=np.uint8)
    for dh, dw in ((26, 34), (7, 9), (20, 11)):
        out = np.asarray(resize_plane(jnp.asarray(x), dh, dw, "point"))
        iy = np.clip(np.floor((np.arange(dh) + 0.5) * 13 / dh).astype(int),
                     0, 12)
        ix = np.clip(np.floor((np.arange(dw) + 0.5) * 17 / dw).astype(int),
                     0, 16)
        np.testing.assert_array_equal(out[0], x[0][np.ix_(iy, ix)])


def test_resize_area_integer_downscale_is_box_mean():
    # SWS_AREA on an integer factor = exact pixel-block average
    rng = np.random.default_rng(5)
    x = rng.integers(0, 256, (1, 32, 48), dtype=np.uint8)
    out = np.asarray(resize_plane(jnp.asarray(x), 16, 24, "area"))
    blocks = x[0].reshape(16, 2, 24, 2).astype(np.float64)
    want = blocks.mean(axis=(1, 3))
    # two rounded 14-bit passes: within 1 of the exact mean
    assert np.abs(out[0].astype(np.float64) - want).max() <= 1.0


def test_resize_lanczos_sharper_than_bilinear():
    # a step edge upscaled: lanczos must have a steeper transition
    x = np.zeros((1, 8, 16), np.uint8)
    x[:, :, 8:] = 255
    up_l = np.asarray(resize_plane(jnp.asarray(x), 8, 64, "lanczos"))
    up_b = np.asarray(resize_plane(jnp.asarray(x), 8, 64, "bilinear"))
    mid_l = np.abs(np.diff(up_l[0, 4].astype(np.int32))).max()
    mid_b = np.abs(np.diff(up_b[0, 4].astype(np.int32))).max()
    assert mid_l > mid_b
    # flat regions stay flat (windowed-sinc ringing clipped off the ends)
    np.testing.assert_array_equal(up_l[0, :, :16], 0)
    np.testing.assert_array_equal(up_l[0, :, -16:], 255)


@pytest.mark.parametrize("filt", ["bilinear", "bicubic", "point", "area",
                                  "lanczos", "gauss", "sinc", "spline",
                                  "experimental"])
@pytest.mark.parametrize("dims", [(120, 160), (17, 23)])
def test_resize_constant_stays_constant(filt, dims):
    x = np.full((1, 48, 64), 137, np.uint8)
    out = np.asarray(resize_plane(jnp.asarray(x), *dims, filt))
    assert out.shape == (1,) + dims
    np.testing.assert_array_equal(out, 137)


@pytest.mark.parametrize("filt", ["sinc", "spline", "experimental"])
def test_resize_identity_interpolating_filters(filt):
    """sinc/spline/experimental all vanish at nonzero integer taps, so
    same-size resize is exact (gauss deliberately blurs — SWS_GAUSS is
    a blur kernel, tested separately)."""
    rng = np.random.default_rng(9)
    x = rng.integers(0, 256, (2, 24, 32), dtype=np.uint8)
    out = np.asarray(resize_plane(jnp.asarray(x), 24, 32, filt))
    np.testing.assert_array_equal(out, x)


def test_resize_gauss_blurs():
    """SWS_GAUSS 2^(-3 d^2) has nonzero weight at d=1 (1/8), so a
    same-size pass low-passes: a 1-px checkerboard flattens toward
    mid-gray while flat fields stay flat (weight normalization)."""
    x = (np.indices((16, 16)).sum(axis=0) % 2 * 255)[None].astype(np.uint8)
    out = np.asarray(resize_plane(jnp.asarray(x), 16, 16, "gauss"))
    assert np.abs(out[0, 4:-4, 4:-4].astype(int) - 128).max() < 100


def test_resize_bicublin_luma_bicubic_chroma_bilinear():
    """SWS_BICUBLIN: Y plane matches a bicubic resize, chroma matches
    bilinear (swscale.c:2295-2341)."""
    rng = np.random.default_rng(10)
    y = rng.integers(0, 256, (1, 48, 64), dtype=np.uint8)
    cb = rng.integers(0, 256, (1, 24, 32), dtype=np.uint8)
    cr = rng.integers(0, 256, (1, 24, 32), dtype=np.uint8)
    yj, cbj, crj = (jnp.asarray(p) for p in (y, cb, cr))
    y2, cb2, cr2 = resize_yuv420(yj, cbj, crj, 96, 128, "bicublin")
    np.testing.assert_array_equal(
        np.asarray(y2), np.asarray(resize_plane(yj, 96, 128, "bicubic")))
    np.testing.assert_array_equal(
        np.asarray(cb2), np.asarray(resize_plane(cbj, 48, 64, "bilinear")))
    np.testing.assert_array_equal(
        np.asarray(cr2), np.asarray(resize_plane(crj, 48, 64, "bilinear")))


def test_spline_matches_reference_recursion():
    """_spline values equal a direct transliteration of the C
    getSplineCoeff recursion (swscale.c:971-980)."""
    from amv_tpu.kernels.scale import _spline

    def ref(a, b, c, d, dist):
        if dist <= 1.0:
            return ((d * dist + c) * dist + b) * dist + a
        return ref(0.0, b + 2 * c + 3 * d, c + 3 * d,
                   -b - 3 * c - 6 * d, dist - 1.0)

    p = -2.196152422706632
    xs = np.linspace(0, 9.5, 97)
    want = np.array([ref(1.0, 0.0, p, -p - 1.0, float(d)) for d in xs])
    got = _spline(xs)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-12)


def test_resize_ramp_monotone():
    # horizontal ramp upscaled stays monotone and spans the same range
    x = np.tile(np.linspace(0, 255, 40, dtype=np.uint8), (1, 8, 1))
    out = np.asarray(resize_plane(jnp.asarray(x), 8, 160, "bicubic"))
    row = out[0, 4].astype(np.int32)
    assert (np.diff(row) >= -1).all()        # monotone modulo rounding
    assert row[0] <= 4 and row[-1] >= 251


def test_resize_downscale_antialias():
    # 1-px checkerboard downscaled 2x must average toward mid-gray,
    # not alias to black/white
    x = np.indices((64, 64)).sum(axis=0) % 2 * 255
    x = x[None].astype(np.uint8)
    out = np.asarray(resize_plane(jnp.asarray(x), 32, 32, "bilinear"))
    assert 100 <= out[0, 8:-8, 8:-8].mean() <= 155
    assert out[0, 8:-8, 8:-8].std() < 40


def test_resize_yuv420_shapes_and_determinism():
    rng = np.random.default_rng(1)
    y = rng.integers(0, 256, (3, 96, 128), dtype=np.uint8)
    cb = rng.integers(0, 256, (3, 48, 64), dtype=np.uint8)
    cr = rng.integers(0, 256, (3, 48, 64), dtype=np.uint8)
    y2, cb2, cr2 = resize_yuv420(jnp.asarray(y), jnp.asarray(cb),
                                 jnp.asarray(cr), 120, 160)
    assert y2.shape == (3, 120, 160)
    assert cb2.shape == (3, 60, 80) and cr2.shape == (3, 60, 80)
    y3, _, _ = resize_yuv420(jnp.asarray(y), jnp.asarray(cb),
                             jnp.asarray(cr), 120, 160)
    np.testing.assert_array_equal(np.asarray(y2), np.asarray(y3))
    with pytest.raises(ValueError):
        resize_yuv420(jnp.asarray(y), jnp.asarray(cb), jnp.asarray(cr),
                      121, 160)


# ---------------- audio resample ----------------

def test_resample_identity_rate():
    pcm = np.arange(-500, 500, dtype=np.int16)
    out = resample_pcm(pcm, 8000, 8000)
    np.testing.assert_array_equal(out, pcm)


def test_resample_dc():
    pcm = np.full(4000, 1000, np.int16)
    out = resample_pcm(pcm, 8000, 22050)
    assert len(out) == 4000 * 22050 // 8000
    mid = out[200:-200].astype(np.int32)
    assert abs(mid.mean() - 1000) < 2 and mid.std() < 2


def _sine(freq, rate, n, amp=10000.0):
    return np.arange(n) * (2 * np.pi * freq / rate), amp


@pytest.mark.parametrize("in_rate,out_rate", [(8000, 22050), (44100, 22050),
                                              (22050, 8000)])
def test_resample_sine_snr(in_rate, out_rate):
    freq = 1000.0
    n = in_rate // 2
    t_in, amp = _sine(freq, in_rate, n)
    pcm = np.round(amp * np.sin(t_in)).astype(np.int16)
    out = resample_pcm(pcm, in_rate, out_rate).astype(np.float64)
    m = len(out)
    # ideal reference at the output rate (same underlying continuous signal)
    ideal = amp * np.sin(np.arange(m) * (2 * np.pi * freq / out_rate))
    core = slice(50, m - 50)  # exclude filter edge transients
    err = out[core] - ideal[core]
    snr = 10 * np.log10((ideal[core] ** 2).mean() / max((err ** 2).mean(), 1e-9))
    assert snr > 35, f"SNR {snr:.1f} dB too low for {in_rate}->{out_rate}"


def test_resample_bandlimits_on_downsample():
    # 15 kHz tone at 44100 must be strongly attenuated at 22050 (Nyquist
    # 11025), not aliased to full scale
    in_rate, out_rate = 44100, 22050
    n = in_rate // 2
    t = np.arange(n) * (2 * np.pi * 15000.0 / in_rate)
    pcm = np.round(10000 * np.sin(t)).astype(np.int16)
    out = resample_pcm(pcm, in_rate, out_rate).astype(np.float64)
    rms = np.sqrt((out[100:-100] ** 2).mean())
    assert rms < 2500, f"aliased energy too high: rms {rms:.0f}"
