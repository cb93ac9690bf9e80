"""Progressive JPEG (SOF2) tests.

The reference decodes progressive via mjpegdec.c:432
decode_block_progressive / mjpeg_decode_scan_progressive_ac.  Our gate is
a self round-trip (progressive is a lossless reorganization of the
quantized coefficients, so decode(encode(levels)) == levels exactly) plus
pixel equality against the baseline path for identical coefficients.
"""

import numpy as np
import pytest

from amv_tpu.bitstream import jpeg_tables as T
from amv_tpu.bitstream.jpeg_progressive import (decode_progressive,
                                                encode_progressive)
from amv_tpu.codecs.mjpeg import (_COMP_OF_BLOCK, _jpeg_header_with_tables,
                                  _pack_scan_generic, _sof_marker,
                                  decode_mjpeg_frames)
from amv_tpu.codecs.amv_video import _encoder_quant_matrix

_MCU = {"420": (16, 16), "422": (16, 8), "444": (8, 8), "gray": (8, 8)}


def _rand_levels(layout, W, H, seed=0, dc_range=40, ac_range=80):
    mcu_w, mcu_h = _MCU[layout]
    mb_w, mb_h = (W + mcu_w - 1) // mcu_w, (H + mcu_h - 1) // mcu_h
    nb = len(_COMP_OF_BLOCK[layout])
    M = mb_w * mb_h
    rng = np.random.default_rng(seed)
    lv = np.zeros((M, nb, 64), np.int16)
    lv[:, :, 0] = rng.integers(-dc_range, dc_range + 1, (M, nb))
    # sparse AC so EOB runs actually occur
    mask = rng.random((M, nb, 63)) < 0.12
    lv[:, :, 1:] = np.where(
        mask, rng.integers(-ac_range, ac_range + 1, (M, nb, 63)), 0)
    # some blocks entirely zero-AC (pure EOB blocks)
    zero = rng.random((M, nb)) < 0.3
    lv[:, :, 1:] *= ~zero[:, :, None]
    # MCU padding blocks beyond the component grid are never coded by
    # non-interleaved AC scans (T.81 A.2.3) — their AC cannot round-trip
    lv[:, :, 1:] *= _coded_mask(layout, W, H)[:, :, None]
    return lv


def _coded_mask(layout, W, H):
    """[M, nb] bool: block is inside its component's block grid."""
    from amv_tpu.bitstream import jpeg_progressive as P

    class _F:
        pass
    samp = {"420": (2, 2), "422": (2, 1), "444": (1, 1),
            "gray": (1, 1)}[layout]
    f = _F()
    f.width, f.height = W, H
    f.components = [(1, samp[0], samp[1], 0)] + \
        ([(2, 1, 1, 0), (3, 1, 1, 0)] if layout != "gray" else [])
    mb_w, mb_h, _, _ = P._mcu_grid(f)
    nb = len(_COMP_OF_BLOCK[layout])
    mask = np.zeros((mb_w * mb_h, nb), bool)
    for m in P._block_index_maps(f):
        for (mi, s) in m.reshape(-1, 2):
            if mi >= 0:
                mask[mi, s] = True
    return mask


@pytest.mark.parametrize("layout,wh", [
    ("420", (48, 32)), ("420", (28, 20)), ("422", (44, 24)),
    ("444", (24, 24)), ("444", (20, 12)), ("gray", (28, 20)),
])
def test_roundtrip_levels(layout, wh):
    lv = _rand_levels(layout, *wh, seed=hash((layout, wh)) & 0xFFFF)
    data = encode_progressive(lv, wh, layout=layout)
    assert _sof_marker(data) == 0xC2
    got, f = decode_progressive(data)
    assert (f.width, f.height) == wh
    np.testing.assert_array_equal(got, lv)


@pytest.mark.parametrize("al_dc,al_ac", [(0, 0), (2, 2), (1, 3)])
def test_roundtrip_successive_approximation(al_dc, al_ac):
    lv = _rand_levels("420", 32, 32, seed=7, ac_range=300)
    data = encode_progressive(lv, (32, 32), layout="420",
                              al_dc=al_dc, al_ac=al_ac)
    got, _ = decode_progressive(data)
    np.testing.assert_array_equal(got, lv)


@pytest.mark.parametrize("layout,wh", [
    ("420", (48, 32)), ("422", (32, 24)), ("444", (16, 16)),
    ("gray", (24, 16)),
])
def test_pixels_match_baseline(layout, wh):
    """Progressive and baseline payloads carrying the same quantized
    coefficients must decode to identical pixels (both feed the same
    device dequant/IDCT)."""
    W, H = wh
    lv = _rand_levels(layout, W, H, seed=3)
    prog = encode_progressive(lv, wh, layout=layout)
    # baseline equivalent: absolute DC rides a difference chain with
    # origin 128 (so +128 here), same quant matrix via the header
    qm_zz = _encoder_quant_matrix(2)[T.ZIGZAG]
    lv_base = lv.copy()
    lv_base[:, :, 0] += 128
    hdr = _jpeg_header_with_tables(W, H, qm_zz, layout=layout)
    base = hdr + _pack_scan_generic(lv_base, _COMP_OF_BLOCK[layout], 0) + \
        b"\xFF\xD9"
    yp, cbp, crp = decode_mjpeg_frames([prog])
    yb, cbb, crb = decode_mjpeg_frames([base])
    np.testing.assert_array_equal(yp, yb)
    if layout != "gray":
        np.testing.assert_array_equal(cbp, cbb)
        np.testing.assert_array_equal(crp, crb)


def test_mixed_batch_matches_separate():
    """A batch mixing baseline and progressive frames decodes each frame
    identically to decoding it alone."""
    W, H = 32, 32
    lv0 = _rand_levels("420", W, H, seed=11)
    lv1 = _rand_levels("420", W, H, seed=12)
    prog = encode_progressive(lv0, (W, H), layout="420")
    qm_zz = _encoder_quant_matrix(2)[T.ZIGZAG]
    lv1b = lv1.copy()
    lv1b[:, :, 0] += 128
    base = _jpeg_header_with_tables(W, H, qm_zz) + \
        _pack_scan_generic(lv1b, _COMP_OF_BLOCK["420"], 0) + b"\xFF\xD9"
    y, cb, cr = decode_mjpeg_frames([base, prog, base])
    y0, cb0, cr0 = decode_mjpeg_frames([prog])
    y1, cb1, cr1 = decode_mjpeg_frames([base])
    np.testing.assert_array_equal(y[1], y0[0])
    np.testing.assert_array_equal(y[0], y1[0])
    np.testing.assert_array_equal(y[2], y1[0])
    np.testing.assert_array_equal(cb[1], cb0[0])
    np.testing.assert_array_equal(cr[0], cr1[0])


def test_per_scan_table_redefinition():
    """Scans must decode with the Huffman tables in effect at THEIR SOS:
    libjpeg/mozjpeg optimized output redefines ids 0/1 before each scan.
    Crafts an 8x8 gray progressive stream whose two AC scans use
    different tables under the same id (1, 0)."""
    from amv_tpu.bitstream.jpeg_progressive import decode_progressive
    from amv_tpu.bitstream import jpeg_tables as T
    from amv_tpu.verify import ref_jpeg as R

    def dht(tc, tid, bits, vals):
        body = bytes([(tc << 4) | tid]) + \
            bytes(np.asarray(bits)[1:].astype(np.uint8)) + \
            bytes(np.asarray(vals).astype(np.uint8))
        return b"\xFF\xC4" + (len(body) + 2).to_bytes(2, "big") + body

    def sos_hdr(ss, se, ah, al):
        body = bytes([1, 1, 0x00, ss, se, (ah << 4) | al])
        return b"\xFF\xDA" + (len(body) + 2).to_bytes(2, "big") + body

    # DC table: syms 0..7 at 3 bits each
    dc_bits = np.zeros(17, np.int32); dc_bits[3] = 8
    dc_vals = np.arange(8, dtype=np.int32)
    dc_tab = T.build_huffman_codes(dc_bits, dc_vals)
    # AC table A: syms {0x02, 0x00} at 2 bits; table B: same syms but
    # 0x00 gets a 1-bit code (structurally different decode)
    a_bits = np.zeros(17, np.int32); a_bits[2] = 2
    a_vals = np.array([0x02, 0x00], np.int32)
    tab_a = T.build_huffman_codes(a_bits, a_vals)
    b_bits = np.zeros(17, np.int32); b_bits[1] = 1; b_bits[2] = 1
    b_vals = np.array([0x00, 0x02], np.int32)
    tab_b = T.build_huffman_codes(b_bits, b_vals)

    def scan_bytes(puts):
        bw = R.BitWriter()
        for n, v in puts:
            bw.put_bits(n, v)
        if bw.nbits % 8:
            bw.put_bits(8 - bw.nbits % 8, 0xFF)
        return R.escape_ff(bw.flush())

    out = bytearray(b"\xFF\xD8")
    out += b"\xFF\xDB" + (67).to_bytes(2, "big") + b"\x00" + bytes([1] * 64)
    out += dht(0, 0, dc_bits, dc_vals)
    out += dht(1, 0, a_bits, a_vals)
    out += (b"\xFF\xC2" + (11).to_bytes(2, "big") + b"\x08" +
            (8).to_bytes(2, "big") + (8).to_bytes(2, "big") +
            bytes([1, 1, 0x11, 0]))
    # scan 1: DC first (diff=5 -> size 3, mant 101)
    out += sos_hdr(0, 0, 0, 0)
    out += scan_bytes([(int(dc_tab[0][3]), int(dc_tab[1][3])), (3, 0b101)])
    # scan 2: AC band 1..5 with table A: AC1=3 (rs 0x02, mant 11), EOB
    out += sos_hdr(1, 5, 0, 0)
    out += scan_bytes([(int(tab_a[0][0x02]), int(tab_a[1][0x02])), (2, 0b11),
                       (int(tab_a[0][0x00]), int(tab_a[1][0x00]))])
    # redefine id (1, 0) to table B, then AC band 6..63 with it:
    # AC6=-2 (rs 0x02, mant = -3 & 3 = 01), EOB
    out += dht(1, 0, b_bits, b_vals)
    out += sos_hdr(6, 63, 0, 0)
    out += scan_bytes([(int(tab_b[0][0x02]), int(tab_b[1][0x02])), (2, 0b01),
                       (int(tab_b[0][0x00]), int(tab_b[1][0x00]))])
    out += b"\xFF\xD9"

    coef, f = decode_progressive(bytes(out))
    expect = np.zeros(64, np.int16)
    expect[0], expect[1], expect[6] = 5, 3, -2
    np.testing.assert_array_equal(coef[0, 0], expect)


def test_native_scan_decoder_matches_python():
    """The C per-scan decoder (native/entropy.c:amv_progressive_scan)
    must agree with the pure-Python scan loop on every scan kind the
    encoder emits (DC/AC first + successive-approximation refinement)."""
    import os
    lv = _rand_levels("420", 48, 32, seed=5)
    data = encode_progressive(lv, (48, 32), al_dc=2, al_ac=2)
    c_nat, _ = decode_progressive(data)
    os.environ["AMV_PROGRESSIVE_PY"] = "1"
    try:
        c_py, _ = decode_progressive(data)
    finally:
        del os.environ["AMV_PROGRESSIVE_PY"]
    np.testing.assert_array_equal(c_nat, c_py)


def test_libjpeg_progressive_equals_baseline():
    """Real libjpeg progressive output (PIL, optimized per-scan Huffman
    tables + successive approximation): the progressive and baseline
    encodings of the same image carry identical quantized coefficients,
    so our two decode paths must produce identical pixels."""
    import io
    PIL = pytest.importorskip("PIL.Image")
    rng = np.random.default_rng(2)
    xx, yy = np.mgrid[0:64, 0:80]
    img = np.stack([
        np.clip(120 + 70 * np.sin(xx / 7.0) + rng.integers(-9, 9, (64, 80)),
                0, 255),
        np.clip(110 + 60 * np.cos(yy / 9.0), 0, 255),
        np.clip(90 + 50 * np.sin((xx + yy) / 11.0), 0, 255)],
        axis=-1).astype(np.uint8)
    im = PIL.fromarray(img)
    base, prog = io.BytesIO(), io.BytesIO()
    im.save(base, "JPEG", quality=80, progressive=False, optimize=False,
            subsampling=2)
    im.save(prog, "JPEG", quality=80, progressive=True, subsampling=2)
    yb, cbb, crb = decode_mjpeg_frames([base.getvalue()])
    yp, cbp, crp = decode_mjpeg_frames([prog.getvalue()])
    np.testing.assert_array_equal(np.asarray(yb), np.asarray(yp))
    np.testing.assert_array_equal(np.asarray(cbb), np.asarray(cbp))
    np.testing.assert_array_equal(np.asarray(crb), np.asarray(crp))
