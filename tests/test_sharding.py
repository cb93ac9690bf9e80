"""Multi-chip sharding on the virtual 8-device CPU mesh."""

import numpy as np
import pytest
import jax

from amv_tpu.parallel.sharding import (make_mesh, sharded_decode_step,
                                       sharded_encode_step,
                                       sharded_adpcm_decode)


@pytest.fixture(scope="module")
def mesh():
    if jax.device_count() < 8:
        pytest.skip("needs 8 devices")
    return make_mesh(jax.devices()[:8])


def test_mesh_shape(mesh):
    assert mesh.devices.shape == (4, 2)
    assert mesh.axis_names == ("dp", "sp")


def test_sharded_video_roundtrip_matches_single(mesh):
    from amv_tpu.codecs.amv_video import decode_transform, encode_transform
    import jax.numpy as jnp
    rng = np.random.default_rng(3)
    F, M = 8, 80  # 160x120
    levels = rng.integers(-32, 32, (F, M, 6, 64)).astype(np.int16)
    dec = sharded_decode_step(mesh, 10, 8, 160, 120)
    y, cb, cr = dec(jnp.asarray(levels))
    y1, cb1, cr1 = decode_transform(jnp.asarray(levels), 10, 8, 160, 120)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(y1))
    enc = sharded_encode_step(mesh, 10, 8)
    lv = enc(y, cb, cr)
    lv1 = encode_transform(y1, cb1, cr1, 10, 8)
    np.testing.assert_array_equal(np.asarray(lv), np.asarray(lv1))


def test_sharded_adpcm_matches_single(mesh):
    import jax.numpy as jnp
    from amv_tpu.kernels.adpcm import decode_chunks
    rng = np.random.default_rng(4)
    C, L = 16, 64
    payload = rng.integers(0, 256, (C, L)).astype(np.uint8)
    pred = rng.integers(-1000, 1000, C).astype(np.int32)
    sidx = rng.integers(0, 89, C).astype(np.int32)
    fn = sharded_adpcm_decode(mesh)
    got = np.asarray(fn(jnp.asarray(payload), jnp.asarray(pred),
                        jnp.asarray(sidx)))
    want = np.asarray(decode_chunks(jnp.asarray(payload), jnp.asarray(pred),
                                    jnp.asarray(sidx)))
    np.testing.assert_array_equal(got, want)


def test_sharded_adpcm_encode_matches_single(mesh):
    import jax.numpy as jnp
    from amv_tpu.kernels.adpcm import encode_samples
    from amv_tpu.parallel.sharding import sharded_adpcm_encode
    rng = np.random.default_rng(5)
    B, n = 8, 128
    samples = rng.integers(-20000, 20000, (B, n)).astype(np.int32)
    reset = np.zeros((B, n), bool)
    reset[:, 0] = True
    sidx0 = rng.integers(0, 89, B).astype(np.int32)
    fn = sharded_adpcm_encode(mesh)
    got = fn(jnp.asarray(samples), jnp.asarray(reset), jnp.asarray(sidx0))
    want = encode_samples(jnp.asarray(samples), jnp.asarray(reset),
                          jnp.asarray(sidx0))
    np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(want[0]))
    np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(want[1]))


def test_sharded_g729_chain_matches_single(mesh):
    import jax.numpy as jnp
    from amv_tpu.codecs import g729a
    from amv_tpu.parallel.sharding import sharded_g729_decode_chain
    from test_g729 import make_frame
    rng = np.random.default_rng(6)
    T, B = 8, 8
    frames = np.zeros((T, B, 10), np.uint8)
    for t in range(T):
        for b in range(B):
            frames[t, b] = np.frombuffer(make_frame(rng), np.uint8)
    want = g729a.decode_streams(frames)          # [B, T*80]
    parms = jnp.asarray(g729a.unpack_frames(frames))
    fn = sharded_g729_decode_chain(mesh)
    st, pcm = fn(g729a.init_state(B), parms)     # pcm [T, B, 80]
    got = np.asarray(pcm).transpose(1, 0, 2).reshape(B, T * 80)
    np.testing.assert_array_equal(got, np.asarray(want))


def test_sharded_complete_transcode_matches_single(mesh):
    """The production zero-relayout chain (Pallas entropy decode +
    in-layout transform + Pallas entropy encode) sharded over the mesh
    equals the single-device run and the host re-encode payloads."""
    import jax.numpy as jnp
    from amv_tpu.bitstream.entropy import (huffman_encode_frame,
                                           huffman_decode_frames)
    from amv_tpu.codecs.amv_video import (_encoder_quant_qmat_np,
                                          _unescape_pack)
    from amv_tpu.parallel.sharding import sharded_complete_transcode
    from amv_tpu.pipeline.transcode import (transcode_complete_layout,
                                            transcode_levels_fused)

    rng = np.random.default_rng(11)
    F, M = 16, 2
    lv = np.zeros((F, M, 6, 64), np.int16)
    lv[..., 0] = rng.integers(-8, 48, (F, M, 6))
    lv[..., 1] = rng.integers(-4, 4, (F, M, 6))
    payloads = [huffman_encode_frame(lv[f]) for f in range(F)]
    rows = _unescape_pack(payloads)
    qk = tuple(int(v) for v in _encoder_quant_qmat_np(2))

    fn = sharded_complete_transcode(mesh, M, qk, w_out=128, interpret=True)
    words, bits = fn(jnp.asarray(rows))
    w1, b1 = transcode_complete_layout(jnp.asarray(rows), M, qk,
                                       w_out=128, interpret=True,
                                       win_fetch=64, win_emit=64)
    np.testing.assert_array_equal(np.asarray(words), np.asarray(w1))
    np.testing.assert_array_equal(np.asarray(bits), np.asarray(b1))

    # end-to-end byte equality vs the host re-encode
    from amv_tpu.native import entropy_native as native
    got = native.escape_frames(np.asarray(words), np.asarray(bits))
    lvdec = huffman_decode_frames(payloads, M)
    lv2 = np.asarray(transcode_levels_fused(jnp.asarray(lvdec), 2)[0])
    want = [huffman_encode_frame(lv2[f]) for f in range(F)]
    assert got == want


def test_sharded_decode_scans_matches_single(mesh):
    import jax.numpy as jnp
    from amv_tpu.bitstream.entropy import huffman_encode_frame
    from amv_tpu.codecs.amv_video import _unescape_pack
    from amv_tpu.parallel.sharding import sharded_decode_scans
    from amv_tpu.pipeline.transcode import decode_scans_layout

    rng = np.random.default_rng(12)
    F, M = 16, 2
    lv = np.zeros((F, M, 6, 64), np.int16)
    lv[..., 0] = rng.integers(-8, 48, (F, M, 6))
    payloads = [huffman_encode_frame(lv[f]) for f in range(F)]
    rows = _unescape_pack(payloads)
    fn = sharded_decode_scans(mesh, M, interpret=True)
    got = np.asarray(fn(jnp.asarray(rows)))
    want = np.asarray(decode_scans_layout(jnp.asarray(rows), M,
                                          interpret=True, win_fetch=64))
    np.testing.assert_array_equal(got, want)


def test_sharded_async_transcode_sb_matches_single(mesh):
    """The lane-async bench-headline chain, sharded with a non-default
    sublane width (sb=16), must equal the single-device async chain and
    the host re-encode bytes.  sb sizes the PER-SHARD lane tile, so the
    words/bits contract cannot depend on it."""
    import jax.numpy as jnp
    from amv_tpu.bitstream.entropy import (huffman_encode_frame,
                                           huffman_decode_frames)
    from amv_tpu.codecs.amv_video import (_encoder_quant_qmat_np,
                                          _unescape_pack)
    from amv_tpu.parallel.sharding import sharded_complete_transcode_async
    from amv_tpu.pipeline.transcode import (transcode_complete_async,
                                            transcode_levels_fused)

    rng = np.random.default_rng(17)
    F, M = 16, 2
    lv = np.zeros((F, M, 6, 64), np.int16)
    lv[..., 0] = rng.integers(-8, 48, (F, M, 6))
    lv[..., 1] = rng.integers(-4, 4, (F, M, 6))
    payloads = [huffman_encode_frame(lv[f]) for f in range(F)]
    rows = _unescape_pack(payloads)
    qk = tuple(int(v) for v in _encoder_quant_qmat_np(2))

    fn = sharded_complete_transcode_async(mesh, M, qk, w_out=128,
                                          interpret=True, sb=16)
    words, bits, ok = fn(jnp.asarray(rows))
    assert bool(np.all(np.asarray(ok) == 1))
    w1, b1, ok1 = transcode_complete_async(jnp.asarray(rows), M, qk,
                                           w_out=128, interpret=True,
                                           win_fetch=64, win_emit=64,
                                           enc="async", sb=16)
    assert bool(ok1)
    np.testing.assert_array_equal(np.asarray(words), np.asarray(w1))
    np.testing.assert_array_equal(np.asarray(bits), np.asarray(b1))

    from amv_tpu.native import entropy_native as native
    got = native.escape_frames(np.asarray(words), np.asarray(bits))
    lvdec = huffman_decode_frames(payloads, M)
    lv2 = np.asarray(transcode_levels_fused(jnp.asarray(lvdec), 2)[0])
    want = [huffman_encode_frame(lv2[f]) for f in range(F)]
    assert got == want


def test_sharded_g729_encoder_matches_single(mesh):
    """The batched TPU G.729A encoder frame step sharded on dp must emit
    the same parameters (and state) as the unsharded step."""
    import jax.numpy as jnp
    from amv_tpu.codecs import g729a
    from amv_tpu.codecs.g729a_encoder_tpu import encode_frame_batch
    from amv_tpu.parallel.sharding import sharded_g729_encode_step
    rng = np.random.default_rng(11)
    B = 8
    sig = (3000 * rng.standard_normal((B, 80))).astype(np.float32)
    st0 = g729a.init_state(B)
    hist0 = jnp.zeros((B, 160))
    st_w, hist_w, parm_w = encode_frame_batch(st0, hist0, jnp.asarray(sig))
    fn = sharded_g729_encode_step(mesh)
    st_g, hist_g, parm_g = fn(g729a.init_state(B), jnp.zeros((B, 160)),
                              jnp.asarray(sig))
    np.testing.assert_array_equal(np.asarray(parm_g), np.asarray(parm_w))
    np.testing.assert_array_equal(np.asarray(st_g["exc"]),
                                  np.asarray(st_w["exc"]))
    np.testing.assert_array_equal(np.asarray(hist_g), np.asarray(hist_w))
