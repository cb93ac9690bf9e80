"""Golden-output regression gate (the reference regression.sh md5 parity).

The decoded output of the vendored device corpus is bit-exact against the
single-core C implementation of the reference algorithms; these md5s
freeze that behavior so any semantic regression in the entropy decoder,
IDCT, assembly/flip or ADPCM kernels fails loudly.
"""

import hashlib

import pytest

from amv_tpu.pipeline.decode import decode_file

GOLDEN = {
    "y": "e3a5464be94344faf039cbb14b4d7c72",
    "cb": "308b3241ed23be19289cb708b107ec74",
    "cr": "9441012da8366b0c477952de18f5ec3b",
    "pcm": "10ee1d7766cb30742c65ea70558cff22",
}


def test_corpus_decode_golden(sample_amv_path):
    dec = decode_file(sample_amv_path)
    got = {
        "y": hashlib.md5(dec.y.tobytes()).hexdigest(),
        "cb": hashlib.md5(dec.cb.tobytes()).hexdigest(),
        "cr": hashlib.md5(dec.cr.tobytes()).hexdigest(),
        "pcm": hashlib.md5(dec.pcm.tobytes()).hexdigest(),
    }
    assert got == GOLDEN
    assert dec.y.shape == (252, 96, 128)
    assert dec.pcm.shape == (336252,)
