"""AES-128 lookup-circuit tests."""

import numpy as np

from hobbit_tpu.models import aes
from hobbit_tpu.streams import trace as trc
from hobbit_tpu.streams import views

RNG = np.random.default_rng(23)

FIPS_KEY = list(range(16))
FIPS_PT = [0x00, 0x11, 0x22, 0x33, 0x44, 0x55, 0x66, 0x77,
           0x88, 0x99, 0xAA, 0xBB, 0xCC, 0xDD, 0xEE, 0xFF]
FIPS_CT = [0x69, 0xC4, 0xE0, 0xD8, 0x6A, 0x7B, 0x04, 0x30,
           0xD8, 0xCD, 0xB7, 0x80, 0x70, 0xB4, 0xC5, 0x5A]


def test_reference_model_fips_vector():
    assert aes.reference_encrypt(FIPS_PT, FIPS_KEY) == FIPS_CT


def test_aes_circuit_matches_model():
    prog, ct_labels = aes.build(blocks_log2=0, key=FIPS_KEY)
    ab = aes.AesBuilder(1, aes.key_schedule(FIPS_KEY))
    x = ab.inputs(np.array([FIPS_PT], dtype=np.uint64))
    tr = trc.execute(prog, x)
    fin = np.asarray(tr.fin_val)[:, 0]
    got = [int(fin[ct_labels[j][0]]) for j in range(16)]
    assert got == FIPS_CT


def test_aes_parallel_blocks():
    prog, ct_labels = aes.build(blocks_log2=1, key=FIPS_KEY)
    pts = RNG.integers(0, 256, size=(2, 16), dtype=np.uint64)
    ab = aes.AesBuilder(2, aes.key_schedule(FIPS_KEY))
    tr = trc.execute(prog, ab.inputs(pts))
    fin = np.asarray(tr.fin_val)[:, 0]
    for blk in range(2):
        got = [int(fin[ct_labels[j][blk]]) for j in range(16)]
        want = aes.reference_encrypt([int(b) for b in pts[blk]], FIPS_KEY)
        assert got == want


def test_aes_gate_consistency():
    prog, _ = aes.build(blocks_log2=0, key=FIPS_KEY)
    ab = aes.AesBuilder(1, aes.key_schedule(FIPS_KEY))
    tr = trc.execute(prog, ab.inputs(np.array([FIPS_PT], dtype=np.uint64)))
    terms = views.gate_consistency_terms(views.gate_arrays(tr))
    assert np.all(np.asarray(terms) == 0)
