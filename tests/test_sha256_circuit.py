"""SHA-256 lookup-circuit tests: digest correctness vs pure-python model."""

import numpy as np

from hobbit_tpu.models import sha256
from hobbit_tpu.streams import trace as trc
from hobbit_tpu.streams import views

RNG = np.random.default_rng(17)


def test_sha256_single_block_digest():
    prog, digest = sha256.build(blocks_log2=0)
    words = RNG.integers(0, 1 << 32, size=(1, 16), dtype=np.uint64)
    sb = sha256.Sha256Builder(1)
    x = sb.inputs(words)
    tr = trc.execute(prog, x)
    fin = np.asarray(tr.fin_val)[:, 0]
    got = [int(sum(int(fin[digest[i][j][0]]) << (8 * j) for j in range(4)))
           for i in range(8)]
    want = sha256.reference_digest(words[0])
    assert got == want


def test_sha256_gate_consistency_and_lookups():
    prog, _ = sha256.build(blocks_log2=0, rounds=16)  # reduced rounds: fast
    words = RNG.integers(0, 1 << 32, size=(1, 16), dtype=np.uint64)
    sb = sha256.Sha256Builder(1)
    x = sb.inputs(words)
    tr = trc.execute(prog, x)
    terms = views.gate_consistency_terms(views.gate_arrays(tr))
    assert np.all(np.asarray(terms) == 0)


def test_sha256_parallel_blocks_match():
    prog, digest = sha256.build(blocks_log2=1)
    words = RNG.integers(0, 1 << 32, size=(2, 16), dtype=np.uint64)
    sb = sha256.Sha256Builder(2)
    tr = trc.execute(prog, sb.inputs(words))
    fin = np.asarray(tr.fin_val)[:, 0]
    for blk in range(2):
        got = [int(sum(int(fin[digest[i][j][blk]]) << (8 * j)
                       for j in range(4))) for i in range(8)]
        want = sha256.reference_digest(words[blk])
        assert got == want
