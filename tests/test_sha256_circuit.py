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
    # finals are emitted in DEATH order; map back to wire labels
    fin = np.zeros(int(np.asarray(tr.fin_idx).max()) + 1, dtype=np.uint64)
    fin[np.asarray(tr.fin_idx)] = np.asarray(tr.fin_val)[:, 0]
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
    fin = np.zeros(int(np.asarray(tr.fin_idx).max()) + 1, dtype=np.uint64)
    fin[np.asarray(tr.fin_idx)] = np.asarray(tr.fin_val)[:, 0]
    for blk in range(2):
        got = [int(sum(int(fin[digest[i][j][blk]]) << (8 * j)
                       for j in range(4))) for i in range(8)]
        want = sha256.reference_digest(words[blk])
        assert got == want


def test_get_sha_witness_matches_hashlib():
    """The a..h evolution in the GKR input vector is real SHA-256
    compression (witness_stream.cpp:58-224 analog; checked against
    hashlib on a fully padded single block)."""
    import hashlib
    from hobbit_tpu.models import sha256 as sha_mod

    msg = b"hobbit tpu witness"
    block = msg + b"\x80" + b"\x00" * (55 - len(msg)) \
        + (len(msg) * 8).to_bytes(8, "big")
    words = [int.from_bytes(block[4 * i: 4 * i + 4], "big")
             for i in range(16)]
    vec = sha_mod.get_sha_witness(words)
    assert vec.shape == (1 << 14, 2)
    assert sha_mod.sha_witness_digest(vec) == hashlib.sha256(msg).digest()
    # layout invariants: schedule words present, trailing 1 marker
    n_used = 64 + 64 + 65 * 8 + 128 + 64 * 32 + 6 * 64 * 32 + 1
    assert vec[n_used - 1, 0] == 1
    assert not vec[n_used:, 0].any()


def test_get_sha_witness_bits_decompose():
    from hobbit_tpu.models import sha256 as sha_mod

    words = list(range(1, 17))
    vec = sha_mod.get_sha_witness(words)
    off_bits = 64 + 64 + 65 * 8 + 128
    for i in (0, 20, 63):
        w = int(vec[i, 0])
        bits = vec[off_bits + 32 * i: off_bits + 32 * (i + 1), 0]
        assert sum(int(b) << j for j, b in enumerate(bits)) == w
