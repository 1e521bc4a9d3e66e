"""SHA-256 op + Pigeon SHA-based PC tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from hobbit_tpu.ops import field as F
from hobbit_tpu.ops import merkle, mimc, poly, sha256
from hobbit_tpu.pc import pigeon

pytestmark = pytest.mark.slow


def _rf(rng, *shape):
    re = rng.integers(0, F.P, size=shape, dtype=np.uint64)
    im = rng.integers(0, F.P, size=shape, dtype=np.uint64)
    return jnp.stack([jnp.asarray(re), jnp.asarray(im)], axis=-1)


def test_sha256_bitexact():
    msg = bytes(range(64))
    words = jnp.asarray(np.frombuffer(msg, dtype="<u4"))[None]
    got = np.asarray(sha256.hash64(words))[0].tobytes()
    assert got == sha256.py_hash64(msg)


def test_sha_merkle_roundtrip():
    rng = np.random.default_rng(0)
    vals = _rf(rng, 64)
    tree = merkle.commit_fields(vals, backend="sha256")
    assert tree.backend == "sha256"
    path = merkle.open_leaf(tree, 5)
    assert merkle.verify_leaf(tree.root, tree.levels[0][5], 5, path,
                              backend="sha256")
    # blake3 root differs (distinct backends)
    tree_b = merkle.commit_fields(vals, backend="blake3")
    assert not bool(jnp.all(tree.root == tree_b.root))


@pytest.mark.parametrize("mode", ["rs", "expander"])
def test_pigeon_pc_roundtrip(mode):
    rng = np.random.default_rng(7)
    N, rows = 256, 4
    params = pigeon.PigeonParams(N=N, rows=rows, mode=mode, queries=8)
    msg = _rf(rng, N)
    com = pigeon.commit(msg, params)
    x = _rf(rng, int(np.log2(N)))
    opening, _ = pigeon.open(msg, com, x, params, mimc.fresh_state())
    assert bool(F.feq(opening.eval_claim, poly.evaluate_vector(msg, x)))
    ok, _ = pigeon.verify(com.root, x, opening, params, com.code,
                          mimc.fresh_state())
    assert bool(ok)

    bad = opening._replace(aggr=opening.aggr.at[0, 0].add(1))
    okb, _ = pigeon.verify(com.root, x, bad, params, com.code,
                           mimc.fresh_state())
    assert not bool(okb)


def test_sha3_bitexact_and_merkle():
    from hobbit_tpu.ops import sha3
    msg = bytes(range(64))
    words = jnp.asarray(np.frombuffer(msg, dtype="<u4"))[None]
    got = np.asarray(sha3.hash64(words))[0].tobytes()
    assert got == sha3.py_hash64(msg)

    rng = np.random.default_rng(5)
    vals = _rf(rng, 32)
    tree = merkle.commit_fields(vals, backend="sha3")
    path = merkle.open_leaf(tree, 3)
    assert merkle.verify_leaf(tree.root, tree.levels[0][3], 3, path,
                              backend="sha3")
