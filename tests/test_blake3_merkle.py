"""BLAKE3 compression + Merkle tree tests."""

import numpy as np

import jax.numpy as jnp

from hobbit_tpu.ops import blake3, merkle
from hobbit_tpu.ops import field as F

RNG = np.random.default_rng(5)


def test_blake3_official_vector_64b():
    # Official BLAKE3 test vector: input bytes i % 251, input_len = 64.
    msg = bytes(i % 251 for i in range(64))
    want_hex = ("4eed7141ea4a5cd4b788606bd23f46e212af9cacebacdc7d1f4c6dc7"
                "f2511b98")
    got = blake3.py_compress64(msg)
    assert got.hex() == want_hex


def test_jnp_matches_python():
    blocks = RNG.integers(0, 256, size=(16, 64), dtype=np.uint8)
    words = np.frombuffer(blocks.tobytes(), dtype="<u4").reshape(16, 16)
    got = np.asarray(blake3.compress64(jnp.asarray(words)))
    for i in range(16):
        want = np.frombuffer(blake3.py_compress64(blocks[i].tobytes()), dtype="<u4")
        np.testing.assert_array_equal(got[i], want)


def test_fields_to_words_layout():
    # Little-endian memcpy of (real u64, img u64) pairs.
    f = jnp.asarray(
        np.array([[[0x1122334455667788, 0x99AABBCCDDEEFF00]] * 4],
                 dtype=np.uint64))
    w = np.asarray(blake3.fields_to_words(f))[0]
    assert w[0] == 0x55667788 and w[1] == 0x11223344
    assert w[2] == 0xDDEEFF00 and w[3] == 0x99AABBCC


def rand_field(n):
    re = RNG.integers(0, F.P, size=n, dtype=np.uint64)
    im = RNG.integers(0, F.P, size=n, dtype=np.uint64)
    return jnp.stack([jnp.asarray(re), jnp.asarray(im)], axis=-1)


def test_merkle_commit_open_verify():
    vals = rand_field(64)  # 16 leaves
    tree = merkle.commit_fields(vals)
    assert tree.num_leaves == 16
    for idx in [0, 5, 15]:
        path = merkle.open_leaf(tree, idx)
        leaf = tree.levels[0][idx]
        assert merkle.verify_leaf(tree.root, leaf, idx, path)
    # wrong index fails
    path = merkle.open_leaf(tree, 3)
    assert not merkle.verify_leaf(tree.root, tree.levels[0][3], 2, path)


def test_merkle_tamper_detection():
    vals = rand_field(32)
    tree = merkle.commit_fields(vals)
    path = merkle.open_leaf(tree, 1)
    bad_leaf = tree.levels[0][1] ^ np.uint32(1)
    assert not merkle.verify_leaf(tree.root, bad_leaf, 1, path)


def test_chained_commit_differs_and_verifies():
    chunks = rand_field(128).reshape(2, 64, 2)
    t1 = merkle.commit_fields_chained(chunks)
    t2 = merkle.commit_fields_chained(chunks[::-1])
    assert not np.array_equal(np.asarray(t1.root), np.asarray(t2.root))
    path = merkle.open_leaf(t1, 7)
    assert merkle.verify_leaf(t1.root, t1.levels[0][7], 7, path)


def test_dedup_path_size():
    # two sibling leaves share their whole path above the first level
    n = 16
    full = merkle.dedup_path_size([0], n)
    assert full == 4
    both = merkle.dedup_path_size([0, 1], n)
    assert both == 4 + 1  # sibling pair: second opening adds only the leaf
