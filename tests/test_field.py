"""Field arithmetic tests: GF(p^2), p = 2^61-1, vs pure-python big ints."""

import numpy as np
import pytest

import jax.numpy as jnp

from hobbit_tpu.ops import field as F

P = F.P
RNG = np.random.default_rng(1234)


def rand_pairs(n):
    re = RNG.integers(0, P, size=n, dtype=np.uint64)
    im = RNG.integers(0, P, size=n, dtype=np.uint64)
    return re, im


def as_field(re, im):
    return jnp.stack([jnp.asarray(re), jnp.asarray(im)], axis=-1).astype(jnp.uint64)


def py_ext_mul(a, b):
    ar, ai, br, bi = int(a[0]), int(a[1]), int(b[0]), int(b[1])
    return ((ar * br - ai * bi) % P, (ar * bi + ai * br) % P)


def test_mulmod_random():
    x = RNG.integers(0, P, size=4096, dtype=np.uint64)
    y = RNG.integers(0, P, size=4096, dtype=np.uint64)
    got = np.asarray(F.mulmod(jnp.asarray(x), jnp.asarray(y)))
    want = np.array([(int(a) * int(b)) % P for a, b in zip(x, y)], dtype=np.uint64)
    np.testing.assert_array_equal(got, want)


def test_mulmod_edge_cases():
    edge = np.array([0, 1, 2, P - 1, P - 2, (1 << 32) - 1, 1 << 32, (1 << 61) - 2],
                    dtype=np.uint64)
    xs, ys = np.meshgrid(edge, edge)
    xs, ys = xs.ravel(), ys.ravel()
    got = np.asarray(F.mulmod(jnp.asarray(xs), jnp.asarray(ys)))
    want = np.array([(int(a) * int(b)) % P for a, b in zip(xs, ys)], dtype=np.uint64)
    np.testing.assert_array_equal(got, want)


def test_mulmod_lazy_input_range():
    # fmul feeds sums < 2^62 into mulmod; check exactness there too.
    x = RNG.integers(0, 2 * P, size=2048, dtype=np.uint64)
    y = RNG.integers(0, 2 * P, size=2048, dtype=np.uint64)
    got = np.asarray(F.mulmod(jnp.asarray(x), jnp.asarray(y)))
    want = np.array([(int(a) * int(b)) % P for a, b in zip(x, y)], dtype=np.uint64)
    np.testing.assert_array_equal(got, want)


def test_ext_mul_matches_python():
    re1, im1 = rand_pairs(1024)
    re2, im2 = rand_pairs(1024)
    a, b = as_field(re1, im1), as_field(re2, im2)
    got = np.asarray(F.fmul(a, b))
    for i in range(0, 1024, 97):
        want = py_ext_mul((re1[i], im1[i]), (re2[i], im2[i]))
        assert (int(got[i, 0]), int(got[i, 1])) == want


def test_add_sub_neg():
    re1, im1 = rand_pairs(512)
    re2, im2 = rand_pairs(512)
    a, b = as_field(re1, im1), as_field(re2, im2)
    s = F.fadd(a, b)
    assert np.all(np.asarray(F.fsub(s, b)) == np.asarray(a))
    z = F.fadd(a, F.fneg(a))
    assert np.all(np.asarray(z) == 0)


def test_inv():
    re, im = rand_pairs(256)
    a = as_field(re, im)
    inv = F.finv(a)
    prod = np.asarray(F.fmul(a, inv))
    assert np.all(prod[:, 0] == 1)
    assert np.all(prod[:, 1] == 0)
    # zero maps to zero (reference fastPow(0, p^2-2) == 0)
    assert np.all(np.asarray(F.finv(F.zeros((3,)))) == 0)


def test_fpow():
    a = F.scalar(12345, 67890)
    got = np.asarray(F.fpow(a, 5))
    want = (12345, 67890)
    acc = (1, 0)
    for _ in range(5):
        acc = py_ext_mul(acc, want)
    assert (int(got[0]), int(got[1])) == acc


def test_root_of_unity_orders():
    # Canonical generator has order exactly 2^62.
    for k in (1, 2, 5, 10):
        w = F.root_of_unity(k)
        assert F.py_fpow(w, 1 << k) == (1, 0)
        assert F.py_fpow(w, 1 << (k - 1)) != (1, 0)
    # The hard-coded generator itself has order exactly 2^62.
    assert F.py_fpow(F.ROU, 1 << 62) == (1, 0)
    assert F.py_fpow(F.ROU, 1 << 61) != (1, 0)


def test_fsum_fprod_fdot():
    re, im = rand_pairs(1000)
    a = as_field(re, im)
    s = np.asarray(F.fsum(a))
    assert int(s[0]) == int(np.sum(re.astype(object)) % P)
    assert int(s[1]) == int(np.sum(im.astype(object)) % P)

    b = as_field(*rand_pairs(1000))
    d = np.asarray(F.fdot(a, b))
    accr, acci = 0, 0
    for i in range(1000):
        r, c = py_ext_mul((re[i], im[i]), (np.asarray(b)[i, 0], np.asarray(b)[i, 1]))
        accr, acci = (accr + r) % P, (acci + c) % P
    assert (int(d[0]), int(d[1])) == (accr, acci)

    small = as_field(np.arange(1, 6, dtype=np.uint64), np.zeros(5, np.uint64))
    p = np.asarray(F.fprod(small))
    assert (int(p[0]), int(p[1])) == (120, 0)


def test_py_mirror_consistency():
    a, b = (123456789123, 987654321987), (555, 777)
    assert F.py_fmul(a, b) == py_ext_mul(a, b)
    inv = F.py_finv(a)
    assert F.py_fmul(a, inv) == (1, 0)
