"""Expander / Spielman / RS / tensor code tests."""

import numpy as np

import jax.numpy as jnp

from hobbit_tpu.ops import encode as enc
from hobbit_tpu.ops import expanders
from hobbit_tpu.ops import field as F
from hobbit_tpu.ops import poly

P = F.P
RNG = np.random.default_rng(31)


def rand_field(*shape):
    re = RNG.integers(0, P, size=shape, dtype=np.uint64)
    im = RNG.integers(0, P, size=shape, dtype=np.uint64)
    return jnp.stack([jnp.asarray(re), jnp.asarray(im)], axis=-1)


def test_spmv_matches_dense():
    rng = np.random.default_rng(0)
    edges = expanders._make_expander(rng, 20, 7, 3)
    x = rand_field(20)
    y = np.asarray(expanders.spmv(edges, x))
    # dense recompute with python ints
    dense = [[0, 0] for _ in range(7)]
    src, dst = np.asarray(edges.src), np.asarray(edges.dst)
    w = np.asarray(edges.weight)
    xn = np.asarray(x)
    for e in range(len(src)):
        prod = F.py_fmul((int(w[e, 0]), int(w[e, 1])),
                         (int(xn[src[e], 0]), int(xn[src[e], 1])))
        t = dense[dst[e]]
        t[0] = (t[0] + prod[0]) % P
        t[1] = (t[1] + prod[1]) % P
    for i in range(7):
        assert (int(y[i, 0]), int(y[i, 1])) == tuple(dense[i])


def test_spmv_batched():
    rng = np.random.default_rng(0)
    edges = expanders._make_expander(rng, 16, 5, 4)
    xb = rand_field(3, 16)
    yb = np.asarray(expanders.spmv(edges, xb))
    for b in range(3):
        y = np.asarray(expanders.spmv(edges, xb[b]))
        np.testing.assert_array_equal(yb[b], y)


def test_spielman_encode_structure_and_linearity():
    code = expanders.build_code(64)
    assert code.levels[0].n == 64
    # rate approx r = 1.72
    assert 64 < code.codeword_len <= 2 * 64
    x1, x2 = rand_field(64), rand_field(64)
    c1 = enc.spielman_encode_padded(code, x1)
    c2 = enc.spielman_encode_padded(code, x2)
    c12 = enc.spielman_encode_padded(code, F.fadd(x1, x2))
    np.testing.assert_array_equal(np.asarray(F.fadd(c1, c2)), np.asarray(c12))
    # systematic prefix
    np.testing.assert_array_equal(np.asarray(c1[:64]), np.asarray(x1))
    assert c1.shape == (128, 2)


def test_spielman_deterministic():
    c1 = expanders.build_code(64, seed=666)
    c2 = expanders.build_code(64, seed=666)
    x = rand_field(64)
    np.testing.assert_array_equal(
        np.asarray(expanders.encode(c1, x)), np.asarray(expanders.encode(c2, x)))


def test_rs_encode_evaluations():
    # codeword[j] = P(w^j) where P has the row as coefficients
    row = rand_field(8)
    cw = np.asarray(enc.rs_encode(row))
    w = F.root_of_unity(4)  # 16-point domain
    rown = np.asarray(row)
    for j in [0, 1, 7, 15]:
        x = F.py_fpow(w, j)
        acc = (0, 0)
        for i in range(8):
            t = F.py_fmul((int(rown[i, 0]), int(rown[i, 1])), F.py_fpow(x, i))
            acc = ((acc[0] + t[0]) % P, (acc[1] + t[1]) % P)
        assert (int(cw[j, 0]), int(cw[j, 1])) == acc


def test_tensor_encode_rs_shape_and_consistency():
    N, rows = 256, 16
    spec = enc.make_tensor_spec(N, rows, linear_time=False)
    msg = rand_field(N)
    T = enc.tensor_encode(spec, msg)
    assert T.shape == (2 * rows, 2 * N // rows, 2)
    # Column code is linear & applied after row code: encoding rows first
    # then columns must equal encoding a second message's sum etc.
    msg2 = rand_field(N)
    T2 = enc.tensor_encode(spec, msg2)
    T12 = enc.tensor_encode(spec, F.fadd(msg, msg2))
    np.testing.assert_array_equal(np.asarray(F.fadd(T, T2)), np.asarray(T12))


def test_tensor_encode_linear_time():
    N, rows = 512, 32
    spec = enc.make_tensor_spec(N, rows, linear_time=True)
    msg = rand_field(N)
    T = enc.tensor_encode(spec, msg)
    assert T.shape == (2 * rows, 2 * N // rows, 2)
    # systematic region: rows 0..rows of the column code carry the
    # RS-extended rows
    mat = msg.reshape(rows, N // rows, 2)
    ext = enc.rs_encode(mat)
    np.testing.assert_array_equal(np.asarray(T[:rows]), np.asarray(ext))
