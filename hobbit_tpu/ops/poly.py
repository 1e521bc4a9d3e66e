"""Multilinear / univariate polynomial utilities.

TPU-first equivalents of the reference's ``src/utils.cpp`` helpers:
``precompute_beta`` (tensor-product expansion via log-depth doubling),
``evaluate_vector`` (pair-fold multilinear evaluation), power tables,
Lagrange coefficients, convolution (tensor product), and coefficient-form
conversion.  Convention (identical to the reference): challenge ``r[0]``
binds the least-significant index bit; folding combines adjacent pairs.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from . import field as F
from ..utils.jitting import maybe_jit


@maybe_jit
def beta_table(r):
    """eq-table B[x] = prod_j (x_j ? r[j] : 1-r[j]); r is [k, 2] -> [2^k, 2].

    Semantics of reference utils.cpp:251-296 (``precompute_beta``), but
    computed as k full-width masked products inside one ``fori_loop``
    instead of log-depth doubling: the unrolled doubling chain made XLA
    compile a 2^k-wide fusion DAG (228 s at k=22 on v5e), while a single
    fixed-shape loop body compiles in milliseconds and the extra k/2x
    multiplies are noise at TPU mult throughput.
    """
    import jax
    from jax import lax

    k = r.shape[0]
    n = 1 << k
    if k <= 8:          # tiny tables: the unrolled chain compiles instantly
        B = F.ones((1,))
        for i in range(k - 1, -1, -1):
            t = F.fmul(B, r[i][None, :])
            B = jnp.stack([F.fsub(B, t), t], axis=1).reshape(-1, 2)
        return B
    idx = jnp.arange(n, dtype=jnp.uint32)
    one = F.ones(())

    def body(j, B):
        rj = lax.dynamic_slice(r, (j, 0), (1, 2))
        f = jnp.where(((idx >> j) & 1)[:, None].astype(bool),
                      rj, F.fsub(one, rj[0])[None, :])
        return F.fmul(B, f)

    return lax.fori_loop(0, k, body, F.ones((n,)))


@maybe_jit
def evaluate_vector(v, r):
    """Multilinear extension of v evaluated at r (pair-fold, r[0] first).

    v: [n, 2] with n = 2^k (power of two); r: [>=k, 2].
    Mirrors reference utils.cpp:789-802 (r truncated to log2(n)).
    """
    n = v.shape[0]
    k = int(np.log2(n))
    assert (1 << k) == n, "evaluate_vector needs power-of-two length"
    for i in range(k):
        v0, v1 = v[0::2], v[1::2]
        v = F.fadd(v0, F.fmul(r[i][None, :], F.fsub(v1, v0)))
    return v[0]


def fold_once(v, r_scalar):
    """One sumcheck fold: v'[j] = v[2j] + r*(v[2j+1]-v[2j])."""
    v0, v1 = v[0::2], v[1::2]
    return F.fadd(v0, F.fmul(r_scalar[None, :], F.fsub(v1, v0)))


def evaluate_matrix(M, r1, r2):
    """Bilinear evaluation of matrix M [rows, cols, 2] at (r_row=r2, r_col=r1).

    Matches reference evaluate_matrix (utils.cpp:777-787): r1 folds columns,
    r2 folds rows.
    """
    rows, cols = M.shape[0], M.shape[1]
    v = M.reshape(rows * cols, 2)
    # fold columns first: evaluate each row's MLE at r1
    kc = int(np.log2(cols))
    Mv = M
    for i in range(kc):
        v0, v1 = Mv[:, 0::2], Mv[:, 1::2]
        Mv = F.fadd(v0, F.fmul(r1[i][None, None, :], F.fsub(v1, v0)))
    row_evals = Mv[:, 0]
    return evaluate_vector(row_evals, r2)


@maybe_jit(static_argnums=(1,))
def powers(w, n: int):
    """[1, w, w^2, ..., w^(n-1)] via log-depth doubling; w scalar [2]."""
    assert n >= 1
    A = F.ones((1,))
    while A.shape[0] < n:
        step = F.fmul(A[-1], w)        # w^len
        A = jnp.concatenate([A, F.fmul(A, step[None, :])], axis=0)
    return A[:n]


@maybe_jit(static_argnums=(1,))
def powers_batch(w, n: int):
    """Per-row power tables: w [q, 2] -> [q, n, 2] with out[i, j] = w_i^j."""
    assert n >= 1
    q = w.shape[0]
    A = jnp.broadcast_to(F.ones((1,))[None], (q, 1, 2))
    while A.shape[1] < n:
        step = F.fmul(A[:, -1], w)     # w_i^len
        A = jnp.concatenate([A, F.fmul(A, step[:, None, :])], axis=1)
    return A[:, :n]


def batch_inv(x):
    """Vectorized field inversion (Fermat); x: [..., 2]."""
    return F.finv(x)


def lagrange_coeffs(omega, r, degree: int):
    """L_i(r) over the size-``degree`` multiplicative coset <omega>.

    L_i(r) = (r^degree - 1) * omega^i / (degree * (r - omega^i))
    (reference utils.cpp:228-250).
    """
    pows = powers(omega, degree)
    A = F.fsub(F.fpow(r, degree), F.scalar(1))
    denom = F.fmul(F.scalar(degree)[None, :], F.fsub(r[None, :], pows))
    return F.fmul(F.fmul(batch_inv(denom), A[None, :]), pows)


@maybe_jit
def convolution(tables):
    """Tensor product of vectors: out[i_0..i_k] = prod_j tables[j][i_j].

    tables: list of [n_j, 2]; result [prod n_j, 2] with tables[-1] fastest
    varying (reference compute_convolution, utils.cpp:149-179).
    """
    B = F.ones((1,))
    for t in tables:
        B = F.fmul(
            jnp.repeat(B, t.shape[0], axis=0),
            jnp.tile(t, (B.shape[0], 1)),
        )
    return B


def univariate_eval(coeffs, x):
    """Horner evaluation of coeffs[0] + coeffs[1] x + ... at scalar x."""
    acc = coeffs[-1]
    for i in range(coeffs.shape[0] - 2, -1, -1):
        acc = F.fadd(coeffs[i], F.fmul(acc, x))
    return acc


def eval_quadratic(c, x):
    """c = [3, 2] coefficients (a, b, c) of a x^2 + b x + c."""
    return F.fadd(F.fmul(F.fadd(F.fmul(c[0], x), c[1]), x), c[2])


def eval_cubic(c, x):
    return F.fadd(F.fmul(eval_quadratic(c[:3], x), x), c[3])


def eval_quartic(c, x):
    return F.fadd(F.fmul(eval_cubic(c[:4], x), x), c[4])


@maybe_jit
def to_coefficient_form_batch(v):
    """Moebius transform over the last-but-one axis, batched: [..., n, 2].

    One scanned butterfly stage (traced stride from iota bit tests)
    instead of k unrolled stages — see utils/closure.py for why lowered
    op count is the compile-cost currency on this platform."""
    import jax

    n = v.shape[-2]
    k = int(np.log2(n))
    if k == 0:
        return v
    i = jnp.arange(n, dtype=jnp.int32)

    def stage(v, j):
        stride = jnp.left_shift(jnp.int32(1), j)
        hi = (i & stride) > 0
        pv = jnp.take(v, i ^ stride, axis=-2)
        return jnp.where(hi[:, None], F.fsub(v, pv), v), None

    v, _ = jax.lax.scan(stage, v, jnp.arange(k, dtype=jnp.int32))
    return v


@maybe_jit
def to_coefficient_form(v):
    """Multilinear evaluations -> multilinear coefficients (Moebius).

    After this, v(r) = sum_S c_S prod_{j in S} r_j.  Inverse of evaluating
    on the boolean hypercube; bit j of the index corresponds to r[j].
    """
    return to_coefficient_form_batch(v)


@maybe_jit
def from_coefficient_form(c):
    """Inverse of to_coefficient_form."""
    n = c.shape[0]
    k = int(np.log2(n))
    for j in range(k):
        stride = 1 << j
        cc = c.reshape(-1, 2 * stride, 2)
        lo, hi = cc[:, :stride], cc[:, stride:]
        c = jnp.concatenate([lo, F.fadd(hi, lo)], axis=1).reshape(-1, 2)
    return c


def pad_pow2(v, value: int = 0):
    """Pad [n, 2] to the next power of two with the given constant."""
    n = v.shape[0]
    m = 1
    while m < n:
        m <<= 1
    if m == n:
        return v
    fill = jnp.zeros((m - n, 2), dtype=v.dtype)
    if value:
        fill = fill.at[:, 0].set(np.uint64(value))
    return jnp.concatenate([v, fill], axis=0)


__all__ = [
    "beta_table", "evaluate_vector", "fold_once", "evaluate_matrix",
    "powers", "batch_inv", "lagrange_coeffs", "convolution",
    "univariate_eval", "eval_quadratic", "eval_cubic", "eval_quartic",
    "to_coefficient_form", "from_coefficient_form", "pad_pow2",
]
