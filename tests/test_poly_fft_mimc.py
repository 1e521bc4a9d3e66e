"""Tests for MiMC, beta tables, multilinear eval, and the field FFT."""

import numpy as np

import jax.numpy as jnp

from hobbit_tpu.ops import field as F
from hobbit_tpu.ops import fft as FFT
from hobbit_tpu.ops import mimc, poly

P = F.P
RNG = np.random.default_rng(7)


def rand_field(n):
    re = RNG.integers(0, P, size=n, dtype=np.uint64)
    im = RNG.integers(0, P, size=n, dtype=np.uint64)
    return jnp.stack([jnp.asarray(re), jnp.asarray(im)], axis=-1)


# ------------------------------- MiMC --------------------------------------

def py_mimc(x, k):
    h = None
    for i in range(mimc.ROUNDS):
        if i == 0:
            t = ((x[0] + k[0]) % P, (x[1] + k[1]) % P)
        else:
            c = (i - 1, 0)
            t = ((h[0] + k[0] + c[0]) % P, (h[1] + k[1]) % P)
        h = F.py_fmul(F.py_fmul(t, t), t)
    return ((h[0] + k[0]) % P, (h[1] + k[1]) % P)


def test_mimc_matches_python():
    x, k = (123456789, 42), (987654321, 7)
    got = np.asarray(mimc.mimc_hash(F.scalar(*x), F.scalar(*k)))
    assert (int(got[0]), int(got[1])) == py_mimc(x, k)


def test_mimc_transcript_determinism():
    s = mimc.fresh_state()
    s = mimc.absorb(s, rand_field(5))
    s2 = mimc.fresh_state()
    s2 = mimc.absorb(s2, rand_field(5))  # different values -> different state
    _, r1 = mimc.squeeze(s, 3)
    _, r2 = mimc.squeeze(s, 3)
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
    assert not np.array_equal(np.asarray(s), np.asarray(s2))


# ---------------------------- beta / evaluate -------------------------------

def test_beta_table_matches_direct():
    r = rand_field(4)
    B = np.asarray(poly.beta_table(r))
    rn = np.asarray(r)
    for x in range(16):
        acc = (1, 0)
        for j in range(4):
            rj = (int(rn[j, 0]), int(rn[j, 1]))
            term = rj if (x >> j) & 1 else ((1 - rj[0]) % P, (P - rj[1]) % P)
            acc = F.py_fmul(acc, term)
        assert (int(B[x, 0]), int(B[x, 1])) == acc


def test_evaluate_vector_vs_beta_dot():
    v = rand_field(32)
    r = rand_field(5)
    ev = np.asarray(poly.evaluate_vector(v, r))
    B = poly.beta_table(r)
    dot = np.asarray(F.fdot(B, v))
    np.testing.assert_array_equal(ev, dot)


def test_evaluate_on_hypercube_point():
    v = rand_field(8)
    # r = (1, 0, 1) -> index 0b101 = 5
    r = F.make(np.array([1, 0, 1]), np.array([0, 0, 0]))
    ev = np.asarray(poly.evaluate_vector(v, r))
    np.testing.assert_array_equal(ev, np.asarray(v)[5])


def test_coefficient_form_roundtrip():
    v = rand_field(16)
    c = poly.to_coefficient_form(v)
    v2 = poly.from_coefficient_form(c)
    np.testing.assert_array_equal(np.asarray(v), np.asarray(v2))
    # coefficient eval == multilinear eval
    r = rand_field(4)
    ev = np.asarray(poly.evaluate_vector(v, r))
    # evaluate coefficient form directly: sum_S c_S prod_{j in S} r_j
    cn = np.asarray(c)
    rn = np.asarray(r)
    acc = (0, 0)
    for x in range(16):
        term = (int(cn[x, 0]), int(cn[x, 1]))
        for j in range(4):
            if (x >> j) & 1:
                term = F.py_fmul(term, (int(rn[j, 0]), int(rn[j, 1])))
        acc = ((acc[0] + term[0]) % P, (acc[1] + term[1]) % P)
    assert (int(ev[0]), int(ev[1])) == acc


def test_powers():
    w = F.scalar(3, 5)
    ps = np.asarray(poly.powers(w, 7))
    acc = (1, 0)
    for i in range(7):
        assert (int(ps[i, 0]), int(ps[i, 1])) == acc
        acc = F.py_fmul(acc, (3, 5))


def test_convolution():
    a, b = rand_field(2), rand_field(4)
    c = np.asarray(poly.convolution([a, b]))
    an, bn = np.asarray(a), np.asarray(b)
    for i in range(2):
        for j in range(4):
            want = F.py_fmul((int(an[i, 0]), int(an[i, 1])), (int(bn[j, 0]), int(bn[j, 1])))
            assert (int(c[i * 4 + j, 0]), int(c[i * 4 + j, 1])) == want


# --------------------------------- FFT --------------------------------------

def py_fft_naive(vals, inverse=False):
    n = len(vals)
    logn = n.bit_length() - 1
    w = F.root_of_unity(logn)
    if inverse:
        w = F.py_finv(w)
    out = []
    for i in range(n):
        acc = (0, 0)
        for j in range(n):
            t = F.py_fmul(vals[j], F.py_fpow(w, (i * j) % n))
            acc = ((acc[0] + t[0]) % P, (acc[1] + t[1]) % P)
        out.append(acc)
    if inverse:
        ninv = F.py_finv((n, 0))
        out = [F.py_fmul(x, ninv) for x in out]
    return out


def test_fft_matches_naive_dft():
    v = rand_field(16)
    got = np.asarray(FFT.fft(v))
    vals = [(int(x[0]), int(x[1])) for x in np.asarray(v)]
    want = py_fft_naive(vals)
    for i in range(16):
        assert (int(got[i, 0]), int(got[i, 1])) == want[i]


def test_fft_ifft_roundtrip():
    v = rand_field(256)
    back = FFT.ifft(FFT.fft(v))
    np.testing.assert_array_equal(np.asarray(v), np.asarray(back))


def test_rs_extend_agrees_on_subdomain():
    # The 2n-domain evaluations restricted to even positions must equal the
    # original n-domain evaluations (w_{2n}^2 = w_n).
    rows = rand_field(2 * 8).reshape(2, 8, 2)
    ext = FFT.rs_extend(rows)  # [2, 16, 2]
    np.testing.assert_array_equal(np.asarray(ext)[:, 0::2], np.asarray(rows))


def test_lagrange_coeffs_interpolate():
    # sum_i L_i(r) * f(w^i) == f(r) for a low-degree f
    deg = 8
    w = F.make(*F.root_of_unity(3))
    r = rand_field(1)[0]
    # f(x) = 3 + 5x + 7x^2
    def f(x):
        return F.fadd(F.scalar(3), F.fadd(F.fmul(F.scalar(5), x),
                                          F.fmul(F.scalar(7), F.fmul(x, x))))
    pows = poly.powers(w, deg)
    evals = jnp.stack([f(pows[i]) for i in range(deg)])
    L = poly.lagrange_coeffs(w, r, deg)
    got = np.asarray(F.fdot(L, evals))
    want = np.asarray(f(r))
    np.testing.assert_array_equal(got, want)


def test_fft_matrix_sumcheck():
    import numpy as np
    import jax.numpy as jnp
    from hobbit_tpu.core import fft_sumcheck as fsc
    from hobbit_tpu.ops import fft as fftm
    from hobbit_tpu.ops import field as F, mimc, poly

    rng = np.random.default_rng(4)
    m, c = 4, 8
    re = rng.integers(0, F.P, size=(m, c), dtype=np.uint64)
    im = rng.integers(0, F.P, size=(m, c), dtype=np.uint64)
    M = jnp.stack([jnp.asarray(re), jnp.asarray(im)], axis=-1)
    rre = rng.integers(0, F.P, size=(4 + 2,), dtype=np.uint64)
    rim = rng.integers(0, F.P, size=(4 + 2,), dtype=np.uint64)
    r = jnp.stack([jnp.asarray(rre), jnp.asarray(rim)], axis=-1)

    # true claim: MLE of the row-FFT'd matrix at (r_col, r_row)
    pad = jnp.concatenate([M, jnp.zeros((m, c, 2), jnp.uint64)], axis=1)
    rows_fft = jnp.stack([fftm.fft(pad[i]) for i in range(m)])
    want = poly.evaluate_vector(rows_fft.reshape(-1, 2), r)

    proof, claim, _ = fsc.prove_fft_matrix(M, r, mimc.fresh_state())
    assert bool(F.feq(claim, want))
    ok, full_pt, mat_eval, _ = fsc.verify_fft_matrix(proof, r, claim,
                                                     mimc.fresh_state(), m)
    assert bool(ok)
    # matrix_eval binds M~ at (full_pt)
    Mflat = M.reshape(-1, 2)
    assert bool(F.feq(mat_eval, poly.evaluate_vector(Mflat, full_pt)))


def test_mimc_hash_segments_chain():
    """Segment boundaries compose back to the full hash (mimc.cpp:68-88):
    the last segment equals mimc_hash, and each inner boundary state
    continues correctly when the remaining rounds are replayed from it."""
    x, k = F.scalar(987654321), F.scalar(mimc.K_MIMC)
    full = np.asarray(mimc.mimc_hash(x, k))
    for parts in (2, 4, 8):
        segs = np.asarray(mimc.mimc_hash_segments(x, k, parts))
        assert segs.shape == (parts, 2)
        assert np.array_equal(segs[-1], full)
        # replay rounds per*j..160 from segment j-1's recorded state
        per = 160 // parts
        h = jnp.asarray(segs[0])
        for i in range(per, 161):
            c = F.scalar(i - 1)
            h = F.fmul(F.fmul(F.fadd(F.fadd(h, k), c),
                              F.fadd(F.fadd(h, k), c)),
                       F.fadd(F.fadd(h, k), c))
        assert np.array_equal(np.asarray(F.fadd(h, k)), full)


def test_mimc_hash_segments_distinct_from_partial():
    x, k = F.scalar(5), F.scalar(7)
    segs = np.asarray(mimc.mimc_hash_segments(x, k, 4))
    assert len({tuple(s) for s in segs}) == 4


def test_mimc_expand_counter_mode():
    """expand = one squeeze + parallel counter-mode MiMC: deterministic,
    prefix-consistent, distinct from sequential squeeze."""
    st = mimc.fresh_state()
    s1, a = mimc.expand(st, 8)
    s2, b = mimc.expand(st, 8)
    assert np.array_equal(np.asarray(a), np.asarray(b))
    assert np.array_equal(np.asarray(s1), np.asarray(s2))
    _, c = mimc.expand(st, 4)
    assert np.array_equal(np.asarray(a)[:4], np.asarray(c))
    # the state advances exactly one squeeze
    s3, _ = mimc.squeeze1(st)
    assert np.array_equal(np.asarray(s1), np.asarray(s3))
    # outputs differ from each other
    flat = {tuple(v) for v in np.asarray(a)}
    assert len(flat) == 8


def test_fft_four_step_matches_radix2():
    for logn in (5, 9):
        v = rand_field(1 << logn)
        assert np.array_equal(np.asarray(FFT.fft(v)),
                              np.asarray(FFT.fft_four_step(v)))
        assert np.array_equal(np.asarray(FFT.ifft(v)),
                              np.asarray(FFT.fft_four_step(v, True)))
