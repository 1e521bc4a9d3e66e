"""Virgo VPD + univariate FRI tests."""

import numpy as np
import jax.numpy as jnp

from hobbit_tpu.ops import field as F
from hobbit_tpu.ops import mimc, poly
from hobbit_tpu.pc import virgo
import pytest

pytestmark = pytest.mark.slow


def _rf(rng, *shape):
    re = rng.integers(0, F.P, size=shape, dtype=np.uint64)
    im = rng.integers(0, F.P, size=shape, dtype=np.uint64)
    return jnp.stack([jnp.asarray(re), jnp.asarray(im)], axis=-1)


def test_chi_table():
    rng = np.random.default_rng(1)
    x = _rf(rng, 3)
    chi = virgo.chi_table(x)
    # chi_5 = x0 * x2 (bits 101)
    want = F.fmul(x[0], x[2])
    assert bool(F.feq(chi[5], want))
    assert bool(F.feq(chi[0], F.scalar(1)))


def test_fri_roundtrip():
    rng = np.random.default_rng(2)
    n = 64
    coeffs = _rf(rng, n)
    cw = virgo.coset_eval(coeffs, int(np.log2(n)) + virgo.RATE_BITS)
    tree = virgo.commit_codeword(cw)

    state = mimc.fresh_state()
    proof, _ = virgo.fri_prove(cw, state, queries=8)

    # caller-authenticated level-0 pairs
    half0 = cw.shape[0] // 2
    lid = list(proof.query_idx)
    pairs = virgo._pair_leaves(cw)[jnp.asarray(lid, jnp.int32)][:, :2]
    ok, _ = virgo.verify_fri(pairs, proof, int(np.log2(cw.shape[0])),
                             mimc.fresh_state(), queries=8)
    assert bool(ok)

    # tampered final polynomial -> reject
    bad = proof._replace(final_coeffs=proof.final_coeffs.at[0, 0].add(1))
    okb, _ = virgo.verify_fri(pairs, bad, int(np.log2(cw.shape[0])),
                              mimc.fresh_state(), queries=8)
    assert not bool(okb)


def test_vpd_roundtrip():
    rng = np.random.default_rng(3)
    n = 64
    coeffs = _rf(rng, n)
    com = virgo.vpd_commit(coeffs)
    x = _rf(rng, int(np.log2(n)))

    opening, _ = virgo.vpd_open(coeffs, com, x, mimc.fresh_state(),
                                queries=8)
    want = F.fdot(coeffs, virgo.chi_table(x))
    assert bool(F.feq(opening.eval_claim, want))

    ok, _ = virgo.vpd_verify(com.root, x, opening, n, mimc.fresh_state(),
                             queries=8)
    assert bool(ok)

    bad = opening._replace(eval_claim=F.fadd(opening.eval_claim,
                                             F.scalar(1)))
    okb, _ = virgo.vpd_verify(com.root, x, bad, n, mimc.fresh_state(),
                              queries=8)
    assert not bool(okb)


def test_vpd_degree_shift_forgery_rejected():
    """Soundness regression: without an individual deg(p) <= n-2 bound a
    prover can shift p' = p + d*X^(n-1), q' = q - d and claim
    y' = y - n*d (the identity still balances).  The alpha^3 * (X p) term
    in the FRI RLC must reject this (X p' has degree n)."""
    from hobbit_tpu.ops import fft as fftm
    from hobbit_tpu.ops import merkle

    rng = np.random.default_rng(7)
    n = 64
    ln = int(np.log2(n))
    dl = ln + virgo.RATE_BITS
    coeffs = _rf(rng, n)
    com = virgo.vpd_commit(coeffs)
    x = _rf(rng, ln)

    # --- forging prover: replay vpd_open with perturbed (q, p, y) ---------
    chi = virgo.chi_table(x)
    y = F.fdot(coeffs, chi)
    u_coeffs = fftm.ifft(coeffs)
    g_coeffs = fftm.ifft(chi)
    big = 1 << (ln + 1)
    ue = fftm.fft(jnp.concatenate(
        [u_coeffs, jnp.zeros((big - n, 2), jnp.uint64)]))
    ge = fftm.fft(jnp.concatenate(
        [g_coeffs, jnp.zeros((big - n, 2), jnp.uint64)]))
    m_coeffs = fftm.ifft(F.fmul(ue, ge))
    q_c, r_c = virgo._decompose(m_coeffs, n)
    p_c = r_c[1:]

    d = F.scalar(5)
    q_c = q_c.at[0].set(np.asarray(F.fsub(q_c[0], d)))
    p_c = jnp.concatenate(
        [p_c, jnp.zeros((n - 1 - p_c.shape[0], 2), jnp.uint64)]) \
        if p_c.shape[0] < n - 1 else p_c[: n - 1]
    p_c = p_c.at[n - 2].set(np.asarray(F.fadd(p_c[n - 2], d)))
    y_f = F.fsub(y, F.fmul(F.scalar(n), d))

    q_cw = virgo.coset_eval(q_c, dl)
    p_cw = virgo.coset_eval(p_c, dl)
    q_tree = virgo.commit_codeword(q_cw)
    p_tree = virgo.commit_codeword(p_cw)

    state = mimc.fresh_state()
    state = mimc.absorb(state, y_f)
    state = mimc.absorb(state, q_tree.root.astype(jnp.uint64).reshape(4, 2))
    state = mimc.absorb(state, p_tree.root.astype(jnp.uint64).reshape(4, 2))
    state, alpha = mimc.squeeze1(state)
    a2 = F.fmul(alpha, alpha)
    a3 = F.fmul(a2, alpha)
    dom = virgo._domain_points(dl)
    w_cw = F.fadd(F.fadd(com.u_cw, F.fmul(alpha[None, :], q_cw)),
                  F.fadd(F.fmul(a2[None, :], p_cw),
                         F.fmul(a3[None, :], F.fmul(dom, p_cw))))
    fri, state = virgo.fri_prove(w_cw, state, queries=8)

    lid = [int(v) for v in np.asarray(fri.query_idx, dtype=np.int64)]
    opening = virgo.VpdOpening(
        eval_claim=y_f, q_root=q_tree.root, p_root=p_tree.root, fri=fri,
        u_pairs=virgo._pair_leaves(com.u_cw)[jnp.asarray(lid, jnp.int32)],
        u_paths=merkle.open_leaves(com.tree, lid),
        q_pairs=virgo._pair_leaves(q_cw)[jnp.asarray(lid, jnp.int32)],
        q_paths=merkle.open_leaves(q_tree, lid),
        p_pairs=virgo._pair_leaves(p_cw)[jnp.asarray(lid, jnp.int32)],
        p_paths=merkle.open_leaves(p_tree, lid),
    )
    ok, _ = virgo.vpd_verify(com.root, x, opening, n, mimc.fresh_state(),
                             queries=8)
    assert not bool(ok)
