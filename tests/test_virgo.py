"""Virgo VPD + univariate FRI tests."""

import numpy as np
import jax.numpy as jnp

from hobbit_tpu.ops import field as F
from hobbit_tpu.ops import mimc, poly
from hobbit_tpu.pc import virgo


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
