"""WHIR (sumcheck-FRI) PC tests."""

import numpy as np

import jax.numpy as jnp

from hobbit_tpu.ops import field as F
from hobbit_tpu.ops import mimc, poly
from hobbit_tpu.pc import whir
import pytest

pytestmark = pytest.mark.slow

P = F.P
RNG = np.random.default_rng(21)


def rand_field(n):
    re = RNG.integers(0, P, size=n, dtype=np.uint64)
    im = RNG.integers(0, P, size=n, dtype=np.uint64)
    return jnp.stack([jnp.asarray(re), jnp.asarray(im)], axis=-1)


def test_whir_roundtrip_two_levels():
    n = 1 << 10  # two folding iterations (1024 -> 64)
    vals = rand_field(n)
    com = whir.commit(vals)
    x = rand_field(10)
    proof, y, _ = whir.prove(com, vals, x, mimc.fresh_state(), queries=8)
    np.testing.assert_array_equal(
        np.asarray(y), np.asarray(poly.evaluate_vector(vals, x)))
    ok, _ = whir.verify(com.root, proof, x, y, mimc.fresh_state(), queries=8)
    assert ok


def test_whir_rejects_wrong_eval():
    n = 1 << 9
    vals = rand_field(n)
    com = whir.commit(vals)
    x = rand_field(9)
    proof, y, _ = whir.prove(com, vals, x, mimc.fresh_state(), queries=6)
    bad_y = F.fadd(y, F.scalar(1))
    ok, _ = whir.verify(com.root, proof, x, bad_y, mimc.fresh_state(),
                        queries=6)
    assert not ok


def test_whir_rejects_tampered_final():
    n = 1 << 9
    vals = rand_field(n)
    com = whir.commit(vals)
    x = rand_field(9)
    proof, y, _ = whir.prove(com, vals, x, mimc.fresh_state(), queries=6)
    bad = proof._replace(final_poly=proof.final_poly.at[0].set(
        np.asarray(F.fadd(proof.final_poly[0], F.scalar(1)))))
    ok, _ = whir.verify(com.root, proof, x, y, mimc.fresh_state(), queries=6)
    assert ok
    ok2, _ = whir.verify(com.root, bad, x, y, mimc.fresh_state(), queries=6)
    assert not ok2


def test_whir_rejects_tampered_coset():
    n = 1 << 9
    vals = rand_field(n)
    com = whir.commit(vals)
    x = rand_field(9)
    proof, y, _ = whir.prove(com, vals, x, mimc.fresh_state(), queries=6)
    lvl = proof.levels[0]
    bad_lvl = lvl._replace(cosets=lvl.cosets.at[0, 0].set(
        np.asarray(F.fadd(lvl.cosets[0, 0], F.scalar(1)))))
    bad = proof._replace(levels=(bad_lvl,) + proof.levels[1:])
    ok, _ = whir.verify(com.root, bad, x, y, mimc.fresh_state(), queries=6)
    assert not ok


def test_whir_batch_roundtrip_and_tamper():
    """Instance-batched WHIR: per-instance transcript branches, one
    query transfer per level; roundtrip + per-instance tamper."""
    I, n, bits = 3, 1 << 9, 9
    vals = rand_field((I, n))
    xs = rand_field((I, bits))
    coeffs = jnp.stack([poly.to_coefficient_form(vals[i]) for i in range(I)])
    _, tree = whir._batch_encode(coeffs)
    state = mimc.absorb(mimc.fresh_state(), tree.roots.astype(jnp.uint64))
    proof, ys, _ = whir.prove_batch(vals, xs, state, queries=6)
    for i in range(I):
        assert bool(F.feq(ys[i], F.fdot(vals[i], poly.beta_table(xs[i]))))
    ok, _ = whir.verify_batch(tree.roots, proof, xs, ys, state, queries=6)
    assert bool(ok)
    bad = ys.at[1].set(F.fadd(ys[1], F.scalar(1)))
    okb, _ = whir.verify_batch(tree.roots, proof, xs, bad, state, queries=6)
    assert not bool(okb)
    lv = proof.levels[0]
    tam = proof._replace(levels=(lv._replace(
        cosets=lv.cosets.at[2, 0, 0].set(F.scalar(9))),) + proof.levels[1:])
    okc, _ = whir.verify_batch(tree.roots, tam, xs, ys, state, queries=6)
    assert not bool(okc)


def test_whir_rejects_tampered_ood_eval():
    # out-of-domain binding (Virgo.cpp:560-651): a forged zeta-evaluation
    # must break the RLC-merged constraint
    n = 1 << 10
    vals = rand_field(n)
    com = whir.commit(vals)
    x = rand_field(10)
    proof, y, _ = whir.prove(com, vals, x, mimc.fresh_state(), queries=8)
    lvl0 = proof.levels[0]
    bad_lvl = lvl0._replace(
        ood_eval=F.fadd(lvl0.ood_eval, F.scalar(1)))
    bad = proof._replace(levels=(bad_lvl,) + proof.levels[1:])
    ok, _ = whir.verify(com.root, bad, x, y, mimc.fresh_state(), queries=8)
    assert not ok


def test_whir_batch_rejects_tampered_ood_eval():
    I, n, bits = 3, 1 << 9, 9
    vals = rand_field((I, n))
    xs = rand_field((I, bits))
    coeffs = jnp.stack([poly.to_coefficient_form(vals[i]) for i in range(I)])
    _, tree = whir._batch_encode(coeffs)
    state = mimc.absorb(mimc.fresh_state(), tree.roots.astype(jnp.uint64))
    proof, ys, _ = whir.prove_batch(vals, xs, state, queries=6)
    ok, _ = whir.verify_batch(tree.roots, proof, xs, ys, state, queries=6)
    assert bool(ok)
    lvl0 = proof.levels[0]
    bad_lvl = lvl0._replace(
        ood_evals=lvl0.ood_evals.at[1, 0].set(lvl0.ood_evals[1, 0] ^ 1))
    bad = proof._replace(levels=(bad_lvl,) + proof.levels[1:])
    okb, _ = whir.verify_batch(tree.roots, bad, xs, ys, state, queries=6)
    assert not bool(okb)
