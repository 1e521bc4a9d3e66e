"""Sumcheck engine + multiplication-tree tests (prover/verifier round-trip)."""

import numpy as np

import jax.numpy as jnp

from hobbit_tpu.ops import field as F
from hobbit_tpu.ops import mimc, poly
from hobbit_tpu.core import mul_tree
from hobbit_tpu.core import sumcheck as sc

P = F.P
RNG = np.random.default_rng(99)


def rand_field(n):
    re = RNG.integers(0, P, size=n, dtype=np.uint64)
    im = RNG.integers(0, P, size=n, dtype=np.uint64)
    return jnp.stack([jnp.asarray(re), jnp.asarray(im)], axis=-1)


def test_2product_roundtrip():
    v1, v2 = rand_field(64), rand_field(64)
    claim = F.fdot(v1, v2)
    proof, _ = sc.prove_2product(v1, v2, mimc.fresh_state())
    ok, point, final, _ = sc.verify_product_sumcheck(
        proof, claim, mimc.fresh_state(), 2)
    assert bool(ok)
    # final evals are the MLEs at the challenge point
    np.testing.assert_array_equal(
        np.asarray(proof.final_evals[0]), np.asarray(poly.evaluate_vector(v1, point)))
    np.testing.assert_array_equal(
        np.asarray(proof.final_evals[1]), np.asarray(poly.evaluate_vector(v2, point)))


def test_2product_rejects_wrong_claim():
    v1, v2 = rand_field(32), rand_field(32)
    claim = F.fadd(F.fdot(v1, v2), F.scalar(1))
    proof, _ = sc.prove_2product(v1, v2, mimc.fresh_state())
    ok, _, _, _ = sc.verify_product_sumcheck(proof, claim, mimc.fresh_state(), 2)
    assert not bool(ok)


def test_3product_roundtrip():
    v1, v2, v3 = rand_field(128), rand_field(128), rand_field(128)
    claim = F.fsum(F.fmul(F.fmul(v1, v2), v3))
    proof, _ = sc.prove_3product(v1, v2, v3, mimc.fresh_state())
    ok, _, _, _ = sc.verify_product_sumcheck(proof, claim, mimc.fresh_state(), 3)
    assert bool(ok)


def test_4product_roundtrip():
    vs = [rand_field(32) for _ in range(4)]
    claim = F.fsum(F.fmul(F.fmul(vs[0], vs[1]), F.fmul(vs[2], vs[3])))
    proof, _ = sc.prove_4product(*vs, mimc.fresh_state())
    ok, _, _, _ = sc.verify_product_sumcheck(proof, claim, mimc.fresh_state(), 4)
    assert bool(ok)


def test_batch_3product_heterogeneous():
    lens = [32, 8, 32]
    v1s = [rand_field(n) for n in lens]
    v2s = [rand_field(n) for n in lens]
    v3s = [rand_field(n) for n in lens]
    state = mimc.fresh_state()
    state, ws = mimc.squeeze(state, 3)
    claim = None
    for j in range(3):
        t = F.fmul(ws[j], F.fsum(F.fmul(F.fmul(v1s[j], v2s[j]), v3s[j])))
        claim = t if claim is None else F.fadd(claim, t)
    proof, _ = sc.prove_3product_batch(v1s, v2s, v3s, ws, state)
    ok, _, _ = sc.verify_3product_batch(proof, claim, ws, lens, state)
    assert bool(ok)


def test_batch_3product_rejects_tamper():
    lens = [16, 16]
    v1s = [rand_field(n) for n in lens]
    v2s = [rand_field(n) for n in lens]
    v3s = [rand_field(n) for n in lens]
    state = mimc.fresh_state()
    state, ws = mimc.squeeze(state, 2)
    claim = None
    for j in range(2):
        t = F.fmul(ws[j], F.fsum(F.fmul(F.fmul(v1s[j], v2s[j]), v3s[j])))
        claim = t if claim is None else F.fadd(claim, t)
    proof, _ = sc.prove_3product_batch(v1s, v2s, v3s, ws, state)
    bad = proof._replace(polys=proof.polys.at[0, 3].set(
        np.asarray(F.fadd(proof.polys[0, 3], F.scalar(1)))))
    ok, _, _ = sc.verify_3product_batch(bad, claim, ws, lens, state)
    assert not bool(ok)


def test_mul_tree_roundtrip():
    vectors = [rand_field(16) for _ in range(4)]
    proof, _ = mul_tree.prove(vectors, mimc.fresh_state())
    # outputs are the true products
    for j, v in enumerate(vectors):
        want = np.asarray(F.fprod(v))
        np.testing.assert_array_equal(np.asarray(proof.output[j]), want)
    ok, point, _ = mul_tree.verify(proof, mimc.fresh_state())
    assert bool(ok)
    # partial evals match direct MLE evaluations of each vector
    ind_r = point[:4]
    for j, v in enumerate(vectors):
        np.testing.assert_array_equal(
            np.asarray(proof.partial_evals[j]),
            np.asarray(poly.evaluate_vector(v, ind_r)))


def test_mul_tree_uneven_batch():
    vectors = [rand_field(8) for _ in range(3)]   # pads batch to 4
    proof, _ = mul_tree.prove(vectors, mimc.fresh_state())
    ok, _, _ = mul_tree.verify(proof, mimc.fresh_state())
    assert bool(ok)
    np.testing.assert_array_equal(
        np.asarray(proof.output[3]), np.asarray(F.scalar(1)))


def test_mul_tree_rejects_tampered_output():
    vectors = [rand_field(8) for _ in range(2)]
    proof, _ = mul_tree.prove(vectors, mimc.fresh_state())
    bad = proof._replace(output=F.fadd(proof.output, F.scalar(1)[None, :]))
    ok, _, _ = mul_tree.verify(bad, mimc.fresh_state())
    assert not bool(ok)


def _rand_vec(rng, n):
    return jnp.asarray(
        rng.integers(0, F.P, size=(n, 2), dtype=np.uint64))


def test_chunked_big_rounds_transcript_identical(monkeypatch):
    """Rounds above _BIG_ROUND_LIMIT run as chunk-wise unrolled programs;
    the transcript (round polys, challenges, finals, sponge state) must be
    BIT-identical to the single-scan lowering."""
    import jax

    rng = np.random.default_rng(7)
    n, k = 1024, 2
    arrays = tuple(_rand_vec(rng, n) for _ in range(k))
    state0 = mimc.fresh_state()

    raw = sc._product_sumcheck_scan.__wrapped__
    monkeypatch.setattr(sc, "_BIG_ROUND_LIMIT", 1 << 20)
    plain, st_plain = jax.jit(raw)(arrays, state0)
    monkeypatch.setattr(sc, "_BIG_ROUND_LIMIT", 256)
    chunked, st_chunk = jax.jit(raw)(arrays, state0)

    assert np.array_equal(np.asarray(plain.polys), np.asarray(chunked.polys))
    assert np.array_equal(np.asarray(plain.challenges),
                          np.asarray(chunked.challenges))
    assert np.array_equal(np.asarray(plain.final_evals),
                          np.asarray(chunked.final_evals))
    assert np.array_equal(np.asarray(st_plain), np.asarray(st_chunk))


def test_chunked_big_rounds_padded_transcript_identical(monkeypatch):
    import jax

    rng = np.random.default_rng(8)
    N, k = 1024, 3
    raw = sc._product_sumcheck_scan_padded.__wrapped__
    state0 = mimc.fresh_state()
    for n_active in (16, 256, 1024):
        vecs = tuple(_rand_vec(rng, n_active) for _ in range(k))
        arrays = tuple(
            jnp.concatenate([v, jnp.zeros((N - n_active, 2), jnp.uint64)])
            for v in vecs)
        monkeypatch.setattr(sc, "_BIG_ROUND_LIMIT", 1 << 20)
        plain, st_plain = jax.jit(raw)(arrays, n_active, state0)
        monkeypatch.setattr(sc, "_BIG_ROUND_LIMIT", 256)
        chunked, st_chunk = jax.jit(raw)(arrays, n_active, state0)
        assert np.array_equal(np.asarray(plain.polys),
                              np.asarray(chunked.polys))
        assert np.array_equal(np.asarray(plain.challenges),
                              np.asarray(chunked.challenges))
        assert np.array_equal(np.asarray(plain.final_evals),
                              np.asarray(chunked.final_evals))
        assert np.array_equal(np.asarray(st_plain), np.asarray(st_chunk))
