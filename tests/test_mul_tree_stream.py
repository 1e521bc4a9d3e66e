"""Streaming multiplication-tree argument tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from hobbit_tpu.core import mul_tree_stream as mts
from hobbit_tpu.ops import field as F
from hobbit_tpu.ops import mimc, poly

pytestmark = pytest.mark.slow


def _rand_vec(rng, n):
    re = rng.integers(1, F.P, size=(n,), dtype=np.uint64)
    im = rng.integers(0, F.P, size=(n,), dtype=np.uint64)
    return jnp.stack([jnp.asarray(re), jnp.asarray(im)], axis=-1)


def _products(flat, vectors, size):
    out = []
    for i in range(vectors):
        out.append(F.fprod(flat[i * size:(i + 1) * size]))
    return jnp.stack(out)


@pytest.mark.parametrize("vectors,size,B", [(4, 64, 16), (2, 256, 32)])
def test_stream_mul_tree_roundtrip(vectors, size, B):
    rng = np.random.default_rng(7)
    flat = _rand_vec(rng, vectors * size)
    oracle = mts.flat_oracle(flat)

    proof, point, claim, _ = mts.prove(oracle, vectors, size,
                                       mimc.fresh_state(), B)
    assert proof.num_layers == int(np.log2(vectors * size // (2 * B)))

    # claimed outputs == direct products
    want = _products(flat, vectors, size)
    assert bool(jnp.all(F.feq(proof.output, want)))

    ok, vpoint, vclaim, _ = mts.verify(proof, mimc.fresh_state())
    assert bool(ok)
    assert bool(jnp.all(vpoint == point))
    # the final claim must equal the raw stream's MLE at the final point
    direct = poly.evaluate_vector(flat, point)
    assert bool(F.feq(claim, direct))
    assert bool(F.feq(vclaim, claim))


def test_stream_mul_tree_in_memory_path():
    rng = np.random.default_rng(3)
    vectors, size, B = 4, 16, 64     # total = 64 <= 2B -> in-memory
    flat = _rand_vec(rng, vectors * size)
    proof, point, claim, _ = mts.prove(mts.flat_oracle(flat), vectors, size,
                                       mimc.fresh_state(), B)
    assert proof.num_layers == 0
    want = _products(flat, vectors, size)
    assert bool(jnp.all(F.feq(proof.output, want)))
    ok, _, vclaim, _ = mts.verify(proof, mimc.fresh_state())
    assert bool(ok)
    assert bool(F.feq(claim, poly.evaluate_vector(flat, point)))


def test_stream_mul_tree_layer_commits():
    rng = np.random.default_rng(11)
    vectors, size, B = 2, 256, 16     # layers = log2(512/32) = 4
    flat = _rand_vec(rng, vectors * size)
    oracle = mts.flat_oracle(flat)
    proof, point, claim, _ = mts.prove(oracle, vectors, size,
                                       mimc.fresh_state(), B,
                                       commit_layers=True)
    assert len(proof.layer_roots) == proof.num_layers - 1
    ok, _, vclaim, _ = mts.verify(proof, mimc.fresh_state())
    assert bool(ok)
    assert bool(F.feq(vclaim, poly.evaluate_vector(flat, point)))


def test_stream_mul_tree_tamper_rejected():
    rng = np.random.default_rng(5)
    vectors, size, B = 4, 64, 16
    flat = _rand_vec(rng, vectors * size)
    proof, _, _, _ = mts.prove(mts.flat_oracle(flat), vectors, size,
                               mimc.fresh_state(), B)
    bad_pc = proof.level_proofs[0].per_chunk.at[0, 1].set(
        F.scalar(12345))
    bad_level = proof.level_proofs[0]._replace(per_chunk=bad_pc)
    bad = proof._replace(level_proofs=(bad_level,) + proof.level_proofs[1:])
    ok, _, _, _ = mts.verify(bad, mimc.fresh_state())
    assert not bool(ok)


def test_batched_levels_descent():
    """Distance-batched bottom levels: every batch proves its current
    level in the same streaming pass; final claims bind to the stream."""
    rng = np.random.default_rng(13)
    vectors, size, B = 2, 512, 8      # total 1024, layers = log2(1024/16)=6
    distance = 3                       # 2 batches of 3 levels
    flat = _rand_vec(rng, vectors * size)
    oracle = mts.flat_oracle(flat)
    total = vectors * size
    layers = int(np.log2(total // (2 * B)))
    assert layers == 6

    # top in-memory tree over level `layers`
    from hobbit_tpu.core import mul_tree
    top_stream = mts._read_top(oracle, layers, total, B)
    rows = [top_stream[i * (top_stream.shape[0] // vectors):
                       (i + 1) * (top_stream.shape[0] // vectors)]
            for i in range(vectors)]
    top, state = mul_tree.prove(rows, mimc.fresh_state())

    proof, pts, cls, _ = mts.prove_batched_levels(
        oracle, total, layers, distance, top.final_point, state, B)
    # the coarsest batch's streamed claim equals the top proof's final eval
    assert bool(F.feq(proof.claims0[-1], top.final_eval))

    vtop, vstate = mul_tree.prove(rows, mimc.fresh_state())  # replay state
    ok, vpts, vcls, _ = mts.verify_batched_levels(
        proof, total, top.final_point, vstate)
    assert bool(ok)
    # final claims: batch 0 on the raw stream, batch 1 on level `distance`
    got0 = poly.evaluate_vector(flat, vpts[0])
    assert bool(F.feq(vcls[0], got0))
    lvl_d = mts.flat_oracle(flat)(distance, 0, total >> distance)
    got1 = poly.evaluate_vector(lvl_d, vpts[1])
    assert bool(F.feq(vcls[1], got1))


def test_batched_driver_roundtrip():
    """prove_batched/verify_batched: distance-batched descent with
    Elastic-committed batch boundaries, same contract as the plain driver."""
    rng = np.random.default_rng(29)
    vectors, size, B = 2, 1024, 16      # total 2048, layers = 6
    distance = 2                        # 3 batches; boundaries at lvls 2, 4
    flat = _rand_vec(rng, vectors * size)
    oracle = mts.flat_oracle(flat)

    proof, point, claim, _ = mts.prove_batched(
        oracle, vectors, size, mimc.fresh_state(), B, distance,
        pc_rows=4, pc_queries=8)
    assert isinstance(proof, mts.BatchedMulTreeProof)
    assert len(proof.boundary_roots) == 2

    want = _products(flat, vectors, size)
    assert bool(jnp.all(F.feq(proof.output, want)))

    ok, vpoint, vclaim, _ = mts.verify_batched(
        proof, mimc.fresh_state(), pc_rows=4, pc_queries=8)
    assert bool(ok)
    # batch 0's final claim binds the raw stream
    assert bool(F.feq(vclaim, poly.evaluate_vector(flat, vpoint)))
    assert np.array_equal(np.asarray(vpoint), np.asarray(point))


def test_batched_driver_dispatches_plain():
    """distance=0 (or too-shallow trees) falls back to the plain driver."""
    rng = np.random.default_rng(31)
    flat = _rand_vec(rng, 256)
    oracle = mts.flat_oracle(flat)
    proof, _, _, _ = mts.prove_batched(oracle, 2, 128, mimc.fresh_state(),
                                       16, 0)
    assert isinstance(proof, mts.StreamMulTreeProof)
    ok, _, _, _ = mts.verify_batched(proof, mimc.fresh_state())
    assert bool(ok)


def test_batched_driver_rejects_tampered_boundary():
    rng = np.random.default_rng(37)
    vectors, size, B = 2, 1024, 16
    flat = _rand_vec(rng, vectors * size)
    oracle = mts.flat_oracle(flat)
    proof, _, _, _ = mts.prove_batched(
        oracle, vectors, size, mimc.fresh_state(), B, 2,
        pc_rows=4, pc_queries=8)
    # tamper a streamed batch-top claim
    bad = proof._replace(batched=proof.batched._replace(
        claims0=proof.batched.claims0.at[0, 0].add(np.uint64(1))))
    ok, _, _, _ = mts.verify_batched(bad, mimc.fresh_state(),
                                     pc_rows=4, pc_queries=8)
    assert not bool(ok)
    # tamper a boundary root
    bad = proof._replace(boundary_roots=(
        proof.boundary_roots[0].at[0].add(np.uint32(1)),
        proof.boundary_roots[1]))
    ok, _, _, _ = mts.verify_batched(bad, mimc.fresh_state(),
                                     pc_rows=4, pc_queries=8)
    assert not bool(ok)


def test_batched_driver_degrades_distance():
    """A distance that does not divide the level count degrades to the
    largest divisor (driver passes the reference's 5 unconditionally)."""
    rng = np.random.default_rng(33)
    vectors, size, B = 2, 1024, 16      # total 2048, layers = 6
    flat = _rand_vec(rng, vectors * size)
    oracle = mts.flat_oracle(flat)
    # 5 does not divide 6 -> degrade to 3 (2 batches)
    proof, point, claim, _ = mts.prove_batched(
        oracle, vectors, size, mimc.fresh_state(), B, 5,
        pc_rows=4, pc_queries=8)
    assert isinstance(proof, mts.BatchedMulTreeProof)
    assert proof.distance == 3
    ok, vpoint, vclaim, _ = mts.verify_batched(
        proof, mimc.fresh_state(), pc_rows=4, pc_queries=8)
    assert bool(ok)
    assert bool(F.feq(vclaim, poly.evaluate_vector(flat, vpoint)))
