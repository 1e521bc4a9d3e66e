"""Streaming Elastic PC tests."""

import numpy as np

import jax.numpy as jnp

from hobbit_tpu.ops import field as F
from hobbit_tpu.ops import mimc, poly
from hobbit_tpu.pc import elastic
from hobbit_tpu.pc import standard as std
import pytest

pytestmark = pytest.mark.slow

P = F.P
RNG = np.random.default_rng(55)


def rand_field(n):
    re = RNG.integers(0, P, size=n, dtype=np.uint64)
    im = RNG.integers(0, P, size=n, dtype=np.uint64)
    return jnp.stack([jnp.asarray(re), jnp.asarray(im)], axis=-1)


def setup(linear_time=False):
    N, K, rows = 1 << 12, 4, 8
    params = std.make_params(N, K, rows, linear_time=linear_time, queries=16)
    msg = rand_field(N)
    chunks = msg.reshape(K, params.B, 2)
    return params, msg, lambda i: chunks[i]


def test_elastic_matches_standard_commit_root():
    # the streaming commit and the in-memory commit agree bit-exactly
    params, msg, chunk_fn = setup()
    com_s = elastic.commit_stream(chunk_fn, params)
    com_m = std.commit(msg, params)
    np.testing.assert_array_equal(np.asarray(com_s.root),
                                  np.asarray(com_m.root))


def test_elastic_roundtrip():
    params, msg, chunk_fn = setup()
    com = elastic.commit_stream(chunk_fn, params)
    x = rand_field(12)
    opening, _ = elastic.open_stream(chunk_fn, com, x, mimc.fresh_state())
    np.testing.assert_array_equal(
        np.asarray(opening.eval_claim),
        np.asarray(poly.evaluate_vector(msg, x)))
    ok, _ = elastic.verify(com.root, x, opening, params, mimc.fresh_state())
    assert ok


def test_elastic_zero_chunk_fast_path():
    N, K, rows = 1 << 12, 4, 8
    params = std.make_params(N, K, rows, queries=8)
    half = rand_field(N // 2)
    msg = jnp.concatenate([half, jnp.zeros((N // 2, 2), jnp.uint64)])
    chunks = msg.reshape(K, params.B, 2)
    com_fast = elastic.commit_stream(lambda i: chunks[i], params, zero_from=2)
    com_slow = elastic.commit_stream(lambda i: chunks[i], params)
    np.testing.assert_array_equal(np.asarray(com_fast.root),
                                  np.asarray(com_slow.root))


def test_elastic_rejects_tampered_reply():
    params, msg, chunk_fn = setup()
    com = elastic.commit_stream(chunk_fn, params)
    x = rand_field(12)
    opening, _ = elastic.open_stream(chunk_fn, com, x, mimc.fresh_state())
    bad = opening._replace(reply=opening.reply.at[0, 0, 0].set(
        np.asarray(F.fadd(opening.reply[0, 0, 0], F.scalar(1)))))
    ok, _ = elastic.verify(com.root, x, bad, params, mimc.fresh_state())
    assert not ok


def test_elastic_recursive_open_roundtrip():
    import numpy as np
    import jax.numpy as jnp
    from hobbit_tpu.ops import field as F
    from hobbit_tpu.ops import mimc, poly
    from hobbit_tpu.pc import elastic
    from hobbit_tpu.pc import standard as std

    rng = np.random.default_rng(31)
    N, K, rows = 512, 4, 8
    re = rng.integers(0, F.P, size=(N,), dtype=np.uint64)
    im = rng.integers(0, F.P, size=(N,), dtype=np.uint64)
    msg = jnp.stack([jnp.asarray(re), jnp.asarray(im)], axis=-1)
    params = std.make_params(N, K, rows, linear_time=True, queries=8)
    chunk_fn = lambda i: msg[i * params.B:(i + 1) * params.B]
    com = elastic.commit_stream(chunk_fn, params)
    xre = rng.integers(0, F.P, size=(9,), dtype=np.uint64)
    xim = rng.integers(0, F.P, size=(9,), dtype=np.uint64)
    x = jnp.stack([jnp.asarray(xre), jnp.asarray(xim)], axis=-1)

    op, _ = elastic.open_stream_recursive(chunk_fn, com, x,
                                          mimc.fresh_state(), sw_queries=8)
    assert bool(F.feq(op.eval_claim, poly.evaluate_vector(msg, x)))
    ok, _ = elastic.verify_recursive(com.root, x, op, params,
                                     mimc.fresh_state(), sw_queries=8)
    assert bool(ok)

    bad = op._replace(eval_claim=F.fadd(op.eval_claim, F.scalar(1)))
    okb, _ = elastic.verify_recursive(com.root, x, bad, params,
                                      mimc.fresh_state(), sw_queries=8)
    assert not bool(okb)


def _rand_point(rng, n):
    re = rng.integers(0, P, size=(n,), dtype=np.uint64)
    im = rng.integers(0, P, size=(n,), dtype=np.uint64)
    return jnp.stack([jnp.asarray(re), jnp.asarray(im)], axis=-1)


def _multi_rec_case(linear_time):
    rng = np.random.default_rng(77 + int(linear_time))
    N, K, rows = 1 << 10, 4, 8
    params = std.make_params(N, K, rows, linear_time=linear_time, queries=8)
    msg = rand_field(N)
    chunk_fn = lambda i: msg[i * params.B:(i + 1) * params.B]
    com = elastic.commit_stream(chunk_fn, params)
    points = [_rand_point(rng, 10) for _ in range(3)]
    lb = 8  # log2(B)
    extra = ((0, _rand_point(rng, lb)), (2, _rand_point(rng, lb)))

    op, _ = elastic.open_stream_multi_recursive(
        chunk_fn, com, points, mimc.fresh_state(), extra_points=extra,
        sw_queries=8)
    for p, x in enumerate(points):
        assert bool(F.feq(op.eval_claims[p], poly.evaluate_vector(msg, x)))
    ok, extra_evals, _ = elastic.verify_multi_recursive(
        com.root, points, op, params, mimc.fresh_state(),
        extra_points=extra, sw_queries=8)
    assert bool(ok)
    # the bound extra evals equal the aggregates' MLEs at the extra points
    beta0 = poly.beta_table(points[0][lb:])
    aggr0 = F.fsum(F.fmul(beta0[:, None, :], msg.reshape(K, params.B, 2)),
                   axis=0)
    want0 = poly.evaluate_vector(aggr0, extra[0][1])
    assert bool(F.feq(extra_evals[0], want0))
    beta2 = poly.beta_table(points[2][lb:])
    aggr2 = F.fsum(F.fmul(beta2[:, None, :], msg.reshape(K, params.B, 2)),
                   axis=0)
    want2 = poly.evaluate_vector(aggr2, extra[1][1])
    assert bool(F.feq(extra_evals[1], want2))

    # tamper: claim a wrong evaluation at point 1
    bad = op._replace(eval_claims=jnp.asarray(
        np.asarray(F.fadd(op.eval_claims, F.scalar(1)))))
    okb, _, _ = elastic.verify_multi_recursive(
        com.root, points, bad, params, mimc.fresh_state(),
        extra_points=extra, sw_queries=8)
    assert not bool(okb)

    # tamper: corrupt a query reply
    bad2 = op._replace(reply=op.reply.at[0, 0, 0].set(
        np.asarray(F.fadd(op.reply[0, 0, 0], F.scalar(1)))))
    okb2, _, _ = elastic.verify_multi_recursive(
        com.root, points, bad2, params, mimc.fresh_state(),
        extra_points=extra, sw_queries=8)
    assert not bool(okb2)


def test_elastic_multi_recursive_rs():
    _multi_rec_case(linear_time=False)


def test_elastic_multi_recursive_spielman():
    _multi_rec_case(linear_time=True)


def test_elastic_multi_recursive_single_point():
    # P = 1 degenerates to P2 = 1 (no point bits) and must still verify
    rng = np.random.default_rng(99)
    N, K, rows = 1 << 10, 4, 8
    params = std.make_params(N, K, rows, queries=8)
    msg = rand_field(N)
    chunk_fn = lambda i: msg[i * params.B:(i + 1) * params.B]
    com = elastic.commit_stream(chunk_fn, params)
    points = [_rand_point(rng, 10)]
    op, _ = elastic.open_stream_multi_recursive(
        chunk_fn, com, points, mimc.fresh_state(), sw_queries=8)
    ok, _, _ = elastic.verify_multi_recursive(
        com.root, points, op, params, mimc.fresh_state(), sw_queries=8)
    assert bool(ok)
    assert bool(F.feq(op.eval_claims[0], poly.evaluate_vector(msg,
                                                              points[0])))
