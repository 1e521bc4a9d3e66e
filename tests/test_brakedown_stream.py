"""Streaming Brakedown elastic variant (reference test_Elastic_PC option 3,
Elastic_PC.cpp:112-173, 561-623, 784-808)."""

import numpy as np
import jax.numpy as jnp

from hobbit_tpu.ops import field as F
from hobbit_tpu.ops import mimc, poly
from hobbit_tpu.pc import brakedown as bd

RNG = np.random.default_rng(99)


def rand_field(n):
    re = RNG.integers(0, F.P, size=n, dtype=np.uint64)
    im = RNG.integers(0, F.P, size=n, dtype=np.uint64)
    return jnp.stack([jnp.asarray(re), jnp.asarray(im)], axis=-1)


def setup():
    N, B = 1 << 10, 1 << 7                       # K = 8 chunks
    params = bd.BrakedownStreamParams(N=N, B=B, queries=30)
    msg = rand_field(N)
    chunks = msg.reshape(params.K, B, 2)
    return params, msg, lambda i: chunks[i]


def test_brakedown_stream_roundtrip():
    params, msg, chunk_fn = setup()
    com = bd.commit_brakedown_stream(chunk_fn, params)
    x = rand_field(10)
    opening, _ = bd.open_brakedown_stream(chunk_fn, com, x,
                                          mimc.fresh_state())
    np.testing.assert_array_equal(
        np.asarray(opening.eval_claim),
        np.asarray(poly.evaluate_vector(msg, x)))
    ok, _ = bd.verify_brakedown_stream(com.root, x, opening, params,
                                       mimc.fresh_state())
    assert ok


def test_brakedown_stream_rejects_tampered_reply():
    params, msg, chunk_fn = setup()
    com = bd.commit_brakedown_stream(chunk_fn, params)
    x = rand_field(10)
    opening, _ = bd.open_brakedown_stream(chunk_fn, com, x,
                                          mimc.fresh_state())
    bad = opening._replace(
        reply=opening.reply.at[0, 0, 0].set(opening.reply[0, 0, 0] ^ 1))
    ok, _ = bd.verify_brakedown_stream(com.root, x, bad, params,
                                       mimc.fresh_state())
    assert not ok


def test_brakedown_stream_rejects_wrong_aggregate():
    # consistent (aggr, eval_claim) for a DIFFERENT polynomial still fails
    # the column linearity check against the committed stream
    params, msg, chunk_fn = setup()
    com = bd.commit_brakedown_stream(chunk_fn, params)
    x = rand_field(10)
    opening, _ = bd.open_brakedown_stream(chunk_fn, com, x,
                                          mimc.fresh_state())
    fake_aggr = rand_field(params.B)
    bad = opening._replace(
        aggr=fake_aggr,
        eval_claim=poly.evaluate_vector(fake_aggr, x[:7]))
    ok, _ = bd.verify_brakedown_stream(com.root, x, bad, params,
                                       mimc.fresh_state())
    assert not ok


def test_brakedown_stream_requires_4_chunks():
    import pytest
    with pytest.raises(ValueError):
        bd.commit_brakedown_stream(
            lambda i: None, bd.BrakedownStreamParams(N=1 << 8, B=1 << 7))
