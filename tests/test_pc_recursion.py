"""Tensor-PC recursion driver tests (RS + Spielman modes)."""

import numpy as np
import jax.numpy as jnp
import pytest

from hobbit_tpu.ops import field as F
from hobbit_tpu.ops import mimc, poly
from hobbit_tpu.pc import standard as pc


def _rand_field(rng, *shape):
    re = rng.integers(0, F.P, size=shape, dtype=np.uint64)
    im = rng.integers(0, F.P, size=shape, dtype=np.uint64)
    return jnp.stack([jnp.asarray(re), jnp.asarray(im)], axis=-1)


@pytest.mark.parametrize("linear_time", [False, True])
def test_recursive_open_roundtrip(linear_time):
    rng = np.random.default_rng(17)
    N, K, rows = 512, 4, 8
    msg = _rand_field(rng, N)
    params = pc.make_params(N, K, rows, linear_time=linear_time, queries=8)
    com = pc.commit(msg, params)
    x = _rand_field(rng, int(np.log2(N)))

    opening, _ = pc.open_recursive(msg, com, x, params, mimc.fresh_state(),
                                   sw_queries=8)
    # the claim is the true MLE evaluation
    assert bool(F.feq(opening.eval_claim, poly.evaluate_vector(msg, x)))

    ok, _ = pc.verify_recursive(com.root, x, opening, params,
                                mimc.fresh_state(), sw_queries=8)
    assert bool(ok)


def test_recursive_open_rejects_wrong_claim():
    rng = np.random.default_rng(23)
    N, K, rows = 512, 4, 8
    msg = _rand_field(rng, N)
    params = pc.make_params(N, K, rows, linear_time=False, queries=8)
    com = pc.commit(msg, params)
    x = _rand_field(rng, int(np.log2(N)))
    opening, _ = pc.open_recursive(msg, com, x, params, mimc.fresh_state(),
                                   sw_queries=8)
    bad = opening._replace(eval_claim=F.fadd(opening.eval_claim, F.scalar(1)))
    ok, _ = pc.verify_recursive(com.root, x, bad, params,
                                mimc.fresh_state(), sw_queries=8)
    assert not bool(ok)


def test_recursive_open_rejects_tampered_reply():
    rng = np.random.default_rng(29)
    N, K, rows = 512, 4, 8
    msg = _rand_field(rng, N)
    params = pc.make_params(N, K, rows, linear_time=False, queries=8)
    com = pc.commit(msg, params)
    x = _rand_field(rng, int(np.log2(N)))
    opening, _ = pc.open_recursive(msg, com, x, params, mimc.fresh_state(),
                                   sw_queries=8)
    bad = opening._replace(reply=opening.reply.at[0, 0, 0, 0].add(1))
    ok, _ = pc.verify_recursive(com.root, x, bad, params,
                                mimc.fresh_state(), sw_queries=8)
    assert not bool(ok)
