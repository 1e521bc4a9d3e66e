"""End-to-end tensor-code PC: commit -> open -> verify round trip."""

import numpy as np

import jax.numpy as jnp

from hobbit_tpu.ops import field as F
from hobbit_tpu.ops import mimc, poly
from hobbit_tpu.pc import standard as pc
import pytest

pytestmark = pytest.mark.slow

P = F.P
RNG = np.random.default_rng(77)


def rand_field(n):
    re = RNG.integers(0, P, size=n, dtype=np.uint64)
    im = RNG.integers(0, P, size=n, dtype=np.uint64)
    return jnp.stack([jnp.asarray(re), jnp.asarray(im)], axis=-1)


def run_roundtrip(linear_time):
    N, K, rows = 1 << 12, 4, 32 if linear_time else 8
    params = pc.make_params(N, K, rows, linear_time=linear_time, queries=20)
    msg = rand_field(N)
    com = pc.commit(msg, params)
    x = rand_field(12)
    opening, _ = pc.open(msg, com, x, params, mimc.fresh_state())
    # claimed eval == direct MLE evaluation of the full message
    direct = poly.evaluate_vector(msg, x)
    np.testing.assert_array_equal(
        np.asarray(opening.eval_claim), np.asarray(direct))
    ok, _ = pc.verify(com.root, x, opening, params, mimc.fresh_state())
    assert ok
    return msg, com, x, opening, params


def test_pc_rs_roundtrip():
    run_roundtrip(linear_time=False)


def test_pc_spielman_roundtrip():
    run_roundtrip(linear_time=True)


def test_pc_rejects_wrong_eval():
    msg, com, x, opening, params = run_roundtrip(False)
    bad = opening._replace(eval_claim=F.fadd(opening.eval_claim, F.scalar(1)))
    ok, _ = pc.verify(com.root, x, bad, params, mimc.fresh_state())
    assert not ok


def test_pc_rejects_tampered_aggr():
    msg, com, x, opening, params = run_roundtrip(False)
    bad_aggr = opening.aggr.at[0].set(np.asarray(F.fadd(opening.aggr[0],
                                                        F.scalar(1))))
    # fix up the eval claim so only consistency checks can catch it
    x_lo = x[: int(np.log2(params.B))]
    bad = opening._replace(aggr=bad_aggr,
                           eval_claim=poly.evaluate_vector(bad_aggr, x_lo))
    ok, _ = pc.verify(com.root, x, bad, params, mimc.fresh_state())
    assert not ok


def test_pc_rejects_tampered_reply():
    msg, com, x, opening, params = run_roundtrip(False)
    bad_reply = opening.reply.at[0, 0, 0].set(
        np.asarray(F.fadd(opening.reply[0, 0, 0], F.scalar(1))))
    bad = opening._replace(reply=bad_reply)
    ok, _ = pc.verify(com.root, x, bad, params, mimc.fresh_state())
    assert not ok


def test_proof_size_accounting():
    _, _, _, opening, params = run_roundtrip(False)
    kb = pc.proof_size_kb(opening, params)
    assert kb > 0
