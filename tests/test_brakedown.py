"""Brakedown / BrakingBase PC + linear-code proof tests."""

import numpy as np

import jax.numpy as jnp

from hobbit_tpu.core import linear_code as lc
from hobbit_tpu.ops import encode as enc
from hobbit_tpu.ops import expanders
from hobbit_tpu.ops import field as F
from hobbit_tpu.ops import mimc, poly
from hobbit_tpu.pc import brakedown as bd
import pytest

pytestmark = pytest.mark.slow

P = F.P
RNG = np.random.default_rng(61)


def rand_field(n):
    re = RNG.integers(0, P, size=n, dtype=np.uint64)
    im = RNG.integers(0, P, size=n, dtype=np.uint64)
    return jnp.stack([jnp.asarray(re), jnp.asarray(im)], axis=-1)


def test_encode_transpose_adjoint():
    # <encode(x), y> == <x, encode^T(y)>
    code = expanders.build_code(64)
    x = rand_field(64)
    y = rand_field(code.codeword_len)
    lhs = F.fdot(expanders.encode(code, x), y)
    rhs = F.fdot(x, expanders.encode_transpose(code, y))
    np.testing.assert_array_equal(np.asarray(lhs), np.asarray(rhs))


def test_linear_code_proof_roundtrip():
    code = expanders.build_code(64)
    msg = rand_field(64)
    cw = enc.spielman_encode_padded(code, msg)   # padded to 128
    state = mimc.fresh_state()
    state, rho = mimc.squeeze(state, 7)
    claim_direct = poly.evaluate_vector(cw, rho)
    proof, claim, _ = lc.prove(code, msg, rho, state)
    np.testing.assert_array_equal(np.asarray(claim), np.asarray(claim_direct))
    ok, pt, msg_eval, _ = lc.verify(proof, code, rho, claim, state)
    assert bool(ok)
    np.testing.assert_array_equal(
        np.asarray(msg_eval), np.asarray(poly.evaluate_vector(msg, pt)))


def test_brakedown_roundtrip():
    N, rows = 1 << 10, 8
    params = bd.BrakedownParams(N=N, rows=rows, queries=16)
    msg = rand_field(N)
    com = bd.commit(msg, params)
    x = rand_field(10)
    opening, _ = bd.open(msg, com, x, params, mimc.fresh_state())
    np.testing.assert_array_equal(
        np.asarray(opening.eval_claim),
        np.asarray(poly.evaluate_vector(msg, x)))
    ok, _ = bd.verify(com.root, x, opening, params, com.code,
                      mimc.fresh_state())
    assert ok


def test_brakedown_rejects_tamper():
    N, rows = 1 << 9, 8
    params = bd.BrakedownParams(N=N, rows=rows, queries=12)
    msg = rand_field(N)
    com = bd.commit(msg, params)
    x = rand_field(9)
    opening, _ = bd.open(msg, com, x, params, mimc.fresh_state())
    bad = opening._replace(aggr=opening.aggr.at[0].set(
        np.asarray(F.fadd(opening.aggr[0], F.scalar(1)))))
    ok, _ = bd.verify(com.root, x, bad, params, com.code, mimc.fresh_state())
    assert not ok


def test_brakingbase_roundtrip():
    N, rows = 1 << 10, 8
    params = bd.BrakedownParams(N=N, rows=rows, queries=10)
    msg = rand_field(N)
    com = bd.commit(msg, params)
    x = rand_field(10)
    opening, _ = bd.open_brakingbase(msg, com, x, params,
                                     mimc.fresh_state(), sw_queries=8)
    np.testing.assert_array_equal(
        np.asarray(opening.eval_claim),
        np.asarray(poly.evaluate_vector(msg, x)))
    ok, _ = bd.verify_brakingbase(com.root, x, opening, params, com.code,
                                  mimc.fresh_state(), sw_queries=8)
    assert ok


def test_brakingbase_rejects_bad_eval():
    N, rows = 1 << 9, 8
    params = bd.BrakedownParams(N=N, rows=rows, queries=8)
    msg = rand_field(N)
    com = bd.commit(msg, params)
    x = rand_field(9)
    opening, _ = bd.open_brakingbase(msg, com, x, params,
                                     mimc.fresh_state(), sw_queries=6)
    bad = opening._replace(eval_claim=F.fadd(opening.eval_claim, F.scalar(1)))
    ok, _ = bd.verify_brakingbase(com.root, x, bad, params, com.code,
                                  mimc.fresh_state(), sw_queries=6)
    assert not ok
