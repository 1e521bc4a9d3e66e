"""Sparse-matrix evaluation argument (GKR_standard.cpp:179 analog)."""

import numpy as np

import jax.numpy as jnp

from hobbit_tpu.gkr import matrix_eval as me
from hobbit_tpu.ops import field as F
from hobbit_tpu.ops import mimc, poly
import pytest

pytestmark = pytest.mark.slow


def _rand_field(rng, *shape):
    re = rng.integers(0, F.P, size=shape, dtype=np.uint64)
    im = rng.integers(0, F.P, size=shape, dtype=np.uint64)
    return jnp.stack([jnp.asarray(re), jnp.asarray(im)], axis=-1)


def _dense_eval(rows, cols, vals, r1, r2):
    b1 = poly.beta_table(r1)
    b2 = poly.beta_table(r2)
    total = F.scalar(0)
    for r, c, v in zip(rows, cols, np.asarray(vals)):
        total = F.fadd(total, F.fmul(jnp.asarray(v),
                                     F.fmul(b1[int(r)], b2[int(c)])))
    return total


def test_matrix_eval_roundtrip():
    rng = np.random.default_rng(11)
    M, lb1, lb2 = 8, 3, 2
    rows = rng.integers(0, 1 << lb1, M)
    cols = rng.integers(0, 1 << lb2, M)
    vals = np.asarray(_rand_field(rng, M))
    r1 = _rand_field(rng, lb1)
    r2 = _rand_field(rng, lb2)

    proof, inputs, _ = me.prove(rows, cols, vals, r1, r2,
                                mimc.fresh_state())
    ok, ev, Wt, claim, _ = me.verify(proof, r1, r2, mimc.fresh_state())
    assert bool(ok)
    # the proven evaluation equals the direct sparse evaluation
    expect = _dense_eval(rows, cols, vals, r1, r2)
    assert bool(F.feq(ev, expect))
    # the GKR input claim binds the actual input vector
    z = jnp.zeros((1, 2), dtype=jnp.uint64)
    padded = jnp.concatenate([inputs, z], axis=0)
    direct = F.fdot(Wt, padded[: Wt.shape[0]])
    assert bool(F.feq(direct, claim))


def test_matrix_eval_rejects_wrong_value():
    rng = np.random.default_rng(12)
    M, lb1, lb2 = 4, 2, 2
    rows = rng.integers(0, 1 << lb1, M)
    cols = rng.integers(0, 1 << lb2, M)
    vals = np.asarray(_rand_field(rng, M))
    r1 = _rand_field(rng, lb1)
    r2 = _rand_field(rng, lb2)

    layout = me.build_circuit(M, 1 << lb1, 1 << lb2)
    state = mimc.fresh_state()
    state2, ab = mimc.squeeze(state, 2)
    inputs = me.make_inputs(layout, rows, cols, vals, r1, r2, ab[0], ab[1])
    # tamper: claim a different beta value for entry 0's row read
    off_rw = 5 * M + (1 << lb1) + (1 << lb2)
    bad = np.asarray(inputs).copy()
    bad[off_rw] = (np.uint64(123), np.uint64(45))
    from hobbit_tpu.gkr import prover as gkr
    z = jnp.zeros((1, 2), dtype=jnp.uint64)
    gp, _ = gkr.prove(layout.circuit,
                      jnp.concatenate([jnp.asarray(bad), z], axis=0),
                      state2)
    proof = me.MatrixEvalProof(gkr_proof=gp, M=M, b1=1 << lb1,
                               b2=1 << lb2)
    ok, ev, _, _, _ = me.verify(proof, r1, r2, mimc.fresh_state())
    # the memory-check permutation identity must fail
    assert not bool(ok)
