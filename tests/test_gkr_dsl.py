"""Circuit DSL tests: parse, matmul generator, GKR round trips."""

import numpy as np

import jax.numpy as jnp

from hobbit_tpu.gkr import dsl, layered, prover
from hobbit_tpu.ops import field as F
from hobbit_tpu.ops import mimc
import pytest

pytestmark = pytest.mark.slow

P = F.P
RNG = np.random.default_rng(71)


def real_field(n):
    re = RNG.integers(0, P, size=n, dtype=np.uint64)
    return jnp.stack([jnp.asarray(re), jnp.zeros(n, jnp.uint64)], axis=-1)


def test_dsl_parse_and_eval():
    circ, meta = dsl.parse(
        "P V4 = V0 + V1 E\n"
        "P V5 = V2 * V3 E\n"
        "P V6 = V4 * V5 E\n", num_inputs=4)
    b = meta["builder"]
    x = real_field(4)
    vals = layered.evaluate(circ, b.make_inputs(x))
    xn = np.asarray(x)[:, 0]
    want = ((int(xn[0]) + int(xn[1])) % P) * \
        ((int(xn[2]) * int(xn[3])) % P) % P
    lw = meta["wires"][6]
    got = int(np.asarray(vals[lw[0]])[lw[1], 0])
    assert got == want


def test_matmul_circuit_and_gkr():
    n = 2
    circ, b = dsl.matmul_circuit(n)
    x = real_field(2 * n * n)
    inputs = b.make_inputs(x)
    vals = layered.evaluate(circ, inputs)
    xn = np.asarray(x)[:, 0].astype(object)
    A = xn[: n * n].reshape(n, n)
    B = xn[n * n:].reshape(n, n)
    C = (A @ B) % P
    out = np.asarray(vals[-1])[:, 0]
    # outputs appear in row-major emission order at the last layer
    np.testing.assert_array_equal(out.astype(object), C.reshape(-1))

    proof, _ = prover.prove(circ, inputs, mimc.fresh_state())
    ok, W, claim, _ = prover.verify(proof, circ, mimc.fresh_state())
    assert bool(ok)
    np.testing.assert_array_equal(
        np.asarray(claim),
        np.asarray(F.fdot(W, inputs[: W.shape[0]])))


def test_generated_test_circuit_gkr():
    circ, b = dsl.test_circuit(3, 3)
    x = real_field(8)
    inputs = b.make_inputs(x)
    proof, _ = prover.prove(circ, inputs, mimc.fresh_state())
    ok, W, claim, _ = prover.verify(proof, circ, mimc.fresh_state())
    assert bool(ok)
