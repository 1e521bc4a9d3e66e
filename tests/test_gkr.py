"""GKR layered-circuit protocol tests."""

import numpy as np

import jax.numpy as jnp

from hobbit_tpu.gkr import layered, prover
from hobbit_tpu.ops import field as F
from hobbit_tpu.ops import mimc, poly
import pytest

pytestmark = pytest.mark.slow

P = F.P
RNG = np.random.default_rng(47)


def rand_field(n):
    re = RNG.integers(0, P, size=n, dtype=np.uint64)
    im = RNG.integers(0, P, size=n, dtype=np.uint64)
    return jnp.stack([jnp.asarray(re), jnp.asarray(im)], axis=-1)


def build_test_circuit():
    b = layered.LayeredBuilder(8)
    xs = [b.input_wire(i) for i in range(8)]
    # layer of pairwise products, then sums, then a final product
    prods = [b.mul(xs[2 * i], xs[2 * i + 1]) for i in range(4)]
    sums = [b.add(prods[0], prods[1]), b.add(prods[2], prods[3])]
    b.mul(sums[0], sums[1])
    return b


def test_layered_evaluate():
    b = build_test_circuit()
    circ = b.build()
    re = RNG.integers(0, P, size=8, dtype=np.uint64)
    x = jnp.stack([jnp.asarray(re), jnp.zeros(8, jnp.uint64)], axis=-1)
    vals = layered.evaluate(circ, b.make_inputs(x))
    p = [(int(re[2 * i]) * int(re[2 * i + 1])) % P for i in range(4)]
    want = ((p[0] + p[1]) % P) * ((p[2] + p[3]) % P) % P
    out = np.asarray(vals[-1])
    assert int(out[-1, 0]) == want


def test_gkr_roundtrip():
    b = build_test_circuit()
    circ = b.build()
    x = rand_field(8)
    inputs = b.make_inputs(x)
    proof, _ = prover.prove(circ, inputs, mimc.fresh_state())
    ok, W, claim, _ = prover.verify(proof, circ, mimc.fresh_state())
    assert bool(ok)
    # final claim must equal the weighted input combination
    want = F.fdot(W, inputs[: W.shape[0]])
    np.testing.assert_array_equal(np.asarray(claim), np.asarray(want))


def test_gkr_vpd_input_binding_roundtrip():
    """bind_input=True: the input vector is Virgo-VPD-committed and the
    final chained claim is checked against the two bound openings
    (reference prover_standard.cpp:661-775)."""
    b = build_test_circuit()
    circ = b.build()
    x = rand_field(8)
    inputs = b.make_inputs(x)
    proof, _ = prover.prove(circ, inputs, mimc.fresh_state(),
                            bind_input=True, vpd_queries=8)
    assert proof.input_root is not None and len(proof.input_opens) == 2
    ok, W, claim, _ = prover.verify(proof, circ, mimc.fresh_state(),
                                    vpd_queries=8)
    assert bool(ok)


def test_gkr_vpd_input_binding_rejects_tampered_eval():
    """Tampering the transmitted input_eval alone no longer fools anyone:
    the bound VPD openings pin the true claim."""
    b = build_test_circuit()
    circ = b.build()
    x = rand_field(8)
    inputs = b.make_inputs(x)
    proof, _ = prover.prove(circ, inputs, mimc.fresh_state(),
                            bind_input=True, vpd_queries=8)
    op_u, op_v = proof.input_opens
    bad_u = op_u._replace(eval_claim=F.fadd(op_u.eval_claim, F.scalar(1)))
    bad = proof._replace(input_opens=(bad_u, op_v))
    ok, _, _, _ = prover.verify(bad, circ, mimc.fresh_state(),
                                vpd_queries=8)
    assert not bool(ok)


def test_gkr_rejects_wrong_output():
    b = build_test_circuit()
    circ = b.build()
    x = rand_field(8)
    inputs = b.make_inputs(x)
    proof, _ = prover.prove(circ, inputs, mimc.fresh_state())
    bad = proof._replace(output=F.fadd(proof.output, F.scalar(1)[None, :]))
    ok, W, claim, _ = prover.verify(bad, circ, mimc.fresh_state())
    # either a round check fails or the final input check fails
    final_ok = bool(ok) and np.array_equal(
        np.asarray(claim), np.asarray(F.fdot(W, inputs[: W.shape[0]])))
    assert not final_ok


def test_gkr_deep_circuit():
    b = layered.LayeredBuilder(16)
    xs = [b.input_wire(i) for i in range(16)]
    cur = xs
    for _ in range(3):
        cur = [b.mul(cur[i], cur[(i + 1) % len(cur)])
               for i in range(len(cur))]
    b.sum_tree(cur)
    circ = b.build()
    x = rand_field(16)
    inputs = b.make_inputs(x)
    proof, _ = prover.prove(circ, inputs, mimc.fresh_state())
    ok, W, claim, _ = prover.verify(proof, circ, mimc.fresh_state())
    assert bool(ok)
    np.testing.assert_array_equal(
        np.asarray(claim), np.asarray(F.fdot(W, inputs[: W.shape[0]])))


def test_gkr_all_gate_types():
    """Reference gate-type parity (inputCircuit.hpp:13-15): every bilinear
    gate family proves and verifies through the two-phase GKR."""
    from hobbit_tpu.gkr import layered as L
    b = L.LayeredBuilder(4)
    x0, x1, x2, x3 = (b.input_wire(i) for i in range(4))
    s = b.sub(x0, x1)               # x0 - x1
    a = b.antisub(x0, x1)           # x1 - x0
    n = b.naab(x2, x3)              # (1-x2)*x3
    an = b.antinaab(x2, x3)         # x2*(1-x3)
    c1 = b.addc(x0, 7)              # x0 + 7
    c2 = b.mulc(x1, 5)              # 5*x1
    cp = b.copy(x2)
    nt = b.not_g(x3)
    xr = b.xor_g(x2, x3)
    t = b.sum_tree([s, a, n, an, c1, c2, cp, nt, xr])
    circ = b.build()

    rng = np.random.default_rng(5)
    raw = rng.integers(0, 2, size=4, dtype=np.uint64)   # booleans for xor
    raw[0] = 11
    raw[1] = 3
    x = b.make_inputs(F.make(raw, np.zeros_like(raw)))
    vals = L.evaluate(circ, x)
    # direct semantics check of the output gate
    def fe(v):
        return int(np.asarray(v)[0])
    want = ((11 - 3) + (3 - 11) + (1 - raw[2]) * raw[3]
            + raw[2] * (1 - raw[3]) + (11 + 7) + 5 * 3 + raw[2]
            + (1 - raw[3]) + (raw[2] ^ raw[3])) % F.P
    out = vals[-1]
    got = fe(out[np.argmax(np.asarray(out[:, 0]) >= 0)])  # single live gate?
    # find the sum-tree root: it is the last gate of the last layer
    assert fe(out[-1]) == want % F.P

    proof, _ = prover.prove(circ, x, mimc.fresh_state())
    ok, W, claim, _ = prover.verify(proof, circ, mimc.fresh_state())
    assert bool(ok)
    assert bool(F.feq(claim, F.fdot(W, x)))
