"""Streaming fold-phase gate-consistency protocol tests."""

import numpy as np

import jax.numpy as jnp

from hobbit_tpu.core import gate_consistency as gc
from hobbit_tpu.models import circuits as C
from hobbit_tpu.ops import field as F
from hobbit_tpu.ops import mimc, poly
from hobbit_tpu.streams import trace as trc
from hobbit_tpu.streams import views
import pytest

pytestmark = pytest.mark.slow


def make_chunks(program, inputs, B):
    oracle = trc.TraceOracle(program, inputs)
    n = oracle.num_gates
    K = max(2, 1 << int(np.ceil(np.log2(max(1, (n + B - 1) // B)))))
    chunks = [views.gate_arrays(c) for c in oracle.gate_chunks(B)]
    empty = views.gate_arrays(next(iter(
        trc.TraceOracle(program, inputs).gate_chunks(B))))
    zero_ga = views.GateArrays(
        L=jnp.zeros((B, 2), jnp.uint64), R=jnp.zeros((B, 2), jnp.uint64),
        O=jnp.zeros((B, 2), jnp.uint64),
        sel_add=jnp.zeros((B, 2), jnp.uint64),
        sel_mul=jnp.zeros((B, 2), jnp.uint64))
    while len(chunks) < K:
        chunks.append(zero_ga)
    return chunks, K


def full_arrays(chunks):
    return {
        "L": jnp.concatenate([c.L for c in chunks]),
        "R": jnp.concatenate([c.R for c in chunks]),
        "O": jnp.concatenate([c.O for c in chunks]),
        "sa": jnp.concatenate([c.sel_add for c in chunks]),
        "sm": jnp.concatenate([c.sel_mul for c in chunks]),
    }


def run(program, inputs, B):
    chunks, K = make_chunks(program, inputs, B)
    n_total = K * B
    state = mimc.fresh_state()
    state, r = mimc.squeeze(state, int(np.log2(n_total)))
    proof, _ = gc.prove(lambda i: chunks[i], K, B, r, state)
    res, _ = gc.verify(proof, B, r, state)
    return chunks, r, proof, res


def test_gate_consistency_accepts_and_binds():
    prog = C.fun1_arbitrary(4, 6)
    x = C.fun1_inputs(prog.num_inputs)
    chunks, r, proof, res = run(prog, x, B=32)
    assert bool(res.ok)
    # stream evals match the direct MLEs of the concatenated streams
    full = full_arrays(chunks)
    for a in ("L", "R", "O", "sa", "sm"):
        want = poly.evaluate_vector(full[a], res.point)
        np.testing.assert_array_equal(
            np.asarray(res.stream_evals[a]), np.asarray(want))


def test_gate_consistency_rejects_bad_trace():
    prog = C.fun1_arbitrary(4, 6)
    x = C.fun1_inputs(prog.num_inputs)
    oracle = trc.TraceOracle(prog, x)
    tr = oracle.trace()
    # corrupt one output value -> the add/mul relation breaks
    bad = tr._replace(val_o=tr.val_o.at[5].set(
        np.asarray(F.fadd(tr.val_o[5], F.scalar(3)))))
    B = 32
    n = bad.num_gates
    K = max(2, 1 << int(np.ceil(np.log2((n + B - 1) // B))))
    slices = [trc._slice_pad(bad, s, min(s + B, n), B)
              for s in range(0, n, B)]
    chunks = [views.gate_arrays(s) for s in slices]
    zero = views.GateArrays(*(jnp.zeros((B, 2), jnp.uint64) for _ in range(5)))
    while len(chunks) < K:
        chunks.append(zero)
    state = mimc.fresh_state()
    state, r = mimc.squeeze(state, int(np.log2(K * B)))
    proof, _ = gc.prove(lambda i: chunks[i], K, B, r, state)
    res, _ = gc.verify(proof, B, r, state)
    assert not bool(res.ok)


def test_gate_consistency_lookup_circuit():
    # lookup gates must be transparent to the relation
    prog = C.fun2_range_proof_lookup(4)
    x = C.fun2_inputs(4)
    chunks, r, proof, res = run(prog, x, B=16)
    assert bool(res.ok)
