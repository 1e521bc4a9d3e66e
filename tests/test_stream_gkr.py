"""Streaming GKR layer prover (compressed-round engine) tests."""

import numpy as np
import jax.numpy as jnp

from hobbit_tpu.core import compressed_sumcheck as cs
from hobbit_tpu.gkr import dsl, layered, stream_prover as sp
from hobbit_tpu.ops import field as F
from hobbit_tpu.ops import mimc, poly
import pytest

pytestmark = pytest.mark.slow


def _rf(rng, *shape):
    re = rng.integers(0, F.P, size=shape, dtype=np.uint64)
    im = rng.integers(0, F.P, size=shape, dtype=np.uint64)
    return jnp.stack([jnp.asarray(re), jnp.asarray(im)], axis=-1)


def test_stream_layer_matches_direct():
    rng = np.random.default_rng(4)
    ckt, b = dsl.test_circuit(6, 3)           # 64 inputs, depth 3
    x = _rf(rng, ckt.input_size)
    vals = layered.evaluate(ckt, x)
    i = ckt.depth - 1                          # top layer
    m = len(ckt.layers[i].types)
    W = poly.beta_table(_rf(rng, int(np.ceil(np.log2(max(2, m))))))[:m]

    # direct claim: sum_u V(u) G1(u) + sum_u G2(u)
    o = sp.LayerOracle(ckt, x, i, W)
    claim = F.fadd(F.fdot(o._V, o._G1), F.fsum(o._G2))

    B, c = 16, 2
    proof, gr, tp, _ = sp.prove_layer(ckt, x, i, W, B, c,
                                      mimc.fresh_state())
    ok, vgr, vtp, fe, _ = sp.verify_layer(proof, claim, mimc.fresh_state())
    assert bool(ok)

    # generalized-point binding of every final claim
    Wv = cs.weight_vector(vgr, vtp, c, o.n)
    assert bool(F.feq(fe["V0"], F.fdot(Wv, o._V)))
    assert bool(F.feq(fe["H0"], F.fdot(Wv, o._G1)))
    assert bool(F.feq(fe["V1"], F.fdot(Wv, o._G2)))

    # wrong claim rejected
    okb, *_ = sp.verify_layer(proof, F.fadd(claim, F.scalar(1)),
                              mimc.fresh_state())
    assert not bool(okb)


def test_stream_circuit_full_chain():
    """Full streaming GKR circuit driver (prove_circuit(F) analog,
    prover.cpp:1674-1808): chained phase-1/phase-2 claims across every
    layer on the compressed-round engine."""
    from hobbit_tpu.gkr import stream_circuit as scirc

    rng = np.random.default_rng(9)
    ckt, b = dsl.test_circuit(6, 4)
    x = _rf(rng, ckt.input_size)

    proof, _ = scirc.prove_circuit(ckt, x, mimc.fresh_state(), B=16, c=2)
    ok, W, claim, _ = scirc.verify_circuit(proof, ckt, mimc.fresh_state(),
                                           B=16, c=2)
    assert bool(ok)
    # input binding: claim == <W, inputs>
    assert bool(F.feq(claim, F.fdot(W, x)))

    # tamper: corrupt the phase-1 transcript -> reject (engine-agnostic)
    lp0 = proof.layer_proofs[0]
    if hasattr(lp0.p1, "k2"):            # two-pass engine
        bad_p1 = lp0.p1._replace(k2=lp0.p1.k2.at[0, 0].add(np.uint64(1)))
        bad = proof._replace(layer_proofs=(
            lp0._replace(p1=bad_p1),) + proof.layer_proofs[1:])
    elif lp0.p1.round_evals:             # coset engine
        re0 = lp0.p1.round_evals[0].at[0, 0].add(np.uint64(1))
        bad_p1 = lp0.p1._replace(round_evals=(re0,) + lp0.p1.round_evals[1:])
        bad = proof._replace(layer_proofs=(
            lp0._replace(p1=bad_p1),) + proof.layer_proofs[1:])
    else:
        bad = proof._replace(input_eval=F.fadd(proof.input_eval,
                                               F.scalar(1)))
    okb, _, _, _ = scirc.verify_circuit(bad, ckt, mimc.fresh_state(),
                                        B=16, c=2)
    assert not bool(okb)


def test_stream_circuit_all_gates():
    """Streaming driver over the full gate-type family."""
    from hobbit_tpu.gkr import stream_circuit as scirc
    from hobbit_tpu.gkr import layered as L

    b = L.LayeredBuilder(4)
    x0, x1, x2, x3 = (b.input_wire(i) for i in range(4))
    t = b.sum_tree([b.sub(x0, x1), b.naab(x2, x3), b.xor_g(x2, x3),
                    b.addc(x0, 3), b.mulc(x1, 9), b.not_g(x3)])
    ckt = b.build()
    raw = np.array([7, 2, 1, 0], dtype=np.uint64)
    x = b.make_inputs(F.make(raw, np.zeros_like(raw)))

    proof, _ = scirc.prove_circuit(ckt, x, mimc.fresh_state(), B=8, c=1)
    ok, W, claim, _ = scirc.verify_circuit(proof, ckt, mimc.fresh_state(),
                                           B=8, c=1)
    assert bool(ok)
    assert bool(F.feq(claim, F.fdot(W, x)))
