"""Streaming GKR layer prover (compressed-round engine) tests."""

import numpy as np
import jax.numpy as jnp

from hobbit_tpu.core import compressed_sumcheck as cs
from hobbit_tpu.gkr import dsl, layered, stream_prover as sp
from hobbit_tpu.ops import field as F
from hobbit_tpu.ops import mimc, poly


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
