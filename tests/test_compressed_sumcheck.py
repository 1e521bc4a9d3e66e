"""Compressed-round streaming sumcheck tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from hobbit_tpu.core import compressed_sumcheck as cs
from hobbit_tpu.ops import field as F
from hobbit_tpu.ops import mimc


def _rf(rng, *shape):
    re = rng.integers(0, F.P, size=shape, dtype=np.uint64)
    im = rng.integers(0, F.P, size=shape, dtype=np.uint64)
    return jnp.stack([jnp.asarray(re), jnp.asarray(im)], axis=-1)


@pytest.mark.parametrize("N,B,c", [(256, 64, 1), (256, 32, 2), (512, 64, 3)])
def test_compressed_roundtrip(N, B, c):
    rng = np.random.default_rng(N + c)
    V = _rf(rng, N)
    H = _rf(rng, N)
    claim = F.fdot(V, H)

    vchunk = lambda i: V[i * B:(i + 1) * B]
    hchunk = lambda i: H[i * B:(i + 1) * B]
    proof, gr, tail_pt, state = cs.prove(vchunk, hchunk, N, B, c,
                                         mimc.fresh_state())

    ok, vgr, vtail, (Ve, He), _ = cs.verify(proof, claim,
                                            mimc.fresh_state())
    assert bool(ok)
    assert bool(jnp.all(vgr == gr))

    # generalized-point binding: V_eval == <W, V>
    W = cs.weight_vector(vgr, vtail, c, N)
    assert bool(F.feq(Ve, F.fdot(W, V)))
    assert bool(F.feq(He, F.fdot(W, H)))


def test_compressed_rejects_wrong_claim():
    rng = np.random.default_rng(0)
    N, B, c = 256, 64, 2
    V, H = _rf(rng, N), _rf(rng, N)
    claim = F.fadd(F.fdot(V, H), F.scalar(1))
    proof, _, _, _ = cs.prove(lambda i: V[i*B:(i+1)*B],
                              lambda i: H[i*B:(i+1)*B], N, B, c,
                              mimc.fresh_state())
    ok, *_ = cs.verify(proof, claim, mimc.fresh_state())
    assert not bool(ok)
