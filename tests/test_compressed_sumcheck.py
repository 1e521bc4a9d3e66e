"""Compressed-round streaming sumcheck tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from hobbit_tpu.core import compressed_sumcheck as cs
from hobbit_tpu.ops import field as F
from hobbit_tpu.ops import mimc, poly

pytestmark = pytest.mark.slow


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


@pytest.mark.parametrize("N,B,P", [(256, 64, 1), (512, 64, 2)])
def test_two_pass_pairs_roundtrip(N, B, P):
    """Two-pass fold+binding engine: correct claims, standard point."""
    rng = np.random.default_rng(41)
    vs = [_rf(rng, N) for _ in range(P)]
    hs = [_rf(rng, N) for _ in range(P)]
    pairs = [(lambda i, v=v: v[i * B:(i + 1) * B],
              lambda i, h=h: h[i * B:(i + 1) * B])
             for v, h in zip(vs, hs)]
    claim = None
    for v, h in zip(vs, hs):
        t = F.fsum(F.fmul(v, h))
        claim = t if claim is None else F.fadd(claim, t)

    proof, point, _ = cs.prove_pairs_two_pass(pairs, N, B,
                                              mimc.fresh_state())
    assert point.shape[0] == int(np.log2(N))
    ok, vpoint, finals, _ = cs.verify_pairs_two_pass(
        proof, claim, mimc.fresh_state())
    assert bool(ok)
    assert np.array_equal(np.asarray(vpoint), np.asarray(point))
    for p in range(P):
        assert bool(F.feq(finals[f"V{p}"],
                          poly.evaluate_vector(vs[p], vpoint)))
        assert bool(F.feq(finals[f"H{p}"],
                          poly.evaluate_vector(hs[p], vpoint)))


def test_two_pass_pairs_rejects_bad_claim():
    rng = np.random.default_rng(43)
    N, B = 256, 64
    v, h = _rf(rng, N), _rf(rng, N)
    pairs = [(lambda i: v[i * B:(i + 1) * B],
              lambda i: h[i * B:(i + 1) * B])]
    proof, _, _ = cs.prove_pairs_two_pass(pairs, N, B, mimc.fresh_state())
    bad = F.fadd(F.fsum(F.fmul(v, h)), F.scalar(1))
    ok, _, _, _ = cs.verify_pairs_two_pass(proof, bad, mimc.fresh_state())
    assert not bool(ok)


def test_two_pass_pass_count():
    """The engine touches each stream exactly twice (the reference's pass
    complexity) regardless of N/B."""
    rng = np.random.default_rng(44)
    N, B = 1024, 64                  # 16 chunks, 4 group-bits
    v, h = _rf(rng, N), _rf(rng, N)
    counts = {"v": 0, "h": 0}

    def vf(i):
        counts["v"] += 1
        return v[i * B:(i + 1) * B]

    def hf(i):
        counts["h"] += 1
        return h[i * B:(i + 1) * B]

    cs.prove_pairs_two_pass([(vf, hf)], N, B, mimc.fresh_state())
    K = N // B
    assert counts["v"] == 2 * K
    assert counts["h"] == 2 * K
