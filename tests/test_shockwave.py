"""Shockwave PC + FFT-relation sumcheck tests."""

import numpy as np

import jax.numpy as jnp

from hobbit_tpu.core import fft_sumcheck as fsc
from hobbit_tpu.ops import fft as FFT
from hobbit_tpu.ops import field as F
from hobbit_tpu.ops import mimc, poly
from hobbit_tpu.pc import shockwave as sw
import pytest

pytestmark = pytest.mark.slow

P = F.P
RNG = np.random.default_rng(13)


def rand_field(n):
    re = RNG.integers(0, P, size=n, dtype=np.uint64)
    im = RNG.integers(0, P, size=n, dtype=np.uint64)
    return jnp.stack([jnp.asarray(re), jnp.asarray(im)], axis=-1)


def test_phi_vector_is_fft_row():
    r = rand_field(4)
    phi = fsc.phi_vector(r)
    # phi~(x) should satisfy: codeword MLE at r == <message, phi>
    msg = rand_field(8)
    padded = jnp.concatenate([msg, jnp.zeros((8, 2), jnp.uint64)])
    codeword = FFT.fft(padded)
    lhs = poly.evaluate_vector(codeword, r)
    rhs = F.fdot(padded, phi)
    np.testing.assert_array_equal(np.asarray(lhs), np.asarray(rhs))


def test_fft_sumcheck_roundtrip():
    msg = rand_field(16)
    state = mimc.fresh_state()
    state, r = mimc.squeeze(state, 5)  # 32-point domain
    proof, claim, _ = fsc.prove_fft(msg, r, state)
    ok, point, msg_eval, _ = fsc.verify_fft(proof, r, claim, state)
    assert bool(ok)
    padded = jnp.concatenate([msg, jnp.zeros((16, 2), jnp.uint64)])
    np.testing.assert_array_equal(
        np.asarray(msg_eval),
        np.asarray(poly.evaluate_vector(padded, point)))


def test_shockwave_roundtrip():
    N, k = 256, 8
    msg = rand_field(N)
    data = sw.commit(msg, k)
    x = rand_field(8)
    opening, _ = sw.open(data, x, mimc.fresh_state(), queries=12)
    # claimed evaluation matches the direct MLE
    np.testing.assert_array_equal(
        np.asarray(opening.eval_claim),
        np.asarray(poly.evaluate_vector(msg, x)))
    ok, _ = sw.verify(data.outer.root, opening, x, k, N,
                      mimc.fresh_state(), queries=12)
    assert ok


def test_shockwave_rejects_bad_eval():
    N, k = 128, 8
    msg = rand_field(N)
    data = sw.commit(msg, k)
    x = rand_field(7)
    opening, _ = sw.open(data, x, mimc.fresh_state(), queries=10)
    bad = opening._replace(eval_claim=F.fadd(opening.eval_claim, F.scalar(1)))
    ok, _ = sw.verify(data.outer.root, bad, x, k, N,
                      mimc.fresh_state(), queries=10)
    assert not ok


def test_shockwave_rejects_tampered_reply():
    N, k = 128, 8
    msg = rand_field(N)
    data = sw.commit(msg, k)
    x = rand_field(7)
    opening, _ = sw.open(data, x, mimc.fresh_state(), queries=10)
    bad_reply = opening.reply.at[0, 0].set(
        np.asarray(F.fadd(opening.reply[0, 0], F.scalar(1))))
    bad = opening._replace(reply=bad_reply)
    ok, _ = sw.verify(data.outer.root, bad, x, k, N,
                      mimc.fresh_state(), queries=10)
    assert not ok


def test_shockwave_whir_recursion_mode():
    """cols > 2^8 triggers the WHIR inner recursion: no transmitted
    aggregate, both evaluations proven against the inner commitment."""
    import numpy as np
    import jax.numpy as jnp
    from hobbit_tpu.ops import field as F, mimc, poly
    from hobbit_tpu.pc import shockwave as sw

    rng = np.random.default_rng(21)
    N, k = 1 << 12, 8                       # cols = 512 > WHIR_THRESHOLD
    re = rng.integers(0, F.P, size=(N,), dtype=np.uint64)
    im = rng.integers(0, F.P, size=(N,), dtype=np.uint64)
    msg = jnp.stack([jnp.asarray(re), jnp.asarray(im)], axis=-1)
    data = sw.commit(msg, k)
    xre = rng.integers(0, F.P, size=(12,), dtype=np.uint64)
    xim = rng.integers(0, F.P, size=(12,), dtype=np.uint64)
    x = jnp.stack([jnp.asarray(xre), jnp.asarray(xim)], axis=-1)

    opening, _ = sw.open(data, x, mimc.fresh_state(), queries=8)
    assert opening.aggr is None and opening.whir_root is not None
    assert bool(F.feq(opening.eval_claim, poly.evaluate_vector(msg, x)))
    ok, _ = sw.verify(data.outer.root, opening, x, k, N,
                      mimc.fresh_state(), queries=8)
    assert bool(ok)

    bad = opening._replace(eval_claim=F.fadd(opening.eval_claim,
                                             F.scalar(1)))
    okb, _ = sw.verify(data.outer.root, bad, x, k, N, mimc.fresh_state(),
                       queries=8)
    assert not bool(okb)


def test_shockwave_multi_open():
    """Multi-point opening: shared queries/replies/paths, per-point
    indicator + FFT sumchecks."""
    N, k = 1 << 10, 16
    msg = rand_field(N)
    data = sw.commit(msg, k=k)
    pts = [rand_field(10), rand_field(10), rand_field(10)]
    opening, _ = sw.open_multi(data, pts, mimc.fresh_state(), queries=40)
    for p, x in enumerate(pts):
        want = poly.evaluate_vector(msg, x)
        assert bool(F.feq(opening.eval_claims[p], want))
    ok, _ = sw.verify_multi(data.outer.root, opening, pts, k, N,
                            mimc.fresh_state(), queries=40)
    assert bool(ok)
    bad = opening._replace(
        eval_claims=opening.eval_claims.at[1, 0].add(np.uint64(1)))
    okb, _ = sw.verify_multi(data.outer.root, bad, pts, k, N,
                             mimc.fresh_state(), queries=40)
    assert not bool(okb)
