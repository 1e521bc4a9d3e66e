"""Tensor-PC recursion driver tests (RS + Spielman modes)."""

import numpy as np
import jax.numpy as jnp
import pytest

from hobbit_tpu.ops import field as F
from hobbit_tpu.ops import mimc, poly
from hobbit_tpu.pc import standard as pc

pytestmark = pytest.mark.slow


def _rand_field(rng, *shape):
    re = rng.integers(0, F.P, size=shape, dtype=np.uint64)
    im = rng.integers(0, F.P, size=shape, dtype=np.uint64)
    return jnp.stack([jnp.asarray(re), jnp.asarray(im)], axis=-1)


@pytest.mark.parametrize("linear_time", [False, True])
def test_recursive_open_roundtrip(linear_time):
    rng = np.random.default_rng(17)
    N, K, rows = 512, 4, 8
    msg = _rand_field(rng, N)
    params = pc.make_params(N, K, rows, linear_time=linear_time, queries=8)
    com = pc.commit(msg, params)
    x = _rand_field(rng, int(np.log2(N)))

    opening, _ = pc.open_recursive(msg, com, x, params, mimc.fresh_state(),
                                   sw_queries=8)
    # the claim is the true MLE evaluation
    assert bool(F.feq(opening.eval_claim, poly.evaluate_vector(msg, x)))

    ok, _ = pc.verify_recursive(com.root, x, opening, params,
                                mimc.fresh_state(), sw_queries=8)
    assert bool(ok)


def test_recursive_open_rejects_wrong_claim():
    rng = np.random.default_rng(23)
    N, K, rows = 512, 4, 8
    msg = _rand_field(rng, N)
    params = pc.make_params(N, K, rows, linear_time=False, queries=8)
    com = pc.commit(msg, params)
    x = _rand_field(rng, int(np.log2(N)))
    opening, _ = pc.open_recursive(msg, com, x, params, mimc.fresh_state(),
                                   sw_queries=8)
    bad = opening._replace(eval_claim=F.fadd(opening.eval_claim, F.scalar(1)))
    ok, _ = pc.verify_recursive(com.root, x, bad, params,
                                mimc.fresh_state(), sw_queries=8)
    assert not bool(ok)


def test_recursive_open_rejects_tampered_reply():
    rng = np.random.default_rng(29)
    N, K, rows = 512, 4, 8
    msg = _rand_field(rng, N)
    params = pc.make_params(N, K, rows, linear_time=False, queries=8)
    com = pc.commit(msg, params)
    x = _rand_field(rng, int(np.log2(N)))
    opening, _ = pc.open_recursive(msg, com, x, params, mimc.fresh_state(),
                                   sw_queries=8)
    bad = opening._replace(reply=opening.reply.at[0, 0, 0, 0].add(1))
    ok, _ = pc.verify_recursive(com.root, x, bad, params,
                                mimc.fresh_state(), sw_queries=8)
    assert not bool(ok)


def test_parity_commitment_roundtrip():
    """Committed-parity wphi check: <P, W2> sumcheck + shockwave opening
    replaces the verifier's O(q*edges) expander traversal."""
    import numpy as np
    import jax.numpy as jnp
    from hobbit_tpu.config import CodeParams
    from hobbit_tpu.core import parity
    from hobbit_tpu.ops import expanders
    from hobbit_tpu.ops import field as F
    from hobbit_tpu.ops import mimc, poly

    rng = np.random.default_rng(5)
    n = 32
    code = expanders.build_code(n, CodeParams())
    pd = parity.commit_parity(code)
    assert pd.n == n

    qrows = [int(v) for v in rng.integers(0, 2 * n, size=6)]
    cre = rng.integers(0, F.P, size=(6,), dtype=np.uint64)
    coeffs = jnp.stack([jnp.asarray(cre), jnp.zeros(6, jnp.uint64)], axis=-1)
    ire = rng.integers(0, F.P, size=(5,), dtype=np.uint64)
    ipt = jnp.stack([jnp.asarray(ire), jnp.zeros(5, jnp.uint64)], axis=-1)

    # ground truth: sum_q coeffs_q * phi_{r_q}~(ipt)
    from hobbit_tpu.core import linear_code as lc
    want = None
    for qi in range(6):
        rho = np.zeros((int(np.log2(2 * n)), 2), dtype=np.uint64)
        for b in range(rho.shape[0]):
            rho[b, 0] = (qrows[qi] >> b) & 1
        phi = lc._phi(code, jnp.asarray(rho), n)
        t = F.fmul(coeffs[qi], poly.evaluate_vector(phi, ipt))
        want = t if want is None else F.fadd(want, t)

    proof, _ = parity.prove_claim(pd, qrows, coeffs, code.codeword_len, ipt,
                                  mimc.fresh_state(), sw_queries=8)
    ok, _ = parity.verify_claim(proof, pd.root, want, qrows, coeffs,
                                code.codeword_len, pd.cw2, pd.n, ipt,
                                mimc.fresh_state(), sw_queries=8)
    assert bool(ok)

    bad = F.fadd(want, F.scalar(1))
    okb, _ = parity.verify_claim(proof, pd.root, bad, qrows, coeffs,
                                 code.codeword_len, pd.cw2, pd.n, ipt,
                                 mimc.fresh_state(), sw_queries=8)
    assert not bool(okb)
