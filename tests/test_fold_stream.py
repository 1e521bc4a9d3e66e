"""Generic fold-phase engine + lookup-aware gate consistency tests."""

import numpy as np
import jax.numpy as jnp

from hobbit_tpu.core import fold_stream as fs
from hobbit_tpu.core import gate_consistency as gc
from hobbit_tpu.models import circuits as C
from hobbit_tpu.ops import field as F
from hobbit_tpu.ops import mimc, poly
from hobbit_tpu.streams import trace as trc
from hobbit_tpu.streams import views


def _rf(rng, *shape):
    re = rng.integers(0, F.P, size=shape, dtype=np.uint64)
    im = rng.integers(0, F.P, size=shape, dtype=np.uint64)
    return jnp.stack([jnp.asarray(re), jnp.asarray(im)], axis=-1)


def test_fold_stream_group_sums():
    """Per-group true sums equal direct beta-weighted sums."""
    rng = np.random.default_rng(1)
    K, B = 4, 16
    N = K * B
    A = _rf(rng, N)
    Bv = _rf(rng, N)
    names = ("A", "B")
    groups = (("A", "B"), ("A",))

    def chunk(i):
        return {"A": A[i * B:(i + 1) * B], "B": Bv[i * B:(i + 1) * B]}

    r = _rf(rng, int(np.log2(N)))
    proof, point, evals, _ = fs.prove(chunk, names, groups, K, B, r,
                                      mimc.fresh_state())
    res, _ = fs.verify(proof, B, r, mimc.fresh_state())
    assert bool(res.ok)
    beta = poly.beta_table(r)
    want0 = F.fdot(beta, F.fmul(A, Bv))
    want1 = F.fdot(beta, A)
    assert bool(F.feq(res.group_sums[0], want0))
    assert bool(F.feq(res.group_sums[1], want1))
    # stream evals at the final point match the real MLEs
    assert bool(F.feq(evals["A"], poly.evaluate_vector(A, point)))
    assert bool(F.feq(evals["B"], poly.evaluate_vector(Bv, point)))


def test_lookup_gate_consistency():
    """AES-free small lookup circuit: the lookup-aware identity holds and
    verifies; tampering a lookup output breaks it."""
    prog = C.fun2_range_proof_lookup(4)
    x = C.fun2_inputs(4)
    tr = trc.execute(prog, x)
    n = tr.num_gates
    npad = 1 << int(np.ceil(np.log2(max(4, n))))
    B = npad // 4
    K = 4

    state = mimc.fresh_state()
    state, lr = mimc.squeeze(state, 2)
    streams = views.gate_arrays_lookups(tr, lr[0], lr[1])

    def pad(v):
        return jnp.concatenate(
            [v, jnp.zeros((npad - v.shape[0], 2), jnp.uint64)])

    padded = {a: pad(v) for a, v in streams.items()}

    def chunk(i):
        return {a: padded[a][i * B:(i + 1) * B] for a in padded}

    state, r = mimc.squeeze(state, int(np.log2(npad)))
    proof, point, evals, _ = gc.prove_lookups(chunk, K, B, r, state)

    vstate = mimc.fresh_state()
    vstate, vlr = mimc.squeeze(vstate, 2)
    vstate, vr = mimc.squeeze(vstate, int(np.log2(npad)))
    ok, vpoint, vevals, _ = gc.verify_lookups(proof, B, vr, vstate)
    assert bool(ok)
    assert bool(F.feq(evals["L"], poly.evaluate_vector(padded["L"], point)))

    # tamper: flip a pure term so the identity breaks
    bad_pc = proof.per_chunk.at[0, -1].set(F.scalar(99))
    bad = proof._replace(per_chunk=bad_pc)
    okb, _, _, _ = gc.verify_lookups(bad, B, vr, vstate)
    assert not bool(okb)
