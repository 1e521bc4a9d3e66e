"""Orion PC tests: commit + GKR-encoding-proof opening."""

import numpy as np
import jax.numpy as jnp

from hobbit_tpu.gkr import encoding_circuit as ec
from hobbit_tpu.gkr import layered
from hobbit_tpu.ops import expanders
from hobbit_tpu.ops import field as F
from hobbit_tpu.ops import mimc, poly
from hobbit_tpu.pc import orion
import pytest

pytestmark = pytest.mark.slow


def _rf(rng, *shape):
    re = rng.integers(0, F.P, size=shape, dtype=np.uint64)
    im = rng.integers(0, F.P, size=shape, dtype=np.uint64)
    return jnp.stack([jnp.asarray(re), jnp.asarray(im)], axis=-1)


def test_encoding_circuit_matches_encoder():
    rng = np.random.default_rng(3)
    code = expanders.build_code(32)
    ckt, b = ec.build_encoding_circuit(code)
    msg = _rf(rng, 32)
    vals = layered.evaluate(ckt, b.make_inputs(msg))
    want = expanders.encode(code, msg)
    assert vals[-1].shape[0] == code.codeword_len
    assert bool(jnp.all(F.feq(vals[-1], want)))


def test_orion_open_roundtrip():
    rng = np.random.default_rng(5)
    N, rows = 64, 4
    params = orion.OrionParams(N=N, rows=rows, queries=8)
    msg = _rf(rng, N)
    com = orion.commit(msg, params)
    x = _rf(rng, int(np.log2(N)))

    opening, _ = orion.open(msg, com, x, params, mimc.fresh_state())
    assert bool(F.feq(opening.eval_claim, poly.evaluate_vector(msg, x)))
    ok, _ = orion.verify(com.root, x, opening, params, com.code,
                         mimc.fresh_state())
    assert bool(ok)


def test_orion_rejects_bad_aggregate():
    rng = np.random.default_rng(7)
    N, rows = 64, 4
    params = orion.OrionParams(N=N, rows=rows, queries=8)
    msg = _rf(rng, N)
    com = orion.commit(msg, params)
    x = _rf(rng, int(np.log2(N)))
    opening, _ = orion.open(msg, com, x, params, mimc.fresh_state())
    bad = opening._replace(aggr=opening.aggr.at[0, 0].add(1))
    ok, _ = orion.verify(com.root, x, bad, params, com.code,
                         mimc.fresh_state())
    assert not bool(ok)
