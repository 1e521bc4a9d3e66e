"""Aggregated 16-way FRI PC (Virgo.cpp:373-433 analog)."""

import numpy as np

import jax.numpy as jnp

from hobbit_tpu.ops import field as F
from hobbit_tpu.ops import mimc, poly
from hobbit_tpu.pc import fri_agg
import pytest

pytestmark = pytest.mark.slow


def _rand_field(rng, *shape):
    re = rng.integers(0, F.P, size=shape, dtype=np.uint64)
    im = rng.integers(0, F.P, size=shape, dtype=np.uint64)
    return jnp.stack([jnp.asarray(re), jnp.asarray(im)], axis=-1)


def test_agg_fri_roundtrip():
    rng = np.random.default_rng(21)
    n = 1 << 9
    vals = _rand_field(rng, n)
    x = _rand_field(rng, 9)
    com = fri_agg.commit(vals)
    proof, y, _ = fri_agg.prove(com, vals, x, mimc.fresh_state(),
                                cons_queries=16, whir_queries=6)
    assert bool(F.feq(y, F.fdot(vals, poly.beta_table(x))))
    ok, _ = fri_agg.verify(com.root, proof, x, y, n, mimc.fresh_state(),
                           cons_queries=16, whir_queries=6)
    assert bool(ok)


def test_agg_fri_rejects_bad_eval():
    rng = np.random.default_rng(22)
    n = 1 << 8
    vals = _rand_field(rng, n)
    x = _rand_field(rng, 8)
    com = fri_agg.commit(vals)
    proof, y, _ = fri_agg.prove(com, vals, x, mimc.fresh_state(),
                                cons_queries=12, whir_queries=6)
    bad = F.fadd(y, F.scalar(1))
    ok, _ = fri_agg.verify(com.root, proof, x, bad, n, mimc.fresh_state(),
                           cons_queries=12, whir_queries=6)
    assert not bool(ok)


def test_agg_fri_rejects_tampered_column():
    rng = np.random.default_rng(23)
    n = 1 << 8
    vals = _rand_field(rng, n)
    x = _rand_field(rng, 8)
    com = fri_agg.commit(vals)
    proof, y, _ = fri_agg.prove(com, vals, x, mimc.fresh_state(),
                                cons_queries=12, whir_queries=6)
    tam = proof._replace(
        columns=proof.columns.at[0, 3].set(F.scalar(77)))
    ok, _ = fri_agg.verify(com.root, tam, x, y, n, mimc.fresh_state(),
                           cons_queries=12, whir_queries=6)
    assert not bool(ok)
