"""Streaming substrate tests: trace execution, views, multiset identities."""

import numpy as np

import jax.numpy as jnp

from hobbit_tpu.models import circuits as C
from hobbit_tpu.ops import field as F
from hobbit_tpu.ops import mimc
from hobbit_tpu.streams import trace as trc
from hobbit_tpu.streams import views

P = F.P


def test_fun1_trace_algebra():
    prog = C.fun1_arbitrary(3, 4)
    tr = trc.execute(prog, C.fun1_inputs(prog.num_inputs))
    # every gate satisfies its own algebra
    terms = views.gate_consistency_terms(views.gate_arrays(tr))
    assert np.all(np.asarray(terms) == 0)


def test_trace_determinism_two_passes():
    prog = C.fun7_dummy(4, 3)
    x = C.random_inputs(prog, seed=3)
    t1 = trc.execute(prog, x)
    t2 = trc.execute(prog, x)
    np.testing.assert_array_equal(np.asarray(t1.val_o), np.asarray(t2.val_o))
    np.testing.assert_array_equal(np.asarray(t1.fin_val), np.asarray(t2.fin_val))


def test_slot_reuse_bounds_memory():
    prog = C.fun1_arbitrary(3, 10)
    # deep chain of width 8: slots should stay near 2 levels of width,
    # far below total wires
    assert prog.num_slots < prog.num_wires / 2


def test_wiring_multiset_identity():
    prog = C.fun1_arbitrary(3, 5)
    tr = trc.execute(prog, C.fun1_inputs(prog.num_inputs))
    state = mimc.fresh_state()
    _, ab = mimc.squeeze(state, 2)
    a, b = ab[0], ab[1]
    reads, writes = views.wiring_read_write_sets(tr, a, b)
    init, fin = views.wiring_init_final_sets(tr, prog.num_inputs, a, b)
    lhs = F.fmul(F.fprod(reads), F.fprod(fin))
    rhs = F.fmul(F.fprod(writes), F.fprod(init))
    np.testing.assert_array_equal(np.asarray(lhs), np.asarray(rhs))


def test_wiring_identity_fails_on_tamper():
    prog = C.fun1_arbitrary(3, 5)
    tr = trc.execute(prog, C.fun1_inputs(prog.num_inputs))
    # tamper one gate value
    tr = tr._replace(val_o=tr.val_o.at[3].set(
        np.asarray(F.fadd(tr.val_o[3], F.scalar(1)))))
    _, ab = mimc.squeeze(mimc.fresh_state(), 2)
    a, b = ab[0], ab[1]
    reads, writes = views.wiring_read_write_sets(tr, a, b)
    init, fin = views.wiring_init_final_sets(tr, prog.num_inputs, a, b)
    lhs = F.fmul(F.fprod(reads), F.fprod(fin))
    rhs = F.fmul(F.fprod(writes), F.fprod(init))
    assert not np.array_equal(np.asarray(lhs), np.asarray(rhs))


def test_lookup_circuit_and_identity():
    prog = C.fun2_range_proof_lookup(4, bits=8)
    x = C.fun2_inputs(4, bits=8, seed=1)
    tr = trc.execute(prog, x)
    # lookup outputs equal inputs for the range table
    n = 16
    lkp_mask = np.asarray(tr.types) >= trc.T_LOOKUP0
    out_vals = np.asarray(tr.val_o)[lkp_mask]
    in_vals = np.asarray(x)[:n]
    np.testing.assert_array_equal(out_vals[:, 0], in_vals[:, 0])

    _, ab = mimc.squeeze(mimc.fresh_state(), 2)
    a, b = ab[0], ab[1]
    reads, writes, init, fin = views.lookup_sets(
        tr, prog.tables, a, b, table_size=256)
    lhs = F.fmul(F.fprod(reads), F.fprod(fin))
    rhs = F.fmul(F.fprod(writes), F.fprod(init))
    np.testing.assert_array_equal(np.asarray(lhs), np.asarray(rhs))


def test_sql_range_query():
    prog = C.fun6_sql_range_query(3, bits=8)
    vals = np.array([5, 10, 20, 30, 40, 50, 60, 70, 15, 45], dtype=np.uint64)
    # 8 rows + low=15, high=45
    x = F.make(vals, np.zeros_like(vals))
    tr = trc.execute(prog, x)
    # selector = (15 < v) * (v < 45): rows 20, 30, 40 -> 3
    # find the root of the sum tree = last gate output
    total = np.asarray(tr.val_o)[-1]
    assert int(total[0]) == 3


def test_mlp_trace_matches_direct():
    prog = C.fun9_mlp(4, [3, 2])
    x = C.random_inputs(prog, seed=9, small=100)
    tr = trc.execute(prog, x)
    xn = np.asarray(x)[:, 0].astype(object)
    inp, w = xn[:4], xn[4:]
    W1 = w[:12].reshape(3, 4)
    W2 = w[12 : 12 + 6].reshape(2, 3)
    h = (W1 @ inp) % P
    h = (h * h) % P  # square activation
    out = (W2 @ h) % P
    want = int(sum(out) % P)
    got = int(np.asarray(tr.val_o)[-1][0])
    assert got == want


def test_oracle_chunking():
    prog = C.fun7_dummy(4, 3)
    oracle = trc.TraceOracle(prog, C.random_inputs(prog, seed=2))
    chunks = list(oracle.gate_chunks(16))
    n = oracle.num_gates
    assert len(chunks) == (n + 15) // 16
    # reassemble values
    vals = np.concatenate([np.asarray(c.val_o) for c in chunks])[:n]
    np.testing.assert_array_equal(vals, np.asarray(oracle.trace().val_o))


def test_pruned_mlp_builds_and_checks():
    prog = C.fun8_pruned_mlp(8, [4, 2], density=0.5)
    x = C.random_inputs(prog, seed=11, small=1000)
    tr = trc.execute(prog, x)
    terms = views.gate_consistency_terms(views.gate_arrays(tr))
    assert np.all(np.asarray(terms) == 0)
