"""Windowed (O(B)-resident) trace oracle: equivalence + space bounds.

The streaming mode re-executes the program level window by level window
(``trace.stream_segments``); these tests pin (a) bit-exact equivalence of
every gate/final chunk against the materialized reference implementation,
(b) the death-order contract of the final stream, and (c) the space bound:
slot memory is O(live width), sublinear in gates for block-structured
circuits (reference producer semantics, Seval.cpp:1288-1492 +
witness_stream.cpp:1701-1807)."""

import numpy as np

from hobbit_tpu.models import circuits as C
from hobbit_tpu.streams import trace as trc


def _check_equiv(prog, src, B):
    mat = trc.TraceOracle(prog, src, materialize=True)
    st = trc.TraceOracle(prog, src, materialize=False)
    mchunks = list(mat.gate_chunks(B))
    schunks = list(st.gate_chunks(B))
    assert len(mchunks) == len(schunks)
    for i, (a, b) in enumerate(zip(mchunks, schunks)):
        for f in ("types", "idx_o", "idx_l", "idx_r", "acc_l", "acc_r",
                  "val_l", "val_r", "val_o"):
            assert np.array_equal(np.asarray(getattr(a, f)),
                                  np.asarray(getattr(b, f))), (i, f)
    mf = list(mat.final_chunks(B))
    sf = list(st.final_chunks(B))
    assert len(mf) == len(sf)
    for i, (a, b) in enumerate(zip(mf, sf)):
        for j in range(4):
            assert np.array_equal(np.asarray(a[j]), np.asarray(b[j])), (i, j)
    return mf


def test_fun6_blocked_stream_equivalence():
    prog = C.fun6_sql_range_query(9, block_rows=64)
    src = trc.prng_input_source(prog.num_inputs, seed=3, small=256)
    finals = _check_equiv(prog, src, 128)
    # every wire appears exactly once in the final stream (death order)
    allw = np.concatenate([np.asarray(c[0])[: c[3]] for c in finals])
    assert sorted(allw.tolist()) == list(range(prog.num_wires))


def test_fun6_blocked_space_bound():
    # live width O(block): 5 block wire groups + partial-sum tree + acc
    prog = C.fun6_sql_range_query(12, block_rows=128)
    assert prog.num_slots < 8 * 128
    # the same circuit unblocked keeps O(n) live
    flat = C.fun6_sql_range_query(12)
    assert flat.num_slots > prog.num_slots * 4


def test_fun1_deep_space_bound_and_equivalence():
    prog = C.fun1_arbitrary(5, depth=24)
    assert prog.num_slots <= 3 * 32 + 8   # width-bounded live set
    x = C.fun1_inputs(32)
    _check_equiv(prog, x, 64)


def test_uneven_chunk_and_mlp():
    prog = C.fun9_mlp(16, [16, 8])
    x = C.random_inputs(prog, seed=2, small=64)
    _check_equiv(prog, x, 96)            # chunk not dividing level sizes


def test_peak_resident_reporting():
    prog = C.fun6_sql_range_query(10, block_rows=64)
    src = trc.prng_input_source(prog.num_inputs, seed=1, small=256)
    o = trc.TraceOracle(prog, src, materialize=False)
    B = 256
    # device residency in streaming mode: slots + chunk << gates
    assert o.peak_resident(B) < prog.num_gates // 2


def test_blocked_and_flat_same_products():
    """Blocked circuits compute the same query count as flat ones."""
    import jax.numpy as jnp
    flat = C.fun6_sql_range_query(8)
    blk = C.fun6_sql_range_query(8, block_rows=32)
    src = trc.prng_input_source(flat.num_inputs, seed=5, small=256)
    t1 = trc.execute(flat, src)
    t2 = trc.execute(blk, src)
    # final gate of each computes the total count
    assert np.array_equal(np.asarray(t1.val_o[-1]), np.asarray(t2.val_o[-1]))
