"""Native C++ runtime: bit-exactness vs the JAX ops + producer pipeline."""

import numpy as np
import jax.numpy as jnp
import pytest

from hobbit_tpu.ops import blake3 as jb
from hobbit_tpu.ops import field as F
from hobbit_tpu.runtime import native_rt as rt
from hobbit_tpu.models import circuits as C
from hobbit_tpu.models import aes
from hobbit_tpu.streams import trace as trc

pytestmark = pytest.mark.skipif(not rt.available(),
                                reason="native toolchain unavailable")


def test_blake3_bitexact():
    rng = np.random.default_rng(0)
    msgs = rng.integers(0, 1 << 32, size=(32, 16), dtype=np.uint64)
    msgs = msgs.astype(np.uint32)
    native = rt.blake3_compress64(msgs)
    jax_d = np.asarray(jb.compress64(jnp.asarray(msgs)))
    assert np.array_equal(native, jax_d)
    # spec vector: hash of bytes 0..63
    one = rt.blake3_compress64(
        np.frombuffer(bytes(range(64)), dtype=np.uint32)[None])
    assert one.tobytes() == jb.py_compress64(bytes(range(64)))


def test_field_leaves_and_tree():
    rng = np.random.default_rng(1)
    fields = rng.integers(0, F.P, size=(16, 4, 2), dtype=np.uint64)
    native = rt.hash_field_leaves(fields)
    jax_d = np.asarray(jb.hash_field_leaves(jnp.asarray(fields)))
    assert np.array_equal(native, jax_d)

    from hobbit_tpu.ops import merkle
    levels, off = rt.merkle_tree(native)
    tree = merkle.build_from_digests(jnp.asarray(native))
    assert np.array_equal(levels[off], np.asarray(tree.root))


def test_native_eval_matches_trace():
    prog = C.fun1_arbitrary(4, 4)
    x = C.fun1_inputs(prog.num_inputs)
    tr = trc.execute(prog, x)
    L, R, O = rt.eval_program(prog, np.asarray(x))
    assert np.array_equal(L, np.asarray(tr.val_l))
    assert np.array_equal(R, np.asarray(tr.val_r))
    assert np.array_equal(O, np.asarray(tr.val_o))


def test_native_eval_lookup_circuit():
    prog, _ = aes.build(blocks_log2=0, key=list(range(16)))
    ab = aes.AesBuilder(1, aes.key_schedule(list(range(16))))
    x = ab.inputs(np.array([list(range(16))], dtype=np.uint64))
    tr = trc.execute(prog, x)
    L, R, O = rt.eval_program(prog, np.asarray(x))
    assert np.array_equal(O, np.asarray(tr.val_o))


def test_witness_producer_restreams():
    prog = C.fun1_arbitrary(4, 4)
    x = C.fun1_inputs(prog.num_inputs)
    tr = trc.execute(prog, x)
    n = tr.num_gates
    chunk = 32
    K = (n + chunk - 1) // chunk
    with rt.WitnessProducer(prog, np.asarray(x), chunk) as wp:
        # two full passes must be identical (re-streaming oracle)
        for _pass in range(2):
            got_o = []
            for _ in range(K):
                L, R, O = wp.next_chunk()
                got_o.append(O)
            got = np.concatenate(got_o)[:n]
            assert np.array_equal(got, np.asarray(tr.val_o))


def test_execute_native_matches_device():
    prog = C.fun2_range_proof_lookup(4)
    x = C.fun2_inputs(4)
    tn = trc.execute(prog, x, prefer_native=True)
    td = trc.execute(prog, x, prefer_native=False)
    for a, b in zip(tn, td):
        assert np.array_equal(np.asarray(a), np.asarray(b))
