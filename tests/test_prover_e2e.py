"""End-to-end circuit proof (protocol v2): commitments + wiring + lookups
+ gate consistency + multi-point PC openings, with the SUCCINCT verifier
(no circuit re-execution) — full roundtrip + tamper probes."""

import numpy as np
import jax.numpy as jnp

from hobbit_tpu.config import HobbitConfig
from hobbit_tpu.core import prover
from hobbit_tpu.models import circuits as C
from hobbit_tpu.ops import field as F
import pytest

pytestmark = pytest.mark.slow


CFG = HobbitConfig(buffer_bits=6, pc_queries=16, shockwave_queries=16)  # tiny: exercise streaming


def _roundtrip(prog, x, cfg=CFG, streaming=None):
    ccom, _ = prover.commit_circuit(prog, cfg, pc_rows=4)
    proof, _ = prover.prove(prog, x, cfg, pc_rows=4, streaming=streaming,
                            circuit_com=ccom)
    ok, _ = prover.verify(proof, prog, cfg, ccom.root, pc_rows=4)
    return proof, ccom, bool(ok)


def test_e2e_fun1():
    prog = C.fun1_arbitrary(3, 6)
    x = C.fun1_inputs(prog.num_inputs)
    proof, _, ok = _roundtrip(prog, x)
    assert ok
    assert not proof.lookup_mode


def test_e2e_lookup_circuit():
    prog = C.fun2_range_proof_lookup(4)
    x = C.fun2_inputs(4)
    proof, _, ok = _roundtrip(prog, x)
    assert proof.lookup_proof is not None
    assert ok


def test_e2e_streaming_matches_materialized():
    """The O(B)-resident streaming prover emits the SAME transcript as the
    materialized fast path.  (Lookup tables are 2^16-entry, so the lookup
    multiset domain is table-driven: use a buffer sized between the two.)"""
    cfg = HobbitConfig(buffer_bits=15, pc_queries=16, shockwave_queries=16)
    prog = C.fun6_sql_range_query(5, block_rows=8)
    from hobbit_tpu.streams import trace as trc
    x = trc.prng_input_source(prog.num_inputs, seed=3, small=256)
    ccom, _ = prover.commit_circuit(prog, cfg, pc_rows=4)
    p1, s1 = prover.prove(prog, x, cfg, pc_rows=4, streaming=False,
                          circuit_com=ccom)
    p2, s2 = prover.prove(prog, x, cfg, pc_rows=4, streaming=True,
                          circuit_com=ccom)
    assert np.array_equal(np.asarray(s1), np.asarray(s2))
    ok, _ = prover.verify(p2, prog, cfg, ccom.root, pc_rows=4)
    assert bool(ok)


def test_e2e_rejects_tampered_witness_root():
    prog = C.fun1_arbitrary(3, 4)
    x = C.fun1_inputs(prog.num_inputs)
    proof, ccom, ok = _roundtrip(prog, x)
    assert ok
    bad = proof._replace(
        witness_root=proof.witness_root.at[0].add(np.uint32(1)))
    okb, _ = prover.verify(bad, prog, CFG, ccom.root, pc_rows=4)
    assert not bool(okb)


def test_e2e_rejects_tampered_gc_terms():
    prog = C.fun1_arbitrary(3, 4)
    x = C.fun1_inputs(prog.num_inputs)
    proof, ccom, ok = _roundtrip(prog, x)
    assert ok
    pc_ = proof.gc_proof.per_chunk.at[0, 0, 0].add(np.uint64(1))
    bad = proof._replace(gc_proof=proof.gc_proof._replace(per_chunk=pc_))
    okb, _ = prover.verify(bad, prog, CFG, ccom.root, pc_rows=4)
    assert not bool(okb)


def test_e2e_rejects_inconsistent_trace():
    """Tamper with a transmitted wiring product: permutation check fails."""
    prog = C.fun1_arbitrary(3, 4)
    x = C.fun1_inputs(prog.num_inputs)
    proof, ccom, ok = _roundtrip(prog, x)
    assert ok
    out = proof.wiring_proof.top_proof.output
    out = out.at[0].set(np.asarray(F.fadd(out[0], F.scalar(1))))
    bad = proof._replace(wiring_proof=proof.wiring_proof._replace(
        top_proof=proof.wiring_proof.top_proof._replace(output=out)))
    okb, _ = prover.verify(bad, prog, CFG, ccom.root, pc_rows=4)
    assert not bool(okb)


def test_e2e_uncommitted_circuit_fun1():
    """committed_circuit=False (the reference prove_circuit mode,
    main.cpp:862-983): no c_open in the proof; the verifier evaluates the
    circuit-description MLE directly."""
    import dataclasses
    cfg = dataclasses.replace(CFG, committed_circuit=False)
    prog = C.fun1_arbitrary(3, 6)
    x = C.fun1_inputs(prog.num_inputs)
    proof, ccom, ok = _roundtrip(prog, x, cfg=cfg)
    assert ok
    # group opening carries only the witness entry (no circuit entry)
    assert len(proof.open_proof.eval_claims) == 1


def test_e2e_uncommitted_circuit_lookup():
    import dataclasses
    cfg = dataclasses.replace(CFG, committed_circuit=False)
    prog = C.fun2_range_proof_lookup(4)
    x = C.fun2_inputs(4)
    proof, ccom, ok = _roundtrip(prog, x, cfg=cfg)
    assert ok
    # group entries: witness, lookup, counts (no circuit entry)
    assert len(proof.open_proof.eval_claims) == 3
    # mode mismatch is a structural reject, both directions
    okb, _ = prover.verify(proof, prog, CFG, ccom.root, pc_rows=4)
    assert not bool(okb)


def test_e2e_uncommitted_rejects_wrong_circuit():
    """A proof for one circuit must not verify against another program of
    identical geometry (direct lane evaluation binds the description)."""
    import dataclasses
    cfg = dataclasses.replace(CFG, committed_circuit=False)
    prog = C.fun1_arbitrary(3, 6)
    x = C.fun1_inputs(prog.num_inputs)
    proof, ccom, ok = _roundtrip(prog, x, cfg=cfg)
    assert ok

    # same geometry, one level's add<->mul selector flipped
    n = 1 << 3
    b = C.Builder(num_inputs=n)
    cur = np.arange(n, dtype=np.int64)
    for d in range(6):
        rolled = np.roll(cur, 1)
        use_add = (d % 2 == 0) != (d == 3)
        cur = b.add(cur, rolled) if use_add else b.mul(cur, rolled)
    b.sum_tree(cur)
    other = b.build()
    assert other.num_gates == prog.num_gates

    okb, _ = prover.verify(proof, other, cfg, ccom.root, pc_rows=4)
    assert not bool(okb)


def test_e2e_aes_lookup_mode():
    """AES-128 block: all-lookup circuit through the full pipeline.
    (2^16-entry XOR table => table-driven lookup domain; medium buffer.)"""
    from hobbit_tpu.models import aes
    cfg = HobbitConfig(buffer_bits=15, pc_queries=16, shockwave_queries=16)
    prog, _ = aes.build(blocks_log2=0, key=list(range(16)))
    ab = aes.AesBuilder(1, aes.key_schedule(list(range(16))))
    x = ab.inputs(np.array([list(range(16))], dtype=np.uint64))
    proof, _, ok = _roundtrip(prog, x, cfg=cfg)
    assert proof.lookup_mode
    assert ok


def test_e2e_mlp_dense():
    prog = C.fun9_mlp(4, [4])
    x = C.random_inputs(prog, seed=11)
    _, _, ok = _roundtrip(prog, x)
    assert ok


def test_e2e_mlp_pruned():
    prog = C.fun8_pruned_mlp(4, [4], density=0.5)
    x = C.random_inputs(prog, seed=13)
    _, _, ok = _roundtrip(prog, x)
    assert ok
