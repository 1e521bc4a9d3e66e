"""End-to-end circuit proof: commit + wiring + lookups + gate consistency
+ PC openings, full verify round trip."""

import numpy as np

from hobbit_tpu.config import HobbitConfig
from hobbit_tpu.core import prover
from hobbit_tpu.models import circuits as C
from hobbit_tpu.ops import field as F


CFG = HobbitConfig(buffer_bits=6)   # tiny buffer to exercise streaming


def test_e2e_fun1():
    prog = C.fun1_arbitrary(3, 6)
    x = C.fun1_inputs(prog.num_inputs)
    proof, _ = prover.prove(prog, x, CFG, pc_K=2, pc_rows=4)
    ok, _ = prover.verify(proof, prog, x, CFG, pc_K=2, pc_rows=4)
    assert ok
    assert proof.num_chunks * proof.chunk_size >= proof.num_gates


def test_e2e_lookup_circuit():
    prog = C.fun2_range_proof_lookup(4)
    x = C.fun2_inputs(4)
    proof, _ = prover.prove(prog, x, CFG, pc_K=2, pc_rows=4)
    assert proof.lookup_proof is not None
    ok, _ = prover.verify(proof, prog, x, CFG, pc_K=2, pc_rows=4)
    assert ok


def test_e2e_rejects_wrong_inputs():
    prog = C.fun1_arbitrary(3, 4)
    x = C.fun1_inputs(prog.num_inputs)
    proof, _ = prover.prove(prog, x, CFG, pc_K=2, pc_rows=4)
    x_bad = F.fadd(x, F.scalar(1)[None, :])
    ok, _ = prover.verify(proof, prog, x_bad, CFG, pc_K=2, pc_rows=4)
    assert not ok


def test_e2e_aes_lookup_mode():
    """AES-128 block: all-lookup circuit through the full pipeline
    (streaming wiring mul-tree + lookup-aware gate consistency)."""
    from hobbit_tpu.models import aes
    prog, _ = aes.build(blocks_log2=0, key=list(range(16)))
    ab = aes.AesBuilder(1, aes.key_schedule(list(range(16))))
    x = ab.inputs(np.array([list(range(16))], dtype=np.uint64))
    proof, _ = prover.prove(prog, x, CFG, pc_K=2, pc_rows=4)
    assert proof.lookup_mode
    ok, _ = prover.verify(proof, prog, x, CFG, pc_K=2, pc_rows=4)
    assert ok


def test_e2e_mlp_dense():
    """fun 9: dense MLP inference through the full pipeline."""
    prog = C.fun9_mlp(4, [4])
    x = C.random_inputs(prog, seed=11)
    proof, _ = prover.prove(prog, x, CFG, pc_K=2, pc_rows=4)
    ok, _ = prover.verify(proof, prog, x, CFG, pc_K=2, pc_rows=4)
    assert ok


def test_e2e_mlp_pruned():
    """fun 8: pruned (sparse) MLP inference."""
    prog = C.fun8_pruned_mlp(4, [4], density=0.5)
    x = C.random_inputs(prog, seed=13)
    proof, _ = prover.prove(prog, x, CFG, pc_K=2, pc_rows=4)
    ok, _ = prover.verify(proof, prog, x, CFG, pc_K=2, pc_rows=4)
    assert ok
