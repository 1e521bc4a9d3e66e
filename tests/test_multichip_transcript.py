"""Sharded-prover transcript equality.

The sharding constraints in the prover's kernels (parallel.mesh.
shard_leading inside the fold/encode/commit paths) change only the device
layout, never the numbers: a proof produced under a dp x tp mesh must be
BIT-IDENTICAL to the single-device proof, and must verify.  This pins the
multi-chip path the driver dry-runs (``__graft_entry__.dryrun_multichip``)
against the canonical transcript.
"""

import numpy as np

import jax

from hobbit_tpu.config import HobbitConfig
from hobbit_tpu.core import prover
from hobbit_tpu.models import circuits as C
from hobbit_tpu.parallel import mesh as meshmod
import pytest

pytestmark = pytest.mark.slow


def _tiny_setup():
    cfg = HobbitConfig(buffer_bits=7, pc_queries=8, shockwave_queries=8)
    prog = C.fun1_arbitrary(4, 8)
    x = C.fun1_inputs(prog.num_inputs)
    return cfg, prog, x


def test_sharded_transcript_equals_single_device():
    cfg, prog, x = _tiny_setup()
    ccom, _ = prover.commit_circuit(prog, cfg, pc_rows=4)
    proof0, st0 = prover.prove(prog, x, cfg, pc_rows=4, circuit_com=ccom)

    mesh = meshmod.make_mesh(len(jax.devices()))
    with meshmod.use_mesh(mesh):
        proof1, st1 = prover.prove(prog, x, cfg, pc_rows=4,
                                   circuit_com=ccom)
        ok, _ = prover.verify(proof1, prog, cfg, ccom.root, pc_rows=4)

    assert bool(ok)
    assert np.array_equal(np.asarray(proof0.witness_root),
                          np.asarray(proof1.witness_root))
    assert np.array_equal(np.asarray(st0), np.asarray(st1))


def test_sharded_verify_accepts_single_device_proof():
    cfg, prog, x = _tiny_setup()
    ccom, _ = prover.commit_circuit(prog, cfg, pc_rows=4)
    proof, _ = prover.prove(prog, x, cfg, pc_rows=4, circuit_com=ccom)
    mesh = meshmod.make_mesh(len(jax.devices()))
    with meshmod.use_mesh(mesh):
        ok, _ = prover.verify(proof, prog, cfg, ccom.root, pc_rows=4)
    assert bool(ok)
