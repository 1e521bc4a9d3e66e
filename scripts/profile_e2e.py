"""Phase profile of the flagship fun6 proof (protocol v2) on the TPU.

Runs prove() twice (cold incl. compile, then warm) and prints the per-phase
timings the driver records.  Usage: python scripts/profile_e2e.py [log_n [bb [streaming]]]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("HOBBIT_JIT", "1")

import numpy as np
import jax

jax.config.update("jax_enable_x64", True)
_CACHE = os.environ.get(
    "HOBBIT_XLA_CACHE",
    os.path.join(os.path.expanduser("~"), ".cache", "hobbit_tpu_xla"))
os.makedirs(_CACHE, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from hobbit_tpu.config import HobbitConfig
from hobbit_tpu.core import prover
from hobbit_tpu.models import circuits as C
from hobbit_tpu.streams import trace as trc

LOG_N = int(sys.argv[1]) if len(sys.argv) > 1 else 17
BB = int(sys.argv[2]) if len(sys.argv) > 2 else 19
STREAMING = bool(int(sys.argv[3])) if len(sys.argv) > 3 else None


def main():
    cfg = HobbitConfig(buffer_bits=BB)
    print(f"fun6 log_n={LOG_N} buffer_bits={BB} streaming={STREAMING} "
          f"device={jax.devices()[0]}", flush=True)
    t0 = time.perf_counter()
    prog = C.fun6_sql_range_query(LOG_N)
    print(f"  build program: {time.perf_counter()-t0:.2f}s  "
          f"gates={prog.num_gates} slots={prog.num_slots}", flush=True)
    x = C.random_inputs(prog, seed=3, small=256)

    t0 = time.perf_counter()
    ccom, _ = prover.commit_circuit(prog, cfg, pc_rows=256)
    jax.block_until_ready(ccom.root)
    print(f"  commit_circuit (preprocess): {time.perf_counter()-t0:.2f}s",
          flush=True)

    for run in ("cold", "warm"):
        t0 = time.perf_counter()
        proof, state = prover.prove(prog, x, cfg, pc_rows=256,
                                    streaming=STREAMING, circuit_com=ccom)
        jax.block_until_ready(state)
        total = time.perf_counter() - t0
        phases = " ".join(f"{k}={v:.2f}" for k, v in proof.timings.items())
        print(f"  prove[{run}]: {total:.2f}s   ({phases})", flush=True)

    from hobbit_tpu.utils import metrics
    print(f"  proof size: {metrics.proof_size_kb(proof):.1f} KB", flush=True)
    for run in ("cold", "warm"):
        t0 = time.perf_counter()
        ok, _ = prover.verify(proof, prog, cfg, ccom.root, pc_rows=256)
        print(f"  verify[{run}]: {time.perf_counter()-t0:.2f}s ok={ok}",
              flush=True)


if __name__ == "__main__":
    main()
