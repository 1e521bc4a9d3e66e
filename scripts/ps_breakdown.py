"""Proof-size + phase-time breakdown of the flagship fun6 proof.

Prints per-component Ps (KB, dedup'd accounting) and the prover's phase
timings for cold and warm runs — the evidence base for proof-size and
orchestration work.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("HOBBIT_JIT", "1")
os.environ.setdefault("HOBBIT_TRACE", "1")

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
from hobbit_tpu.utils import metrics


def main(log_n=17, buffer_bits=19, warm_runs=1, committed_circuit=False):
    cfg = HobbitConfig(buffer_bits=buffer_bits,
                       committed_circuit=committed_circuit)
    prog = C.fun6_sql_range_query(log_n)
    x = C.random_inputs(prog, seed=3, small=256)
    t0 = time.time()
    ccom, _ = prover.commit_circuit(prog, cfg, pc_rows=256)
    print(f"commit_circuit: {time.time() - t0:.1f}s", file=sys.stderr)

    t0 = time.time()
    proof, _ = prover.prove(prog, x, cfg, pc_rows=256, circuit_com=ccom)
    cold = time.time() - t0
    print(f"prove cold: {cold:.1f}s  timings={proof.timings}",
          file=sys.stderr)

    for _ in range(warm_runs):
        t0 = time.time()
        proof, _ = prover.prove(prog, x, cfg, pc_rows=256, circuit_com=ccom)
        warm = time.time() - t0
        print(f"prove warm: {warm:.1f}s  timings={proof.timings}",
              file=sys.stderr)

    # per-component Ps
    parts = {}
    for name in proof._fields:
        v = getattr(proof, name)
        if v is None or name == "timings":
            continue
        parts[name] = round(metrics.proof_size_kb(v), 1)
    total = metrics.proof_size_kb(proof)
    print(json.dumps({"total_kb": round(total, 1), "parts": parts},
                     indent=1))

    # drill into the opening (group or per-commitment)
    op = proof.open_proof
    sub = {}
    for f in op._fields:
        v = getattr(op, f)
        if v is None:
            continue
        sub[f] = round(metrics.proof_size_kb(v), 1)
    # metrics walks NamedTuples with dedup; per-field walk of paths is
    # raw — recompute the dedup'd figure for the whole opening
    sub["_dedup_total"] = round(metrics.proof_size_kb(op), 1)
    print("open_proof", json.dumps(sub))
    rec = getattr(op, "recursion", None)
    if rec is not None and hasattr(rec, "_fields"):
        rsub = {f: round(metrics.proof_size_kb(getattr(rec, f)), 1)
                for f in rec._fields if getattr(rec, f) is not None}
        print("open_proof.recursion", json.dumps(rsub))

    for path, kb in metrics.size_breakdown(proof, min_kb=20.0):
        print(f"  RAW {kb:9.1f} KB  {path}")

    t0 = time.time()
    ok = prover.verify(proof, prog, cfg, ccom.root, pc_rows=256)
    print(f"verify cold: {time.time() - t0:.1f}s ok={ok[0]}",
          file=sys.stderr)
    t0 = time.time()
    ok = prover.verify(proof, prog, cfg, ccom.root, pc_rows=256)
    print(f"verify warm: {time.time() - t0:.1f}s ok={ok[0]}",
          file=sys.stderr)


if __name__ == "__main__":
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("--log-n", type=int, default=17)
    p.add_argument("--buffer-bits", type=int, default=19)
    p.add_argument("--warm-runs", type=int, default=1)
    p.add_argument("--committed-circuit", action="store_true")
    a = p.parse_args()
    main(a.log_n, a.buffer_bits, a.warm_runs, a.committed_circuit)
