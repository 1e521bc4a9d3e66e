"""Command-line driver: the TPU-native analog of the reference binary.

The reference exposes exactly one executable (``./pigeon fun buffer_bits
input_bits depth``, main.cpp:1171-1235) plus benchmark shell scripts
(sql_test.sh, test_aes.sh, test_arb.sh, MLP_test.sh, PC_tests.sh,
test_Elastic_PC).  This module provides the same surface:

  python -m hobbit_tpu prove --fun 6 --buffer-bits 19 --log-n 17
  python -m hobbit_tpu pc    --log-n 20 --option 4 --k 16
  python -m hobbit_tpu sweep sql            # sql_test.sh analog

and prints the reference's metric lines (main.cpp:856):

  Pt : <prover seconds>
  Ps : <proof KB> KB
  Vt : <verifier seconds>
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def _setup_jax():
    os.environ.setdefault("HOBBIT_JIT", "1")
    import jax
    jax.config.update("jax_enable_x64", True)
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache_tpu")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    return jax


def _workload(fun: int, log_n: int, depth: int, seed: int):
    """fun 1-9 -> (program, inputs), mirroring Seval.cpp's dispatch."""
    import numpy as np
    from .models import circuits as C

    if fun == 1:
        prog = C.fun1_arbitrary(log_n, depth)
        return prog, C.fun1_inputs(prog.num_inputs)
    if fun == 2:
        return C.fun2_range_proof_lookup(log_n), C.fun2_inputs(log_n,
                                                               seed=seed)
    if fun == 3:
        prog = C.fun3_range_proof_bits(log_n)
        rng = np.random.default_rng(seed)
        from .ops import field as F
        n = 1 << log_n
        bits = (prog.num_inputs - n) // n
        vals = rng.integers(0, 1 << bits, size=n, dtype=np.uint64)
        bit_arr = ((vals[:, None] >> np.arange(bits)) & 1).reshape(-1)
        x = np.concatenate([bit_arr, vals]).astype(np.uint64)
        return prog, F.make(x, np.zeros_like(x))
    if fun == 4:
        from .models import sha256
        blocks_log2 = max(0, log_n - 14)   # one block ~ 2^14 gates
        prog, _ = sha256.build(blocks_log2=blocks_log2)
        rng = np.random.default_rng(seed)
        words = rng.integers(0, 1 << 32, size=(1 << blocks_log2, 16),
                             dtype=np.uint64)
        return prog, sha256.Sha256Builder(1 << blocks_log2).inputs(words)
    if fun == 5:
        from .models import aes
        blocks_log2 = max(0, log_n - 12)   # one block ~ 2^12 gates
        key = list(range(16))
        prog, _ = aes.build(blocks_log2=blocks_log2, key=key)
        rng = np.random.default_rng(seed)
        pts = rng.integers(0, 256, size=(1 << blocks_log2, 16),
                           dtype=np.uint64)
        return prog, aes.AesBuilder(1 << blocks_log2,
                                    aes.key_schedule(key)).inputs(pts)
    if fun == 6:
        prog = C.fun6_sql_range_query(log_n)
        return prog, C.random_inputs(prog, seed=seed, small=256)
    if fun == 7:
        prog = C.fun7_dummy(log_n, depth)
        return prog, C.random_inputs(prog, seed=seed)
    if fun == 8:
        prog = C.fun8_pruned_mlp(1 << log_n, [1 << log_n, 1 << (log_n - 1)])
        return prog, C.random_inputs(prog, seed=seed, small=1 << 16)
    if fun == 9:
        prog = C.fun9_mlp(1 << log_n, [1 << log_n, 1 << (log_n - 1)])
        return prog, C.random_inputs(prog, seed=seed, small=1 << 16)
    raise SystemExit(f"unknown workload fun={fun} (expected 1-9)")


def cmd_prove(args) -> dict:
    jax = _setup_jax()
    from .config import HobbitConfig
    from .core import prover
    from .utils import metrics

    # fun 1/7/8 mirror the reference's prove_arbitrary_circuit (committed
    # circuit stream, main.cpp:1224-1229); the rest mirror prove_circuit
    # (verifier knows the circuit, main.cpp:1231)
    cfg = HobbitConfig(buffer_bits=args.buffer_bits,
                       linear_time=args.linear_time,
                       recursion=not args.no_recursion,
                       pc_queries=args.pc_queries,
                       committed_circuit=args.fun in (1, 7, 8))
    prog, x = _workload(args.fun, args.log_n, args.depth, args.seed)
    print(f"# fun={args.fun} gates={prog.num_gates} "
          f"buffer=2^{args.buffer_bits} device={jax.devices()[0]}",
          file=sys.stderr)

    t0 = time.perf_counter()
    ccom, _ = prover.commit_circuit(prog, cfg, pc_rows=args.pc_rows)
    jax.block_until_ready(ccom.root)
    preprocess = time.perf_counter() - t0

    streaming = None if args.streaming < 0 else bool(args.streaming)
    warm = None
    for run in range(2 if args.warm else 1):
        t0 = time.perf_counter()
        proof, state = prover.prove(prog, x, cfg, pc_rows=args.pc_rows,
                                    streaming=streaming, circuit_com=ccom)
        jax.block_until_ready(state)
        pt = time.perf_counter() - t0
        if run == 0:
            cold = pt
        warm = pt
    ps = metrics.proof_size_kb(proof)

    ok, _ = prover.verify(proof, prog, cfg, ccom.root, pc_rows=args.pc_rows)
    t0 = time.perf_counter()
    ok, _ = prover.verify(proof, prog, cfg, ccom.root, pc_rows=args.pc_rows)
    vt = time.perf_counter() - t0
    if not bool(ok):
        raise SystemExit("VERIFICATION FAILED")

    # the reference's metric lines (main.cpp:856)
    print(f"Pt : {warm:.6f}")
    print(f"Ps : {ps:.6f} KB")
    print(f"Vt : {vt:.6f}")
    phases = " ".join(f"{k}={v:.2f}s" for k, v in proof.timings.items())
    print(f"# cold(incl. compile)={cold:.2f}s preprocess={preprocess:.2f}s "
          f"phases: {phases}", file=sys.stderr)
    return {"fun": args.fun, "log_n": args.log_n, "gates": prog.num_gates,
            "Pt": warm, "Ps_kb": ps, "Vt": vt, "cold": cold}


def cmd_pc(args) -> dict:
    """PC micro-benchmark: test_PC / test_Elastic_PC analog.

    options (Our_PC.cpp:757-860): 1=ours/RS 2=Orion 3=Brakedown
    4=ours/Spielman 5=BrakingBase 6=WHIR; elastic variants via --elastic
    (Elastic_PC.cpp:736-808): 1=streaming RS, 2=streaming Spielman,
    3=streaming Brakedown (1-D expander rows)."""
    jax = _setup_jax()
    import jax.numpy as jnp
    from .ops import field as F
    from .ops import mimc

    N = 1 << args.log_n
    key = jax.random.PRNGKey(args.seed)
    msg = F.frandom(key, (N,))
    x = F.frandom(jax.random.PRNGKey(args.seed + 1), (args.log_n,))
    state = mimc.fresh_state()
    t0 = time.perf_counter()

    if args.elastic and args.option == 3:
        from .pc import brakedown as bd
        # reference buffer rule: B = 2^(floor(n/2)+6) (Elastic_PC.cpp:786-791)
        n = args.log_n
        bb = (n // 2 + 6) if n % 2 else ((n - 1) // 2 + 6)
        B = min(N // 4, 1 << bb)
        params = bd.BrakedownStreamParams(N=N, B=B,
                                          queries=args.queries or 2935)
        chunk_fn = lambda i: msg[i * B:(i + 1) * B]
        com = bd.commit_brakedown_stream(chunk_fn, params)
        jax.block_until_ready(com.root)
        commit_t = time.perf_counter() - t0
        t0 = time.perf_counter()
        opening, st = bd.open_brakedown_stream(chunk_fn, com, x, state)
        jax.block_until_ready(st)
        open_t = time.perf_counter() - t0
        t0 = time.perf_counter()
        okv, _ = bd.verify_brakedown_stream(com.root, x, opening, params,
                                            state)
        vt = time.perf_counter() - t0
        ok = bool(okv)
    elif args.elastic:
        from .pc import elastic
        from .pc import standard as std
        lt = args.option == 2
        params = std.make_params(N, args.k, args.rows, linear_time=lt,
                                 queries=args.queries)
        B = N // args.k
        com = elastic.commit_stream(lambda i: msg[i * B:(i + 1) * B],
                                    params, full=msg)
        jax.block_until_ready(com.root)
        commit_t = time.perf_counter() - t0
        t0 = time.perf_counter()
        opening, st = elastic.open_stream_recursive(
            lambda i: msg[i * B:(i + 1) * B], com, x, state, full=msg)
        jax.block_until_ready(st)
        open_t = time.perf_counter() - t0
        t0 = time.perf_counter()
        okv, _ = elastic.verify_recursive(com.root, x, opening, params,
                                          state)
        vt = time.perf_counter() - t0
        ok = bool(okv)
    elif args.option in (1, 4):
        from .pc import standard as std
        lt = args.option == 4
        params = std.make_params(N, args.k, args.rows, linear_time=lt,
                                 queries=args.queries)
        com = std.commit(msg, params)
        jax.block_until_ready(com.root)
        commit_t = time.perf_counter() - t0
        t0 = time.perf_counter()
        opening, st = std.open_recursive(msg, com, x, params, state)
        jax.block_until_ready(opening.eval_claim)
        open_t = time.perf_counter() - t0
        t0 = time.perf_counter()
        okv, _ = std.verify_recursive(com.root, x, opening, params, state)
        vt = time.perf_counter() - t0
        ok = bool(okv)
    elif args.option in (2, 3, 5):
        from .pc import brakedown as bd
        params = bd.BrakedownParams(N=N, rows=args.rows,
                                    queries=args.queries or 128)
        com = bd.commit(msg, params)
        jax.block_until_ready(com.root)
        commit_t = time.perf_counter() - t0
        t0 = time.perf_counter()
        if args.option == 2:
            from .pc import orion
            opening, st = orion.open(msg, com, x, params, state)
            open_t = time.perf_counter() - t0
            t0 = time.perf_counter()
            okv, _ = orion.verify(com.root, x, opening, params, state)
        elif args.option == 5:
            opening, st = bd.open_brakingbase(msg, com, x, params, state)
            open_t = time.perf_counter() - t0
            t0 = time.perf_counter()
            okv, _ = bd.verify_brakingbase(com.root, x, opening, params,
                                           state)
        else:
            opening, st = bd.open(msg, com, x, params, state)
            open_t = time.perf_counter() - t0
            t0 = time.perf_counter()
            okv, _ = bd.verify(com.root, x, opening, params, state)
        vt = time.perf_counter() - t0
        ok = bool(okv)
    else:
        from .pc import whir
        com = whir.commit(msg)
        jax.block_until_ready(com.tree.root)
        commit_t = time.perf_counter() - t0
        t0 = time.perf_counter()
        from .ops import poly
        y = poly.evaluate_vector(msg, x)
        proof, st = whir.prove(com, msg, x, state)
        open_t = time.perf_counter() - t0
        t0 = time.perf_counter()
        okv, _ = whir.verify(com.tree.root, proof, x, y, state)
        vt = time.perf_counter() - t0
        ok = bool(okv)

    if not ok:
        raise SystemExit("PC VERIFICATION FAILED")
    print(f"Commit time: {commit_t:.6f}")
    print(f"Total time: {commit_t + open_t:.6f}")
    print(f"PC : vt = {vt:.6f}")
    return {"log_n": args.log_n, "option": args.option,
            "elastic": args.elastic, "commit_s": commit_t,
            "open_s": open_t, "verify_s": vt}


SWEEPS = {
    # name: (fun, buffer_bits, log_n range, depth) — the shell scripts
    "sql": (6, 19, range(14, 18), 1),        # sql_test.sh (fun 6)
    "aes": (5, 19, range(14, 17), 1),        # test_aes.sh
    "arb": (1, 21, range(16, 21), 8),        # test_arb.sh (fun 1)
    "mlp": (9, 19, range(6, 9), 1),          # MLP_test.sh
    "pruned_mlp": (8, 19, range(6, 9), 1),   # pruned_MLP.sh
    "range": (2, 19, range(14, 17), 1),
}


def cmd_sweep(args) -> dict:
    fun, bb, rng, depth = SWEEPS[args.name]
    rows = []
    for log_n in rng:
        sub = argparse.Namespace(
            fun=fun, buffer_bits=min(bb, args.max_buffer_bits),
            log_n=log_n, depth=depth, seed=0, pc_rows=args.pc_rows,
            pc_queries=args.pc_queries, warm=True, streaming=-1,
            linear_time=False, no_recursion=False)
        rows.append(cmd_prove(sub))
    print(json.dumps(rows, indent=1))
    return {"sweep": args.name, "rows": rows}


def build_parser():
    ap = argparse.ArgumentParser(prog="hobbit_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("prove", help="prove+verify one workload circuit")
    p.add_argument("--fun", type=int, required=True, help="workload 1-9")
    p.add_argument("--buffer-bits", type=int, default=19)
    p.add_argument("--log-n", type=int, default=14)
    p.add_argument("--depth", type=int, default=8)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--pc-rows", type=int, default=256)
    p.add_argument("--pc-queries", type=int, default=None)
    p.add_argument("--warm", action="store_true",
                   help="time a second (compile-amortized) run")
    p.add_argument("--streaming", type=int, default=-1,
                   help="-1 auto, 0 materialized, 1 O(B)-resident")
    p.add_argument("--linear-time", action="store_true")
    p.add_argument("--no-recursion", action="store_true")
    p.set_defaults(fn=cmd_prove)

    p = sub.add_parser("pc", help="PC micro-benchmark (test_PC analog)")
    p.add_argument("--log-n", type=int, default=16)
    p.add_argument("--option", type=int, default=1,
                   help="1 ours/RS 2 Orion 3 Brakedown 4 ours/Spielman "
                        "5 BrakingBase 6 WHIR")
    p.add_argument("--k", type=int, default=16)
    p.add_argument("--rows", type=int, default=64)
    p.add_argument("--queries", type=int, default=64)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--elastic", action="store_true",
                   help="streaming Elastic variant (test_Elastic_PC)")
    p.set_defaults(fn=cmd_pc)

    p = sub.add_parser("sweep", help="benchmark sweeps (shell-script analogs)")
    p.add_argument("name", choices=sorted(SWEEPS))
    p.add_argument("--pc-rows", type=int, default=256)
    p.add_argument("--pc-queries", type=int, default=None)
    p.add_argument("--max-buffer-bits", type=int, default=19)
    p.set_defaults(fn=cmd_sweep)
    return ap


def main(argv=None):
    args = build_parser().parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
