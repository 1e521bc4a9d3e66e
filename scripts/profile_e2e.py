"""Fine-grained phase profile of the flagship fun6 proof on the attached TPU.

Times every phase of core.prover.prove plus a sub-phase breakdown of the
wiring mul-tree (top tree vs level descent vs binding).  Run twice to
separate compile from execution:  python scripts/profile_e2e.py [log_n [bb]]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("HOBBIT_JIT", "1")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)
_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      ".jax_cache_tpu")
os.makedirs(_CACHE, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from hobbit_tpu.config import HobbitConfig
from hobbit_tpu.core import gate_consistency as gc
from hobbit_tpu.core import mul_tree, prover
from hobbit_tpu.core import mul_tree_stream as mts
from hobbit_tpu.models import circuits as C
from hobbit_tpu.ops import field as F
from hobbit_tpu.ops import mimc, poly
from hobbit_tpu.pc import standard as pc
from hobbit_tpu.streams import trace as trc
from hobbit_tpu.streams import views

LOG_N = int(sys.argv[1]) if len(sys.argv) > 1 else 17
BB = int(sys.argv[2]) if len(sys.argv) > 2 else 19


def tic():
    return time.perf_counter()


def toc(t0, label, sync=None):
    if sync is not None:
        jax.block_until_ready(sync)
    dt = time.perf_counter() - t0
    print(f"  {label:40s} {dt:8.2f}s", flush=True)
    return dt


def main():
    cfg = HobbitConfig(buffer_bits=BB)
    print(f"fun6 log_n={LOG_N} buffer_bits={BB} device={jax.devices()[0]}")

    t0 = tic()
    prog = C.fun6_sql_range_query(LOG_N)
    toc(t0, "build program (host)")
    print(f"  gates={prog.num_gates} wires={prog.num_wires} "
          f"levels={len(prog.levels)} slots={prog.num_slots}")
    x = C.random_inputs(prog, seed=3, small=256)

    t0 = tic()
    oracle = trc.TraceOracle(prog, x)
    tr = oracle.trace()
    toc(t0, "witness gen (execute)", tr.val_o)

    # witness commit
    t0 = tic()
    wpoly = prover.build_witness_poly(tr)
    toc(t0, "build_witness_poly", wpoly)
    N4 = wpoly.shape[0]
    rows = max(4, cfg.tensor_row_size)
    print(f"  N4={N4} (2^{int(np.log2(N4))}) rows={rows}")
    use_elastic = (N4 > 2 * cfg.buffer_space and N4 // cfg.buffer_space <= 32)
    t0 = tic()
    if use_elastic:
        from hobbit_tpu.pc import elastic
        K_el = max(4, N4 // cfg.buffer_space)
        params = pc.make_params(N4, K_el, rows, linear_time=cfg.linear_time,
                                queries=min(64, 790))
        commitment = elastic.commit_stream(
            lambda i: wpoly[i * params.B:(i + 1) * params.B], params)
    else:
        params = pc.make_params(N4, 4, rows, linear_time=cfg.linear_time,
                                queries=min(64, 790))
        commitment = pc.commit(wpoly, params)
    toc(t0, f"witness commit (elastic={use_elastic})", commitment.root)

    state = mimc.fresh_state()
    state = mimc.absorb(state, commitment.root.astype(jnp.uint64).reshape(4, 2))

    # wiring sets
    t0 = tic()
    state, ab = mimc.squeeze(state, 2)
    a, b = ab[0], ab[1]
    reads, writes = views.wiring_read_write_sets(tr, a, b)
    init, fin = views.wiring_init_final_sets(tr, prog.num_inputs, a, b)
    wflat, wV, wsize = prover._set_matrix([reads, writes, init, fin])
    toc(t0, "wiring sets", wflat)
    total = wV * wsize
    B0 = cfg.buffer_space
    print(f"  wV={wV} wsize=2^{int(np.log2(wsize))} total=2^{int(np.log2(total))} B0=2^{BB}")

    # --- wiring mul-tree, instrumented --------------------------------------
    chunk_fn = mts.flat_oracle(wflat)
    if total <= 2 * B0:
        t0 = tic()
        wiring_proof, _, _, state = mts.prove(chunk_fn, wV, wsize, state, B0)
        toc(t0, "wiring mul-tree (small)", state)
    else:
        layers = int(np.log2(total // (2 * B0)))
        print(f"  layers={layers}")
        t0 = tic()
        top_stream = mts._read_top(chunk_fn, layers, total, B0)
        toc(t0, "  top stream fold", top_stream)
        row = top_stream.shape[0] // wV
        rows_l = [top_stream[i * row:(i + 1) * row] for i in range(wV)]
        t0 = tic()
        top, state = mul_tree.prove(rows_l, state)
        toc(t0, "  top mul_tree.prove (in-mem)", state)
        point, claim = top.final_point, top.final_eval
        for l in range(layers - 1, -1, -1):
            K = total // ((1 << (l + 1)) * B0)
            t0 = tic()
            lp, point, claim, state = mts._prove_level(
                lambda i, l=l: chunk_fn(l, i, 2 * B0), K, B0, point, claim,
                state)
            toc(t0, f"  level {l} (K={K})", state)

    # gate consistency (lookup mode for fun6)
    np2 = N4 // 4
    B = min(cfg.buffer_space, np2 // 2)
    K = np2 // B
    t0 = tic()
    state, lkw = mimc.squeeze(state, 2)
    streams = views.gate_arrays_lookups(tr, lkw[0], lkw[1])
    padded = {nm: jnp.concatenate(
        [v, jnp.zeros((np2 - v.shape[0], 2), jnp.uint64)])
        for nm, v in streams.items()}
    toc(t0, "gc streams", padded["L"])
    t0 = tic()
    state, r = mimc.squeeze(state, int(np.log2(K * B)))
    gc_proof, _, _, state = gc.prove_lookups(
        lambda i: {nm: padded[nm][i * B:(i + 1) * B] for nm in padded},
        K, B, r, state)
    toc(t0, f"gate consistency (K={K}, B=2^{int(np.log2(B))})", state)

    # opening
    t0 = tic()
    pt = jnp.concatenate([gc_proof.mem_proof.challenges,
                          gc_proof.bind_proof.challenges], axis=0)
    zero = F.scalar(0)
    full_pt = jnp.concatenate([jnp.stack([zero, zero]), pt],
                              axis=0)[: int(np.log2(N4))]
    if use_elastic:
        from hobbit_tpu.pc import elastic
        opening, state = elastic.open_stream(
            lambda i: wpoly[i * params.B:(i + 1) * params.B],
            commitment, full_pt, state)
    else:
        opening, state = pc.open(wpoly, commitment, full_pt, params, state)
    toc(t0, "witness open", state)

    print("done")


if __name__ == "__main__":
    main()
