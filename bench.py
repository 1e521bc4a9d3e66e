"""HOBBIT-TPU benchmark harness.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
The line is (re)printed as results accumulate — first after the micro
benches, again after the end-to-end proof — so a driver that records the
last JSON line always sees the most complete snapshot, and a driver that
times out still finds a parsed line.

A watchdog thread guarantees the process exits cleanly (after printing
the best snapshot so far) within ``HOBBIT_BENCH_BUDGET`` seconds even if
an XLA compile or a device hang would otherwise blow the caller's
timeout (round-2 regression: rc=124, no JSON emitted).

Primary metric: GF(p^2) field multiplications/sec/chip — the kernel every
HOBBIT component bottlenecks on (BASELINE.json north-star).
``vs_baseline`` compares against the reference C implementation's AVX2
4-lane rate measured on this host (``baseline_numbers.json``).

Measurement methodology: every kernel is timed with dependency-chained
repetitions and a SCALAR reduction output — on remote-attached TPUs the
device->host pull of a large result dominates wall clock otherwise, and
XLA strength-reduces loop-invariant chains unless the chain is
algebraically opaque (the modular reduction is).

CRITICAL (round-4 finding): operands MUST be explicit jit arguments,
never closure-captured.  On the remote-attached (axon) platform a jit
that closes over a 33 MB device array serializes it through the compile
RPC as a program constant: compile time goes 2 s -> ~100 s REGARDLESS of
graph size, and execution retraffics the constants every call (20e9
mults/s vs 300e9 with explicit args).  This single issue produced the
null BENCH payloads of rounds 1-3 and the 26e9->20e9 "regression".
"""

import json
import os
import sys
import threading
import time

os.environ.setdefault("HOBBIT_JIT", "1")

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)
# warm persistent compile cache (first e2e run populates it; subsequent
# bench invocations measure execution, not compilation).  Lives OUTSIDE
# the checkout (in ~/.cache) so it survives fresh clones on the same
# host — on this remote-attached platform every XLA compile has a ~1s
# floor, so a cold cache costs minutes regardless of program size.
_CACHE = os.environ.get(
    "HOBBIT_XLA_CACHE",
    os.path.join(os.path.expanduser("~"), ".cache", "hobbit_tpu_xla"))
os.makedirs(_CACHE, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from hobbit_tpu.ops import blake3
from hobbit_tpu.ops import encode as enc
from hobbit_tpu.ops import field as F

_T_START = time.perf_counter()
_BUDGET = float(os.environ.get("HOBBIT_BENCH_BUDGET", "540"))
_PAYLOAD = [None]          # best snapshot so far (watchdog prints this)
_DONE = threading.Event()


def _elapsed():
    return time.perf_counter() - _T_START


def _remaining():
    return _BUDGET - _elapsed()


def _emit(payload):
    _PAYLOAD[0] = payload
    print(json.dumps(payload), flush=True)


def _watchdog():
    if not _DONE.wait(max(1.0, _BUDGET - _elapsed())):
        # honest timeout: the last JSON line carries timed_out=true so a
        # budget kill is distinguishable from a completed run (round-4
        # regression: rc=0 + null fields read as "success")
        if _PAYLOAD[0] is not None:
            payload = dict(_PAYLOAD[0])
            extra = dict(payload.get("extra") or {})
            extra["timed_out"] = True
            payload["extra"] = extra
            print(json.dumps(payload), flush=True)
        os._exit(3)


def _tick(name):
    print(f"[bench {_elapsed():7.1f}s] {name}", file=sys.stderr, flush=True)


_SEED = [0]


def _rand_field(rng, *shape):
    # generated ON DEVICE: uploading 100+MB of host randomness through the
    # remote-attach tunnel dominated micro-bench wall clock otherwise
    _SEED[0] += 1
    key = jax.random.key(_SEED[0])

    @jax.jit
    def gen(key):
        bits = jax.random.bits(key, shape=tuple(shape) + (2,),
                               dtype=jnp.uint32).astype(jnp.uint64)
        hi = jax.random.bits(jax.random.split(key)[0],
                             shape=tuple(shape) + (2,),
                             dtype=jnp.uint32).astype(jnp.uint64)
        return ((hi << 32) | bits) % F.P

    return gen(key)


def _timeit(step, init_s, reps, windows=3):
    """Best-of-``windows`` timing: the tunneled chip shows up to 10x
    run-to-run variance (shared link + occasional co-tenant), so the
    minimum over a few short windows estimates the uncontended rate."""
    s = step(init_s)
    np.asarray(s)                   # compile + force execution
    best = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(reps):
            s = step(s)
        np.asarray(s)               # one tiny sync bounds the wall clock
        best = min(best, (time.perf_counter() - t0) / reps)
        if _remaining() < 60:
            break
    return best


def bench_field_mult(rng, n=1 << 22, chain=16, reps=8):
    """GF(p^2) multiply rate with a TRUE elementwise dependency chain.

    The accumulator (cr, ci) carries across calls AND across the in-call
    chain, so every multiply is on the critical path: a scalar-only carry
    (sum of results) let executions overlap/collapse and report
    impossible rates (the round-1..3 numbers moved 20e9-1200e9 run to
    run for this reason).  Roofline: one GF(p^2) mult lowers to ~130
    u64-emulated integer ops (3 Karatsuba base mulmods of ~36 32-bit
    multiplies + aux adds/shifts/selects); the v5e VPU sustains ~1e12
    int32 ops/s (8x128 lanes x ~940 MHz), so ~5-7e9 dependent mults/s
    IS speed-of-light for this kernel class — measured 5.6e9 =~ 0.73e12
    int-ops/s, ~76% of peak, justifying the XLA-only (no Pallas) field
    path."""
    a = _rand_field(rng, n)
    b = _rand_field(rng, n)
    br, bi = jnp.array(a[:, 0]), jnp.array(a[:, 1])

    @jax.jit
    def step(cr, ci, br, bi):
        for _ in range(chain):
            t = F.mulmod(cr + ci, br + bi)
            ac = F.mulmod(cr, br)
            bd = F.mulmod(ci, bi)
            cr = F.submod(ac, bd)
            ci = F.submod(F.submod(t, ac), bd)
        return cr, ci

    cr, ci = jnp.array(b[:, 0]), jnp.array(b[:, 1])
    out = step(cr, ci, br, bi)            # compile
    np.asarray(out[0][:1])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        c = (cr, ci)
        for _ in range(reps):
            c = step(c[0], c[1], br, bi)
        np.asarray(c[0][:1])
        best = min(best, (time.perf_counter() - t0) / reps)
        if _remaining() < 60:
            break
    return chain * n / best


def bench_merkle_hashes(rng, n_leaves=1 << 18, reps=8):
    vals = _rand_field(rng, n_leaves * 4).reshape(n_leaves, 4, 2)

    @jax.jit
    def step(s, vals):
        d = blake3.hash_field_leaves(vals)
        return jnp.sum(d.astype(jnp.uint64)) + s

    dt = _timeit(lambda s: step(s, vals), jnp.zeros((), jnp.uint64), reps)
    return n_leaves / dt


def bench_fold_phase(rng, B=1 << 18, reps=8):
    from hobbit_tpu.core import gate_consistency as gc
    from hobbit_tpu.streams.views import GateArrays

    beta = _rand_field(rng, B)
    folds = {a: _rand_field(rng, B) for a in ("L", "R", "O", "sa", "sm", "M")}
    L, R = _rand_field(rng, B), _rand_field(rng, B)
    ga = GateArrays(L=L, R=R, O=F.fadd(L, R),
                    sel_add=jnp.zeros((B, 2), jnp.uint64).at[:, 0].set(1),
                    sel_mul=jnp.zeros((B, 2), jnp.uint64))

    @jax.jit
    def step(s, beta, folds, ga):
        cur = gc._derived(ga)
        terms = gc._chunk_terms(beta, folds, cur)
        return F.fsum(terms)[0] + s

    dt = _timeit(lambda s: step(s, beta, folds, ga),
                 jnp.zeros((), jnp.uint64), reps)
    return B / dt


def bench_tensor_encode(rng, N=1 << 20, rows=64, reps=8):
    spec = enc.make_tensor_spec(N, rows, linear_time=False)
    msg = _rand_field(rng, N)

    @jax.jit
    def step(s, msg):
        cw = enc.tensor_encode(spec, msg)
        return jnp.sum(cw[:, 0, 0]) + s

    dt = _timeit(lambda s: step(s, msg), jnp.zeros((), jnp.uint64), reps)
    return N / dt


def bench_spielman_encode(rng, n=1 << 16, batch=16, reps=8):
    from hobbit_tpu.ops import expanders

    from hobbit_tpu.utils.closure import hoist_arrays

    code = expanders.build_code(n)
    msgs = _rand_field(rng, batch, n)
    code_arrs, rebuild = hoist_arrays(code)

    @jax.jit
    def step(s, msgs, code_arrs):
        cw = expanders.encode(rebuild(code_arrs), msgs)
        return jnp.sum(cw[:, 0, 0]) + s

    dt = _timeit(lambda s: step(s, msgs, code_arrs),
                 jnp.zeros((), jnp.uint64), reps)
    return batch * n / dt


def bench_e2e_sql(extra, mult_rate, buffer_bits=19, log_n=17):
    """Full proof of the SQL fun-6 workload at the reference's headline
    config (pigeon 6 19 17: Pt 94.3s, Ps 1329.89 KB on this host's CPU
    build).

    Methodology: one warm-up run amortizes XLA compilation (the analog of
    the reference's ahead-of-time C++ build step), then the proof is timed.
    A partial payload is (re)emitted after EVERY stage so an external
    kill at any point still leaves the most complete snapshot on stdout."""
    import time as _t
    from hobbit_tpu.config import HobbitConfig
    from hobbit_tpu.core import prover
    from hobbit_tpu.models import circuits as C
    from hobbit_tpu.utils import metrics

    def stage(key, val):
        extra[key] = val
        _emit(_payload(mult_rate, extra))

    try:
        # fun6 mirrors the reference's prove_circuit path (main.cpp:1231):
        # the verifier knows the circuit, so the circuit-description
        # commitment is public preprocessing and carries NO opening
        cfg = HobbitConfig(buffer_bits=buffer_bits, committed_circuit=False)
        prog = C.fun6_sql_range_query(log_n)
        x = C.random_inputs(prog, seed=3, small=256)
        # circuit-description commitment: input-independent preprocessing
        # (public input of verification), excluded from Pt like the
        # reference's non-arbitrary prove_circuit path
        _tick("e2e:commit_circuit")
        ccom, _ = prover.commit_circuit(prog, cfg, pc_rows=256)
        _tick("e2e:prove[cold]")
        t0 = _t.time()
        proof, _ = prover.prove(prog, x, cfg, pc_rows=256,
                                circuit_com=ccom)      # compile + warm
        stage("sql_fun6_n17_cold_sec", _t.time() - t0)
        stage("sql_fun6_n17_proof_kb", metrics.proof_size_kb(proof))
        cold = extra["sql_fun6_n17_cold_sec"]
        if _remaining() > 0.5 * cold + 30:
            _tick("e2e:prove[warm]")
            t0 = _t.time()
            proof, _ = prover.prove(prog, x, cfg, pc_rows=256,
                                    circuit_com=ccom)
            stage("sql_fun6_n17_prover_sec", _t.time() - t0)
        _tick("e2e:verify[cold]")
        t0 = _t.time()
        prover.verify(proof, prog, cfg, ccom.root, pc_rows=256)  # compile
        vt = _t.time() - t0
        stage("sql_fun6_n17_verifier_cold_sec", vt)
        stage("sql_fun6_n17_verifier_sec", vt)
        # warm verify is ~10 s once compiled — worth attempting with far
        # less margin than the cold number suggests
        if _remaining() > 45:
            _tick("e2e:verify[warm]")
            t0 = _t.time()
            prover.verify(proof, prog, cfg, ccom.root, pc_rows=256)
            stage("sql_fun6_n17_verifier_sec", _t.time() - t0)
    except Exception:
        import traceback
        traceback.print_exc(file=sys.stderr)


def _payload(mult_rate, extra):
    baseline = None
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "baseline_numbers.json")
    if os.path.exists(path):
        with open(path) as f:
            baseline = json.load(f)
    vs = (mult_rate / baseline["field_mults_per_sec_cpu"]
          if baseline and baseline.get("field_mults_per_sec_cpu") else None)
    extra = dict(extra)
    extra["sql_fun6_n17_reference_sec"] = (
        baseline or {}).get("sql_fun6_n17_prover_sec_cpu")
    extra["sql_fun6_n17_reference_proof_kb"] = (
        baseline or {}).get("sql_fun6_n17_proof_kb_cpu")
    return {
        "metric": "field_mults_per_sec_per_chip",
        "value": mult_rate,
        "unit": "mults/s",
        "vs_baseline": vs,
        "extra": extra,
    }


def main():
    threading.Thread(target=_watchdog, daemon=True).start()
    rng = np.random.default_rng(42)
    extra = {
        "merkle_hashes_per_sec": None,
        "fold_phase_gates_per_sec": None,
        "tensor_encode_coeffs_per_sec": None,
        "spielman_encode_coeffs_per_sec": None,
        "sql_fun6_n17_prover_sec": None,
        "sql_fun6_n17_cold_sec": None,
        "sql_fun6_n17_proof_kb": None,
        "sql_fun6_n17_verifier_sec": None,
        "sql_fun6_n17_verifier_cold_sec": None,
        "e2e_note": ("full end-to-end proof (witness gen + commit + "
                     "wiring mul-tree + lookups + gate consistency + "
                     "recursive multi-point openings); warm run timed "
                     "after one warm-up pass that amortizes XLA "
                     "compilation (the analog of the reference's "
                     "ahead-of-time C++ build); cold = first run incl. "
                     "compiles"),
        "device": str(jax.devices()[0]),
    }
    _tick("field_mult")
    mult_rate = bench_field_mult(rng)
    # headline + first parsed line on the record as early as possible
    _emit(_payload(mult_rate, extra))

    # the e2e proof is the round's key deliverable — run it BEFORE the
    # remaining micros so a tight driver budget still captures it
    if (os.environ.get("HOBBIT_BENCH_E2E", "1") != "0"
            and _remaining() > float(os.environ.get(
                "HOBBIT_BENCH_E2E_MIN", "120"))):
        _tick("e2e")
        bench_e2e_sql(extra, mult_rate)

    for key, fn in (
            ("merkle_hashes_per_sec", bench_merkle_hashes),
            ("fold_phase_gates_per_sec", bench_fold_phase),
            ("tensor_encode_coeffs_per_sec", bench_tensor_encode),
            ("spielman_encode_coeffs_per_sec", bench_spielman_encode)):
        if _remaining() < 30:
            break
        _tick(key)
        extra[key] = fn(rng)
        _PAYLOAD[0] = _payload(mult_rate, extra)
    _emit(_payload(mult_rate, extra))

    _DONE.set()


if __name__ == "__main__":
    main()
