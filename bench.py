"""HOBBIT-TPU benchmark harness.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.

Primary metric: field multiplications/sec/chip (GF(p^2), p = 2^61-1) — the
kernel every HOBBIT component bottlenecks on (BASELINE.json north-star).
``vs_baseline`` compares against the reference C implementation's
single-thread AVX2 rate measured on this host (stored in
``baseline_numbers.json``).  Extra metrics: BLAKE3 Merkle leaf hashes/sec,
streaming gate-consistency fold throughput (gates/sec), tensor-code encode
throughput (coefficients/sec).
"""

import json
import os
import time

os.environ.setdefault("HOBBIT_JIT", "1")

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

from hobbit_tpu.ops import blake3
from hobbit_tpu.ops import encode as enc
from hobbit_tpu.ops import field as F


def _rand_field(rng, *shape):
    re = rng.integers(0, F.P, size=shape, dtype=np.uint64)
    im = rng.integers(0, F.P, size=shape, dtype=np.uint64)
    return jnp.stack([jnp.asarray(re), jnp.asarray(im)], axis=-1)


def bench_field_mult(rng, n=1 << 22, chain=8, reps=5):
    a = _rand_field(rng, n)
    b = _rand_field(rng, n)

    @jax.jit
    def run(c, b):
        for _ in range(chain):
            c = F.fmul(c, b)
        return c

    c = run(a, b)
    np.asarray(c)                 # compile + force full execution
    t0 = time.perf_counter()
    for _ in range(reps):
        c = run(c, b)             # dependency-chained: no overlap illusions
    np.asarray(c)                 # device->host sync bounds the wall clock
    dt = time.perf_counter() - t0
    return reps * chain * n / dt


def bench_merkle_hashes(rng, n_leaves=1 << 18, reps=5):
    vals = _rand_field(rng, n_leaves * 4).reshape(n_leaves, 4, 2)

    @jax.jit
    def run(v):
        d = blake3.hash_field_leaves(v)
        # feed digests back in as new leaf material (dependency chain)
        v2 = jnp.tile(d.astype(jnp.uint64).reshape(n_leaves, 2, 4)[:, :, :2]
                      .reshape(n_leaves, 2, 2), (1, 2, 1))
        return v2

    v = run(vals)
    np.asarray(v)
    t0 = time.perf_counter()
    for _ in range(reps):
        v = run(v)
    np.asarray(v)
    dt = time.perf_counter() - t0
    return reps * n_leaves / dt


def bench_fold_phase(rng, B=1 << 16, reps=5):
    from hobbit_tpu.core import gate_consistency as gc
    from hobbit_tpu.streams.views import GateArrays

    beta = _rand_field(rng, B)
    folds = {a: _rand_field(rng, B) for a in ("L", "R", "O", "sa", "sm", "M")}
    L, R = _rand_field(rng, B), _rand_field(rng, B)
    ga = GateArrays(L=L, R=R, O=F.fadd(L, R),
                    sel_add=jnp.zeros((B, 2), jnp.uint64).at[:, 0].set(1),
                    sel_mul=jnp.zeros((B, 2), jnp.uint64))

    @jax.jit
    def run(folds, ga):
        cur = gc._derived(ga)
        terms = gc._chunk_terms(beta, folds, cur)
        w = terms[0]
        new = {a: F.fadd(folds[a], F.fmul(w[None, :], cur[a])) for a in folds}
        return terms, new

    out = run(folds, ga)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(run(folds, ga))
        best = min(best, time.perf_counter() - t0)
    return B / best


def bench_tensor_encode(rng, N=1 << 18, rows=64, reps=5):
    spec = enc.make_tensor_spec(N, rows, linear_time=False)
    msg = _rand_field(rng, N)

    @jax.jit
    def run(m):
        return enc.tensor_encode(spec, m)

    run(msg).block_until_ready()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        run(msg).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    return N / best


def main():
    rng = np.random.default_rng(42)
    mult_rate = bench_field_mult(rng)
    hash_rate = bench_merkle_hashes(rng)
    fold_rate = bench_fold_phase(rng)
    encode_rate = bench_tensor_encode(rng)

    baseline = None
    path = os.path.join(os.path.dirname(__file__), "baseline_numbers.json")
    if os.path.exists(path):
        with open(path) as f:
            baseline = json.load(f)
    vs = (mult_rate / baseline["field_mults_per_sec_cpu"]
          if baseline and baseline.get("field_mults_per_sec_cpu") else None)

    print(json.dumps({
        "metric": "field_mults_per_sec_per_chip",
        "value": mult_rate,
        "unit": "mults/s",
        "vs_baseline": vs,
        "extra": {
            "merkle_hashes_per_sec": hash_rate,
            "fold_phase_gates_per_sec": fold_rate,
            "tensor_encode_coeffs_per_sec": encode_rate,
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
