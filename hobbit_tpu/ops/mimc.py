"""MiMC-161 Fiat-Shamir hash and transcript state.

Same permutation as the reference (``src/mimc.cpp:90-107``): 161 rounds of
t = state + key (+ round constant), state = t^3, returning state + key, with
round constants C[i] = F(i) and K = F(213).  The reference derives *initial*
challenges from libc ``rand()``; here every challenge comes from the MiMC
sponge itself (deterministic, reproducible, and sound Fiat-Shamir), so
transcripts are self-consistent rather than process-dependent.

The whole chain is jit-compatible: absorbing runs as a ``lax.scan`` over the
values, with an inner scan over the 161 rounds.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from . import field as F

ROUNDS = 161
K_MIMC = 213

# C[i] = F(i), i in 0..159 (mimc.cpp:14-18)
_COMMON = np.zeros((ROUNDS - 1, 2), dtype=np.uint64)
_COMMON[:, 0] = np.arange(ROUNDS - 1, dtype=np.uint64)


def _cube(t):
    return F.fmul(F.fmul(t, t), t)


@jax.jit
def mimc_hash(x, k):
    """MiMC(x, k): x, k field scalars [..., 2] (broadcastable).

    Jitted at module level: called eagerly, each invocation would re-trace
    and re-lower the 161-round scan (the inner closure is fresh per call,
    so the eager-scan lowering cache never hits — ~55ms of pure Python/MLIR
    work per call, dominating tight transcript loops)."""
    x, k = jnp.broadcast_arrays(x, k)
    consts = jnp.asarray(_COMMON)

    h = _cube(F.fadd(x, k))

    def round_fn(h, c):
        return _cube(F.fadd(F.fadd(h, k), c)), None

    h, _ = jax.lax.scan(round_fn, h, consts)
    return F.fadd(h, k)


def mimc_hash_segments(x, k, partitions: int = 4):
    """Segmented MiMC: intermediate states at ``partitions`` boundaries.

    The reference exposes the 161-round chain in segments for in-circuit
    verification of the transcript (``mimc.cpp:68-88``): the first 160
    rounds are split into ``partitions`` equal blocks whose end states are
    recorded, then the final round (constant C[159]) and the ``+k`` output
    whitening are applied to the last segment — so
    ``mimc_hash_segments(x, k)[-1] == mimc_hash(x, k)``.

    Returns [partitions, 2]."""
    if 160 % partitions:
        raise ValueError("partitions must divide 160")
    per = 160 // partitions
    consts = jnp.asarray(_COMMON)          # C[i] for rounds 1..160

    def round_fn(h, c):
        return _cube(F.fadd(F.fadd(h, k), c)), None

    h = _cube(F.fadd(x, k))                # round 0
    segs = []
    for j in range(partitions):
        lo = max(0, per * j - 1)           # consts index of first round > 0
        hi = per * (j + 1) - 1
        if hi > lo:
            h, _ = jax.lax.scan(round_fn, h, consts[lo:hi])
        segs.append(h)
    # final round + output whitening fold into the last segment
    h = _cube(F.fadd(F.fadd(h, k), consts[159]))
    segs[-1] = F.fadd(h, k)
    return jnp.stack(segs)


def mimc_multihash(values):
    """Chain-hash a [n, 2] array: h = h + v + MiMC(v, h) (mimc.cpp:136-142)."""

    def step(h, v):
        return F.fadd(F.fadd(h, v), mimc_hash(v, h)), None

    h, _ = jax.lax.scan(step, F.zeros(()), values)
    return h


# ---------------------------------------------------------------------------
# Transcript
# ---------------------------------------------------------------------------

def fresh_state(seed: int = 0):
    """Initial transcript state."""
    return F.scalar(seed)


@jax.jit
def _absorb_chain(state, values):
    """Absorb a [n, 2] vector as ONE flattened scan over n*161 MiMC steps.

    A nested formulation (scan over n of mimc_hash's inner 161-round
    scan) lowers to one While per element when the outer loop is
    unrolled, and each While costs seconds of TPU backend compile on the
    remote service — protocol programs contain dozens of absorbs, which
    made While count the dominant compile cost.  The flattened chain is
    exactly the same arithmetic (round j of element i at step i*161+j),
    so transcripts are unchanged."""
    n = values.shape[0]
    # per-step round constant (C[i-1] for rounds 1..160, 0 for round 0);
    # keys/constants are GATHERED by the carried step counter instead of
    # pre-repeated xs arrays (a 161x HBM copy of everything absorbed)
    cs = jnp.concatenate(
        [jnp.zeros((1, 2), jnp.uint64), jnp.asarray(_COMMON)], axis=0)

    def step(carry, _):
        h, out, i = carry
        r = i % ROUNDS
        k = values[i // ROUNDS]
        c = cs[r]
        x = jnp.where(r == 0, out, h)
        h2 = _cube(F.fadd(F.fadd(x, k), c))
        out2 = jnp.where(r == ROUNDS - 1, F.fadd(h2, k), out)
        return (h2, out2, i + 1), None

    (_, state, _), _ = jax.lax.scan(
        step, (jnp.zeros_like(state), state, jnp.int32(0)), None,
        length=n * ROUNDS)
    return state


def absorb(state, values):
    """Absorb field elements; values shaped [..., 2] (flattened in order).

    One compiled kernel (a single flattened XLA While) per length."""
    values = values.reshape(-1, 2)
    if values.shape[0] == 0:
        return state
    return _absorb_chain(state, values)


import functools


@functools.partial(jax.jit, static_argnames=("n",))
def _squeeze_chain(state, n: int):
    """n sequential challenges as ONE flattened n*161-step scan (see
    ``_absorb_chain`` for why: one XLA While instead of n)."""
    k = F.scalar(K_MIMC)
    cs = jnp.concatenate(
        [jnp.zeros((1, 2), jnp.uint64), jnp.asarray(_COMMON)], axis=0)
    cs = jnp.tile(cs, (n, 1))
    step_i = jnp.arange(n * ROUNDS, dtype=jnp.int32)
    first = (step_i % ROUNDS) == 0
    last = (step_i % ROUNDS) == (ROUNDS - 1)

    def step(carry, xs):
        h, out = carry
        c, fst, lst = xs
        x = jnp.where(fst, out, h)
        h2 = _cube(F.fadd(F.fadd(x, k), c))
        out2 = jnp.where(lst, F.fadd(h2, k), out)
        return (h2, out2), jnp.where(lst, out2, 0)

    (_, state), ys = jax.lax.scan(
        step, (jnp.zeros_like(state), state), (cs, first, last))
    rs = ys.reshape(n, ROUNDS, 2)[:, ROUNDS - 1]
    return state, rs


def squeeze(state, n: int = 1):
    """Derive n challenges; returns (new_state, [n, 2] challenges)."""
    if n == 0:
        return state, jnp.zeros((0, 2), dtype=jnp.uint64)
    return _squeeze_chain(state, n)


def squeeze1(state):
    state, rs = squeeze(state, 1)
    return state, rs[0]


@jax.jit
def _absorb_squeeze1_chain(state, values):
    """absorb(values) immediately followed by squeeze1, as ONE flattened
    (n+1)*161-step chain.  Inside scanned sumcheck rounds the two
    separate MiMC Whiles cost ~2.8 ms of nested-While launch overhead
    EACH on the remote TPU runtime (measured: 19 rounds of absorb[5]+
    squeeze1 under a scan = 108 ms vs 1.4 ms standalone); fusing halves
    the launches.  Bit-identical to absorb-then-squeeze1: the first n
    blocks key on values[j], the last block keys on K_MIMC from the
    absorbed state."""
    n = values.shape[0]
    cs = jnp.concatenate(
        [jnp.zeros((1, 2), jnp.uint64), jnp.asarray(_COMMON)], axis=0)
    kq = F.scalar(K_MIMC)

    def step(carry, _):
        h, out, i = carry
        r = i % ROUNDS
        j = i // ROUNDS
        k = jnp.where(j < n, values[jnp.minimum(j, n - 1)], kq)
        c = cs[r]
        x = jnp.where(r == 0, out, h)
        h2 = _cube(F.fadd(F.fadd(x, k), c))
        out2 = jnp.where(r == ROUNDS - 1, F.fadd(h2, k), out)
        return (h2, out2, i + 1), None

    (_, out, _), _ = jax.lax.scan(
        step, (jnp.zeros_like(state), state, jnp.int32(0)), None,
        length=(n + 1) * ROUNDS)
    return out, out


def absorb_squeeze1(state, values):
    """Fused absorb + squeeze1 (identical transcript, one While)."""
    values = values.reshape(-1, 2)
    if values.shape[0] == 0:
        return squeeze1(state)
    return _absorb_squeeze1_chain(state, values)


@functools.partial(jax.jit, static_argnames=("n",))
def _expand_kernel(state, n: int):
    k = F.scalar(K_MIMC)
    state = mimc_hash(state, k)                 # seed absorbs the chain
    ctr = jnp.zeros((n, 2), dtype=jnp.uint64)
    ctr = ctr.at[:, 0].set(jnp.arange(1, n + 1, dtype=jnp.uint64))
    outs = mimc_hash(ctr, state[None, :])       # ONE vectorized MiMC pass
    return state, outs


def expand(state, n: int):
    """Counter-mode challenge expansion: one squeeze for a seed, then n
    challenges out[i] = MiMC(i+1, seed) computed in PARALLEL.

    Used for query-index sampling (hundreds of indices per opening): the
    sequential ``squeeze`` chain costs n dependent 161-round MiMC
    evaluations (a ~n-deep latency chain on device), while the
    counter-mode expansion is one squeeze plus one batched MiMC — sound
    Fiat-Shamir (the seed binds the transcript, the expansion is public
    and injective per counter).  The reference uses libc ``rand()`` for
    the same indices (Virgo.cpp:398 etc.); this is the deterministic
    replacement.  Returns (state', [n, 2])."""
    if n == 0:
        return state, jnp.zeros((0, 2), dtype=jnp.uint64)
    return _expand_kernel(state, n)


__all__ = [
    "ROUNDS", "K_MIMC", "mimc_hash", "mimc_hash_segments", "mimc_multihash",
    "fresh_state", "absorb", "squeeze", "squeeze1", "absorb_squeeze1", "expand",
]
