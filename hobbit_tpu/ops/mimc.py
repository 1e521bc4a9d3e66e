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


def mimc_hash(x, k):
    """MiMC(x, k): x, k field scalars [..., 2] (broadcastable)."""
    x, k = jnp.broadcast_arrays(x, k)
    consts = jnp.asarray(_COMMON)

    h = _cube(F.fadd(x, k))

    def round_fn(h, c):
        return _cube(F.fadd(F.fadd(h, k), c)), None

    h, _ = jax.lax.scan(round_fn, h, consts)
    return F.fadd(h, k)


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


def absorb(state, values):
    """Absorb field elements; values shaped [..., 2] (flattened in order)."""
    values = values.reshape(-1, 2)

    def step(s, v):
        return mimc_hash(s, v), None

    state, _ = jax.lax.scan(step, state, values)
    return state


def squeeze(state, n: int = 1):
    """Derive n challenges; returns (new_state, [n, 2] challenges)."""
    k = F.scalar(K_MIMC)

    def step(s, _):
        s = mimc_hash(s, k)
        return s, s

    state, rs = jax.lax.scan(step, state, None, length=n)
    return state, rs


def squeeze1(state):
    state, rs = squeeze(state, 1)
    return state, rs[0]


__all__ = [
    "ROUNDS", "K_MIMC", "mimc_hash", "mimc_multihash",
    "fresh_state", "absorb", "squeeze", "squeeze1",
]
