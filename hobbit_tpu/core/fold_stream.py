"""Generic fold-phase streaming sumcheck engine.

The common two-pass O(B)-memory pattern behind the reference's streaming
provers (``prove_gate_consistency[_lookups]`` sumcheck.cpp:503-981, the
level descent of the streaming mul-tree, the batched stream sumchecks
sumcheck.cpp:1150-1621), factored once:

Statement: for named streams A_1..A_m of length N = K*B and term groups
g (subsets of names, degree = |g| <= 3), prove the per-group sums

    S_g = sum_x beta(r, x) * prod_{a in g} A_a(x)

at a fixed point r (beta factorizes chunk-locally:
beta_N(r, (x,i)) = beta_B(r_lo, x) * beta_K(r_hi, i)).

PASS 1 (fold): per chunk emit, for every group, the cross-term
coefficients K_1..K_d of prod (fold_a + w * cur_a) - prod fold_a expanded
in the chunk weight w (squeezed AFTER absorbing the terms); fold every
stream; d-th ("pure") coefficients recombine with beta_K into the true S_g
on the verifier side.

IN-MEMORY: one mixed-degree sumcheck over the folded buffers proving the
w-weighted combined claim -> point rho.

PASS 2 (bind): per-chunk partial evaluations P_a[i] = <beta_B(rho), A_a^i>
proven consistent with the folds by a mixed sumcheck against the w vector
-> point sigma; every stream lands on ONE point (rho, sigma) whose claimed
evaluations the caller binds to its commitments.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Sequence, Tuple

import numpy as np

import jax.numpy as jnp

from ..ops import field as F
from ..utils.jitting import maybe_jit
from ..ops import mimc, poly
from . import sumcheck as sc


class FoldStreamProof(NamedTuple):
    per_chunk: jnp.ndarray            # [K, T, 2] all groups' coefficients
    mem_proof: sc.MixedSumcheckProof  # folds at rho
    bind_proof: sc.MixedSumcheckProof # partial evals at sigma
    names: tuple
    groups: tuple


def _group_coeffs(beta, folds, cur, g):
    """Coefficients K_1..K_d of prod_a (fold_a + w cur_a) - prod_a fold_a,
    as polynomials in w, each summed against beta."""
    d = len(g)
    # DP over the group members: acc[j] = vector coefficient of w^j in
    # prod_a (fold_a + w * cur_a)
    acc = [jnp.broadcast_to(F.ones(())[None, :], beta.shape).astype(jnp.uint64)]
    for a in g:
        new = [None] * (len(acc) + 1)
        for j, c in enumerate(acc):
            t0 = F.fmul(c, folds[a])
            t1 = F.fmul(c, cur[a])
            new[j] = t0 if new[j] is None else F.fadd(new[j], t0)
            new[j + 1] = t1 if new[j + 1] is None else F.fadd(new[j + 1], t1)
        acc = new
    # acc[0] is the all-fold term (already counted in the running claim)
    return [F.fdot(beta, acc[j]) for j in range(1, d + 1)]


def prove(chunk_fn: Callable[[int], dict], names: Sequence[str],
          groups: Sequence[Tuple[str, ...]], K: int, B: int, r, state):
    """chunk_fn(i) -> dict name -> [B, 2] (re-callable for pass 2).

    Returns (FoldStreamProof, point, stream_evals, state)."""
    names = tuple(names)
    groups = tuple(tuple(g) for g in groups)
    lb = int(np.log2(B))
    r_lo, r_hi = r[:lb], r[lb:]
    beta = poly.beta_table(r_lo)

    zeros = jnp.zeros((B, 2), dtype=jnp.uint64)
    folds = {a: zeros for a in names}
    ws, per_chunk = [], []
    C = [F.scalar(0) for _ in groups]    # running folded claims per group
    for i in range(K):
        cur = chunk_fn(i)
        terms = []
        for g in groups:
            terms.extend(_group_coeffs(beta, folds, cur, g))
        terms = jnp.stack(terms)
        state, w = mimc.absorb_squeeze1(state, terms)
        wp = w
        ti = 0
        for gi, g in enumerate(groups):
            wp = w
            for j in range(len(g)):
                C[gi] = F.fadd(C[gi], F.fmul(wp, terms[ti]))
                wp = F.fmul(wp, w)
                ti += 1
        for a in names:
            folds[a] = F.fadd(folds[a], F.fmul(w[None, :], cur[a]))
        ws.append(w)
        per_chunk.append(terms)
    w_vec = jnp.stack(ws)

    # in-memory mixed sumcheck over folds
    state, gw = mimc.squeeze(state, len(groups))
    mem_groups = tuple(("beta",) + g for g in groups)
    mem_proof, state = sc.prove_mixed({"beta": beta, **folds}, mem_groups,
                                      gw, state)
    rho = mem_proof.challenges

    # pass 2: binding
    beta_rho = poly.beta_table(rho)
    Ps = {a: [] for a in names}
    for i in range(K):
        cur = chunk_fn(i)
        for a in names:
            Ps[a].append(F.fdot(beta_rho, cur[a]))
    bind_arrays = {"w": w_vec}
    for a in names:
        bind_arrays[f"P{a}"] = jnp.stack(Ps[a])
    bind_groups = tuple(("w", f"P{a}") for a in names)
    state, uw = mimc.squeeze(state, len(names))
    bind_proof, state = sc.prove_mixed(bind_arrays, bind_groups, uw, state)
    sigma = bind_proof.challenges

    point = jnp.concatenate([rho, sigma], axis=0)
    evals = {a: bind_proof.final_evals[f"P{a}"] for a in names}
    proof = FoldStreamProof(per_chunk=jnp.stack(per_chunk),
                            mem_proof=mem_proof, bind_proof=bind_proof,
                            names=names, groups=groups)
    return proof, point, evals, state


class FoldStreamResult(NamedTuple):
    ok: jnp.ndarray
    point: jnp.ndarray
    group_sums: tuple        # per-group true S_g (from pure terms + beta_K)
    stream_evals: dict


def verify(proof: FoldStreamProof, B: int, r, state):
    """Replay; returns (FoldStreamResult, state).  The caller checks the
    semantic identity over group_sums (e.g. S1+S2-S3 == 0) and binds
    stream_evals at `point` to its commitments."""
    names, groups = proof.names, proof.groups
    K = proof.per_chunk.shape[0]
    lb = int(np.log2(B))
    r_lo, r_hi = r[:lb], r[lb:]
    beta_K = poly.beta_table(r_hi)
    ok = jnp.array(True)

    ws = []
    C = [F.scalar(0) for _ in groups]
    S = [F.scalar(0) for _ in groups]
    for i in range(K):
        terms = proof.per_chunk[i]
        state, w = mimc.absorb_squeeze1(state, terms)
        ti = 0
        for gi, g in enumerate(groups):
            wp = w
            for j in range(len(g)):
                C[gi] = F.fadd(C[gi], F.fmul(wp, terms[ti]))
                if j == len(g) - 1:     # pure term
                    S[gi] = F.fadd(S[gi], F.fmul(beta_K[i], terms[ti]))
                wp = F.fmul(wp, w)
                ti += 1
        ws.append(w)
    w_vec = jnp.stack(ws)

    state, gw = mimc.squeeze(state, len(groups))
    claim = None
    for gi in range(len(groups)):
        t = F.fmul(gw[gi], C[gi])
        claim = t if claim is None else F.fadd(claim, t)
    mem_groups = tuple(("beta",) + g for g in groups)
    okm, rho, state = sc.verify_mixed(proof.mem_proof, claim, mem_groups,
                                      gw, state)
    ok = jnp.logical_and(ok, okm)
    fe = proof.mem_proof.final_evals
    ok = jnp.logical_and(ok, F.feq(fe["beta"], _eq_eval(r_lo, rho)))

    state, uw = mimc.squeeze(state, len(names))
    bind_claim = None
    for ai, a in enumerate(names):
        t = F.fmul(uw[ai], fe[a])
        bind_claim = t if bind_claim is None else F.fadd(bind_claim, t)
    bind_groups = tuple(("w", f"P{a}") for a in names)
    okb, sigma, state = sc.verify_mixed(proof.bind_proof, bind_claim,
                                        bind_groups, uw, state)
    ok = jnp.logical_and(ok, okb)
    w_eval = poly.evaluate_vector(w_vec, sigma)
    ok = jnp.logical_and(ok, F.feq(proof.bind_proof.final_evals["w"],
                                   w_eval))

    point = jnp.concatenate([rho, sigma], axis=0)
    evals = {a: proof.bind_proof.final_evals[f"P{a}"] for a in names}
    return FoldStreamResult(ok=ok, point=point, group_sums=tuple(S),
                            stream_evals=evals), state


@maybe_jit
def _eq_eval(r1, r2):
    one = F.scalar(1)
    acc = one
    for j in range(r1.shape[0]):
        acc = F.fmul(acc, F.fadd(
            F.fmul(F.fsub(one, r1[j]), F.fsub(one, r2[j])),
            F.fmul(r1[j], r2[j])))
    return acc


__all__ = ["FoldStreamProof", "FoldStreamResult", "prove", "verify"]
