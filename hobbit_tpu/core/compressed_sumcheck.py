"""Compressed-round streaming 2-product sumcheck (sqrt-space GKR engine).

TPU-native re-design of the reference's streaming Libra path
(``_generate_2product_sumcheck_proof_stream_beta``, prover.cpp:861-1211):
instead of one boolean variable per round, each group of c variables is a
single UNIVARIATE round: the streams' length-2^c blocks are interpreted as
evaluations on the coset D = <w_{2^c}>, coset-FFT'd to the double domain
D' = <w_{2^(c+1)}> (the reference's ``my_fft`` interpolate), pointwise
multiplied and accumulated into ONE round polynomial of degree < 2^(c+1)
transmitted in evaluation form (2^(c+1) values).  The verifier checks
sum over D (the even-indexed points of D') == claim and evaluates at the
challenge r.  The streams then fold by the Lagrange coefficient vector
L(r) over D — so one pass compresses c rounds.

Memory: each pass keeps one chunk + the tensor weight vector (size <= B)
resident — O(B); passes: one per group (log(N/B)/c of them) plus the
in-memory tail.  The reference gets away with 2 passes total by chaining
claims through a convolution-consistency sumcheck (compute_convolution,
utils.cpp:149-179); we re-stream per group instead — same O(N log / c)
work, simpler Fiat-Shamir — and return the generalized evaluation weights
(tensor of per-group Lagrange vectors x eq(z)) for the caller to bind
(transparently, or with a PC that supports generalized tensor points).
"""

from __future__ import annotations

from typing import Callable, List, NamedTuple, Tuple

import numpy as np

import jax.numpy as jnp

from ..ops import fft as fftm
from ..ops import field as F
from ..ops import mimc, poly
from . import sumcheck as sc


class CompressedSumcheckProof(NamedTuple):
    round_evals: tuple            # per group: [2^(c+1), 2] Q on D'
    tail: sc.SumcheckProof        # in-memory 2-product over the residue
    c: int                        # compression bits per group
    N: int
    B: int


def _block_extend(chunk, m: int):
    """[B, 2] -> [B/m, 2m, 2]: each m-block's evals on D_m extended to
    D_2m (IFFT_m -> zero-pad -> FFT_2m), vectorized over blocks."""
    B = chunk.shape[0]
    blocks = chunk.reshape(B // m, m, 2)
    coeffs = fftm._batch_fft(blocks, inverse=True)
    padded = jnp.concatenate(
        [coeffs, jnp.zeros((B // m, m, 2), dtype=jnp.uint64)], axis=1)
    return fftm._batch_fft(padded, inverse=False)


def _fold_weights(groups: List):
    """Tensor product of the per-group Lagrange vectors (latest fastest)."""
    return poly.convolution(list(reversed(groups))) if groups else None


def _eval_on_dprime(qe, r, m: int):
    """Evaluate the degree-<2m interpolant of evals-on-D_2m at r."""
    coeffs = fftm.ifft(qe)
    return poly.univariate_eval(coeffs, r)


def prove(vchunk: Callable[[int], jnp.ndarray],
          hchunk: Callable[[int], jnp.ndarray], N: int, B: int, c: int,
          state):
    """Proves sum_x V(x) H(x) over x in [N]; V/H streamed in B-chunks
    (re-callable).  Returns (proof, groups_r, tail_point, state):
    groups_r = per-group univariate challenges; the final claims are
    V~/H~ at the generalized point (see ``weight_vector``)."""
    m = 1 << c
    K = max(1, N // B)
    groups_L: List = []            # per-group Lagrange coefficient vectors
    round_evals = []
    groups_r = []
    rem = N

    while rem > B:
        W = _fold_weights(groups_L)          # [f, 2] or None
        f = 1 if W is None else W.shape[0]
        q = jnp.zeros((2 * m, 2), dtype=jnp.uint64)
        for i in range(K):
            v = vchunk(i)
            h = hchunk(i)
            if W is not None:
                v = F.fsum(F.fmul(v.reshape(-1, f, 2), W[None]), axis=1)
                h = F.fsum(F.fmul(h.reshape(-1, f, 2), W[None]), axis=1)
            ve = _block_extend(v, m)         # [nb, 2m, 2]
            he = _block_extend(h, m)
            q = F.fadd(q, F.fsum(F.fmul(ve, he), axis=0))
        state = mimc.absorb(state, q)
        state, r = mimc.squeeze1(state)
        L = poly.lagrange_coeffs(
            jnp.asarray(np.array(F.root_of_unity(c), np.uint64)), r, m)
        groups_L.append(L)
        groups_r.append(r)
        round_evals.append(q)
        rem //= m

    # materialize the fully folded residue (size rem <= B) and finish
    W = _fold_weights(groups_L)
    f = 1 if W is None else W.shape[0]
    vs, hs = [], []
    for i in range(K):
        v, h = vchunk(i), hchunk(i)
        if W is not None:
            v = F.fsum(F.fmul(v.reshape(-1, f, 2), W[None]), axis=1)
            h = F.fsum(F.fmul(h.reshape(-1, f, 2), W[None]), axis=1)
        vs.append(v)
        hs.append(h)
    vfull = jnp.concatenate(vs)[:rem]
    hfull = jnp.concatenate(hs)[:rem]
    tail, state = sc.prove_2product(vfull, hfull, state)

    proof = CompressedSumcheckProof(
        round_evals=tuple(round_evals), tail=tail, c=c, N=N, B=B)
    return proof, jnp.stack(groups_r) if groups_r else \
        jnp.zeros((0, 2), jnp.uint64), tail.challenges, state


def verify(proof: CompressedSumcheckProof, claim, state):
    """Replays; returns (ok, groups_r, tail_point, final_claims, state).
    final_claims = (V_eval, H_eval) at the generalized point; bind with
    ``weight_vector(groups_r, tail_point, proof.c)``."""
    m = 1 << proof.c
    ok = jnp.array(True)
    groups_r = []
    cur = claim
    for q in proof.round_evals:
        # sum over D_m = even-indexed points of D_2m
        s = F.fsum(q[0::2])
        ok = jnp.logical_and(ok, F.feq(s, cur))
        state = mimc.absorb(state, q)
        state, r = mimc.squeeze1(state)
        groups_r.append(r)
        cur = _eval_on_dprime(q, r, m)

    okt, tail_point, final, state = sc.verify_product_sumcheck(
        proof.tail, cur, state, 2)
    ok = jnp.logical_and(ok, okt)
    V_eval = proof.tail.final_evals[0]
    H_eval = proof.tail.final_evals[1]
    gr = jnp.stack(groups_r) if groups_r else jnp.zeros((0, 2), jnp.uint64)
    return ok, gr, tail_point, (V_eval, H_eval), state


# ---------------------------------------------------------------------------
# Multi-pair variant: sum_p sum_x V_p(x) H_p(x) with ALL pairs sharing the
# round challenges (the shape of a GKR layer phase:
# sum_u V(u) G1(u) + sum_u G2(u) 1(u)).
# ---------------------------------------------------------------------------

def prove_pairs(pair_chunk_fns, N: int, B: int, c: int, state):
    """pair_chunk_fns: list of (vchunk, hchunk); proves the SUM over pairs.

    Returns (proof, groups_r, tail_point, state); final claims are per-pair
    (V_p, H_p) evaluations at the shared generalized point."""
    m = 1 << c
    K = max(1, N // B)
    P = len(pair_chunk_fns)
    groups_L: List = []
    round_evals = []
    groups_r = []
    rem = N

    while rem > B:
        W = _fold_weights(groups_L)
        f = 1 if W is None else W.shape[0]
        q = jnp.zeros((2 * m, 2), dtype=jnp.uint64)
        for (vf, hf) in pair_chunk_fns:
            for i in range(K):
                v, h = vf(i), hf(i)
                if W is not None:
                    v = F.fsum(F.fmul(v.reshape(-1, f, 2), W[None]), axis=1)
                    h = F.fsum(F.fmul(h.reshape(-1, f, 2), W[None]), axis=1)
                ve = _block_extend(v, m)
                he = _block_extend(h, m)
                q = F.fadd(q, F.fsum(F.fmul(ve, he), axis=0))
        state = mimc.absorb(state, q)
        state, r = mimc.squeeze1(state)
        L = poly.lagrange_coeffs(
            jnp.asarray(np.array(F.root_of_unity(c), np.uint64)), r, m)
        groups_L.append(L)
        groups_r.append(r)
        round_evals.append(q)
        rem //= m

    W = _fold_weights(groups_L)
    f = 1 if W is None else W.shape[0]
    arrays = {}
    groups = []
    for pi, (vf, hf) in enumerate(pair_chunk_fns):
        vs, hs = [], []
        for i in range(K):
            v, h = vf(i), hf(i)
            if W is not None:
                v = F.fsum(F.fmul(v.reshape(-1, f, 2), W[None]), axis=1)
                h = F.fsum(F.fmul(h.reshape(-1, f, 2), W[None]), axis=1)
            vs.append(v)
            hs.append(h)
        arrays[f"V{pi}"] = jnp.concatenate(vs)[:rem]
        arrays[f"H{pi}"] = jnp.concatenate(hs)[:rem]
        groups.append((f"V{pi}", f"H{pi}"))
    ones = jnp.zeros((P, 2), dtype=jnp.uint64).at[:, 0].set(1)
    tail, state = sc.prove_mixed(arrays, tuple(groups), ones, state)

    proof = CompressedPairsProof(
        round_evals=tuple(round_evals), tail=tail, c=c, N=N, B=B, pairs=P)
    gr = jnp.stack(groups_r) if groups_r else jnp.zeros((0, 2), jnp.uint64)
    return proof, gr, tail.challenges, state


class CompressedPairsProof(NamedTuple):
    round_evals: tuple
    tail: sc.MixedSumcheckProof
    c: int
    N: int
    B: int
    pairs: int


def verify_pairs(proof: CompressedPairsProof, claim, state):
    """Returns (ok, groups_r, tail_point, final_evals dict, state)."""
    m = 1 << proof.c
    ok = jnp.array(True)
    groups_r = []
    cur = claim
    for q in proof.round_evals:
        s = F.fsum(q[0::2])
        ok = jnp.logical_and(ok, F.feq(s, cur))
        state = mimc.absorb(state, q)
        state, r = mimc.squeeze1(state)
        groups_r.append(r)
        cur = _eval_on_dprime(q, r, m)

    groups = tuple((f"V{p}", f"H{p}") for p in range(proof.pairs))
    ones = jnp.zeros((proof.pairs, 2), dtype=jnp.uint64).at[:, 0].set(1)
    okt, tail_point, state = sc.verify_mixed(proof.tail, cur, groups, ones,
                                             state)
    ok = jnp.logical_and(ok, okt)
    gr = jnp.stack(groups_r) if groups_r else jnp.zeros((0, 2), jnp.uint64)
    return ok, gr, tail_point, proof.tail.final_evals, state


def weight_vector(groups_r, tail_point, c: int, N: int):
    """The generalized evaluation weights: V_eval = <W, V> with
    W = eq(tail_point) (x) L(r_G) (x) ... (x) L(r_1)  (group 1 fastest)."""
    m = 1 << c
    omega = jnp.asarray(np.array(F.root_of_unity(c), np.uint64))
    tables = [poly.beta_table(tail_point)]
    for g in range(groups_r.shape[0] - 1, -1, -1):
        tables.append(poly.lagrange_coeffs(omega, groups_r[g], m))
    W = poly.convolution(tables)
    return W[:N]


__all__ = ["CompressedSumcheckProof", "prove", "verify", "weight_vector"]
