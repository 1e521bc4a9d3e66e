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
utils.cpp:149-179); this coset engine re-streams per group instead — same
O(N log / c) work, simpler Fiat-Shamir — and returns the generalized
evaluation weights (tensor of per-group Lagrange vectors x eq(z)) for the
caller to bind.

PASS-COUNT PARITY: ``prove_pairs_two_pass`` (bottom of this module) is
the engine with the reference's 2-passes-per-phase complexity — fold the
chunk stream under sequential Fiat-Shamir weights with transmitted
cross-terms, then chain the folded claim back to the real stream with a
binding sumcheck over the chunk axis (the role the reference's
convolution-consistency sumcheck plays).  ``gkr/stream_circuit.py``
uses it BY DEFAULT (engine="two_pass"); the coset engine remains as the
one-pass-per-group alternative whose final point is a generalized
(non-multilinear) tensor point.
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


__all__ = ["CompressedSumcheckProof", "prove", "verify", "weight_vector",
           "CompressedPairsProof", "prove_pairs", "verify_pairs",
           "TwoPassPairsProof", "prove_pairs_two_pass",
           "verify_pairs_two_pass"]


# ---------------------------------------------------------------------------
# Two-pass fold-phase pairs engine (reference pass complexity).
#
# The reference's streaming GKR makes TWO passes total per phase
# (prover.cpp:861-1211): pass 1 folds the chunk stream into B-resident
# buffers under sequential Fiat-Shamir chunk weights while emitting
# cross-term corrections, then chains the folded claim to the real stream
# with a binding sumcheck over the chunk axis (the role its
# convolution-consistency sumcheck plays, utils.cpp:149-179).  This is
# that protocol, re-derived for products:
#
#   claim = sum_i <v_i, h_i>           (K2_i = <v_i, h_i> transmitted)
#   Vf = sum_i w_i v_i, Hf = sum_i w_i h_i   (w_0 = 1, w_i from FS)
#   <Vf, Hf> = sum_i w_i^2 K2_i + w_i K1_i   (K1_i = cross terms, transmitted)
#   tail:    log B-round product sumcheck on (Vf, Hf)      -> point r_lo
#   binding: per-chunk partial evals pv_i = v_i~(r_lo) etc.; a mixed
#            sumcheck of <w, pv_p> / <w, ph_p> over the K chunk axis
#            -> point r_hi;  V_p~(r_lo || r_hi) = pv_p~(r_hi).
#
# Unlike the coset-compressed engine above (one pass per c-variable
# group), the final point is a STANDARD multilinear point — downstream
# claims bind through ordinary beta tables / PC openings — and the pass
# count is 2 independent of N/B.
# ---------------------------------------------------------------------------


class TwoPassPairsProof(NamedTuple):
    k1: jnp.ndarray               # [K, 2] cross terms (k1[0] == 0)
    k2: jnp.ndarray               # [K, 2] per-chunk product sums
    tail: sc.MixedSumcheckProof   # over the folded B-sized buffers
    binding: sc.MixedSumcheckProof  # over the K-sized partial evals
    N: int
    B: int
    pairs: int


def _fold_pass(pair_chunk_fns, K, state):
    """Pass 1: sequential-FS chunk folding with cross-term emission."""
    folds = None
    k1s, k2s, ws = [], [], []
    for i in range(K):
        chunks = [(vf(i), hf(i)) for (vf, hf) in pair_chunk_fns]
        k2 = None
        for (v, h) in chunks:
            t = F.fdot(v, h)
            k2 = t if k2 is None else F.fadd(k2, t)
        if folds is None:
            k1 = F.zeros(())
            folds = [(v, h) for (v, h) in chunks]
            w = F.scalar(1)
        else:
            k1 = None
            for (Vf, Hf), (v, h) in zip(folds, chunks):
                t = F.fadd(F.fdot(Vf, h), F.fdot(v, Hf))
                k1 = t if k1 is None else F.fadd(k1, t)
            state = mimc.absorb(state, jnp.stack([k1, k2]))
            state, w = mimc.squeeze1(state)
            folds = [(F.fadd(Vf, F.fmul(w[None, :], v)),
                      F.fadd(Hf, F.fmul(w[None, :], h)))
                     for (Vf, Hf), (v, h) in zip(folds, chunks)]
        k1s.append(k1)
        k2s.append(k2)
        ws.append(w)
    return folds, jnp.stack(k1s), jnp.stack(k2s), jnp.stack(ws), state


def prove_pairs_two_pass(pair_chunk_fns, N: int, B: int, state):
    """Proves sum_p sum_x V_p(x) H_p(x) in TWO passes over the streams.

    Returns (proof, point, state); point = r_lo || r_hi, and the per-pair
    evaluations at it are ``proof.binding.final_evals["pv{p}"/"ph{p}"]``.
    """
    K = max(1, N // B)
    P = len(pair_chunk_fns)
    folds, k1, k2, w, state = _fold_pass(pair_chunk_fns, K, state)

    arrays = {}
    groups = []
    for p, (Vf, Hf) in enumerate(folds):
        arrays[f"V{p}"] = Vf
        arrays[f"H{p}"] = Hf
        groups.append((f"V{p}", f"H{p}"))
    ones = jnp.zeros((P, 2), dtype=jnp.uint64).at[:, 0].set(1)
    tail, state = sc.prove_mixed(arrays, tuple(groups), ones, state)
    r_lo = tail.challenges

    # pass 2: per-chunk partial evaluations at r_lo
    beta_lo = poly.beta_table(r_lo)
    arrays2 = {"w": w}
    groups2 = []
    for p, (vf, hf) in enumerate(pair_chunk_fns):
        pv = jnp.stack([F.fdot(vf(i), beta_lo) for i in range(K)])
        ph = jnp.stack([F.fdot(hf(i), beta_lo) for i in range(K)])
        arrays2[f"pv{p}"] = pv
        arrays2[f"ph{p}"] = ph
        groups2 += [("w", f"pv{p}"), ("w", f"ph{p}")]
    state, gamma = mimc.squeeze1(state)
    gpow = [F.scalar(1)]
    for _ in range(2 * P - 1):
        gpow.append(F.fmul(gpow[-1], gamma))
    binding, state = sc.prove_mixed(arrays2, tuple(groups2),
                                    jnp.stack(gpow), state)
    point = jnp.concatenate([r_lo, binding.challenges], axis=0)
    proof = TwoPassPairsProof(k1=k1, k2=k2, tail=tail, binding=binding,
                              N=N, B=B, pairs=P)
    return proof, point, state


def verify_pairs_two_pass(proof: TwoPassPairsProof, claim, state):
    """Returns (ok, point, final_evals, state); final_evals maps
    "V{p}"/"H{p}" to the pair evaluations at point (compatible keys with
    ``verify_pairs``)."""
    K = proof.k2.shape[0]
    P = proof.pairs
    ok = jnp.array(True)

    # 1. the transmitted per-chunk sums must carry the claim
    ok = jnp.logical_and(ok, F.feq(F.fsum(proof.k2), claim))
    # 2. replay the fold weights; accumulate the folded claim
    ws = [F.scalar(1)]
    c_fold = proof.k2[0]
    for i in range(1, K):
        state = mimc.absorb(state, jnp.stack([proof.k1[i], proof.k2[i]]))
        state, w = mimc.squeeze1(state)
        ws.append(w)
        c_fold = F.fadd(c_fold, F.fadd(
            F.fmul(w, proof.k1[i]),
            F.fmul(F.fmul(w, w), proof.k2[i])))
    groups = tuple((f"V{p}", f"H{p}") for p in range(P))
    ones = jnp.zeros((P, 2), dtype=jnp.uint64).at[:, 0].set(1)
    okt, r_lo, state = sc.verify_mixed(proof.tail, c_fold, groups, ones,
                                       state)
    ok = jnp.logical_and(ok, okt)

    # 3. binding claim from the folded finals
    state, gamma = mimc.squeeze1(state)
    gpow = [F.scalar(1)]
    for _ in range(2 * P - 1):
        gpow.append(F.fmul(gpow[-1], gamma))
    b_claim = None
    for p in range(P):
        t = F.fadd(F.fmul(gpow[2 * p], proof.tail.final_evals[f"V{p}"]),
                   F.fmul(gpow[2 * p + 1], proof.tail.final_evals[f"H{p}"]))
        b_claim = t if b_claim is None else F.fadd(b_claim, t)
    groups2 = tuple(g for p in range(P)
                    for g in (("w", f"pv{p}"), ("w", f"ph{p}")))
    okb, r_hi, state = sc.verify_mixed(proof.binding, b_claim,
                                       groups2, jnp.stack(gpow), state)
    ok = jnp.logical_and(ok, okb)
    # 4. the weight MLE is verifier-computable from the replayed weights
    w_direct = F.fdot(jnp.stack(ws), poly.beta_table(r_hi))
    ok = jnp.logical_and(ok, F.feq(proof.binding.final_evals["w"],
                                   w_direct))

    point = jnp.concatenate([r_lo, r_hi], axis=0)
    finals = {}
    for p in range(P):
        finals[f"V{p}"] = proof.binding.final_evals[f"pv{p}"]
        finals[f"H{p}"] = proof.binding.final_evals[f"ph{p}"]
    return ok, point, finals, state
