"""Sumcheck engine: in-memory 2/3/4-product sumchecks and batched variants.

TPU-native re-design of the reference kernels
(``src/sumcheck.cpp:1974-2260``, ``src/prover.cpp:119-186``): each round's
polynomial coefficients are segmented reductions over pair-split arrays
(perfectly vectorizable on the VPU), the fold is the half-array idiom
``v' = v0 + r*(v1 - v0)``, and the Fiat-Shamir challenge comes from the MiMC
sponge.

Deviation from the reference (documented): the reference folds round i with
the challenge derived from round i-1's polynomial (a one-round lag,
sumcheck.cpp:2002-2029); we use the standard ordering (absorb round poly,
*then* derive the fold challenge), which is the textbook-sound version.
Transcripts are internally consistent between our prover and verifier.

Round-poly coefficient layout matches the reference's polynomial classes
(``polynomial.h``): descending powers, e.g. cubic = (a, b, c, d) for
a x^3 + b x^2 + c x + d.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from ..ops import field as F
from ..ops import mimc, poly
from ..utils.jitting import maybe_jit


class SumcheckProof(NamedTuple):
    polys: jnp.ndarray        # [rounds, deg+1, 2] descending-power coeffs
    challenges: jnp.ndarray   # [rounds, 2]
    final_evals: jnp.ndarray  # [k, 2] fully-folded values of each input array


def _lin(v):
    """Pair-split an array into per-pair linear polynomials (slope, intercept)."""
    v0, v1 = v[0::2], v[1::2]
    return F.fsub(v1, v0), v0


def _poly_mul(p, q):
    """Multiply coefficient lists (descending powers) of vectorized polys."""
    dp, dq = len(p), len(q)
    out = [None] * (dp + dq - 1)
    for i in range(dp):
        for j in range(dq):
            t = F.fmul(p[i], q[j])
            out[i + j] = t if out[i + j] is None else F.fadd(out[i + j], t)
    return out


def _round_coeffs(lin_factors):
    """Sum over pairs of the product of linear factors -> descending coeffs."""
    acc = list(lin_factors[0])
    for lf in lin_factors[1:]:
        acc = _poly_mul(acc, list(lf))
    return jnp.stack([F.fsum(c) for c in acc])


def _product_sumcheck(arrays, state, extra_factors=None):
    """Generic k-product sumcheck over equal-length arrays.

    arrays: list of [n, 2]; proves sum_x prod_j arrays[j][x].
    Returns (proof, state after absorbing polys + final evals).

    Implemented as ONE fixed-shape ``lax.scan`` over the rounds: the folded
    values live in a contiguous prefix of a length-n/2 buffer and a mask
    zeroes the inactive pairs' contributions, so every round has identical
    shapes — one small compiled kernel per n instead of an unrolled
    log(n)-round graph (which takes minutes per shape on the TPU
    compiler).  Transcripts are identical to the unrolled version."""
    return _product_sumcheck_scan(tuple(arrays), state)


# Arrays above this length never appear as operands of ops inside a
# While body: the TPU AOT compile service prices While-body ops ~5x a
# straight-line op of the same shape AND proportionally to the operand
# size, so a 2^22-length round body costs minutes of compile.  Rounds on
# longer arrays run as a statically-unrolled prefix whose coefficient
# sums and folds are inner ``lax.scan``s over <=2^18-element chunks —
# transcripts are bit-identical (field addition is exact and
# associative), only the lowering changes.
_BIG_ROUND_LIMIT = 1 << 18


def _chunked_round(vs, state):
    """One product-sumcheck round over [k, n, 2]; ops stay <= chunk-size.

    Returns (coeffs [k+1, 2], state after absorb, challenge r,
    folded [k, n/2, 2])."""
    k, n, _ = vs.shape
    half = n // 2
    ch = _BIG_ROUND_LIMIT // 2                     # pairs per chunk
    C = max(1, half // ch)
    ch = half // C
    vsr = jnp.moveaxis(vs.reshape(k, C, 2 * ch, 2), 1, 0)  # [C, k, 2ch, 2]
    ones = jnp.zeros((ch, 2), dtype=jnp.uint64).at[:, 0].set(1)

    def coeff_chunk(acc, chunk):                   # chunk [k, 2ch, 2]
        v0 = chunk[:, 0::2]
        v1 = chunk[:, 1::2]
        slope = F.fsub(v1, v0)
        accp = [ones]
        for j in range(k):
            new = [None] * (len(accp) + 1)
            for d, c in enumerate(accp):
                t0 = F.fmul(c, v0[j])
                t1 = F.fmul(c, slope[j])
                new[d] = t0 if new[d] is None else F.fadd(new[d], t0)
                new[d + 1] = t1 if new[d + 1] is None \
                    else F.fadd(new[d + 1], t1)
            accp = new
        sums = jnp.stack([F.fsum(c) for c in reversed(accp)])
        return F.fadd(acc, sums), None

    coeffs, _ = jax.lax.scan(
        coeff_chunk, jnp.zeros((k + 1, 2), jnp.uint64), vsr)
    state, r = mimc.absorb_squeeze1(state, coeffs)

    def fold_chunk(_, chunk):
        v0 = chunk[:, 0::2]
        v1 = chunk[:, 1::2]
        return None, F.fadd(v0, F.fmul(r[None, None, :], F.fsub(v1, v0)))

    _, folded = jax.lax.scan(fold_chunk, None, vsr)  # [C, k, ch, 2]
    return coeffs, state, r, jnp.moveaxis(folded, 0, 1).reshape(k, half, 2)


@maybe_jit
def _product_sumcheck_scan(arrays, state):
    n = arrays[0].shape[0]
    rounds = int(np.log2(n))
    k = len(arrays)
    assert all(a.shape[0] == n for a in arrays)
    vs = jnp.stack(arrays)                          # [k, n, 2]
    if rounds == 0:
        finals = vs[:, 0]
        state = mimc.absorb(state, finals)
        return SumcheckProof(jnp.zeros((0, k + 1, 2), jnp.uint64),
                             jnp.zeros((0, 2), jnp.uint64), finals), state
    big_polys, big_chals = [], []
    while vs.shape[1] > _BIG_ROUND_LIMIT:
        coeffs, state, r, vs = _chunked_round(vs, state)
        big_polys.append(coeffs)
        big_chals.append(r)
    if big_polys:
        proof, state = _product_sumcheck_scan(tuple(vs), state)
        return SumcheckProof(
            jnp.concatenate([jnp.stack(big_polys), proof.polys]),
            jnp.concatenate([jnp.stack(big_chals), proof.challenges]),
            proof.final_evals), state
    n = vs.shape[1]
    idx = jnp.arange(n // 2, dtype=jnp.int32)
    ones = jnp.zeros((n // 2, 2), dtype=jnp.uint64).at[:, 0].set(1)

    def body(carry, i):
        vs, state = carry
        m_half = n >> (i + 1)                       # active pairs (traced)
        mask = (idx < m_half)[:, None]
        v0 = vs[:, 0::2]                            # [k, n/2, 2]
        v1 = vs[:, 1::2]
        slope = F.fsub(v1, v0)
        # per-pair coefficient DP over the k linear factors; inactive
        # pairs start at 0 so their products vanish
        acc = [jnp.where(mask, ones, 0)]
        for j in range(k):
            new = [None] * (len(acc) + 1)
            for d, c in enumerate(acc):
                t0 = F.fmul(c, v0[j])
                t1 = F.fmul(c, slope[j])
                new[d] = t0 if new[d] is None else F.fadd(new[d], t0)
                new[d + 1] = t1 if new[d + 1] is None \
                    else F.fadd(new[d + 1], t1)
            acc = new
        # descending powers to match the unrolled layout
        coeffs = jnp.stack([F.fsum(c) for c in reversed(acc)])
        state2, r = mimc.absorb_squeeze1(state, coeffs)
        folded = F.fadd(v0, F.fmul(r[None, None, :], slope))
        vs2 = jnp.concatenate([folded, jnp.zeros_like(folded)], axis=1)
        return (vs2, state2), (coeffs, r)

    (vs, state), (polys, chals) = jax.lax.scan(
        body, (vs, state), jnp.arange(rounds, dtype=jnp.int32))
    finals = vs[:, 0]
    state = mimc.absorb(state, finals)
    proof = SumcheckProof(polys, chals, finals)
    return proof, state


def _chunked_round_padded(vs, n_active, i_round: int, state):
    """One MASKED round over padded [k, n, 2]; ops stay <= chunk-size.

    Round ``i_round`` of the padded schedule: m_half = n_active >>
    (i_round+1) pairs are active; an inactive round (m_half == 0) passes
    state through and emits zeros, exactly like the scan body."""
    k, n, _ = vs.shape
    half = n // 2
    ch = _BIG_ROUND_LIMIT // 2
    C = max(1, half // ch)
    ch = half // C
    m_half = n_active >> (i_round + 1)
    active = m_half > 0
    vsr = jnp.moveaxis(vs.reshape(k, C, 2 * ch, 2), 1, 0)  # [C, k, 2ch, 2]
    idxr = jnp.arange(half, dtype=jnp.int32).reshape(C, ch)
    ones = jnp.zeros((ch, 2), dtype=jnp.uint64).at[:, 0].set(1)

    def coeff_chunk(acc, xs):
        chunk, idc = xs                            # [k, 2ch, 2], [ch]
        mask = (idc < m_half)[:, None]
        v0 = chunk[:, 0::2]
        v1 = chunk[:, 1::2]
        slope = F.fsub(v1, v0)
        accp = [jnp.where(mask, ones, 0)]
        for j in range(k):
            new = [None] * (len(accp) + 1)
            for d, c in enumerate(accp):
                t0 = F.fmul(c, v0[j])
                t1 = F.fmul(c, slope[j])
                new[d] = t0 if new[d] is None else F.fadd(new[d], t0)
                new[d + 1] = t1 if new[d + 1] is None \
                    else F.fadd(new[d + 1], t1)
            accp = new
        sums = jnp.stack([F.fsum(c) for c in reversed(accp)])
        return F.fadd(acc, sums), None

    coeffs, _ = jax.lax.scan(
        coeff_chunk, jnp.zeros((k + 1, 2), jnp.uint64), (vsr, idxr))
    state2, r = mimc.absorb_squeeze1(state, coeffs)

    def fold_chunk(_, chunk):
        v0 = chunk[:, 0::2]
        v1 = chunk[:, 1::2]
        return None, F.fadd(v0, F.fmul(r[None, None, :], F.fsub(v1, v0)))

    _, folded = jax.lax.scan(fold_chunk, None, vsr)  # [C, k, ch, 2]
    folded = jnp.moveaxis(folded, 0, 1).reshape(k, half, 2)
    vs_out = jnp.where(active, folded, vs[:, :half])
    state_out = jnp.where(active, state2, state)
    return (jnp.where(active, coeffs, 0), state_out,
            jnp.where(active, r, 0), vs_out)


@maybe_jit
def _product_sumcheck_scan_padded(arrays, n_active, state):
    """Masked k-product sumcheck over ZERO-PADDED arrays.

    arrays: [N, 2] each (N the shared pad size); n_active: traced scalar —
    the true (power-of-two) length.  Rounds beyond log2(n_active) are
    no-ops (state passes through untouched), so ONE compiled executable
    serves every level of a product tree / every size <= N; the caller
    slices polys/challenges to log2(n_active) rounds.  Active rounds
    produce transcripts identical to ``_product_sumcheck_scan``."""
    n = arrays[0].shape[0]
    rounds = int(np.log2(n))
    k = len(arrays)
    vs = jnp.stack(arrays)                          # [k, n, 2]
    n_active = jnp.asarray(n_active, dtype=jnp.int32)
    if n > _BIG_ROUND_LIMIT:
        # chunked unrolled prefix (see _BIG_ROUND_LIMIT): shrink the pad
        # to the limit, then one scan program serves the tail rounds
        big_polys, big_chals = [], []
        i_round = 0
        while vs.shape[1] > _BIG_ROUND_LIMIT:
            coeffs, state, r, vs = _chunked_round_padded(
                vs, n_active, i_round, state)
            big_polys.append(coeffs)
            big_chals.append(r)
            i_round += 1
        proof, state = _product_sumcheck_scan_padded(
            tuple(vs), jnp.maximum(n_active >> i_round, 0), state)
        return SumcheckProof(
            jnp.concatenate([jnp.stack(big_polys), proof.polys]),
            jnp.concatenate([jnp.stack(big_chals), proof.challenges]),
            proof.final_evals), state
    idx = jnp.arange(n // 2, dtype=jnp.int32)
    ones = jnp.zeros((n // 2, 2), dtype=jnp.uint64).at[:, 0].set(1)

    def body(carry, i):
        vs, state = carry
        m_half = n_active >> (i + 1)
        active = m_half > 0
        mask = (idx < m_half)[:, None]
        v0 = vs[:, 0::2]
        v1 = vs[:, 1::2]
        slope = F.fsub(v1, v0)
        acc = [jnp.where(mask, ones, 0)]
        for j in range(k):
            new = [None] * (len(acc) + 1)
            for d, c in enumerate(acc):
                t0 = F.fmul(c, v0[j])
                t1 = F.fmul(c, slope[j])
                new[d] = t0 if new[d] is None else F.fadd(new[d], t0)
                new[d + 1] = t1 if new[d + 1] is None \
                    else F.fadd(new[d + 1], t1)
            acc = new
        coeffs = jnp.stack([F.fsum(c) for c in reversed(acc)])
        state2, r = mimc.absorb_squeeze1(state, coeffs)
        folded = F.fadd(v0, F.fmul(r[None, None, :], slope))
        vs2 = jnp.concatenate([folded, jnp.zeros_like(folded)], axis=1)
        vs_out = jnp.where(active, vs2, vs)
        state_out = jnp.where(active, state2, state)
        return (vs_out, state_out), (jnp.where(active, coeffs, 0),
                                     jnp.where(active, r, 0))

    (vs, state), (polys, chals) = jax.lax.scan(
        body, (vs, state), jnp.arange(rounds, dtype=jnp.int32))
    finals = vs[:, 0]
    state = mimc.absorb(state, finals)
    return SumcheckProof(polys, chals, finals), state


@maybe_jit
def prove_2product(v1, v2, state):
    """sum_x v1(x) * v2(x); quadratic rounds (reference prover.cpp:119-186)."""
    return _product_sumcheck([v1, v2], state)


@maybe_jit
def prove_3product(v1, v2, v3, state):
    """sum_x v1 v2 v3; cubic rounds (reference sumcheck.cpp:1974-2058)."""
    return _product_sumcheck([v1, v2, v3], state)


@maybe_jit
def prove_4product(v1, v2, v3, v4, state):
    return _product_sumcheck([v1, v2, v3, v4], state)


@maybe_jit(static_argnums=(3,))
def verify_product_sumcheck(proof: SumcheckProof, claim, state, degree: int = 0):
    """Replay transcript; check round sums; return (ok, final_point,
    final_claim, state).

    final_claim must then be checked against openings of the input MLEs at
    final_point by the caller (reference verifier.cpp:11-213 semantics).
    The round replay is one ``lax.scan`` over the proof's round polys
    (an unrolled replay costs ~minutes of TPU AOT compile per shape)."""
    rounds = proof.polys.shape[0]
    zero, one = F.scalar(0), F.scalar(1)

    def body(carry, coeffs):
        ok, cur, state = carry
        s0 = poly.univariate_eval(coeffs[::-1], zero)
        s1 = poly.univariate_eval(coeffs[::-1], one)
        ok = jnp.logical_and(ok, F.feq(F.fadd(s0, s1), cur))
        state, r = mimc.absorb_squeeze1(state, coeffs)
        cur = poly.univariate_eval(coeffs[::-1], r)
        return (ok, cur, state), r

    (ok, cur, state), pts = jax.lax.scan(
        body, (jnp.array(True), claim, state), proof.polys)
    if rounds == 0:
        pts = jnp.zeros((0, 2), dtype=jnp.uint64)
    state = mimc.absorb(state, proof.final_evals)
    prod = proof.final_evals[0]
    for j in range(1, proof.final_evals.shape[0]):
        prod = F.fmul(prod, proof.final_evals[j])
    ok = jnp.logical_and(ok, F.feq(prod, cur))
    return ok, pts, cur, state


# ---------------------------------------------------------------------------
# Batched 3-product sumcheck (heterogeneous lengths, RLC-combined)
# ---------------------------------------------------------------------------

class BatchSumcheckProof(NamedTuple):
    polys: jnp.ndarray        # [rounds, 4, 2] cubic coeffs of the combined poly
    challenges: jnp.ndarray   # [rounds, 2]
    final_evals: jnp.ndarray  # [batch, 3, 2]


@maybe_jit
def prove_3product_batch(v1s: Sequence, v2s: Sequence, v3s: Sequence,
                         weights, state):
    """Batched cubic sumcheck: proves sum_j w_j * sum_x v1_j v2_j v3_j.

    Arrays within the batch may have different (power-of-two) lengths; once a
    member is folded to a scalar it contributes w_j*(1-x)^3*v1v2v3 each round
    (reference batch_3product_sumcheck, sumcheck.cpp:275-372).
    """
    batch = len(v1s)
    rounds = max(int(np.log2(v.shape[0])) for v in v1s)
    vs = [[jnp.asarray(v1s[j]), jnp.asarray(v2s[j]), jnp.asarray(v3s[j])]
          for j in range(batch)]
    fixed = [None] * batch   # final evals at the moment of exhaustion
    polys, challenges = [], []
    one = F.scalar(1)
    for _ in range(rounds):
        total = None
        for j in range(batch):
            trio = vs[j]
            if trio[0].shape[0] >= 2:
                lins = [_lin(v) for v in trio]
                coeffs = _round_coeffs(lins)
            else:
                if fixed[j] is None:
                    fixed[j] = jnp.stack([trio[0][0], trio[1][0], trio[2][0]])
                # w*(b0(1-x))(b1(1-x))(b2(1-x))
                prod = F.fmul(F.fmul(trio[0][0], trio[1][0]), trio[2][0])
                negp = F.fneg(prod)
                # (1-x)^3 = -x^3 + 3x^2 - 3x + 1
                coeffs = jnp.stack([
                    negp,
                    F.fmul(F.scalar(3), prod),
                    F.fmul(F.scalar(3), negp),
                    prod,
                ])
            w = weights[j]
            coeffs = F.fmul(coeffs, w[None, :])
            total = coeffs if total is None else F.fadd(total, coeffs)
        state = mimc.absorb(state, total)
        state, r = mimc.squeeze1(state)
        for j in range(batch):
            trio = vs[j]
            if trio[0].shape[0] >= 2:
                vs[j] = [poly.fold_once(v, r) for v in trio]
            else:
                scale = F.fsub(one, r)
                vs[j] = [F.fmul(v, scale[None, :]) for v in trio]
        polys.append(total)
        challenges.append(r)
    for j in range(batch):
        if fixed[j] is None:
            fixed[j] = jnp.stack([vs[j][0][0], vs[j][1][0], vs[j][2][0]])
    finals = jnp.stack(fixed)
    state = mimc.absorb(state, finals)
    return BatchSumcheckProof(jnp.stack(polys), jnp.stack(challenges), finals), state


def verify_3product_batch(proof: BatchSumcheckProof, claim, weights,
                          lengths: Sequence[int], state):
    """Verify the batched cubic sumcheck against the RLC'd claim."""
    return _verify_3product_batch(proof, claim, weights, tuple(lengths), state)


@maybe_jit(static_argnums=(3,))
def _verify_3product_batch(proof: BatchSumcheckProof, claim, weights,
                           lengths, state):
    rounds = proof.polys.shape[0]
    zero, one = F.scalar(0), F.scalar(1)

    def body(carry, coeffs):
        ok, cur, state = carry
        s0 = poly.univariate_eval(coeffs[::-1], zero)
        s1 = poly.univariate_eval(coeffs[::-1], one)
        ok = jnp.logical_and(ok, F.feq(F.fadd(s0, s1), cur))
        state, r = mimc.absorb_squeeze1(state, coeffs)
        cur = poly.univariate_eval(coeffs[::-1], r)
        return (ok, cur, state), r

    (ok, cur, state), chals = jax.lax.scan(
        body, (jnp.array(True), claim, state), proof.polys)
    state = mimc.absorb(state, proof.final_evals)
    # final combined value: sum_j w_j * scale_j * prod(final_j)
    # where scale_j = prod over rounds after exhaustion of (1-r)^3 is already
    # folded into final_evals by the prover's post-exhaustion scaling.
    total = None
    for j in range(len(lengths)):
        prod = F.fmul(F.fmul(proof.final_evals[j, 0], proof.final_evals[j, 1]),
                      proof.final_evals[j, 2])
        extra = int(rounds - np.log2(lengths[j]))
        for e in range(extra):
            s = F.fsub(one, chals[int(np.log2(lengths[j])) + e])
            prod = F.fmul(prod, F.fmul(F.fmul(s, s), s))
        t = F.fmul(weights[j], prod)
        total = t if total is None else F.fadd(total, t)
    ok = jnp.logical_and(ok, F.feq(total, cur))
    pts = (chals if rounds
           else jnp.zeros((0, 2), dtype=jnp.uint64))
    return ok, pts, state


# ---------------------------------------------------------------------------
# Mixed-degree named-array sumcheck (shared fold point across term groups)
# ---------------------------------------------------------------------------

class MixedSumcheckProof(NamedTuple):
    polys: jnp.ndarray        # [rounds, maxdeg+1, 2] combined coeffs
    challenges: jnp.ndarray   # [rounds, 2]
    final_evals: dict         # name -> [2]


@functools.lru_cache(maxsize=None)
def _vand_inv(D: int) -> np.ndarray:
    """Inverse Vandermonde at points 0..D over GF(p), as [D+1, D+1, 2]
    real field constants: coeffs_ascending = Minv @ evals.  Exact — the
    evaluation-form round bodies recover the SAME coefficients symbolic
    accumulation produced (field arithmetic has no rounding)."""
    Pint = int(F.P)
    m = [[pow(i, j, Pint) for j in range(D + 1)] for i in range(D + 1)]
    # Gauss-Jordan mod p
    inv = [[1 if i == j else 0 for j in range(D + 1)] for i in range(D + 1)]
    for col in range(D + 1):
        piv = next(r for r in range(col, D + 1) if m[r][col] % Pint)
        m[col], m[piv] = m[piv], m[col]
        inv[col], inv[piv] = inv[piv], inv[col]
        s = pow(m[col][col], Pint - 2, Pint)
        m[col] = [v * s % Pint for v in m[col]]
        inv[col] = [v * s % Pint for v in inv[col]]
        for r in range(D + 1):
            if r != col and m[r][col]:
                f = m[r][col]
                m[r] = [(a - f * b) % Pint for a, b in zip(m[r], m[col])]
                inv[r] = [(a - f * b) % Pint
                          for a, b in zip(inv[r], inv[col])]
    out = np.zeros((D + 1, D + 1, 2), dtype=np.uint64)
    out[:, :, 0] = np.array(inv, dtype=np.uint64)
    return out


@maybe_jit(static_argnums=(1,))
def prove_mixed(arrays: dict, groups, weights, state):
    """Sumcheck of sum_g w_g * sum_x prod_{a in g} arrays[a][x].

    arrays: dict name -> [n, 2] (all equal length); groups: tuple of tuples
    of names (static); weights: [G, 2].  All arrays fold with the SAME
    challenge each round, so every group's final claim lands on one point.
    Used by the fold-phase gate consistency (terms of degree 2 and 3 share
    beta and selector arrays).

    Fixed-shape masked lax.scan over the rounds.  The round polynomial is
    computed in EVALUATION form — the factors are evaluated at
    t = 0..maxdeg by repeated slope additions, every group's product runs
    as one log-depth batched multiply, and the descending coefficients
    come from one batched inverse-Vandermonde contraction.  Symbolic
    per-group coefficient accumulation lowered to ~160 field-multiply ops
    per round body, and the remote TPU compile service charges 0.1-0.3 s
    PER LOWERED OP — this form is ~10x fewer ops with bit-identical
    transcripts (exact arithmetic, same polynomial)."""
    names = tuple(sorted(arrays.keys()))
    n = arrays[names[0]].shape[0]
    rounds = int(np.log2(n))
    maxdeg = max(len(g) for g in groups)
    vs = jnp.stack([arrays[a] for a in names])      # [A, n, 2]
    pos = {a: i for i, a in enumerate(names)}

    if rounds == 0:
        finals = {a: vs[pos[a], 0] for a in names}
        state = mimc.absorb(state, jnp.stack([finals[a] for a in names]))
        return MixedSumcheckProof(
            jnp.zeros((0, maxdeg + 1, 2), jnp.uint64),
            jnp.zeros((0, 2), jnp.uint64), finals), state

    G = len(groups)
    M = maxdeg                                      # max members per group
    # static member-gather indices; padding slots multiply by one
    midx = np.zeros((G, M), dtype=np.int32)
    mpad = np.zeros((G, M, 1, 1), dtype=bool)
    for gi, g in enumerate(groups):
        for s in range(M):
            if s < len(g):
                midx[gi, s] = pos[g[s]]
            else:
                mpad[gi, s] = True
    midx_j = jnp.asarray(midx.reshape(-1))
    mpad_j = jnp.asarray(mpad)
    one_f = jnp.zeros((2,), dtype=jnp.uint64).at[0].set(1)
    minv = jnp.asarray(_vand_inv(M))                # [M+1, M+1, 2]

    idx = jnp.arange(n // 2, dtype=jnp.int32)

    def body(carry, i):
        vs, state = carry
        m_half = n >> (i + 1)
        mask = (idx < m_half)[None, :, None]
        v0 = vs[:, 0::2]
        v1 = vs[:, 1::2]
        slope = F.fsub(v1, v0)
        evals = []
        vt = v0
        for t in range(M + 1):
            if t > 0:
                vt = F.fadd(vt, slope)              # factor values at t
            sel = vt[midx_j].reshape(G, M, n // 2, 2)
            sel = jnp.where(mpad_j, one_f, sel)
            cur, m = sel, M
            while m > 1:                            # log-depth product
                if m % 2:
                    cur = jnp.concatenate(
                        [cur, jnp.broadcast_to(
                            one_f, (G, 1) + cur.shape[2:])], axis=1)
                    m += 1
                cur = F.fmul(cur[:, 0::2], cur[:, 1::2])
                m //= 2
            prodv = jnp.where(mask, cur[:, 0], 0)
            evals.append(F.fsum(prodv, axis=1))     # [G, 2]
        ev = jnp.stack(evals, axis=1)               # [G, M+1, 2]
        # ascending coeffs = Minv @ evals, batched over groups (exact)
        casc = F.fsum(F.fmul(minv[None], ev[:, None, :, :]), axis=2)
        total = F.fsum(F.fmul(weights[:, None, :], casc[:, ::-1]), axis=0)
        state2, r = mimc.absorb_squeeze1(state, total)
        folded = F.fadd(v0, F.fmul(r[None, None, :], slope))
        vs2 = jnp.concatenate([folded, jnp.zeros_like(folded)], axis=1)
        return (vs2, state2), (total, r)

    (vs, state), (polys, chals) = jax.lax.scan(
        body, (vs, state), jnp.arange(rounds, dtype=jnp.int32))
    finals = {a: vs[pos[a], 0] for a in names}
    state = mimc.absorb(state, jnp.stack([finals[a] for a in names]))
    return MixedSumcheckProof(polys, chals, finals), state


@maybe_jit(static_argnums=(2,))
def verify_mixed(proof: MixedSumcheckProof, claim, groups, weights, state):
    """Verify; returns (ok, point, state).  Checks round sums and that the
    final combined product of per-group evals matches the last claim.

    Jitted per (shape, groups): the unrolled round replay is ~8 ops per
    round — eager, every verify_mixed costs O(rounds) dispatches, which
    dominated verifier wall-clock on remote-attached chips."""
    names = sorted(proof.final_evals.keys())
    rounds = proof.polys.shape[0]
    zero, one = F.scalar(0), F.scalar(1)

    def body(carry, coeffs):
        ok, cur, state = carry
        s0 = poly.univariate_eval(coeffs[::-1], zero)
        s1 = poly.univariate_eval(coeffs[::-1], one)
        ok = jnp.logical_and(ok, F.feq(F.fadd(s0, s1), cur))
        state, r = mimc.absorb_squeeze1(state, coeffs)
        cur = poly.univariate_eval(coeffs[::-1], r)
        return (ok, cur, state), r

    (ok, cur, state), pts = jax.lax.scan(
        body, (jnp.array(True), claim, state), proof.polys)
    if rounds == 0:
        pts = jnp.zeros((0, 2), dtype=jnp.uint64)
    state = mimc.absorb(state,
                        jnp.stack([proof.final_evals[a] for a in names]))
    total = None
    for gi, g in enumerate(groups):
        prod = proof.final_evals[g[0]]
        for a in g[1:]:
            prod = F.fmul(prod, proof.final_evals[a])
        t = F.fmul(weights[gi], prod)
        total = t if total is None else F.fadd(total, t)
    ok = jnp.logical_and(ok, F.feq(total, cur))
    return ok, pts, state


__all__ = [
    "SumcheckProof", "BatchSumcheckProof", "MixedSumcheckProof",
    "prove_2product", "prove_3product", "prove_4product",
    "verify_product_sumcheck",
    "prove_3product_batch", "verify_3product_batch",
    "prove_mixed", "verify_mixed",
]
