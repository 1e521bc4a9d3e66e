"""Multiplication-tree product argument (in-memory).

The whole prover is one jitted graph: the per-level sumchecks run as
fixed-shape lax.scans (see core.sumcheck), which keeps the monolithic
graph small enough for the TPU compiler even at 2^20 inputs.

Proves, for a batch of vectors, that claimed products
``prod_i = x_i[0] * ... * x_i[n-1]`` are correct: build the binary product
tree over the concatenated (padded) batch, then descend with one
beta-weighted 3-product sumcheck per level, chaining claims via
``(1-c) * v_even + c * v_odd`` (reference ``prove_multiplication_tree_new``,
sumcheck.cpp:35-257).

The tree build is a log-depth sequence of vectorized pair-multiplies (VPU
friendly); each level's sumcheck is the vectorized engine from
``core.sumcheck``.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from ..ops import field as F
from ..ops import mimc, poly
from ..utils.jitting import maybe_jit
from . import sumcheck as sc


class MulTreeProof(NamedTuple):
    output: jnp.ndarray              # [V, 2] claimed per-vector products
    out_point: jnp.ndarray           # [log2 V, 2]
    out_eval: jnp.ndarray            # [2]
    layer_proofs: tuple              # depth x SumcheckProof (top to bottom)
    mix_challenges: jnp.ndarray      # [depth, 2] claim-combination challenges
    final_point: jnp.ndarray         # [log2(V*n), 2] point on the input MLE
    final_eval: jnp.ndarray          # [2] input MLE evaluation at final_point
    partial_evals: jnp.ndarray       # [V, 2] per-vector MLE evals


def _pad_inputs(vectors: Sequence[jnp.ndarray]):
    size = max(v.shape[0] for v in vectors)
    size = 1 << int(np.ceil(np.log2(size)))
    V = 1 << int(np.ceil(np.log2(len(vectors))))
    rows = []
    for v in vectors:
        if v.shape[0] < size:
            v = jnp.concatenate([v, F.ones((size - v.shape[0],))], axis=0)
        rows.append(v)
    for _ in range(V - len(vectors)):
        rows.append(F.ones((size,)))  # pad vectors with all-ones (product 1)
    return jnp.stack(rows), size, V


@maybe_jit(static_argnums=(1,))
def _build_tree(mat, V: int):
    """Tree levels (top-down lists) + output row; one small compiled kernel
    (log-depth pairwise multiplies)."""
    total = mat.reshape(-1, 2)
    in1s, in2s = [], []
    cur = total
    while cur.shape[0] > V:
        in1s.append(cur[0::2])
        in2s.append(cur[1::2])
        cur = F.fmul(cur[0::2], cur[1::2])
    return tuple(in1s), tuple(in2s), cur


@maybe_jit
def _open_top(output, state):
    state = mimc.absorb(state, output)
    V = output.shape[0]
    if V > 1:
        state, r = mimc.squeeze(state, int(np.log2(V)))
        out_eval = poly.evaluate_vector(output, r)
    else:
        r = jnp.zeros((0, 2), dtype=jnp.uint64)
        out_eval = output[0]
    state = mimc.absorb(state, out_eval)
    return r, out_eval, state


@maybe_jit
def _level_step_padded(in1, in2, point_pad, n_active, state):
    """One tree level on PADDED buffers: beta table + 3-product sumcheck +
    mix challenge.  in1/in2 zero-padded to the tree's max level size,
    point_pad zero-padded to log2(max) coords (zero coords leave the low
    beta-table block intact and zero the rest), n_active traced — ONE
    compiled executable serves every level of every tree up to this size
    (19 per-level compiles at minutes each otherwise)."""
    beta = poly.beta_table(point_pad)
    proof, state = sc._product_sumcheck_scan_padded((in1, in2, beta),
                                                    n_active, state)
    state, c = mimc.squeeze1(state)
    return proof, c, state


@maybe_jit(static_argnums=(2,))
def _partials(mat, ind_r, V: int, state):
    partial = jnp.stack([poly.evaluate_vector(mat[j], ind_r)
                         for j in range(V)])
    state = mimc.absorb(state, partial)
    return partial, state


def prove(vectors: Sequence[jnp.ndarray], state):
    """Prove products of each vector; returns (MulTreeProof, state).

    Padding deviation from the reference: we pad missing batch rows with
    ones (product 1) rather than zeros, so the padded outputs stay
    meaningful; sizes pad with ones as the reference does.
    """
    mat, size, V = _pad_inputs(tuple(vectors))
    depth = int(np.log2(size))
    in1s, in2s, output = _build_tree(mat, V)

    r, out_eval, state = _open_top(output, state)

    maxn = in1s[0].shape[0]
    log_max = int(np.log2(maxn))
    zrow = jnp.zeros((1, 2), dtype=jnp.uint64)

    layer_proofs = []
    mixes = []
    point = r
    claim = out_eval
    for i in range(depth - 1, -1, -1):
        n_i = in1s[i].shape[0]
        rounds_i = int(np.log2(n_i))
        # bucketed pad width: a SINGLE full-width executable made every
        # level cost maxn work (~19x the honest total); per-level pads
        # step down 16x to the smallest bucket that fits, keeping
        # executables to ~2-3 shapes while bounding waste at 16x the
        # true size.  Transcripts are pad-invariant (inactive
        # rounds/pairs contribute nothing).
        W = maxn
        while W > 64 and n_i <= W >> 4:
            W >>= 4
        logW = int(np.log2(W))
        pad = W - n_i
        in1p = jnp.concatenate(
            [in1s[i], jnp.zeros((pad, 2), jnp.uint64)]) if pad else in1s[i]
        in2p = jnp.concatenate(
            [in2s[i], jnp.zeros((pad, 2), jnp.uint64)]) if pad else in2s[i]
        ppad = jnp.concatenate(
            [point[:logW]] + [zrow] * max(0, logW - point.shape[0]),
            axis=0)
        pf, c, state = _level_step_padded(in1p, in2p, ppad, n_i, state)
        proof = sc.SumcheckProof(polys=pf.polys[:rounds_i],
                                 challenges=pf.challenges[:rounds_i],
                                 final_evals=pf.final_evals)
        v1, v2 = proof.final_evals[0], proof.final_evals[1]
        claim = F.fadd(F.fmul(F.fsub(F.scalar(1), c), v1), F.fmul(c, v2))
        point = jnp.concatenate([c[None, :], proof.challenges], axis=0)
        layer_proofs.append(proof)
        mixes.append(c)

    ind_r = point[: depth]          # bits binding within-vector index
    partial, state = _partials(mat, ind_r, V, state)

    return MulTreeProof(
        output=output,
        out_point=r,
        out_eval=out_eval,
        layer_proofs=tuple(layer_proofs),
        mix_challenges=jnp.stack(mixes),
        final_point=point,
        final_eval=claim,
        partial_evals=partial,
    ), state


@maybe_jit
def _beta_pair_eval(r1, r2):
    """eq(r1, r2) = prod_j ((1-r1_j)(1-r2_j) + r1_j r2_j)."""
    one = F.scalar(1)
    acc = one
    for j in range(r1.shape[0]):
        a = F.fmul(F.fsub(one, r1[j]), F.fsub(one, r2[j]))
        b = F.fmul(r1[j], r2[j])
        acc = F.fmul(acc, F.fadd(a, b))
    return acc


def verify(proof: MulTreeProof, state):
    """Replay the transcript; returns (ok, state).

    Checks: each level's sumcheck chain, that the beta final-eval matches a
    direct eq() evaluation, the claim chaining, and that the partial
    per-vector evaluations recombine to the final input evaluation.
    """
    V = proof.output.shape[0]
    depth = len(proof.layer_proofs)
    ok = jnp.array(True)

    state = mimc.absorb(state, proof.output)
    if V > 1:
        state, r = mimc.squeeze(state, int(np.log2(V)))
        out_eval = poly.evaluate_vector(proof.output, r)
    else:
        r = jnp.zeros((0, 2), dtype=jnp.uint64)
        out_eval = proof.output[0]
    ok = jnp.logical_and(ok, F.feq(out_eval, proof.out_eval))
    state = mimc.absorb(state, out_eval)

    point = r
    claim = out_eval
    for idx, i in enumerate(range(depth - 1, -1, -1)):
        p = proof.layer_proofs[idx]
        okc, chals, cur, state = sc.verify_product_sumcheck(p, claim, state, 3)
        ok = jnp.logical_and(ok, okc)
        # third final eval must equal eq(point, chals)
        ok = jnp.logical_and(
            ok, F.feq(p.final_evals[2], _beta_pair_eval(point, chals))
        )
        state, c = mimc.squeeze1(state)
        v1, v2 = p.final_evals[0], p.final_evals[1]
        claim = F.fadd(F.fmul(F.fsub(F.scalar(1), c), v1), F.fmul(c, v2))
        point = jnp.concatenate([c[None, :], chals], axis=0)

    ok = jnp.logical_and(ok, F.feq(claim, proof.final_eval))
    state = mimc.absorb(state, proof.partial_evals)
    glob_r = point[depth:]
    recomb = poly.evaluate_vector(proof.partial_evals, glob_r) if V > 1 \
        else proof.partial_evals[0]
    ok = jnp.logical_and(ok, F.feq(recomb, proof.final_eval))
    return ok, point, state


__all__ = ["MulTreeProof", "prove", "verify"]
