"""Brakedown and BrakingBase polynomial commitments.

Brakedown (reference ``commit_standard_brakedown`` / ``open_brakedown_
standard``, Our_PC.cpp:197-236, 432-523): the message is an R x C matrix;
every ROW is Spielman-encoded x2 (1-D expander code, no FFT); each codeword
column gets a chained Merkle leaf; opening eq(x_row)-aggregates the rows,
transmits the aggregate, and checks random columns by code linearity.

BrakingBase (``commit_brakingbase`` / ``open_brakingbase``, Our_PC.cpp:
114-144, 355-430): same commitment, but the aggregated CODEWORD is bound
by a shockwave commitment and the per-query checks become a query-indicator
2-product sumcheck plus a linear-code encoding proof — the aggregate is
never transmitted.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import numpy as np

import jax.numpy as jnp

from ..core import linear_code as lc
from ..core import sumcheck as sc
from ..ops import blake3
from ..ops import encode as enc
from ..ops import expanders
from ..ops import field as F
from ..ops import merkle, mimc, poly
from . import shockwave as sw


class BrakedownParams(NamedTuple):
    N: int
    rows: int
    queries: int = 120

    @property
    def cols(self) -> int:
        return self.N // self.rows


class BrakedownCommitment(NamedTuple):
    encoded: jnp.ndarray        # [R, 2C, 2]
    tree: merkle.MerkleTree
    code: expanders.SpielmanCode

    @property
    def root(self):
        return self.tree.root


def commit(message, params: BrakedownParams):
    code = expanders.build_code(params.cols)
    mat = message.reshape(params.rows, params.cols, 2)
    encoded = enc.spielman_encode_padded(code, mat)   # [R, 2C, 2]
    # chained column leaves: leaf (row-group g, col) over groups of 4 rows
    R = params.rows
    assert R % 4 == 0 or R < 4
    if R >= 4:
        groups = encoded.reshape(R // 4, 4, 2 * params.cols, 2)
        num_leaves = (R // 4) * (2 * params.cols)
        vals = jnp.moveaxis(groups, 2, 1).reshape(num_leaves, 4, 2)
    else:
        pad = jnp.zeros((4 - R, 2 * params.cols, 2), dtype=jnp.uint64)
        full = jnp.concatenate([encoded, pad], axis=0)
        num_leaves = 2 * params.cols
        vals = jnp.moveaxis(full.reshape(1, 4, 2 * params.cols, 2), 2, 1) \
            .reshape(num_leaves, 4, 2)
    leaves = blake3.hash_field_leaves(vals)
    if num_leaves & (num_leaves - 1):
        padn = (1 << int(np.ceil(np.log2(num_leaves)))) - num_leaves
        leaves = jnp.concatenate(
            [leaves, jnp.zeros((padn, 8), dtype=leaves.dtype)])
    tree = merkle.build_from_digests(leaves)
    return BrakedownCommitment(encoded=encoded, tree=tree, code=code)


class BrakedownOpening(NamedTuple):
    eval_claim: jnp.ndarray
    aggr: jnp.ndarray           # [C, 2] transmitted
    queries: Tuple[int, ...]
    reply: jnp.ndarray          # [q, R, 2] full columns
    paths: jnp.ndarray          # [q, n_groups, depth, 8]


def _split(x, params):
    lc_bits = int(np.log2(params.cols))
    return x[:lc_bits], x[lc_bits:]


def open(message, com: BrakedownCommitment, x, params: BrakedownParams,
         state):
    x_lo, x_hi = _split(x, params)
    beta = poly.beta_table(x_hi)[: params.rows]
    mat = message.reshape(params.rows, params.cols, 2)
    aggr = F.fsum(F.fmul(beta[:, None, :], mat), axis=0)
    eval_claim = poly.evaluate_vector(aggr, x_lo)

    aggr_tree = merkle.commit_fields(aggr)
    state = mimc.absorb(state, aggr_tree.root.astype(jnp.uint64).reshape(4, 2))
    state, qs = mimc.expand(state, params.queries)
    idx = tuple(int(v) % (2 * params.cols) for v in np.asarray(qs)[:, 0])

    cols_vals = jnp.moveaxis(com.encoded, 0, 1)       # [2C, R, 2]
    reply = cols_vals[jnp.asarray(idx, dtype=jnp.int32)]
    n_groups = max(1, params.rows // 4)
    paths = jnp.stack([
        jnp.stack([merkle.open_leaf(com.tree, g * 2 * params.cols + c)
                   for g in range(n_groups)])
        for c in idx])
    return BrakedownOpening(eval_claim=eval_claim, aggr=aggr, queries=idx,
                            reply=reply, paths=paths), state


def verify(root, x, opening: BrakedownOpening, params: BrakedownParams,
           code: expanders.SpielmanCode, state):
    x_lo, x_hi = _split(x, params)
    beta = poly.beta_table(x_hi)[: params.rows]

    aggr_tree = merkle.commit_fields(opening.aggr)
    state = mimc.absorb(state, aggr_tree.root.astype(jnp.uint64).reshape(4, 2))
    state, qs = mimc.expand(state, params.queries)
    idx = tuple(int(v) % (2 * params.cols) for v in np.asarray(qs)[:, 0])
    if idx != tuple(opening.queries):
        return False, state

    if not bool(F.feq(poly.evaluate_vector(opening.aggr, x_lo),
                      opening.eval_claim)):
        return False, state

    enc_aggr = enc.spielman_encode_padded(code, opening.aggr)
    comb = F.fsum(F.fmul(beta[None, :, :], opening.reply), axis=1)
    n_groups = max(1, params.rows // 4)
    for qi, c in enumerate(idx):
        if not bool(F.feq(comb[qi], enc_aggr[c])):
            return False, state
        col = opening.reply[qi]
        if params.rows < 4:
            col = jnp.concatenate(
                [col, jnp.zeros((4 - params.rows, 2), jnp.uint64)])
        groups = col.reshape(n_groups, 4, 2)
        leaves = blake3.hash_field_leaves(groups)
        for g in range(n_groups):
            if not merkle.verify_leaf(root, leaves[g],
                                      g * 2 * params.cols + c,
                                      opening.paths[qi, g]):
                return False, state
    return True, state


# ---------------------------------------------------------------------------
# BrakingBase: aggregate bound via shockwave + linear-code proof
# ---------------------------------------------------------------------------

class BrakingBaseOpening(NamedTuple):
    eval_claim: jnp.ndarray
    cw_root: jnp.ndarray            # shockwave root of the aggregate codeword
    queries: Tuple[int, ...]
    reply: jnp.ndarray              # [q, R, 2]
    paths: jnp.ndarray
    ind_proof: sc.SumcheckProof     # indicator sumcheck over the codeword
    lc_proof: lc.LinearCodeProof    # encoding proof codeword -> message
    sw_open_q: sw.ShockwaveOpening  # codeword MLE at indicator point rho
    sw_open_x: sw.ShockwaveOpening  # codeword MLE at (x_lo, 0) = f(x)
    sw_open_m: sw.ShockwaveOpening  # codeword MLE at (pt, 0) = msg eval


def open_brakingbase(message, com: BrakedownCommitment, x,
                     params: BrakedownParams, state,
                     sw_queries: int = 24, sw_k: int = 8):
    x_lo, x_hi = _split(x, params)
    beta = poly.beta_table(x_hi)[: params.rows]
    mat = message.reshape(params.rows, params.cols, 2)
    aggr = F.fsum(F.fmul(beta[:, None, :], mat), axis=0)
    acw = enc.spielman_encode_padded(com.code, aggr)    # [2C, 2]
    eval_claim = poly.evaluate_vector(aggr, x_lo)

    cw_data = sw.commit(acw, sw_k)                      # C_c (Our_PC.cpp:255)
    state = mimc.absorb(state,
                        cw_data.outer.root.astype(jnp.uint64).reshape(4, 2))
    state = mimc.absorb(state, eval_claim)
    state, qs = mimc.expand(state, params.queries)
    idx = tuple(int(v) % (2 * params.cols) for v in np.asarray(qs)[:, 0])

    cols_vals = jnp.moveaxis(com.encoded, 0, 1)
    reply = cols_vals[jnp.asarray(idx, dtype=jnp.int32)]
    n_groups = max(1, params.rows // 4)
    paths = jnp.stack([
        jnp.stack([merkle.open_leaf(com.tree, g * 2 * params.cols + c)
                   for g in range(n_groups)])
        for c in idx])

    indicator = jnp.zeros((2 * params.cols, 2), dtype=jnp.uint64)
    indicator = indicator.at[jnp.asarray(idx, dtype=jnp.int32), 0].set(1)
    ind_proof, state = sc.prove_2product(acw, indicator, state)
    rho = ind_proof.challenges
    # codeword MLE at rho via shockwave; encoding proof ties it to aggr
    sw_open_q, state = sw.open(cw_data, rho, state, queries=sw_queries)
    lc_proof, lc_claim, state = lc.prove(com.code, aggr, rho, state)
    pt = lc_proof.inner.challenges
    # systematic code: aggr~(y) == acw~((y, 0)); ground both message-side
    # claims with further C_c openings
    zero = jnp.zeros((1, 2), dtype=jnp.uint64)
    x_sys = jnp.concatenate([x_lo, zero], axis=0)
    pt_sys = jnp.concatenate([pt, zero], axis=0)
    sw_open_x, state = sw.open(cw_data, x_sys, state, queries=sw_queries)
    sw_open_m, state = sw.open(cw_data, pt_sys, state, queries=sw_queries)

    return BrakingBaseOpening(
        eval_claim=eval_claim, cw_root=cw_data.outer.root, queries=idx,
        reply=reply, paths=paths, ind_proof=ind_proof, lc_proof=lc_proof,
        sw_open_q=sw_open_q, sw_open_x=sw_open_x, sw_open_m=sw_open_m,
    ), state


def verify_brakingbase(root, x, opening: BrakingBaseOpening,
                       params: BrakedownParams, code, state,
                       sw_queries: int = 24, sw_k: int = 8):
    x_lo, x_hi = _split(x, params)
    beta = poly.beta_table(x_hi)[: params.rows]

    state = mimc.absorb(state,
                        opening.cw_root.astype(jnp.uint64).reshape(4, 2))
    state = mimc.absorb(state, opening.eval_claim)
    state, qs = mimc.expand(state, params.queries)
    idx = tuple(int(v) % (2 * params.cols) for v in np.asarray(qs)[:, 0])
    if idx != tuple(opening.queries):
        return False, state

    # Merkle membership + indicator claim
    comb = F.fsum(F.fmul(beta[None, :, :], opening.reply), axis=1)
    n_groups = max(1, params.rows // 4)
    for qi, c in enumerate(idx):
        col = opening.reply[qi]
        if params.rows < 4:
            col = jnp.concatenate(
                [col, jnp.zeros((4 - params.rows, 2), jnp.uint64)])
        leaves = blake3.hash_field_leaves(col.reshape(n_groups, 4, 2))
        for g in range(n_groups):
            if not merkle.verify_leaf(root, leaves[g],
                                      g * 2 * params.cols + c,
                                      opening.paths[qi, g]):
                return False, state
    seen = {}
    for qi, c in enumerate(idx):
        if c not in seen:
            seen[c] = comb[qi]
    claim = None
    for v in seen.values():
        claim = v if claim is None else F.fadd(claim, v)

    okp, rho, cur, state = sc.verify_product_sumcheck(opening.ind_proof,
                                                     claim, state, 2)
    ok = bool(okp)
    indicator = jnp.zeros((2 * params.cols, 2), dtype=jnp.uint64)
    indicator = indicator.at[jnp.asarray(sorted(set(idx)), jnp.int32), 0].set(1)
    ok = ok and bool(F.feq(opening.ind_proof.final_evals[1],
                           poly.evaluate_vector(indicator, rho)))

    # codeword MLE at rho proven by shockwave against C_c
    oks, state = sw.verify(opening.cw_root, opening.sw_open_q, rho, sw_k,
                           2 * params.cols, state, queries=sw_queries)
    ok = ok and oks
    ok = ok and bool(F.feq(opening.sw_open_q.eval_claim,
                           opening.ind_proof.final_evals[0]))

    # encoding proof: codeword~(rho) == <phi, aggr>, reducing to msg eval
    okl, pt, msg_eval, state = lc.verify(
        opening.lc_proof, code, rho, opening.ind_proof.final_evals[0], state)
    ok = ok and bool(okl)

    # systematic-prefix grounding: f(x) and the lc message eval are C_c
    # openings at (x_lo, 0) and (pt, 0)
    zero = jnp.zeros((1, 2), dtype=jnp.uint64)
    x_sys = jnp.concatenate([x_lo, zero], axis=0)
    pt_sys = jnp.concatenate([pt, zero], axis=0)
    okx, state = sw.verify(opening.cw_root, opening.sw_open_x, x_sys, sw_k,
                           2 * params.cols, state, queries=sw_queries)
    ok = ok and okx
    ok = ok and bool(F.feq(opening.sw_open_x.eval_claim, opening.eval_claim))
    okm, state = sw.verify(opening.cw_root, opening.sw_open_m, pt_sys, sw_k,
                           2 * params.cols, state, queries=sw_queries)
    ok = ok and okm
    ok = ok and bool(F.feq(opening.sw_open_m.eval_claim, msg_eval))
    return ok, state


# ---------------------------------------------------------------------------
# Streaming Brakedown (the reference's `commit_brakedown_stream` /
# `open_brakedown_stream`, Elastic_PC.cpp:112-173, 561-623; exercised by
# test_Elastic_PC option 3, Elastic_PC.cpp:784-808): every B-sized CHUNK is
# a row, 1-D Spielman-encoded B -> 2B; one chained Merkle tree over the 2B
# codeword positions (chunk groups of 4 extend each leaf Merkle-Damgard
# style — the same leaf rule as the tensor-code elastic commit).  Opening
# transmits TWO B-sized aggregates — the eq(x_hi)-weighted evaluation
# aggregate and a powers-of-r proximity aggregate — and checks both against
# random codeword columns by code linearity.
# ---------------------------------------------------------------------------


class BrakedownStreamParams(NamedTuple):
    N: int
    B: int
    queries: int = 2935         # reference schedule, Elastic_PC.cpp:562

    @property
    def K(self) -> int:
        return self.N // self.B


class BrakedownStreamCommitment(NamedTuple):
    tree: merkle.MerkleTree
    params: BrakedownStreamParams

    @property
    def root(self):
        return self.tree.root


class BrakedownStreamOpening(NamedTuple):
    eval_claim: jnp.ndarray
    aggr: jnp.ndarray           # [B, 2] eq-weighted aggregate (transmitted)
    aggr_r: jnp.ndarray         # [B, 2] powers-of-r proximity aggregate
    queries: Tuple[int, ...]    # codeword positions in [0, 2B)
    reply: jnp.ndarray          # [q, K, 2] codeword columns across chunks
    paths: jnp.ndarray          # [q, depth, 8]


import functools as _functools


@_functools.lru_cache(maxsize=16)
def _bd_stream_kernels(params: BrakedownStreamParams):
    from ..utils.jitting import maybe_jit

    code = expanders.build_code(params.B)

    @maybe_jit
    def commit_group(chunks4, prev):
        # chunks4 [4, B, 2] -> chained leaf update over 2B positions
        cw = enc.spielman_encode_padded(code, chunks4)      # [4, 2B, 2]
        return blake3.hash_chained_leaf(jnp.moveaxis(cw, 0, 1), prev)

    @maybe_jit
    def aggr_step(aggr, aggr_r, b, rp, chunk):
        return (F.fadd(aggr, F.fmul(b[None, :], chunk)),
                F.fadd(aggr_r, F.fmul(rp[None, :], chunk)))

    @maybe_jit
    def reply_step(chunk, idx):
        cw = enc.spielman_encode_padded(code, chunk)        # [2B, 2]
        return cw[idx]

    return code, commit_group, aggr_step, reply_step


def commit_brakedown_stream(chunk_fn, params: BrakedownStreamParams
                            ) -> BrakedownStreamCommitment:
    """chunk_fn(i) -> [B, 2]; O(B)-resident chained commit.

    K must be a multiple of 4 and >= 4 (the reference refuses smaller
    streams outright, Elastic_PC.cpp:113-116)."""
    if params.K < 4 or params.K % 4:
        raise ValueError("streaming Brakedown needs K % 4 == 0, K >= 4")
    _, commit_group, _, _ = _bd_stream_kernels(params)
    prev = jnp.zeros((2 * params.B, 8), dtype=jnp.uint32)
    for g in range(params.K // 4):
        chunks4 = jnp.stack([chunk_fn(4 * g + t) for t in range(4)])
        prev = commit_group(chunks4, prev)
    return BrakedownStreamCommitment(
        tree=merkle.build_from_digests(prev), params=params)


def open_brakedown_stream(chunk_fn, com: BrakedownStreamCommitment, x,
                          state):
    """Two passes over the chunk stream: aggregate, then query replies."""
    params = com.params
    _, _, aggr_step, reply_step = _bd_stream_kernels(params)
    lb = int(np.log2(params.B))
    x_lo, x_hi = x[:lb], x[lb:]
    beta = poly.beta_table(x_hi)                  # [K, 2]
    state, r = mimc.squeeze1(state)
    rpow = poly.powers(r, params.K)               # [K, 2] proximity RLC

    aggr = jnp.zeros((params.B, 2), dtype=jnp.uint64)
    aggr_r = jnp.zeros((params.B, 2), dtype=jnp.uint64)
    for i in range(params.K):
        aggr, aggr_r = aggr_step(aggr, aggr_r, beta[i], rpow[i],
                                 chunk_fn(i))
    eval_claim = poly.evaluate_vector(aggr, x_lo)

    for v in (aggr, aggr_r):
        t = merkle.commit_fields(v)
        state = mimc.absorb(state, t.root.astype(jnp.uint64).reshape(4, 2))
    state, qs = mimc.expand(state, params.queries)
    idx = tuple(int(v) % (2 * params.B) for v in np.asarray(qs)[:, 0])
    lid = jnp.asarray(idx, dtype=jnp.int32)

    cols = [reply_step(chunk_fn(i), lid) for i in range(params.K)]
    reply = jnp.stack(cols, axis=1)               # [q, K, 2]
    paths = merkle.open_leaves(com.tree, list(idx))
    return BrakedownStreamOpening(
        eval_claim=eval_claim, aggr=aggr, aggr_r=aggr_r, queries=idx,
        reply=reply, paths=paths), state


def verify_brakedown_stream(root, x, opening: BrakedownStreamOpening,
                            params: BrakedownStreamParams, state):
    code, _, _, _ = _bd_stream_kernels(params)
    lb = int(np.log2(params.B))
    x_lo, x_hi = x[:lb], x[lb:]
    beta = poly.beta_table(x_hi)
    state, r = mimc.squeeze1(state)
    rpow = poly.powers(r, params.K)

    for v in (opening.aggr, opening.aggr_r):
        t = merkle.commit_fields(v)
        state = mimc.absorb(state, t.root.astype(jnp.uint64).reshape(4, 2))
    state, qs = mimc.expand(state, params.queries)
    idx = tuple(int(v) % (2 * params.B) for v in np.asarray(qs)[:, 0])
    if idx != tuple(opening.queries):
        return False, state

    if not bool(F.feq(poly.evaluate_vector(opening.aggr, x_lo),
                      opening.eval_claim)):
        return False, state

    # code linearity at every query, both aggregates
    cw_beta = enc.spielman_encode_padded(code, opening.aggr)
    cw_r = enc.spielman_encode_padded(code, opening.aggr_r)
    lid = jnp.asarray(idx, dtype=jnp.int32)
    comb_beta = F.fsum(F.fmul(beta[None, :, :], opening.reply), axis=1)
    comb_r = F.fsum(F.fmul(rpow[None, :, :], opening.reply), axis=1)
    if not bool(jnp.logical_and(jnp.all(F.feq(comb_beta, cw_beta[lid])),
                                jnp.all(F.feq(comb_r, cw_r[lid])))):
        return False, state

    # Merkle: recompute each chained leaf from the reply column
    q = len(idx)
    prev = jnp.zeros((q, 8), dtype=jnp.uint32)
    for g in range(params.K // 4):
        prev = blake3.hash_chained_leaf(opening.reply[:, 4 * g:4 * g + 4],
                                        prev)
    ok = merkle.verify_leaves_batch(root, prev, list(idx), opening.paths)
    return bool(ok), state


__all__ = [
    "BrakedownParams", "BrakedownCommitment", "BrakedownOpening",
    "BrakingBaseOpening", "commit", "open", "verify",
    "open_brakingbase", "verify_brakingbase",
    "BrakedownStreamParams", "BrakedownStreamCommitment",
    "BrakedownStreamOpening", "commit_brakedown_stream",
    "open_brakedown_stream", "verify_brakedown_stream",
]
