"""Shockwave: the small in-memory tensor-ish PC used as recursion inner PC.

Reference ``Virgo.cpp:120-157`` (commit) / ``:435-517`` (prove): the
polynomial is a k x (N/k) matrix; rows are RS-extended x2 (FFT of the row's
coefficients); every codeword *column* gets a mini Merkle tree whose root
becomes a leaf of the outer tree.  Opening at x: eq(x_hi)-aggregate the
rows, answer 240 column queries (k values + path each), then replace the
naive per-query consistency check with (1) a 2-product sumcheck against the
query-indicator vector and (2) an FFT-relation sumcheck reducing the
codeword claim to the message aggregate, which is transmitted (naive) or
recursed into WHIR when large.

Improvement over the reference (documented): the reference's WHIR branch
opens the aggregate only at the FFT-sumcheck point, leaving the x_lo
evaluation unproven (Virgo.cpp:479-490); here the aggregate is always
bound at both points (transmitted in full below the recursion threshold,
else opened twice via WHIR).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import numpy as np

import jax.numpy as jnp

from ..ops import blake3
from ..ops import encode as enc
from ..ops import field as F
from ..ops import merkle, mimc, poly
from ..core import fft_sumcheck as fsc
from ..core import sumcheck as sc
from ..utils.jitting import maybe_jit

QUERIES = 240  # Virgo.cpp:438


class ShockwaveData(NamedTuple):
    matrix: jnp.ndarray          # [k, cols, 2] message rows
    encoded: jnp.ndarray         # [k, 2*cols, 2] RS-extended rows
    col_trees: tuple             # per-column mini trees' levels stacked
    outer: merkle.MerkleTree
    k: int
    N: int


class ShockwaveOpening(NamedTuple):
    eval_claim: jnp.ndarray      # [2] f(x)
    aggr: Optional[jnp.ndarray]  # [cols, 2] transmitted aggregate (naive)
    queries: Tuple[int, ...]
    reply: jnp.ndarray           # [q, k, 2] full columns
    paths: jnp.ndarray           # [q, depth, 8] outer-tree paths
    p1: sc.SumcheckProof         # indicator consistency sumcheck
    p2: fsc.FFTSumcheckProof     # FFT relation sumcheck
    whir_root: Optional[jnp.ndarray] = None   # WHIR-recursion mode
    wp_x: Optional[object] = None             # WHIR proof at x_lo
    wp_f: Optional[object] = None             # WHIR proof at the fft point


WHIR_THRESHOLD = 1 << 8      # recurse into WHIR above this (Virgo.cpp:479)


def _weighted_indicator(idx, s, domain: int):
    """[domain, 2] field vector with indicator[c] = sum_{i: idx[i]=c} s^i."""
    q = len(idx)
    spow = poly.powers(s, q)                              # [q, 2]
    idx_arr = jnp.asarray(idx, dtype=jnp.int32)
    onehot = jnp.arange(domain, dtype=jnp.int32)[None, :] == idx_arr[:, None]
    contrib = jnp.where(onehot[:, :, None], spow[:, None, :], jnp.uint64(0))
    return F.fsum(contrib, axis=0)


def _column_roots(encoded):
    """Mini-MT root per column: [2*cols, 8].  Column = k values -> k/4 leaf
    digests -> tree root (vectorized across all columns at once; the level
    loop is ONE masked scan — see merkle.batch_build_from_digests)."""
    import jax

    k, cols2 = encoded.shape[0], encoded.shape[1]
    cols_vals = jnp.moveaxis(encoded, 0, 1)        # [2c, k, 2]
    assert k % 4 == 0
    leaves = blake3.hash_field_leaves(
        cols_vals.reshape(cols2, k // 4, 4, 2))    # [2c, k/4, 8]
    m = k // 4
    if m == 1:
        return leaves[:, 0]
    D = int(np.log2(m))

    def body(cur, _):
        nxt = blake3.hash_pairs(cur[:, 0::2], cur[:, 1::2])
        return jnp.concatenate(
            [nxt, jnp.zeros((cols2, m - m // 2, 8), dtype=cur.dtype)],
            axis=1), None

    cur, _ = jax.lax.scan(body, leaves, None, length=D)
    return cur[:, 0]                               # [2c, 8]


@maybe_jit(static_argnums=(1,))
def _commit_impl(message, k: int):
    """Whole commit (RS encode + column roots + outer tree) as ONE
    compiled program — scanned builders keep the graph small."""
    N = message.shape[0]
    mat = message.reshape(k, N // k, 2)
    encoded = enc.rs_encode(mat)                   # [k, 2*cols, 2]
    roots = _column_roots(encoded)
    bt = merkle.batch_build_from_digests(roots[None])
    levels = tuple(l[0] for l in bt.levels)
    stack = None if bt.stack is None else bt.stack[:, 0]
    return mat, encoded, levels, stack


def commit(message, k: int = 32) -> ShockwaveData:
    """message [N, 2], N divisible by k; k divisible by 4."""
    N = message.shape[0]
    assert N % k == 0
    mat, encoded, levels, stack = _commit_impl(message, k)
    outer = merkle.MerkleTree(levels=levels, backend="blake3", stack=stack)
    return ShockwaveData(matrix=mat, encoded=encoded, col_trees=(),
                         outer=outer, k=k, N=N)


def open(data: ShockwaveData, x, state, queries: int = QUERIES):
    """Open f at x ([log2 N, 2]); returns (ShockwaveOpening, state).

    The whole opening (aggregation, query expansion, path gathers,
    indicator + FFT sumchecks, inner WHIR folding) is ONE compiled
    program per shape; nothing crosses the device link mid-proof."""
    return _open_impl(data.matrix, data.encoded, data.outer.stack,
                      jnp.asarray(x, dtype=jnp.uint64), state, queries,
                      data.k, data.N)


@maybe_jit(static_argnums=(5, 6, 7))
def _open_impl(matrix, encoded, ostack, x, state, queries: int, k: int,
               N: int):
    cols = N // k
    lc = int(np.log2(cols))
    x_lo, x_hi = x[:lc], x[lc:]
    beta_rows = poly.beta_table(x_hi)              # [k, 2]

    aggr = F.fsum(F.fmul(beta_rows[:, None, :], matrix), axis=0)
    aggr_tensor = F.fsum(F.fmul(beta_rows[:, None, :], encoded), axis=0)
    eval_claim = poly.evaluate_vector(aggr, x_lo)
    state = mimc.absorb(state, eval_claim)

    state, qs = mimc.expand(state, queries)
    idx = (qs[:, 0] % (2 * cols)).astype(jnp.int64)

    cols_vals = jnp.moveaxis(encoded, 0, 1)        # [2c, k, 2]
    reply = cols_vals[idx]                         # [q, k, 2]
    if ostack is not None:
        paths = merkle._open_stack(ostack, idx)
    else:
        paths = jnp.zeros((queries, 0, 8), dtype=jnp.uint32)

    # query-weighted indicator: indicator[c] = sum of s^i over queries i
    # hitting column c (reference aggregates queried codewords with random
    # weights s^i, PC_utils.cpp:203-210).  An UNWEIGHTED indicator lets
    # per-column errors cancel in the plain sum (a codeword difference
    # taking +-a values passes w.p. ~1/sqrt(q) per FS grind).
    state, s = mimc.squeeze1(state)
    indicator = _weighted_indicator(idx, s, 2 * cols)
    p1, state = sc.prove_2product(aggr_tensor, indicator, state)
    p2, _, state = fsc.prove_fft(aggr, p1.challenges, state)

    if cols > WHIR_THRESHOLD:
        # inner recursion: the aggregate is WHIR-committed and both
        # required claims (x_lo and the FFT-sumcheck point) are proven by
        # ONE gamma-weighted folding run instead of being transmitted
        # (Virgo.cpp:479-517) or run as two instances: the weight vector
        # beta_{x_lo} + gamma * beta_{fpoint} is still multilinear.
        from . import whir
        coeffs1 = poly.to_coefficient_form(aggr)[None]
        _, btree = whir._batch_encode(coeffs1)
        root = btree.roots[0]
        state = mimc.absorb(state, root.astype(jnp.uint64).reshape(4, 2))
        fpoint = p2.inner.challenges
        state, gam = mimc.squeeze1(state)
        xs2 = jnp.stack([x_lo, fpoint[:lc]])[None]      # [1, 2, lc, 2]
        gammas = jnp.stack([F.scalar(1), gam])[None]    # [1, 2, 2]
        sc_stack, wlevels, final, _, state = whir._prove_batch_impl(
            aggr[None], xs2, gammas, state, whir.QUERIES_PER_LEVEL)
        wb = whir.WhirBatchProof(sumcheck_polys=sc_stack, levels=wlevels,
                                 final_polys=final, n=cols)
        return ShockwaveOpening(
            eval_claim=eval_claim, aggr=None, queries=idx, reply=reply,
            paths=paths, p1=p1, p2=p2, whir_root=root,
            wp_x=wb, wp_f=None,
        ), state

    state = mimc.absorb(state, aggr)               # naive-mode transmission
    return ShockwaveOpening(
        eval_claim=eval_claim, aggr=aggr, queries=idx, reply=reply,
        paths=paths, p1=p1, p2=p2,
    ), state


# ---------------------------------------------------------------------------
# Multi-point opening: a delta-RLC 2-product sumcheck merges every point
# claim on the committed vector into ONE random point, then a single
# single-point open proves that point.  The weight MLE W(u) =
# sum_j delta^j eq(x_j, u) is multilinear, so the merge costs one
# quadratic sumcheck over N and the verifier evaluates W at the final
# point in closed form (P * log N mults).  Replaces the round-2 design
# (per-point indicator + FFT sumchecks and a 2P-instance WHIR batch)
# whose proofs dominated both Ps and the open-phase wall clock.
# Reference opens per point (Virgo.cpp:435-517); sharing is sound because
# delta is sampled after the claims and the commitment are bound.
# ---------------------------------------------------------------------------

class ShockwaveMultiOpening(NamedTuple):
    eval_claims: jnp.ndarray         # [P, 2]
    p0: sc.SumcheckProof             # delta-merge sumcheck over the vector
    inner: ShockwaveOpening          # single-point open at p0's point


def _eq_evals(points, rho):
    """[P, 2] eq(x_j, rho) for full-domain points x_j."""
    pts = jnp.stack([jnp.asarray(x, dtype=jnp.uint64) for x in points])
    one = F.scalar(1)
    t = F.fmul(pts, rho[None, :, :])                       # x_b * r_b
    t = F.fadd(F.fadd(t, t),                               # 2xr + 1 - x - r
               F.fsub(F.fsub(one[None, None], pts), rho[None, :, :]))
    acc = t[:, 0]
    for b in range(1, t.shape[1]):
        acc = F.fmul(acc, t[:, b])
    return acc


def open_multi(data: ShockwaveData, points, state, queries: int = QUERIES):
    """Open f at every point in `points` (list of [log2 N, 2]).

    One delta-batched merge sumcheck + one inner single-point open; the
    caller must have absorbed the commitment root before calling.  The
    full multi-open (merge + inner open) is one compiled program."""
    pts = jnp.stack([jnp.asarray(x, dtype=jnp.uint64) for x in points])
    return _open_multi_impl(data.matrix, data.encoded,
                            data.outer.stack, pts, state, queries,
                            data.k, data.N)


@maybe_jit(static_argnums=(5, 6, 7))
def _open_multi_impl(matrix, encoded, ostack, pts, state, queries: int,
                     k: int, N: int):
    import jax

    cols = N // k
    lc = int(np.log2(cols))
    P = pts.shape[0]
    # batched beta tables / claims: ONE vectorized instantiation instead
    # of P unrolled copies (compile cost is per lowered op, not per lane);
    # the k-contraction runs as a scan so no [P, k, cols] intermediate
    # materializes (600 MB at the flagship shape)
    blos = jax.vmap(poly.beta_table)(pts[:, :lc])          # [P, cols, 2]
    bhis = jax.vmap(poly.beta_table)(pts[:, lc:])          # [P, k, 2]

    def row_acc(acc, xs):
        bh_r, row = xs                                     # [P, 2], [cols, 2]
        return F.fadd(acc, F.fmul(bh_r[:, None, :], row[None])), None

    aggrs, _ = jax.lax.scan(
        row_acc, jnp.zeros((P, cols, 2), jnp.uint64),
        (jnp.moveaxis(bhis, 1, 0), matrix))                # [P, cols, 2]
    eval_claims = F.fsum(F.fmul(aggrs, blos), axis=1)      # [P, 2]
    state = mimc.absorb(state, eval_claims)

    state, d = mimc.squeeze1(state)
    deltas = poly.powers(d, P)

    def w_acc(acc, xs):
        db, bl = xs                                        # [k, 2], [cols, 2]
        return F.fadd(acc, F.fmul(db[:, None, :], bl[None])), None

    W, _ = jax.lax.scan(
        w_acc, jnp.zeros((k, cols, 2), jnp.uint64),
        (F.fmul(deltas[:, None, :], bhis), blos))          # [k, cols, 2]
    p0, state = sc.prove_2product(matrix.reshape(N, 2),
                                  W.reshape(N, 2), state)
    inner, state = _open_impl(matrix, encoded, ostack, p0.challenges,
                              state, queries, k, N)
    return ShockwaveMultiOpening(eval_claims=eval_claims, p0=p0,
                                 inner=inner), state


def verify_multi(data_root, opening: ShockwaveMultiOpening, points,
                 k: int, N: int, state, queries: int = QUERIES):
    """Returns (ok, state) with ok a device boolean."""
    P = len(points)
    if opening.eval_claims.shape[0] != P:
        return jnp.array(False), state
    pts = jnp.stack([jnp.asarray(x, dtype=jnp.uint64) for x in points])
    return _verify_multi_impl(jnp.asarray(data_root), opening, pts, state,
                              queries, k, N)


@maybe_jit(static_argnums=(4, 5, 6))
def _verify_multi_impl(data_root, opening, pts, state, queries: int,
                       k: int, N: int):
    P = pts.shape[0]
    state = mimc.absorb(state, opening.eval_claims)

    state, d = mimc.squeeze1(state)
    deltas = poly.powers(d, P)
    claim = F.fsum(F.fmul(deltas, opening.eval_claims), axis=0)
    okp, rho, cur, state = sc.verify_product_sumcheck(opening.p0, claim,
                                                      state, 2)
    ok = okp
    want_w = F.fsum(F.fmul(deltas, _eq_evals(pts, rho)), axis=0)
    ok = jnp.logical_and(ok, F.feq(opening.p0.final_evals[1], want_w))
    ok = jnp.logical_and(ok, F.feq(opening.p0.final_evals[0],
                                   opening.inner.eval_claim))
    oki, state = _verify_impl(data_root, opening.inner, rho, state,
                              queries, k, N)
    return jnp.logical_and(ok, oki), state


def verify(data_root, opening: ShockwaveOpening, x, k: int, N: int, state,
           queries: int = QUERIES):
    """Returns (ok, state) with ok a device boolean."""
    if isinstance(opening.queries, tuple):
        opening = opening._replace(
            queries=jnp.asarray(opening.queries, dtype=jnp.int64))
    return _verify_impl(jnp.asarray(data_root), opening,
                        jnp.asarray(x, dtype=jnp.uint64), state, queries,
                        k, N)


@maybe_jit(static_argnums=(4, 5, 6))
def _verify_impl(data_root, opening, x, state, queries: int, k: int,
                 N: int):
    cols = N // k
    lc = int(np.log2(cols))
    x_lo, x_hi = x[:lc], x[lc:]
    beta_rows = poly.beta_table(x_hi)
    ok = jnp.array(True)

    state = mimc.absorb(state, opening.eval_claim)
    state, qs = mimc.expand(state, queries)
    idx = (qs[:, 0] % (2 * cols)).astype(jnp.int64)
    ok = jnp.logical_and(ok, jnp.all(
        idx == jnp.asarray(opening.queries, dtype=jnp.int64)))

    # column membership: recompute mini roots from replies + outer paths
    col_roots = _column_roots(jnp.moveaxis(opening.reply, 1, 0))
    ok = jnp.logical_and(ok, merkle.verify_leaves_device(
        data_root, col_roots, idx, opening.paths))

    # query-weighted indicator-sumcheck claim: sum_i s^i * comb_i over ALL
    # queries (the s^i weights stop cross-column error cancellation)
    comb = F.fsum(F.fmul(beta_rows[None, :, :], opening.reply), axis=1)
    state, s = mimc.squeeze1(state)
    spow = poly.powers(s, queries)
    claim = F.fsum(F.fmul(spow, comb), axis=0)
    okp, point, cur, state = sc.verify_product_sumcheck(opening.p1, claim,
                                                        state, 2)
    ok = jnp.logical_and(ok, okp)
    # indicator final eval check (verifier recomputes its MLE)
    indicator = _weighted_indicator(idx, s, 2 * cols)
    want_ind = poly.evaluate_vector(indicator, point)
    ok = jnp.logical_and(ok, F.feq(opening.p1.final_evals[1], want_ind))

    # FFT relation: codeword eval at `point` -> message eval
    okf, fpoint, msg_eval, state = fsc.verify_fft(
        opening.p2, point, opening.p1.final_evals[0], state)
    ok = jnp.logical_and(ok, okf)

    lc_bits = int(np.log2(cols))
    if opening.whir_root is not None:
        # WHIR-recursion mode: both aggregate evaluations are proven by
        # one gamma-weighted folding run against the inner commitment; the
        # per-query re-encode check is subsumed by the indicator + FFT
        # sumchecks
        from . import whir
        state = mimc.absorb(
            state, opening.whir_root.astype(jnp.uint64).reshape(4, 2))
        state, gam = mimc.squeeze1(state)
        one = F.scalar(1)
        y_f = F.fmul(msg_eval, F.finv(F.fsub(one, fpoint[lc_bits])))
        xs2 = jnp.stack([x_lo, fpoint[:lc_bits]])[None]
        ys2 = jnp.stack([opening.eval_claim, y_f])[None]
        gammas = jnp.stack([F.scalar(1), gam])[None]
        okw, state = whir._verify_batch_impl(
            opening.whir_root[None], opening.wp_x.sumcheck_polys,
            opening.wp_x.levels, opening.wp_x.final_polys, xs2, gammas,
            ys2, state, whir.QUERIES_PER_LEVEL, cols)
        ok = jnp.logical_and(ok, okw)
        return ok, state

    # naive-mode: aggregate transmitted; check both evaluation bindings
    state = mimc.absorb(state, opening.aggr)
    ok = jnp.logical_and(ok,
                         F.feq(poly.evaluate_vector(opening.aggr, x_lo),
                               opening.eval_claim))
    padded = jnp.concatenate(
        [opening.aggr,
         jnp.zeros((2 * cols - opening.aggr.shape[0], 2), jnp.uint64)])
    ok = jnp.logical_and(ok, F.feq(poly.evaluate_vector(padded, fpoint),
                                   msg_eval))
    # consistency of transmitted aggregate with the queried columns
    enc_aggr = enc.rs_encode(opening.aggr[None])[0]
    ok = jnp.logical_and(ok, jnp.all(F.feq(comb, enc_aggr[idx])))
    return ok, state


__all__ = ["ShockwaveData", "ShockwaveOpening", "ShockwaveMultiOpening",
           "commit", "open", "verify", "open_multi", "verify_multi",
           "QUERIES"]
