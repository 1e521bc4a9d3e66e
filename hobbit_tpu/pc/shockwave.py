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
    digests -> tree root (vectorized across all columns at once)."""
    k, cols2 = encoded.shape[0], encoded.shape[1]
    cols_vals = jnp.moveaxis(encoded, 0, 1)        # [2c, k, 2]
    assert k % 4 == 0
    leaves = blake3.hash_field_leaves(
        cols_vals.reshape(cols2, k // 4, 4, 2))    # [2c, k/4, 8]
    cur = leaves
    while cur.shape[1] > 1:
        cur = blake3.hash_pairs(cur[:, 0::2], cur[:, 1::2])
    return cur[:, 0]                               # [2c, 8]


def commit(message, k: int = 32) -> ShockwaveData:
    """message [N, 2], N divisible by k; k divisible by 4."""
    N = message.shape[0]
    assert N % k == 0
    mat = message.reshape(k, N // k, 2)
    encoded = enc.rs_encode(mat)                   # [k, 2*cols, 2]
    roots = _column_roots(encoded)
    outer = merkle.build_from_digests(roots)
    return ShockwaveData(matrix=mat, encoded=encoded, col_trees=(),
                         outer=outer, k=k, N=N)


def open(data: ShockwaveData, x, state, queries: int = QUERIES):
    """Open f at x ([log2 N, 2]); returns (ShockwaveOpening, state)."""
    k, N = data.k, data.N
    cols = N // k
    lk, lc = int(np.log2(k)), int(np.log2(cols))
    x_lo, x_hi = x[:lc], x[lc:]
    beta_rows = poly.beta_table(x_hi)              # [k, 2]

    aggr = F.fsum(F.fmul(beta_rows[:, None, :], data.matrix), axis=0)
    aggr_tensor = F.fsum(F.fmul(beta_rows[:, None, :], data.encoded), axis=0)
    eval_claim = poly.evaluate_vector(aggr, x_lo)
    state = mimc.absorb(state, eval_claim)

    state, qs = mimc.expand(state, queries)
    idx = tuple(int(v) % (2 * cols) for v in np.asarray(qs)[:, 0])

    cols_vals = jnp.moveaxis(data.encoded, 0, 1)   # [2c, k, 2]
    reply = cols_vals[jnp.asarray(idx, dtype=jnp.int32)]   # [q, k, 2]
    paths = merkle.open_leaves(data.outer, idx)

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
        # inner recursion: the aggregate is WHIR-committed and opened at
        # both required points instead of transmitted (Virgo.cpp:479-517);
        # the two openings run as one 2-instance whir batch
        from . import whir
        coeffs1 = poly.to_coefficient_form(aggr)[None]
        _, btree = whir._batch_encode(coeffs1)
        root = btree.roots[0]
        state = mimc.absorb(state, root.astype(jnp.uint64).reshape(4, 2))
        fpoint = p2.inner.challenges
        values2 = jnp.stack([aggr, aggr])
        xs2 = jnp.stack([x_lo, fpoint[:lc]])
        wb, _, state = whir.prove_batch(values2, xs2, state)
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
# Multi-point opening: shared queries/replies/paths; per-point indicator +
# FFT sumchecks and (above the threshold) per-point WHIR openings of one
# shared WHIR commitment per point's aggregate.
# ---------------------------------------------------------------------------

class ShockwaveMultiOpening(NamedTuple):
    eval_claims: jnp.ndarray         # [P, 2]
    aggrs: Optional[jnp.ndarray]     # [P, cols, 2] transmitted (naive mode)
    queries: Tuple[int, ...]
    reply: jnp.ndarray               # [q, k, 2] shared columns
    paths: jnp.ndarray
    p1s: tuple                       # per point indicator sumchecks
    p2s: tuple                       # per point FFT sumchecks
    whir_roots: Optional[jnp.ndarray] = None   # [P, 8]
    whir_batch: Optional[object] = None        # whir.WhirBatchProof (2P)


def open_multi(data: ShockwaveData, points, state, queries: int = QUERIES):
    """Open f at every point in `points`; queries/replies/Merkle shared."""
    k, N = data.k, data.N
    cols = N // k
    lc = int(np.log2(cols))
    P = len(points)
    aggrs, aggr_tensors, claims = [], [], []
    for x in points:
        x_lo, x_hi = x[:lc], x[lc:]
        beta_rows = poly.beta_table(x_hi)[:k]
        aggr = F.fsum(F.fmul(beta_rows[:, None, :], data.matrix), axis=0)
        aggrs.append(aggr)
        aggr_tensors.append(
            F.fsum(F.fmul(beta_rows[:, None, :], data.encoded), axis=0))
        claims.append(poly.evaluate_vector(aggr, x_lo))
    eval_claims = jnp.stack(claims)
    state = mimc.absorb(state, eval_claims)

    state, qs = mimc.expand(state, queries)
    idx = tuple(int(v) % (2 * cols) for v in np.asarray(qs)[:, 0])
    cols_vals = jnp.moveaxis(data.encoded, 0, 1)
    reply = cols_vals[jnp.asarray(idx, dtype=jnp.int32)]
    paths = merkle.open_leaves(data.outer, idx)

    state, s = mimc.squeeze1(state)
    indicator = _weighted_indicator(idx, s, 2 * cols)
    p1s, p2s = [], []
    for p in range(P):
        p1, state = sc.prove_2product(aggr_tensors[p], indicator, state)
        p2, _, state = fsc.prove_fft(aggrs[p], p1.challenges, state)
        p1s.append(p1)
        p2s.append(p2)

    if cols > WHIR_THRESHOLD:
        # inner recursion, instance-batched: ONE whir commitment batch
        # over the P aggregates, then ONE batched whir proof over the 2P
        # (x_lo, fft-point) instances — per-instance transcript branches,
        # one host round trip per level for the whole batch (sequential
        # per-point whir proofs dominated the measured open wall clock)
        from . import whir
        aggr_mat = jnp.stack(aggrs)                      # [P, cols, 2]
        coeffs = jnp.stack([poly.to_coefficient_form(aggrs[p])
                            for p in range(P)])
        _, btree = whir._batch_encode(coeffs)
        roots = btree.roots                              # [P, 8]
        state = mimc.absorb(state, roots.astype(jnp.uint64))
        values2 = jnp.concatenate([aggr_mat, aggr_mat], axis=0)
        xs2 = jnp.stack([points[p][:lc] for p in range(P)]
                        + [p2s[p].inner.challenges[:lc] for p in range(P)])
        wb, _, state = whir.prove_batch(values2, xs2, state)
        return ShockwaveMultiOpening(
            eval_claims=eval_claims, aggrs=None, queries=idx, reply=reply,
            paths=paths, p1s=tuple(p1s), p2s=tuple(p2s),
            whir_roots=roots, whir_batch=wb,
        ), state

    aggr_mat = jnp.stack(aggrs)
    state = mimc.absorb(state, aggr_mat)
    return ShockwaveMultiOpening(
        eval_claims=eval_claims, aggrs=aggr_mat, queries=idx, reply=reply,
        paths=paths, p1s=tuple(p1s), p2s=tuple(p2s),
    ), state


def verify_multi(data_root, opening: ShockwaveMultiOpening, points,
                 k: int, N: int, state, queries: int = QUERIES):
    """Returns (ok, state)."""
    cols = N // k
    lc = int(np.log2(cols))
    P = len(points)
    ok = True

    state = mimc.absorb(state, opening.eval_claims)
    state, qs = mimc.expand(state, queries)
    idx = tuple(int(v) % (2 * cols) for v in np.asarray(qs)[:, 0])
    if idx != tuple(opening.queries):
        return False, state

    col_roots = _column_roots(jnp.moveaxis(opening.reply, 1, 0))
    okm = merkle.verify_leaves_batch(data_root, col_roots, idx,
                                     opening.paths)
    ok = ok and bool(okm)

    state, s = mimc.squeeze1(state)
    spow = poly.powers(s, len(idx))
    indicator = _weighted_indicator(idx, s, 2 * cols)
    fpoints, msg_evals = [], []
    for p in range(P):
        x_hi = points[p][lc:]
        beta_rows = poly.beta_table(x_hi)[:k]
        comb = F.fsum(F.fmul(beta_rows[None, :, :], opening.reply), axis=1)
        claim = F.fsum(F.fmul(spow, comb), axis=0)
        okp, point, cur, state = sc.verify_product_sumcheck(
            opening.p1s[p], claim, state, 2)
        ok = ok and bool(okp)
        ok = ok and bool(F.feq(opening.p1s[p].final_evals[1],
                               poly.evaluate_vector(indicator, point)))
        okf, fpoint, msg_eval, state = fsc.verify_fft(
            opening.p2s[p], point, opening.p1s[p].final_evals[0], state)
        ok = ok and bool(okf)
        fpoints.append(fpoint)
        msg_evals.append(msg_eval)

    if opening.whir_roots is not None:
        from . import whir
        one = F.scalar(1)
        state = mimc.absorb(state, opening.whir_roots.astype(jnp.uint64))
        xs2 = jnp.stack([points[p][:lc] for p in range(P)]
                        + [fpoints[p][:lc] for p in range(P)])
        y_fs = [F.fmul(msg_evals[p], F.finv(F.fsub(one, fpoints[p][lc])))
                for p in range(P)]
        ys2 = jnp.concatenate(
            [opening.eval_claims, jnp.stack(y_fs)], axis=0)
        roots2 = jnp.concatenate([opening.whir_roots,
                                  opening.whir_roots], axis=0)
        okw, state = whir.verify_batch(roots2, opening.whir_batch, xs2,
                                       ys2, state)
        ok = ok and bool(okw)
        return ok, state

    state = mimc.absorb(state, opening.aggrs)
    for p in range(P):
        aggr = opening.aggrs[p]
        ok = ok and bool(F.feq(poly.evaluate_vector(aggr, points[p][:lc]),
                               opening.eval_claims[p]))
        padded = jnp.concatenate(
            [aggr, jnp.zeros((2 * cols - aggr.shape[0], 2), jnp.uint64)])
        ok = ok and bool(F.feq(poly.evaluate_vector(padded, fpoints[p]),
                               msg_evals[p]))
        enc_aggr = enc.rs_encode(aggr[None])[0]
        x_hi = points[p][lc:]
        beta_rows = poly.beta_table(x_hi)[:k]
        comb = F.fsum(F.fmul(beta_rows[None, :, :], opening.reply), axis=1)
        sel = enc_aggr[jnp.asarray(idx)]
        ok = ok and bool(jnp.all(F.feq(comb, sel)))
    return ok, state


def verify(data_root, opening: ShockwaveOpening, x, k: int, N: int, state,
           queries: int = QUERIES):
    """Returns (ok, state)."""
    cols = N // k
    lc = int(np.log2(cols))
    x_lo, x_hi = x[:lc], x[lc:]
    beta_rows = poly.beta_table(x_hi)
    ok = True

    state = mimc.absorb(state, opening.eval_claim)
    state, qs = mimc.expand(state, queries)
    idx = tuple(int(v) % (2 * cols) for v in np.asarray(qs)[:, 0])
    if idx != tuple(opening.queries):
        return False, state

    # column membership: recompute mini roots from replies + outer paths
    col_roots = _column_roots(jnp.moveaxis(opening.reply, 1, 0))
    for qi, col in enumerate(idx):
        if not merkle.verify_leaf(data_root, col_roots[qi], col,
                                  opening.paths[qi]):
            return False, state

    # query-weighted indicator-sumcheck claim: sum_i s^i * comb_i over ALL
    # queries (the s^i weights stop cross-column error cancellation)
    comb = F.fsum(F.fmul(beta_rows[None, :, :], opening.reply), axis=1)
    state, s = mimc.squeeze1(state)
    spow = poly.powers(s, len(idx))
    claim = F.fsum(F.fmul(spow, comb), axis=0)
    okp, point, cur, state = sc.verify_product_sumcheck(opening.p1, claim,
                                                       state, 2)
    ok = ok and bool(okp)
    # indicator final eval check (verifier recomputes its MLE)
    indicator = _weighted_indicator(idx, s, 2 * cols)
    want_ind = poly.evaluate_vector(indicator, point)
    ok = ok and bool(F.feq(opening.p1.final_evals[1], want_ind))

    # FFT relation: codeword eval at `point` -> message eval
    okf, fpoint, msg_eval, state = fsc.verify_fft(
        opening.p2, point, opening.p1.final_evals[0], state)
    ok = ok and bool(okf)

    lc_bits = int(np.log2(cols))
    if opening.whir_root is not None:
        # WHIR-recursion mode: both aggregate evaluations are proven
        # against the inner commitment (one 2-instance whir batch); the
        # per-query re-encode check is subsumed by the indicator + FFT
        # sumchecks
        from . import whir
        state = mimc.absorb(
            state, opening.whir_root.astype(jnp.uint64).reshape(4, 2))
        one = F.scalar(1)
        y_f = F.fmul(msg_eval, F.finv(F.fsub(one, fpoint[lc_bits])))
        xs2 = jnp.stack([x_lo, fpoint[:lc_bits]])
        ys2 = jnp.stack([opening.eval_claim, y_f])
        roots2 = jnp.stack([opening.whir_root, opening.whir_root])
        okw, state = whir.verify_batch(roots2, opening.wp_x, xs2, ys2,
                                       state)
        ok = ok and bool(okw)
        return ok, state

    # naive-mode: aggregate transmitted; check both evaluation bindings
    state = mimc.absorb(state, opening.aggr)
    ok = ok and bool(F.feq(poly.evaluate_vector(opening.aggr, x_lo),
                           opening.eval_claim))
    padded = jnp.concatenate(
        [opening.aggr,
         jnp.zeros((2 * cols - opening.aggr.shape[0], 2), jnp.uint64)])
    ok = ok and bool(F.feq(poly.evaluate_vector(padded, fpoint), msg_eval))
    # consistency of transmitted aggregate with the queried columns
    enc_aggr = enc.rs_encode(opening.aggr[None])[0]
    for qi, col in enumerate(idx):
        ok = ok and bool(F.feq(comb[qi], enc_aggr[col]))
    return ok, state


__all__ = ["ShockwaveData", "ShockwaveOpening", "ShockwaveMultiOpening",
           "commit", "open", "verify", "open_multi", "verify_multi",
           "QUERIES"]
