"""Elastic PC: the streaming polynomial commitment.

TPU-native re-design of ``Elastic_PC.{hpp,cpp}``: the polynomial is a
*stream* of K chunks of B coefficients that is never materialized.

commit (one pass, reference Elastic_PC.cpp:174-285): every chunk is
tensor-encoded on device and absorbed into the chained Merkle leaf state
(leaf (row-group, column) extends Merkle-Damgard style across chunks);
an all-zero chunk skips encoding entirely and reuses a cached leaf update
(the zero-chunk fast path, :206-226).  Resident state: one chunk, one
codeword, one leaf layer — O(B) memory.

open (two more passes, :316-533, 625-726):
  pass A   re-stream chunks, eq(x_hi)-weighted aggregate -> B-sized vector;
  pass B   re-encode every chunk, collecting the queried tensor positions'
           per-chunk values + Merkle paths.
The aggregate is bound via a shockwave commitment and the query consistency
uses code linearity, exactly as the in-memory PC — the streaming variant
changes only *where the data comes from*.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..ops import blake3
from ..ops import encode as enc
from ..ops import field as F
from ..ops import merkle, mimc, poly
from . import shockwave as sw
from . import standard as std


class ElasticCommitment(NamedTuple):
    tree: merkle.MerkleTree
    params: std.TensorPCParams

    @property
    def root(self):
        return self.tree.root


class ElasticOpening(NamedTuple):
    eval_claim: jnp.ndarray
    aggr: jnp.ndarray                  # [B, 2] transmitted aggregate
    rows_idx: Tuple[int, ...]
    cols_idx: Tuple[int, ...]
    reply: jnp.ndarray                 # [q, K, 4, 2]
    paths: jnp.ndarray
    leaf_ids: Tuple[int, ...] = ()     # Merkle leaf indices (Ps dedup)


def _chunk_slices(full, B: int):
    return lambda i: full[i * B:(i + 1) * B]


def _zero_leaf_update(params: std.TensorPCParams):
    """Leaf-state update for an all-zero chunk (cached): chaining with the
    hash of four zero field elements."""
    num_leaves = (2 * params.rows // 4) * (2 * params.cols)
    zero_groups = jnp.zeros((num_leaves, 4, 2), dtype=jnp.uint64)
    return zero_groups


import functools


@functools.lru_cache(maxsize=64)
def _stream_kernels(params: std.TensorPCParams):
    """Per-params jitted chunk kernels shared by every streaming
    commit/open call.  Defining these as closures inside the open/commit
    functions created a fresh function object (and thus a fresh ~10s XLA
    compile of the tensor-encode graph) on EVERY call — the jit cache is
    keyed on function identity."""
    from ..utils.jitting import maybe_jit

    spec = enc.make_tensor_spec(params.B, params.rows, params.linear_time)

    @maybe_jit
    def commit_step(chunk, prev):
        codeword = enc.tensor_encode(spec, chunk)
        return blake3.hash_chained_leaf(std._leaf_groups(codeword), prev)

    @maybe_jit
    def aggr_step1(aggr, b, chunk):
        return F.fadd(aggr, F.fmul(b[None, :], chunk))

    @maybe_jit
    def aggr_stepP(aggrs, b, chunk):
        # aggrs [P, B, 2]; b [P, 2]
        return F.fadd(aggrs, F.fmul(b[:, None, :], chunk[None]))

    @maybe_jit
    def reply_step(chunk, lid):
        codeword = enc.tensor_encode(spec, chunk)
        return std._leaf_groups(codeword)[lid]

    return commit_step, aggr_step1, aggr_stepP, reply_step


@functools.lru_cache(maxsize=64)
def _full_commit_kernel(params: std.TensorPCParams):
    """Whole-commit kernel for a RESIDENT polynomial: lax.scan over the
    chunks inside ONE compiled call (each per-chunk dispatch costs real
    latency on remote-attached chips)."""
    from ..utils.jitting import maybe_jit

    spec = enc.make_tensor_spec(params.B, params.rows, params.linear_time)
    num_leaves = (2 * params.rows // 4) * (2 * params.cols)

    @maybe_jit
    def run(full):
        from ..parallel import mesh as meshmod
        chunks = full.reshape(params.K, params.B, 2)

        def body(prev, chunk):
            codeword = enc.tensor_encode(spec, meshmod.shard_leading(chunk))
            return blake3.hash_chained_leaf(std._leaf_groups(codeword),
                                            prev), None

        prev, _ = jax.lax.scan(
            body, jnp.zeros((num_leaves, 8), dtype=jnp.uint32), chunks)
        return prev

    return run


@functools.lru_cache(maxsize=64)
def _full_open_kernels(params: std.TensorPCParams):
    """(aggr_fn, reply_fn) for resident polynomials: single-dispatch
    aggregation and query-reply passes (scan over chunks)."""
    from ..utils.jitting import maybe_jit

    spec = enc.make_tensor_spec(params.B, params.rows, params.linear_time)

    @maybe_jit
    def aggr_fn(full, betas):
        chunks = full.reshape(params.K, params.B, 2)

        def body(acc, xs):
            b, chunk = xs          # b [P, 2], chunk [B, 2]
            return F.fadd(acc, F.fmul(b[:, None, :], chunk[None])), None

        P = betas.shape[0]
        acc, _ = jax.lax.scan(
            body, jnp.zeros((P, params.B, 2), dtype=jnp.uint64),
            (jnp.moveaxis(betas, 0, 1), chunks))
        return acc

    @maybe_jit
    def reply_fn(full, lid):
        from ..parallel import mesh as meshmod
        chunks = full.reshape(params.K, params.B, 2)

        def body(_, chunk):
            codeword = enc.tensor_encode(spec, meshmod.shard_leading(chunk))
            return None, std._leaf_groups(codeword)[lid]

        _, rep = jax.lax.scan(body, None, chunks)   # [K, q, 4, 2]
        return jnp.moveaxis(rep, 0, 1)              # [q, K, 4, 2]

    return aggr_fn, reply_fn


def commit_stream(chunk_fn: Callable[[int], jnp.ndarray],
                  params: std.TensorPCParams,
                  zero_from: Optional[int] = None,
                  full=None) -> ElasticCommitment:
    """chunk_fn(i) -> [B, 2] chunk i of the coefficient stream.

    zero_from: chunks >= this index are all-zero (padding) — they take the
    fast path.  Only O(B) state is resident at any time; the per-chunk
    encode + chained-leaf update is one compiled kernel.

    full: optional RESIDENT [N, 2] coefficient array — the whole commit
    runs as one compiled scan (identical tree/transcript).
    """
    from ..utils.jitting import JIT_ENABLED, maybe_jit

    if full is not None and not JIT_ENABLED:
        # eager mode: a scan over the BLAKE3 body is an XLA:CPU compile
        # bomb (minutes per shape); per-chunk eager dispatch is fast and
        # produces the identical tree
        chunk_fn = _chunk_slices(full, params.B)
        full = None
    if full is not None:
        prev = _full_commit_kernel(params)(full)
        num_leaves = prev.shape[0]
        if num_leaves & (num_leaves - 1):
            pad = (1 << int(np.ceil(np.log2(num_leaves)))) - num_leaves
            prev = jnp.concatenate(
                [prev, jnp.zeros((pad, 8), dtype=prev.dtype)], axis=0)
        return ElasticCommitment(tree=merkle.build_from_digests(prev),
                                 params=params)

    num_leaves = (2 * params.rows // 4) * (2 * params.cols)
    prev = jnp.zeros((num_leaves, 8), dtype=jnp.uint32)

    _step, _, _, _ = _stream_kernels(params)

    zero_update = None
    for i in range(params.K):
        if zero_from is not None and i >= zero_from:
            if zero_update is None:
                zero_update = _zero_leaf_update(params)
            prev = blake3.hash_chained_leaf(zero_update, prev)
            continue
        prev = _step(chunk_fn(i), prev)
    if num_leaves & (num_leaves - 1):
        pad = (1 << int(np.ceil(np.log2(num_leaves)))) - num_leaves
        prev = jnp.concatenate(
            [prev, jnp.zeros((pad, 8), dtype=prev.dtype)], axis=0)
    tree = merkle.build_from_digests(prev)
    return ElasticCommitment(tree=tree, params=params)


def open_stream(chunk_fn: Callable[[int], jnp.ndarray],
                com: ElasticCommitment, x, state,
                sw_queries: int = sw.QUERIES):
    """Streaming open at x; two passes over the chunk stream."""
    params = com.params
    spec = enc.make_tensor_spec(params.B, params.rows, params.linear_time)
    lb = int(np.log2(params.B))
    x_lo, x_hi = x[:lb], x[lb:]
    beta = poly.beta_table(x_hi)

    # ---- pass A: aggregate ------------------------------------------------
    _, _aggr_step, _, _reply_kernel = _stream_kernels(params)

    aggr = jnp.zeros((params.B, 2), dtype=jnp.uint64)
    for i in range(params.K):
        aggr = _aggr_step(aggr, beta[i], chunk_fn(i))
    eval_claim = poly.evaluate_vector(aggr, x_lo)

    aggr_tree = merkle.commit_fields(aggr)
    state = mimc.absorb(state, aggr_tree.root.astype(jnp.uint64).reshape(4, 2))
    state, qrows, qcols = std.derive_queries(state, params)

    # ---- pass B: re-encode + query replies -------------------------------
    leaf_ids = [((r // 4) * (2 * params.cols) + c)
                for r, c in zip(qrows, qcols)]
    lid = jnp.asarray(leaf_ids, dtype=jnp.int32)

    replies = [_reply_kernel(chunk_fn(i), lid) for i in range(params.K)]
    reply = jnp.stack(replies, axis=1)       # [q, K, 4, 2]
    paths = merkle.open_leaves(com.tree, leaf_ids)

    return ElasticOpening(
        eval_claim=eval_claim, aggr=aggr,
        rows_idx=qrows, cols_idx=qcols, reply=reply, paths=paths,
        leaf_ids=tuple(leaf_ids),
    ), state


def verify(root, x, opening: ElasticOpening, params: std.TensorPCParams,
           state, sw_queries: int = sw.QUERIES):
    """Returns (ok, state).  Naive-recursion mode: the B-sized aggregate is
    transmitted; the verifier re-encodes it (pc.recursion replaces this
    with the shockwave/FFT-sumcheck recursion of PC_utils.cpp:396-512)."""
    lb = int(np.log2(params.B))
    x_lo, x_hi = x[:lb], x[lb:]
    beta = poly.beta_table(x_hi)

    aggr_tree = merkle.commit_fields(opening.aggr)
    state = mimc.absorb(state, aggr_tree.root.astype(jnp.uint64).reshape(4, 2))
    state, qrows, qcols = std.derive_queries(state, params)
    if tuple(qrows) != tuple(opening.rows_idx) or \
       tuple(qcols) != tuple(opening.cols_idx):
        return False, state

    if not bool(F.feq(poly.evaluate_vector(opening.aggr, x_lo),
                      opening.eval_claim)):
        return False, state

    spec = enc.make_tensor_spec(params.B, params.rows, params.linear_time)
    enc_aggr = enc.tensor_encode(spec, opening.aggr)
    # batched over queries: q*K tiny dispatches otherwise (weak on
    # remote-attached devices where every dispatch pays a round trip)
    comb = F.fsum(F.fmul(beta[None, :, None, :], opening.reply), axis=1)
    ra = jnp.asarray(qrows, dtype=jnp.int64)
    ca = jnp.asarray(qcols, dtype=jnp.int64)
    picked = jnp.take_along_axis(comb, (ra % 4)[:, None, None],
                                 axis=1)[:, 0]
    want = enc_aggr[ra, ca]
    if not bool(jnp.all(F.feq(picked, want))):
        return False, state
    prev = jnp.zeros((len(qrows), 8), dtype=jnp.uint32)
    for i in range(params.K):
        prev = blake3.hash_chained_leaf(opening.reply[:, i], prev)
    leaf_ids = [(r // 4) * (2 * params.cols) + c
                for r, c in zip(qrows, qcols)]
    ok = merkle.verify_leaves_batch(root, prev, leaf_ids, opening.paths)
    return bool(ok), state


# ---------------------------------------------------------------------------
# Recursive streaming open (reference recursive_prover_{RS,Spielman}_stream,
# PC_utils.cpp:168-387 + Elastic_PC.cpp:625-726): the B-sized aggregate is
# never transmitted — it is shockwave-committed and the query consistency is
# proven by the recursion sumchecks.
# ---------------------------------------------------------------------------

class ElasticRecursiveOpening(NamedTuple):
    eval_claim: jnp.ndarray
    cf_root: jnp.ndarray
    rows_idx: Tuple[int, ...]
    cols_idx: Tuple[int, ...]
    reply: jnp.ndarray                 # [q, K, 4, 2]
    paths: jnp.ndarray
    recursion: tuple
    leaf_ids: Tuple[int, ...] = ()


def open_stream_recursive(chunk_fn: Callable[[int], jnp.ndarray],
                          com: ElasticCommitment, x, state,
                          sw_queries: int = 240):
    """Streaming recursive open at x; two passes over the chunk stream."""
    from . import recursion as rec
    from . import shockwave as sw

    params = com.params
    spec = enc.make_tensor_spec(params.B, params.rows, params.linear_time)
    lb = int(np.log2(params.B))
    x_lo, x_hi = x[:lb], x[lb:]
    beta = poly.beta_table(x_hi)

    # pass A: aggregate (O(B) resident)
    _, _aggr_step, _, _reply_kernel = _stream_kernels(params)

    aggr = jnp.zeros((params.B, 2), dtype=jnp.uint64)
    for i in range(params.K):
        aggr = _aggr_step(aggr, beta[i], chunk_fn(i))
    eval_claim = poly.evaluate_vector(aggr, x_lo)

    cf = sw.commit(aggr, rec._sw_k(params.B))
    state = mimc.absorb(state, cf.outer.root.astype(jnp.uint64).reshape(4, 2))
    state, qrows, qcols = std.derive_queries(state, params)

    # pass B: re-encode chunks, collect query replies
    leaf_ids = [((r // 4) * (2 * params.cols) + c)
                for r, c in zip(qrows, qcols)]
    lid = jnp.asarray(leaf_ids, dtype=jnp.int32)

    replies = [_reply_kernel(chunk_fn(i), lid) for i in range(params.K)]
    reply = jnp.stack(replies, axis=1)
    paths = merkle.open_leaves(com.tree, leaf_ids)

    if params.linear_time:
        rproof, state = rec.spielman_prove(aggr, cf, x_lo, qrows, qcols,
                                           params.rows, spec.col_code, state,
                                           sw_queries=sw_queries)
    else:
        rproof, state = rec.rs_prove(aggr, cf, x_lo, qrows, qcols,
                                     params.rows, state,
                                     sw_queries=sw_queries)
    return ElasticRecursiveOpening(
        eval_claim=eval_claim, cf_root=cf.outer.root, rows_idx=qrows,
        cols_idx=qcols, reply=reply, paths=paths, recursion=rproof,
        leaf_ids=tuple(leaf_ids),
    ), state


def verify_recursive(root, x, opening: ElasticRecursiveOpening,
                     params: std.TensorPCParams, state,
                     sw_queries: int = 240):
    """Succinct streaming-open verification; returns (ok, state)."""
    from . import recursion as rec

    lb = int(np.log2(params.B))
    x_lo, x_hi = x[:lb], x[lb:]
    beta = poly.beta_table(x_hi)

    state = mimc.absorb(state,
                        opening.cf_root.astype(jnp.uint64).reshape(4, 2))
    state, qrows, qcols = std.derive_queries(state, params)
    if tuple(qrows) != tuple(opening.rows_idx) or \
       tuple(qcols) != tuple(opening.cols_idx):
        return False, state

    comb = F.fsum(F.fmul(beta[None, :, None, :], opening.reply), axis=1)
    ra = jnp.asarray(qrows, dtype=jnp.int64)
    comb_vals = jnp.take_along_axis(comb, (ra % 4)[:, None, None],
                                    axis=1)[:, 0]
    prev = jnp.zeros((len(qrows), 8), dtype=jnp.uint32)
    for i in range(params.K):
        prev = blake3.hash_chained_leaf(opening.reply[:, i], prev)
    leaf_ids = [(r // 4) * (2 * params.cols) + c
                for r, c in zip(qrows, qcols)]
    if not bool(merkle.verify_leaves_batch(root, prev, leaf_ids,
                                           opening.paths)):
        return False, state

    if params.linear_time:
        spec = enc.make_tensor_spec(params.B, params.rows, params.linear_time)
        return rec.spielman_verify(
            opening.recursion, opening.cf_root, comb_vals,
            opening.eval_claim, x_lo, qrows, qcols, params.rows, params.B,
            spec.col_code, state, sw_queries=sw_queries)
    return rec.rs_verify(
        opening.recursion, opening.cf_root, comb_vals, opening.eval_claim,
        x_lo, qrows, qcols, params.rows, params.B, state,
        sw_queries=sw_queries)


# ---------------------------------------------------------------------------
# Multi-point opening: open the SAME commitment at P points sharing one set
# of column queries/replies/Merkle paths (the expensive part); only the
# per-point aggregates differ.  The aggregation pass handles all points at
# once, so the total cost is one open + (P-1) extra B-sized aggregates.
# (Reference opens per point, Elastic_PC.cpp:625-726; sharing the replies
# is sound because the queries are derived AFTER all aggregates are bound.)
# ---------------------------------------------------------------------------

class ElasticMultiOpening(NamedTuple):
    eval_claims: jnp.ndarray           # [P, 2]
    aggrs: jnp.ndarray                 # [P, B, 2] transmitted aggregates
    rows_idx: Tuple[int, ...]
    cols_idx: Tuple[int, ...]
    reply: jnp.ndarray                 # [q, K, 4, 2]
    paths: jnp.ndarray
    leaf_ids: Tuple[int, ...] = ()


def open_stream_multi(chunk_fn: Callable[[int], jnp.ndarray],
                      com: ElasticCommitment, points, state, full=None):
    """Open at every point in `points` (list of [log2 N, 2]); two passes.
    ``full``: optional resident coefficient array — both passes run as one
    compiled scan each (identical transcript)."""
    from ..utils.jitting import maybe_jit

    params = com.params
    spec = enc.make_tensor_spec(params.B, params.rows, params.linear_time)
    lb = int(np.log2(params.B))
    P = len(points)
    betas = jnp.stack([poly.beta_table(x[lb:]) for x in points])  # [P, K, 2]

    if full is not None:
        aggr_fn, reply_fn = _full_open_kernels(params)
        aggrs = aggr_fn(full, betas)
    else:
        _, _, _aggr_step, _reply_kernel = _stream_kernels(params)
        aggrs = jnp.zeros((P, params.B, 2), dtype=jnp.uint64)
        for i in range(params.K):
            aggrs = _aggr_step(aggrs, betas[:, i], chunk_fn(i))
    eval_claims = jnp.stack([poly.evaluate_vector(aggrs[p], points[p][:lb])
                             for p in range(P)])

    for p in range(P):
        aggr_tree = merkle.commit_fields(aggrs[p])
        state = mimc.absorb(state,
                            aggr_tree.root.astype(jnp.uint64).reshape(4, 2))
    state, qrows, qcols = std.derive_queries(state, params)

    leaf_ids = [((r // 4) * (2 * params.cols) + c)
                for r, c in zip(qrows, qcols)]
    lid = jnp.asarray(leaf_ids, dtype=jnp.int32)

    if full is not None:
        reply = reply_fn(full, lid)
    else:
        replies = [_reply_kernel(chunk_fn(i), lid) for i in range(params.K)]
        reply = jnp.stack(replies, axis=1)       # [q, K, 4, 2]
    paths = merkle.open_leaves(com.tree, leaf_ids)
    return ElasticMultiOpening(
        eval_claims=eval_claims, aggrs=aggrs,
        rows_idx=qrows, cols_idx=qcols, reply=reply, paths=paths,
        leaf_ids=tuple(leaf_ids),
    ), state


# ---------------------------------------------------------------------------
# Recursive multi-point opening: the P aggregates are concatenated into one
# vector V (point index in the high bits), shockwave-committed ONCE, and a
# single gamma-RLC'd recursion sumcheck covers every point; nothing B-sized
# is transmitted.  `extra_points` lets the caller bind additional
# evaluations of point pidx's aggregate at alternative low bits (the lane
# trick) through the same shared shockwave multi-open.
# ---------------------------------------------------------------------------

class ElasticMultiRecOpening(NamedTuple):
    eval_claims: jnp.ndarray           # [P, 2]
    cf_root: jnp.ndarray
    rows_idx: Tuple[int, ...]
    cols_idx: Tuple[int, ...]
    reply: jnp.ndarray                 # [q, K, 4, 2]
    paths: jnp.ndarray
    recursion: object                  # rec.MultiRecursionProof
    leaf_ids: Tuple[int, ...] = ()

    @property
    def extra_evals(self):
        """Bound evaluations at the opener's extra_points (P+1 onward of
        the shockwave multi-open claims)."""
        P = self.eval_claims.shape[0]
        return self.recursion.sw_multi.eval_claims[1 + P:]


def open_stream_multi_recursive(chunk_fn, com: ElasticCommitment, points,
                                state, full=None, extra_points=(),
                                sw_queries: int = 240,
                                v_min_len: int = 0, sw_pad: int = 0):
    """Open at every point in `points`; aggregates bound via ONE shockwave
    commitment + batched recursion instead of transmission.

    With a RESIDENT polynomial (full) in RS mode the ENTIRE opening —
    aggregation, shockwave commit, query derivation, replies, Merkle
    paths, and the whole recursion argument — runs as ONE jitted program:
    the eager orchestration otherwise costs hundreds of dispatches over
    the remote-attach tunnel (~10-50 ms each), which dominated the warm
    open phase (ROADMAP round-4: open 33 s of which <3 s kernels)."""
    from . import recursion as rec
    from . import shockwave as sw_mod
    from ..utils.jitting import maybe_jit

    params = com.params
    if full is not None and not params.linear_time:
        from ..utils.jitting import JIT_ENABLED
        if JIT_ENABLED:
            lb = int(np.log2(params.B))
            pts = jnp.stack([jnp.asarray(x, dtype=jnp.uint64)
                             for x in points])
            e_pidx = tuple(int(p) for p, _ in extra_points)
            e_los = (jnp.stack([jnp.asarray(lo, dtype=jnp.uint64)
                                for _, lo in extra_points])
                     if extra_points else jnp.zeros((0, lb, 2), jnp.uint64))
            cfg = (params.queries, params.rows, params.cols, params.B,
                   params.K, params.linear_time, sw_queries, v_min_len,
                   sw_pad, e_pidx, len(points))
            return _open_multi_rec_rs(full, pts, e_los,
                                      tuple(com.tree.levels[:-1]), state,
                                      cfg)
    spec = enc.make_tensor_spec(params.B, params.rows, params.linear_time)
    lb = int(np.log2(params.B))
    P = len(points)
    betas = jnp.stack([poly.beta_table(x[lb:]) for x in points])  # [P, K, 2]

    if full is not None:
        aggr_fn, reply_fn = _full_open_kernels(params)
        aggrs = aggr_fn(full, betas)
    else:
        _, _, _aggr_step, _reply_kernel = _stream_kernels(params)
        aggrs = jnp.zeros((P, params.B, 2), dtype=jnp.uint64)
        for i in range(params.K):
            aggrs = _aggr_step(aggrs, betas[:, i], chunk_fn(i))
    eval_claims = jnp.stack([poly.evaluate_vector(aggrs[p], points[p][:lb])
                             for p in range(P)])

    V = rec.concat_aggregates(aggrs, min_len=v_min_len)
    k = rec._sw_k_multi(V.shape[0])
    cf = sw_mod.commit(V, k)
    state = mimc.absorb(state, cf.outer.root.astype(jnp.uint64).reshape(4, 2))
    state, qrows, qcols = std.derive_queries(state, params)

    leaf_ids = [((r // 4) * (2 * params.cols) + c)
                for r, c in zip(qrows, qcols)]
    lid = jnp.asarray(leaf_ids, dtype=jnp.int32)

    if full is not None:
        reply = reply_fn(full, lid)
    else:
        replies = [_reply_kernel(chunk_fn(i), lid) for i in range(params.K)]
        reply = jnp.stack(replies, axis=1)           # [q, K, 4, 2]
    paths = merkle.open_leaves(com.tree, leaf_ids)

    x_los = [points[p][:lb] for p in range(P)]
    if params.linear_time:
        rproof, state = rec.spielman_prove_multi(
            V, cf, aggrs, x_los, extra_points, qrows, qcols, params.rows,
            spec.col_code, state, sw_queries=sw_queries, sw_pad=sw_pad)
    else:
        rproof, state = rec.rs_prove_multi(
            V, cf, params.B, x_los, extra_points, qrows, qcols, params.rows,
            state, sw_queries=sw_queries, sw_pad=sw_pad)
    return ElasticMultiRecOpening(
        eval_claims=eval_claims, cf_root=cf.outer.root, rows_idx=qrows,
        cols_idx=qcols, reply=reply, paths=paths, recursion=rproof,
        leaf_ids=tuple(leaf_ids),
    ), state


def verify_multi_recursive(root, points, opening: ElasticMultiRecOpening,
                           params: std.TensorPCParams, state,
                           extra_points=(), sw_queries: int = 240,
                           v_min_len: int = 0, sw_pad: int = 0):
    """Succinct multi-point verification; returns (ok, extra_evals, state).

    extra_evals are the recursion-bound evaluations at `extra_points`
    (cryptographically tied to the commitment via the shockwave multi-open;
    callers use them for lane evaluations).

    RS mode runs as ONE jitted program per shape: query indices stay on
    device end-to-end (everything is checked against the DERIVED queries,
    so the prover's claimed index tuples are never consulted), and the
    only host sync is the caller's final bool().  Eager replay cost ~100
    dispatches x the remote-attach round trip per opening otherwise."""
    from . import recursion as rec

    lb = int(np.log2(params.B))
    P = len(points)

    if not params.linear_time:
        pts = jnp.stack([jnp.asarray(x, dtype=jnp.uint64) for x in points])
        e_pidx = tuple(int(p) for p, _ in extra_points)
        e_los = (jnp.stack([jnp.asarray(lo, dtype=jnp.uint64)
                            for _, lo in extra_points])
                 if extra_points else jnp.zeros((0, lb, 2), jnp.uint64))
        op = opening._replace(rows_idx=(), cols_idx=(), leaf_ids=())
        cfg = (params.queries, params.rows, params.cols, params.B,
               params.K, sw_queries, v_min_len, sw_pad, e_pidx)
        return _verify_multi_rec_rs(jnp.asarray(root), pts, op, e_los,
                                    state, cfg)

    betas = jnp.stack([poly.beta_table(x[lb:]) for x in points])

    state = mimc.absorb(state,
                        opening.cf_root.astype(jnp.uint64).reshape(4, 2))
    state, qrows, qcols = std.derive_queries(state, params)
    if tuple(qrows) != tuple(opening.rows_idx) or \
       tuple(qcols) != tuple(opening.cols_idx):
        return jnp.array(False), None, state

    # shared reply combination: comb_vals[p, q] = row-slot value of the
    # beta_p-combined chunks at query q
    rc = jnp.asarray([r % 4 for r in qrows], dtype=jnp.int32)
    q_ar = jnp.arange(len(qrows))
    combP = F.fsum(F.fmul(betas[:, None, :, None, :], opening.reply[None]),
                   axis=2)                            # [P, q, 4, 2]
    comb_vals = combP[:, q_ar, rc]                    # [P, q, 2]

    # shared Merkle verification: chain replies across chunks, batch-verify
    prev = jnp.zeros((len(qrows), 8), dtype=jnp.uint32)
    for i in range(params.K):
        prev = blake3.hash_chained_leaf(opening.reply[:, i], prev)
    leaf_ids = [((r // 4) * (2 * params.cols) + c)
                for r, c in zip(qrows, qcols)]
    okm = merkle.verify_leaves_device(root, prev, leaf_ids, opening.paths)

    x_los = [points[p][:lb] for p in range(P)]
    if params.linear_time:
        spec = enc.make_tensor_spec(params.B, params.rows, params.linear_time)
        okr, extra_evals, state = rec.spielman_verify_multi(
            opening.recursion, opening.cf_root, comb_vals,
            opening.eval_claims, x_los, extra_points, qrows, qcols,
            params.rows, params.B, spec.col_code, state,
            sw_queries=sw_queries, v_min_len=v_min_len, sw_pad=sw_pad)
    else:
        okr, extra_evals, state = rec.rs_verify_multi(
            opening.recursion, opening.cf_root, comb_vals,
            opening.eval_claims, x_los, extra_points, qrows, qcols,
            params.rows, params.B, state, sw_queries=sw_queries,
            v_min_len=v_min_len, sw_pad=sw_pad)
    return jnp.logical_and(okm, okr), extra_evals, state


@functools.lru_cache(maxsize=64)
def _open_multi_rec_rs_fn(cfg):
    """Per-shape jitted whole-opening prover (RS mode, resident poly)."""
    from ..utils.jitting import maybe_jit
    from . import recursion as rec
    from . import shockwave as sw_mod

    (queries, rows, cols_t, B, K, linear_time, sw_queries, v_min_len,
     sw_pad, e_pidx, P) = cfg
    lb = int(np.log2(B))
    spec = enc.make_tensor_spec(B, rows, linear_time)

    @maybe_jit
    def run(full, pts, e_los, tree_levels, state):
        from ..parallel import mesh as meshmod

        betas = jnp.stack([poly.beta_table(pts[p, lb:])
                           for p in range(P)])       # [P, K, 2]
        chunks = full.reshape(K, B, 2)

        def abody(acc, xs):
            b, chunk = xs
            return F.fadd(acc, F.fmul(b[:, None, :], chunk[None])), None

        aggrs, _ = jax.lax.scan(
            abody, jnp.zeros((P, B, 2), dtype=jnp.uint64),
            (jnp.moveaxis(betas, 0, 1), chunks))
        eval_claims = jnp.stack(
            [poly.evaluate_vector(aggrs[p], pts[p, :lb])
             for p in range(P)])

        V = rec.concat_aggregates(aggrs, min_len=v_min_len)
        k = rec._sw_k_multi(V.shape[0])
        cf = sw_mod.commit(V, k)
        state = mimc.absorb(state,
                            cf.outer.root.astype(jnp.uint64).reshape(4, 2))
        state, qs = mimc.expand(state, queries)
        qrows = (qs[:, 0] % (2 * rows)).astype(jnp.int32)
        qcols = (qs[:, 1] % (2 * cols_t)).astype(jnp.int32)
        lid = (qrows // 4) * (2 * cols_t) + qcols

        def rbody(_, chunk):
            codeword = enc.tensor_encode(spec, meshmod.shard_leading(chunk))
            return None, std._leaf_groups(codeword)[lid]

        _, rep = jax.lax.scan(rbody, None, chunks)   # [K, q, 4, 2]
        reply = jnp.moveaxis(rep, 0, 1)
        paths = merkle._open_leaves_kernel(tree_levels,
                                           lid.astype(jnp.int64))

        x_los = [pts[p, :lb] for p in range(P)]
        extra = tuple((e_pidx[j], e_los[j]) for j in range(len(e_pidx)))
        rproof, state = rec.rs_prove_multi(
            V, cf, B, x_los, extra, qrows, qcols, rows, state,
            sw_queries=sw_queries, sw_pad=sw_pad)
        return ElasticMultiRecOpening(
            eval_claims=eval_claims, cf_root=cf.outer.root, rows_idx=qrows,
            cols_idx=qcols, reply=reply, paths=paths, recursion=rproof,
            leaf_ids=lid,
        ), state

    return run


def _open_multi_rec_rs(full, pts, e_los, tree_levels, state, cfg):
    return _open_multi_rec_rs_fn(cfg)(full, pts, e_los, tree_levels, state)


@functools.lru_cache(maxsize=64)
def _verify_multi_rec_rs_fn(cfg):
    """Per-shape jitted whole-opening verifier (RS mode)."""
    from ..utils.jitting import maybe_jit
    from . import recursion as rec

    (queries, rows, cols_t, B, K, sw_queries, v_min_len, sw_pad,
     e_pidx) = cfg
    lb = int(np.log2(B))

    @maybe_jit
    def run(root, pts, op, e_los, state):
        P = pts.shape[0]
        state = mimc.absorb(state,
                            op.cf_root.astype(jnp.uint64).reshape(4, 2))
        state, qs = mimc.expand(state, queries)
        qrows = (qs[:, 0] % (2 * rows)).astype(jnp.int32)
        qcols = (qs[:, 1] % (2 * cols_t)).astype(jnp.int32)

        betas = jnp.stack([poly.beta_table(pts[p, lb:])
                           for p in range(P)])
        rc = (qrows % 4)
        q_ar = jnp.arange(queries)
        combP = F.fsum(F.fmul(betas[:, None, :, None, :], op.reply[None]),
                       axis=2)                        # [P, q, 4, 2]
        comb_vals = combP[:, q_ar, rc]                # [P, q, 2]

        prev = jnp.zeros((queries, 8), dtype=jnp.uint32)
        for i in range(K):
            prev = blake3.hash_chained_leaf(op.reply[:, i], prev)
        leaf_ids = (qrows // 4) * (2 * cols_t) + qcols
        okm = merkle.verify_leaves_device(root, prev, leaf_ids, op.paths)

        x_los = [pts[p, :lb] for p in range(P)]
        extra = tuple((e_pidx[j], e_los[j]) for j in range(len(e_pidx)))
        okr, extra_evals, state = rec.rs_verify_multi(
            op.recursion, op.cf_root, comb_vals, op.eval_claims, x_los,
            extra, qrows, qcols, rows, B, state, sw_queries=sw_queries,
            v_min_len=v_min_len, sw_pad=sw_pad)
        return jnp.logical_and(okm, okr), extra_evals, state

    return run


def _verify_multi_rec_rs(root, pts, op, e_los, state, cfg):
    return _verify_multi_rec_rs_fn(cfg)(root, pts, op, e_los, state)


# ---------------------------------------------------------------------------
# GROUP opening: the multi-point opens of SEVERAL Elastic commitments share
# ONE shockwave commitment + merge sumcheck + inner WHIR (pc.recursion
# group functions).  Per-entry data (replies, paths) stays per-commitment;
# the ~200-400 KB recursion instance is paid once per proof instead of
# once per commitment.
# ---------------------------------------------------------------------------


class GroupItem(NamedTuple):
    """One commitment's share of a group opening.  The verifier builds
    items from PUBLIC data only (params + points + extras); the prover
    additionally supplies the Merkle tree and a data source."""
    params: object                     # std.TensorPCParams
    points: tuple                      # full opening points
    chunk_fn: object = None            # streaming source (restartable)
    full: object = None                # resident [N, 2] (fast path)
    extra_points: tuple = ()           # (point_idx, lo_bits) lane extras
    tree: object = None                # commitment Merkle tree (prover)


class ElasticGroupOpening(NamedTuple):
    eval_claims: tuple                 # per entry [P_e, 2]
    cf_root: jnp.ndarray
    replies: tuple                     # per entry [q, K_e, 4, 2]
    paths: tuple                       # per entry [q, depth_e, 8]
    leaf_ids: tuple                    # per entry [q] (accounting only)
    recursion: object                  # rec.GroupRecursionProof


def _group_entries(items, sw_queries):
    from . import recursion as rec

    qs = {it.params.queries for it in items}
    assert len(qs) == 1, "group entries must share the query schedule"
    entries = tuple(
        rec.GroupEntry(length=it.params.N,
                       K=it.params.K, B=it.params.B,
                       rows=it.params.rows, cols=it.params.cols,
                       queries=it.params.queries,
                       n_points=len(it.points),
                       n_extras=len(it.extra_points))
        for it in items)
    return entries


def open_group_recursive(items, state, sw_queries: int = 240):
    """Open every item's commitment at its points; ONE shared recursion.

    Returns (ElasticGroupOpening, state).  Streaming items make two
    passes over their chunk streams (aggregate, then query replies) with
    O(B) resident; resident items run their passes as compiled scans.
    Transcript: absorb shared shockwave root -> ONE query expansion
    (each entry reduces the raw draws mod its own domains) -> merge
    sumcheck + shared shockwave multi-open."""
    import os
    import sys
    import time as _t

    from . import recursion as rec
    from . import shockwave as sw_mod

    trace = os.environ.get("HOBBIT_TRACE") == "1"

    def _tick(name, t0, val=None):
        if trace:
            import jax as _jax
            if val is not None:
                _jax.block_until_ready(val)
            print(f"[group] {name}: {_t.perf_counter() - t0:.2f}s",
                  file=sys.stderr, flush=True)
        return _t.perf_counter()

    t0 = _t.perf_counter()
    entries = _group_entries(items, sw_queries)
    B_slot, segs, n_seg, P2 = rec.group_layout(entries)
    queries = entries[0].queries

    # ---- pass A: per-entry aggregates -----------------------------------
    aggrs_pe = []
    evals_pe = []
    x_los_pe = []
    extras_pe = []
    for it, e in zip(items, entries):
        params = it.params
        lb = int(np.log2(params.B))
        betas = jnp.stack([poly.beta_table(jnp.asarray(x)[lb:])
                           for x in it.points])
        if it.full is not None:
            aggr_fn, _ = _full_open_kernels(params)
            aggrs = aggr_fn(it.full, betas)
        else:
            _, _, _aggr_step, _ = _stream_kernels(params)
            aggrs = jnp.zeros((len(it.points), params.B, 2),
                              dtype=jnp.uint64)
            for i in range(params.K):
                aggrs = _aggr_step(aggrs, betas[:, i], it.chunk_fn(i))
        aggrs_pe.append(aggrs)
        evals_pe.append(jnp.stack(
            [poly.evaluate_vector(aggrs[p], jnp.asarray(it.points[p])[:lb])
             for p in range(len(it.points))]))
        x_los_pe.append([jnp.asarray(x, dtype=jnp.uint64)[:lb]
                         for x in it.points])
        extras_pe.append(tuple(
            (int(pidx), jnp.asarray(lo, dtype=jnp.uint64))
            for pidx, lo in it.extra_points))

    t0 = _tick("passA", t0, aggrs_pe[-1])
    V = rec.group_concat(entries, aggrs_pe, segs, P2, B_slot)
    k = rec._sw_k_group(P2 * B_slot)
    cf = sw_mod.commit(V, k)
    t0 = _tick("sw_commit", t0, cf.outer.root)
    state = mimc.absorb(state, cf.outer.root.astype(jnp.uint64).reshape(4, 2))
    state, qs = mimc.expand(state, queries)
    qrows_raw = qs[:, 0]
    qcols_raw = qs[:, 1]

    # ---- pass B: per-entry replies + paths ------------------------------
    replies = []
    paths = []
    leaf_ids_pe = []
    for it, e in zip(items, entries):
        params = it.params
        qrows = (qrows_raw % (2 * params.rows)).astype(jnp.int64)
        qcols = (qcols_raw % (2 * params.cols)).astype(jnp.int64)
        lid = (qrows // 4) * (2 * params.cols) + qcols
        if it.full is not None:
            _, reply_fn = _full_open_kernels(params)
            reply = reply_fn(it.full, lid.astype(jnp.int32))
        else:
            _, _, _, _reply_kernel = _stream_kernels(params)
            reps = [_reply_kernel(it.chunk_fn(i), lid.astype(jnp.int32))
                    for i in range(params.K)]
            reply = jnp.stack(reps, axis=1)
        replies.append(reply)
        paths.append(merkle.open_leaves(it.tree, lid))
        leaf_ids_pe.append(lid)
    t0 = _tick("replies+paths", t0, replies[-1])

    rproof, state = rec.rs_prove_group(
        V, cf, entries, segs, P2, B_slot, x_los_pe, extras_pe,
        qrows_raw, qcols_raw, state, sw_queries=sw_queries)
    t0 = _tick("merge+sw_open", t0, state)
    return ElasticGroupOpening(
        eval_claims=tuple(evals_pe), cf_root=cf.outer.root,
        replies=tuple(replies), paths=tuple(paths),
        leaf_ids=tuple(leaf_ids_pe), recursion=rproof,
    ), state


def verify_group_recursive(roots, items, opening: ElasticGroupOpening,
                           state, sw_queries: int = 240):
    """items: GroupItem stubs carrying (com-params via .com, points,
    extra_points) — chunk_fn/full unused.  roots: per-entry commitment
    roots.  Returns (ok, extra_evals_per_entry, state)."""
    from . import recursion as rec

    entries = _group_entries(items, sw_queries)
    B_slot, segs, n_seg, P2 = rec.group_layout(entries)
    queries = entries[0].queries

    state = mimc.absorb(state,
                        opening.cf_root.astype(jnp.uint64).reshape(4, 2))
    state, qs = mimc.expand(state, queries)
    qrows_raw = qs[:, 0]
    qcols_raw = qs[:, 1]

    ok = jnp.array(True)
    comb_pe = []
    x_los_pe = []
    extras_pe = []
    for ei, (it, e) in enumerate(zip(items, entries)):
        params = it.params
        lb = int(np.log2(params.B))
        qrows = (qrows_raw % (2 * params.rows)).astype(jnp.int64)
        qcols = (qcols_raw % (2 * params.cols)).astype(jnp.int64)
        betas = jnp.stack([poly.beta_table(jnp.asarray(x)[lb:])
                           for x in it.points])
        reply = opening.replies[ei]
        rc = (qrows % 4).astype(jnp.int32)
        q_ar = jnp.arange(queries)
        combP = F.fsum(F.fmul(betas[:, None, :, None, :], reply[None]),
                       axis=2)
        comb_pe.append(combP[:, q_ar, rc])
        prev = jnp.zeros((queries, 8), dtype=jnp.uint32)
        for i in range(params.K):
            prev = blake3.hash_chained_leaf(reply[:, i], prev)
        lid = (qrows // 4) * (2 * params.cols) + qcols
        okm = merkle.verify_leaves_device(jnp.asarray(roots[ei]), prev,
                                          lid, opening.paths[ei])
        ok = jnp.logical_and(ok, okm)
        x_los_pe.append([jnp.asarray(x, dtype=jnp.uint64)[:lb]
                         for x in it.points])
        extras_pe.append(tuple(
            (int(pidx), jnp.asarray(lo, dtype=jnp.uint64))
            for pidx, lo in it.extra_points))

    okr, extra_evals, state = rec.rs_verify_group(
        opening.recursion, opening.cf_root, comb_pe,
        opening.eval_claims, entries, segs, P2, B_slot, x_los_pe,
        extras_pe, qrows_raw, qcols_raw, state, sw_queries=sw_queries)
    return jnp.logical_and(ok, okr), extra_evals, state


def lane_eval(opening, pidx: int, lo_bits):
    """Evaluate the transmitted aggregate of point `pidx` at alternative
    low bits (the lane trick: one opening binds every point sharing x_hi)."""
    aggrs = opening.aggrs if hasattr(opening, "aggrs") else None
    aggr = aggrs[pidx] if aggrs is not None else opening.aggr
    return poly.evaluate_vector(aggr, lo_bits)


def verify_multi(root, points, opening: ElasticMultiOpening,
                 params: std.TensorPCParams, state):
    """Returns (ok, state).  Naive-recursion mode (aggregates transmitted,
    verifier re-encodes them); the query replies and Merkle work are shared
    across points."""
    from ..utils.jitting import maybe_jit

    lb = int(np.log2(params.B))
    P = len(points)
    for p in range(P):
        aggr_tree = merkle.commit_fields(opening.aggrs[p])
        state = mimc.absorb(state,
                            aggr_tree.root.astype(jnp.uint64).reshape(4, 2))
    state, qrows, qcols = std.derive_queries(state, params)
    if tuple(qrows) != tuple(opening.rows_idx) or \
       tuple(qcols) != tuple(opening.cols_idx):
        return False, state

    spec = enc.make_tensor_spec(params.B, params.rows, params.linear_time)
    rc = jnp.asarray([r % 4 for r in qrows], dtype=jnp.int32)
    q_ar = jnp.arange(len(qrows))
    enc_aggr = enc.tensor_encode(spec, opening.aggrs)       # [P, 2r, 2c, 2]
    ok = True
    for p in range(P):
        if not bool(F.feq(poly.evaluate_vector(opening.aggrs[p],
                                               points[p][:lb]),
                          opening.eval_claims[p])):
            return False, state
        beta = poly.beta_table(points[p][lb:])
        comb = F.fsum(F.fmul(beta[None, :, None, :], opening.reply), axis=1)
        comb_sel = comb[q_ar, rc]                           # [q, 2]
        want = enc_aggr[p][jnp.asarray(qrows), jnp.asarray(qcols)]
        if not bool(jnp.all(F.feq(comb_sel, want))):
            return False, state

    # shared Merkle verification: chain replies across chunks, batch-verify
    prev = jnp.zeros((len(qrows), 8), dtype=jnp.uint32)
    for i in range(params.K):
        prev = blake3.hash_chained_leaf(opening.reply[:, i], prev)
    leaf_ids = [((r // 4) * (2 * params.cols) + c)
                for r, c in zip(qrows, qcols)]
    okm = merkle.verify_leaves_batch(root, prev, leaf_ids, opening.paths)
    return ok and bool(okm), state


__all__ = ["ElasticCommitment", "ElasticOpening", "ElasticRecursiveOpening",
           "ElasticMultiOpening", "ElasticMultiRecOpening", "commit_stream",
           "open_stream", "open_stream_recursive", "open_stream_multi",
           "open_stream_multi_recursive", "lane_eval", "verify",
           "verify_recursive", "verify_multi", "verify_multi_recursive"]
