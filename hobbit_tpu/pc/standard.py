"""In-memory tensor-code polynomial commitment ("Our_PC standard").

The polynomial (multilinear, N = K * B coefficients) is split into K chunks
of B values; every chunk is tensor-encoded to a [2r, 2c] codeword
(r = tensor rows, c = B / r); one Merkle tree commits to all chunks, with
each leaf covering a 4-row group of one column and *chained across chunks*
Merkle-Damgard style (reference ``commit_standard``, Our_PC.cpp:146-171).

Opening at x (convention: chunk index = high bits of the coefficient index):
aggregate chunks with eq(x_hi) weights into one B-sized vector whose MLE at
x_lo is f(x); prove consistency of the aggregate with the committed chunks
at `queries` random tensor positions using code linearity
(``open_standard``, Our_PC.cpp:604-692).  This module implements the
*naive* verifier (re-encodes the aggregate; the reply vector is transmitted
in full); ``pc.recursion`` upgrades the same transcript with
shockwave/sumcheck recursion to shrink proofs.

Everything heavy — batched tensor encodes, leaf hashing, the aggregation —
is a fused batched tensor op on device.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import numpy as np

import jax.numpy as jnp

from ..ops import blake3
from ..ops import encode as enc
from ..ops import field as F
from ..ops import merkle, mimc, poly


class TensorPCParams(NamedTuple):
    N: int
    K: int                  # number of chunks
    rows: int               # tensor_row_size
    linear_time: bool
    queries: int

    @property
    def B(self) -> int:
        return self.N // self.K

    @property
    def cols(self) -> int:
        return self.B // self.rows


def make_params(N: int, K: int, rows: int, linear_time: bool = False,
                queries: Optional[int] = None) -> TensorPCParams:
    if queries is None:
        queries = 5900 if linear_time else 790   # Our_PC.cpp:609-612
    assert N % K == 0 and (N // K) % rows == 0
    return TensorPCParams(N=N, K=K, rows=rows, linear_time=linear_time,
                          queries=queries)


class TensorCommitment(NamedTuple):
    tensors: jnp.ndarray        # [K, 2r, 2c, 2]
    tree: merkle.MerkleTree

    @property
    def root(self):
        return self.tree.root


class TensorOpening(NamedTuple):
    eval_claim: jnp.ndarray     # [2] f(x)
    aggr: jnp.ndarray           # [B, 2] beta-weighted chunk combination
    rows_idx: Tuple[int, ...]   # query rows (in [0, 2r))
    cols_idx: Tuple[int, ...]   # query cols (in [0, 2c))
    reply: jnp.ndarray          # [q, K, 4, 2] 4-row groups per chunk
    paths: jnp.ndarray          # [q, depth, 8] Merkle paths
    leaf_ids: Tuple[int, ...] = ()   # Merkle leaf indices (Ps dedup)


def _leaf_groups(tensor_k):
    """[2r, 2c, 2] -> [r*c/?, ...]: leaf (g, col) -> 4 values rows 4g..4g+3.

    Returns [num_leaves, 4, 2] ordered leaf-major: l = g * (2c) + col.
    """
    two_r, two_c = tensor_k.shape[0], tensor_k.shape[1]
    g = tensor_k.reshape(two_r // 4, 4, two_c, 2)
    return jnp.moveaxis(g, 1, 2).reshape((two_r // 4) * two_c, 4, 2)


def _spec(params: TensorPCParams) -> enc.TensorCodeSpec:
    return enc.make_tensor_spec(params.B, params.rows, params.linear_time)


def commit(message, params: TensorPCParams) -> TensorCommitment:
    """message: [N, 2] multilinear coefficients -> commitment."""
    from ..utils.jitting import maybe_jit

    spec = _spec(params)
    chunks = message.reshape(params.K, params.B, 2)
    num_leaves = (2 * params.rows // 4) * (2 * params.cols)

    @maybe_jit
    def _encode_and_chain(chunks):
        tensors = enc.tensor_encode(spec, chunks)    # [K, 2r, 2c, 2]
        prev = jnp.zeros((num_leaves, 8), dtype=jnp.uint32)
        for i in range(params.K):
            prev = blake3.hash_chained_leaf(_leaf_groups(tensors[i]), prev)
        return tensors, prev

    tensors, prev = _encode_and_chain(chunks)
    if num_leaves & (num_leaves - 1):
        pad = (1 << int(np.ceil(np.log2(num_leaves)))) - num_leaves
        prev = jnp.concatenate(
            [prev, jnp.zeros((pad, 8), dtype=prev.dtype)], axis=0)
    tree = merkle.build_from_digests(prev)
    return TensorCommitment(tensors=tensors, tree=tree)


def _split_point(x, params: TensorPCParams):
    lb = int(np.log2(params.B))
    return x[:lb], x[lb:]


def derive_queries(state, params: TensorPCParams):
    """Fiat-Shamir query positions; returns (state, rows, cols)."""
    state, qs = mimc.expand(state, params.queries)
    qn = np.asarray(qs)
    rows = tuple(int(v) % (2 * params.rows) for v in qn[:, 0])
    cols = tuple(int(v) % (2 * params.cols) for v in qn[:, 1])
    return state, rows, cols


def open(message, commitment: TensorCommitment, x, params: TensorPCParams,
         state):
    """Produce an evaluation opening of f at point x ([log2 N, 2])."""
    x_lo, x_hi = _split_point(x, params)
    beta = poly.beta_table(x_hi)                      # [K, 2]
    chunks = message.reshape(params.K, params.B, 2)
    aggr = F.fsum(F.fmul(beta[:, None, :], chunks), axis=0)   # [B, 2]
    eval_claim = poly.evaluate_vector(aggr, x_lo)

    # bind the aggregate before deriving queries
    aggr_tree = merkle.commit_fields(aggr)
    state = mimc.absorb(state, aggr_tree.root.astype(jnp.uint64).reshape(4, 2))
    state, qrows, qcols = derive_queries(state, params)

    groups = jnp.stack([_leaf_groups(commitment.tensors[i])
                        for i in range(params.K)])   # [K, L, 4, 2]
    leaf_ids = [((r // 4) * (2 * params.cols) + c)
                for r, c in zip(qrows, qcols)]
    reply = groups[:, jnp.asarray(leaf_ids, dtype=jnp.int32)]  # [K, q, 4, 2]
    reply = jnp.moveaxis(reply, 0, 1)                          # [q, K, 4, 2]
    paths = merkle.open_leaves(commitment.tree, leaf_ids)

    return TensorOpening(
        eval_claim=eval_claim, aggr=aggr, rows_idx=qrows, cols_idx=qcols,
        reply=reply, paths=paths, leaf_ids=tuple(leaf_ids),
    ), state


def proof_size_kb(opening: TensorOpening, params: TensorPCParams) -> float:
    """Transmitted bytes (field elements 16B, digests 32B, dedup'd paths)."""
    n_field = (opening.aggr.shape[0]
               + opening.reply.shape[0] * opening.reply.shape[1] * 4 + 1)
    leaf_ids = [(r // 4) * (2 * params.cols) + c
                for r, c in zip(opening.rows_idx, opening.cols_idx)]
    num_leaves = 1 << int(np.ceil(np.log2((2 * params.rows // 4)
                                          * (2 * params.cols))))
    n_digest = merkle.dedup_path_size(leaf_ids, num_leaves)
    return (n_field * 16 + n_digest * 32) / 1024.0


def verify(root, x, opening: TensorOpening, params: TensorPCParams, state):
    """Naive verification: re-encode the aggregate, check queries + paths.

    Returns (ok: bool, state).
    """
    x_lo, x_hi = _split_point(x, params)
    beta = poly.beta_table(x_hi)

    aggr_tree = merkle.commit_fields(opening.aggr)
    state = mimc.absorb(state, aggr_tree.root.astype(jnp.uint64).reshape(4, 2))
    state, qrows, qcols = derive_queries(state, params)
    if tuple(qrows) != tuple(opening.rows_idx) or \
       tuple(qcols) != tuple(opening.cols_idx):
        return False, state

    # 1. evaluation claim
    if not bool(F.feq(poly.evaluate_vector(opening.aggr, x_lo),
                      opening.eval_claim)):
        return False, state

    # 2. re-encode the aggregate (the "naive" verifier cost)
    spec = _spec(params)
    enc_aggr = enc.tensor_encode(spec, opening.aggr)   # [2r, 2c, 2]

    # 3. per-query consistency + Merkle membership
    comb = F.fsum(F.fmul(beta[None, :, None, :], opening.reply), axis=1)
    # comb: [q, 4, 2] beta-combined 4-row groups
    for qi, (r, c) in enumerate(zip(qrows, qcols)):
        want = enc_aggr[r, c]
        got = comb[qi, r % 4]
        if not bool(F.feq(got, want)):
            return False, state
        # recompute chained leaf from reply
        prev = jnp.zeros((8,), dtype=jnp.uint32)
        for i in range(params.K):
            prev = blake3.hash_chained_leaf(
                opening.reply[qi, i][None], prev[None])[0]
        leaf_id = (r // 4) * (2 * params.cols) + c
        if not merkle.verify_leaf(root, prev, leaf_id, opening.paths[qi]):
            return False, state
    return True, state


# ---------------------------------------------------------------------------
# Recursive opening (shockwave/sumcheck recursion instead of transmitting
# the aggregate; reference PC_utils.cpp:168-512 drivers)
# ---------------------------------------------------------------------------

class RecursiveOpening(NamedTuple):
    eval_claim: jnp.ndarray
    cf_root: jnp.ndarray        # shockwave outer root of the aggregate
    rows_idx: Tuple[int, ...]
    cols_idx: Tuple[int, ...]
    reply: jnp.ndarray          # [q, K, 4, 2]
    paths: jnp.ndarray
    recursion: tuple            # RSRecursionProof | SpielmanRecursionProof
    leaf_ids: Tuple[int, ...] = ()


def open_recursive(message, commitment: TensorCommitment, x,
                   params: TensorPCParams, state, sw_queries: int = 240):
    """Open with the tensor-code recursion (RS or Spielman by params)."""
    from . import recursion as rec
    from . import shockwave as sw

    x_lo, x_hi = _split_point(x, params)
    beta = poly.beta_table(x_hi)
    chunks = message.reshape(params.K, params.B, 2)
    aggr = F.fsum(F.fmul(beta[:, None, :], chunks), axis=0)
    eval_claim = poly.evaluate_vector(aggr, x_lo)

    cf = sw.commit(aggr, rec._sw_k(params.B))
    state = mimc.absorb(state, cf.outer.root.astype(jnp.uint64).reshape(4, 2))
    state, qrows, qcols = derive_queries(state, params)

    groups = jnp.stack([_leaf_groups(commitment.tensors[i])
                        for i in range(params.K)])
    leaf_ids = [((r // 4) * (2 * params.cols) + c)
                for r, c in zip(qrows, qcols)]
    reply = groups[:, jnp.asarray(leaf_ids, dtype=jnp.int32)]
    reply = jnp.moveaxis(reply, 0, 1)
    paths = merkle.open_leaves(commitment.tree, leaf_ids)

    if params.linear_time:
        spec = _spec(params)
        rproof, state = rec.spielman_prove(aggr, cf, x_lo, qrows, qcols,
                                           params.rows, spec.col_code, state,
                                           sw_queries=sw_queries)
    else:
        rproof, state = rec.rs_prove(aggr, cf, x_lo, qrows, qcols,
                                     params.rows, state,
                                     sw_queries=sw_queries)
    return RecursiveOpening(
        eval_claim=eval_claim, cf_root=cf.outer.root, rows_idx=qrows,
        cols_idx=qcols, reply=reply, paths=paths, recursion=rproof,
        leaf_ids=tuple(leaf_ids),
    ), state


def verify_recursive(root, x, opening: RecursiveOpening,
                     params: TensorPCParams, state, sw_queries: int = 240):
    """Succinct verification: Merkle-checked replies + recursion sub-proofs
    (no aggregate re-encoding).  Returns (ok, state)."""
    from . import recursion as rec

    x_lo, x_hi = _split_point(x, params)
    beta = poly.beta_table(x_hi)

    state = mimc.absorb(state,
                        opening.cf_root.astype(jnp.uint64).reshape(4, 2))
    state, qrows, qcols = derive_queries(state, params)
    if tuple(qrows) != tuple(opening.rows_idx) or \
       tuple(qcols) != tuple(opening.cols_idx):
        return False, state

    comb = F.fsum(F.fmul(beta[None, :, None, :], opening.reply), axis=1)
    comb_vals = []
    for qi, (r, c) in enumerate(zip(qrows, qcols)):
        comb_vals.append(comb[qi, r % 4])
        prev = jnp.zeros((8,), dtype=jnp.uint32)
        for i in range(params.K):
            prev = blake3.hash_chained_leaf(
                opening.reply[qi, i][None], prev[None])[0]
        leaf_id = (r // 4) * (2 * params.cols) + c
        if not merkle.verify_leaf(root, prev, leaf_id, opening.paths[qi]):
            return False, state
    comb_vals = jnp.stack(comb_vals)

    if params.linear_time:
        spec = _spec(params)
        return rec.spielman_verify(
            opening.recursion, opening.cf_root, comb_vals,
            opening.eval_claim, x_lo, qrows, qcols, params.rows, params.B,
            spec.col_code, state, sw_queries=sw_queries)
    return rec.rs_verify(
        opening.recursion, opening.cf_root, comb_vals, opening.eval_claim,
        x_lo, qrows, qcols, params.rows, params.B, state,
        sw_queries=sw_queries)


__all__ = [
    "TensorPCParams", "TensorCommitment", "TensorOpening",
    "RecursiveOpening", "make_params", "commit", "open", "verify",
    "open_recursive", "verify_recursive", "proof_size_kb",
    "derive_queries",
]
