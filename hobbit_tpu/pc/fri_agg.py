"""Aggregated 16-way FRI polynomial commitment.

TPU-native analog of the reference's aggregated-FRI path
(``Virgo.cpp:373-433`` ``aggregate`` + ``whir_prove(PC_data...)``): the
coefficient vector is split into 16 slices by its top-4 variables, each
slice's RS codeword is committed under ONE Merkle tree (a position's 16
values chain into a single leaf), and an opening at x

  1. beta-aggregates the slices with eq(x_top4) weights (RS encoding is
     linear, so the aggregated codeword is the beta-combination of the
     slice codewords);
  2. commits the aggregate through the WHIR commitment and spot-checks
     ``cons_queries`` (240, Virgo.cpp:398) random positions: the
     transmitted 16-value columns (authenticated against the slice tree)
     must beta-combine to the aggregate codeword's values (authenticated
     against the WHIR tree) — binding the fresh commitment to the
     original one;
  3. runs the WHIR argument on the aggregate for the evaluation claim
     f~(x) = aggr~(x_low).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import numpy as np

import jax.numpy as jnp

from ..ops import blake3
from ..ops import field as F
from ..ops import fft as fftm
from ..ops import merkle, mimc, poly
from . import whir

K_AGG = 4                      # variables aggregated (16 slices)
CONS_QUERIES = 240             # Virgo.cpp:398


class AggFriCommitment(NamedTuple):
    codewords: jnp.ndarray     # [16, m, 2] slice RS codewords (natural order)
    tree: merkle.MerkleTree    # one leaf per position (16 values chained)
    n: int                     # total coefficient count

    @property
    def root(self):
        return self.tree.root


class AggFriProof(NamedTuple):
    whir_root: jnp.ndarray
    cons_idx: Tuple[int, ...]
    columns: jnp.ndarray       # [q, 16, 2] slice values at queried positions
    col_paths: jnp.ndarray     # [q, depth, 8]
    aggr_leaves: jnp.ndarray   # [q, 4, 2] whir leaves holding the aggregate
    aggr_paths: jnp.ndarray
    whir_proof: object


def _position_leaves(values16):
    """[m, 16, 2] -> [m] leaf digests: 4 chained groups of 4 values
    (the streaming-PC Merkle-Damgard leaf rule)."""
    m = values16.shape[0]
    prev = jnp.zeros((m, 8), dtype=jnp.uint32)
    for g in range(4):
        prev = blake3.hash_chained_leaf(values16[:, 4 * g: 4 * g + 4], prev)
    return prev


def commit(values) -> AggFriCommitment:
    """values: [n, 2] multilinear evaluations; n >= 2^5."""
    n = values.shape[0]
    assert n % (1 << K_AGG) == 0
    sl = n >> K_AGG
    # slice j = the RESTRICTION of f to top-4 evaluation bits == j, so the
    # eq(x_hi)-weighted combination of slice codewords equals the codeword
    # of the partial evaluation (RS + coefficient transform are linear)
    slices = values.reshape(1 << K_AGG, sl, 2)
    coeffs = jnp.stack([poly.to_coefficient_form(slices[j])
                        for j in range(1 << K_AGG)])
    padded = jnp.concatenate(
        [coeffs, jnp.zeros_like(coeffs)], axis=1)          # [16, 2sl, 2]
    cws = jnp.stack([fftm.fft(padded[j]) for j in range(1 << K_AGG)])
    leaves = _position_leaves(jnp.moveaxis(cws, 0, 1))     # [2sl]
    tree = merkle.build_from_digests(leaves)
    return AggFriCommitment(codewords=cws, tree=tree, n=n)


def prove(com: AggFriCommitment, values, x, state,
          cons_queries: int = CONS_QUERIES,
          whir_queries: int = whir.QUERIES_PER_LEVEL):
    """Open f~(x); returns (proof, y, state)."""
    n = com.n
    sl = n >> K_AGG
    lsl = int(np.log2(sl))
    x_lo, x_hi = x[:lsl], x[lsl:]
    beta16 = poly.beta_table(x_hi)                         # [16, 2]
    vals16 = values.reshape(1 << K_AGG, sl, 2)
    aggr = F.fsum(F.fmul(beta16[:, None, :], vals16), axis=0)   # [sl, 2]
    y = F.fdot(aggr, poly.beta_table(x_lo))

    wc = whir.commit(aggr)
    state = mimc.absorb(state, wc.root.astype(jnp.uint64).reshape(4, 2))
    state, qs = mimc.expand(state, cons_queries)
    m = 2 * sl
    idx = tuple(int(v) % m for v in np.asarray(qs)[:, 0])

    cols = jnp.moveaxis(com.codewords, 0, 1)[jnp.asarray(idx)]  # [q, 16, 2]
    col_paths = merkle.open_leaves(com.tree, list(idx))
    # whir leaves holding the aggregate codeword at the queried positions
    ii = np.asarray([whir._inter_index(p, m) for p in idx])
    row_idx = jnp.asarray((ii // 4)[:, None] * 4 + np.arange(4)[None, :])
    aggr_leaves = wc.codeword[row_idx]                     # [q, 4, 2]
    aggr_paths = merkle.open_leaves(wc.tree, (ii // 4).tolist())

    wp, y2, state = whir.prove(wc, aggr, x_lo, state, queries=whir_queries)
    return AggFriProof(
        whir_root=wc.root, cons_idx=idx, columns=cols,
        col_paths=col_paths, aggr_leaves=aggr_leaves,
        aggr_paths=aggr_paths, whir_proof=wp,
    ), y, state


def verify(root, proof: AggFriProof, x, y, n: int, state,
           cons_queries: int = CONS_QUERIES,
           whir_queries: int = whir.QUERIES_PER_LEVEL):
    """Returns (ok, state)."""
    sl = n >> K_AGG
    lsl = int(np.log2(sl))
    x_lo, x_hi = x[:lsl], x[lsl:]
    beta16 = poly.beta_table(x_hi)
    ok = True

    state = mimc.absorb(state,
                        proof.whir_root.astype(jnp.uint64).reshape(4, 2))
    state, qs = mimc.expand(state, cons_queries)
    m = 2 * sl
    idx = tuple(int(v) % m for v in np.asarray(qs)[:, 0])
    ok = ok and idx == tuple(proof.cons_idx)
    q = len(idx)

    # membership of the 16-value columns in the slice tree
    col_digests = _position_leaves(proof.columns)
    ok = ok and bool(merkle.verify_leaves_batch(
        root, col_digests, list(idx), proof.col_paths))
    # membership of the aggregate leaves in the whir tree
    aggr_digests = blake3.hash_field_leaves(proof.aggr_leaves)
    ii = np.asarray([whir._inter_index(p, m) for p in idx])
    ok = ok and bool(merkle.verify_leaves_batch(
        proof.whir_root, aggr_digests, (ii // 4).tolist(),
        proof.aggr_paths))
    # consistency: beta-combined column == aggregate codeword value
    combined = F.fsum(F.fmul(beta16[None, :, :], proof.columns), axis=1)
    picked = jnp.take_along_axis(
        proof.aggr_leaves, jnp.asarray(ii % 4)[:, None, None], axis=1)[:, 0]
    ok = ok and bool(jnp.all(F.feq(combined, picked)))

    okw, state = whir.verify(proof.whir_root, proof.whir_proof, x_lo, y,
                             state, queries=whir_queries)
    return ok and bool(okw), state


__all__ = ["AggFriCommitment", "AggFriProof", "K_AGG", "CONS_QUERIES",
           "commit", "prove", "verify"]
