"""Pigeon/Breakdown SHA-based polynomial commitments.

The reference's older PC family over SHA ``__hhash_digest`` Merkle trees
(``poly_commit.cpp:108-355, 476-658``): the message is an R x C matrix with
rows code-extended x2 — by the Spielman expander code
(``Pigeon_breakdown_commit``) or by RS/FFT (``FFT_breakdown_commit``) —
with ``column_size = 128`` (parameter.h:9) and per-column leaves; opening
transmits the eq-aggregated row and checks random columns by linearity.

Same matrix layout as ``pc.brakedown`` but hashed with the SHA-256 Merkle
backend (the reference's my_hhash path) — one parameterized module covers
the Pigeon (expander), FFT (RS) and naive variants.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import numpy as np

import jax.numpy as jnp

from ..ops import encode as enc
from ..ops import expanders
from ..ops import field as F
from ..ops import merkle, mimc, poly

BACKEND = "sha256"
COLUMN_SIZE = 128          # parameter.h:9


class PigeonParams(NamedTuple):
    N: int
    rows: int
    mode: str = "expander"     # "expander" (Pigeon) | "rs" (FFT_breakdown)
    queries: int = 120

    @property
    def cols(self) -> int:
        return self.N // self.rows


class PigeonCommitment(NamedTuple):
    encoded: jnp.ndarray        # [R, 2C, 2]
    tree: merkle.MerkleTree
    code: object                # SpielmanCode | None

    @property
    def root(self):
        return self.tree.root


def _encode_rows(mat, params: PigeonParams):
    if params.mode == "rs":
        return enc.rs_encode(mat), None
    code = expanders.build_code(params.cols)
    return enc.spielman_encode_padded(code, mat), code


def _column_leaves(encoded):
    """Per-column leaf digests: columns padded to multiples of 4 rows."""
    from ..ops import blake3
    from ..ops import sha256
    R, C2 = encoded.shape[0], encoded.shape[1]
    pad = (-R) % 4
    if pad:
        encoded = jnp.concatenate(
            [encoded, jnp.zeros((pad, C2, 2), jnp.uint64)], axis=0)
        R += pad
    cols = jnp.moveaxis(encoded, 0, 1)          # [2C, R, 2]
    groups = cols.reshape(C2, R // 4, 4, 2)
    digest = None
    for g in range(R // 4):
        words = blake3.fields_to_words(groups[:, g])
        if digest is None:
            digest = sha256.hash64(words)
        else:
            digest = sha256.hash64(
                jnp.concatenate([digest, sha256.hash64(words)], axis=-1))
    return digest                                # [2C, 8]


def commit(message, params: PigeonParams) -> PigeonCommitment:
    mat = message.reshape(params.rows, params.cols, 2)
    encoded, code = _encode_rows(mat, params)
    leaves = _column_leaves(encoded)
    n = leaves.shape[0]
    if n & (n - 1):
        padn = (1 << int(np.ceil(np.log2(n)))) - n
        leaves = jnp.concatenate(
            [leaves, jnp.zeros((padn, 8), dtype=leaves.dtype)])
    tree = merkle.build_from_digests(leaves, backend=BACKEND)
    return PigeonCommitment(encoded=encoded, tree=tree, code=code)


class PigeonOpening(NamedTuple):
    eval_claim: jnp.ndarray
    aggr: jnp.ndarray
    queries: Tuple[int, ...]
    reply: jnp.ndarray          # [q, R, 2] full columns
    paths: jnp.ndarray


def _split(x, params: PigeonParams):
    lc = int(np.log2(params.cols))
    return x[:lc], x[lc:]


def open(message, com: PigeonCommitment, x, params: PigeonParams, state):
    x_lo, x_hi = _split(x, params)
    beta = poly.beta_table(x_hi)[: params.rows]
    mat = message.reshape(params.rows, params.cols, 2)
    aggr = F.fsum(F.fmul(beta[:, None, :], mat), axis=0)
    eval_claim = poly.evaluate_vector(aggr, x_lo)

    aggr_tree = merkle.commit_fields(aggr, backend=BACKEND)
    state = mimc.absorb(state,
                        aggr_tree.root.astype(jnp.uint64).reshape(4, 2))
    state, qs = mimc.expand(state, params.queries)
    idx = tuple(int(v) % (2 * params.cols) for v in np.asarray(qs)[:, 0])

    cols_vals = jnp.moveaxis(com.encoded, 0, 1)
    reply = cols_vals[jnp.asarray(idx, dtype=jnp.int32)]
    paths = merkle.open_leaves(com.tree, idx)
    return PigeonOpening(eval_claim=eval_claim, aggr=aggr, queries=idx,
                         reply=reply, paths=paths), state


def verify(root, x, opening: PigeonOpening, params: PigeonParams, code,
           state):
    x_lo, x_hi = _split(x, params)
    beta = poly.beta_table(x_hi)[: params.rows]

    aggr_tree = merkle.commit_fields(opening.aggr, backend=BACKEND)
    state = mimc.absorb(state,
                        aggr_tree.root.astype(jnp.uint64).reshape(4, 2))
    state, qs = mimc.expand(state, params.queries)
    idx = tuple(int(v) % (2 * params.cols) for v in np.asarray(qs)[:, 0])
    if idx != tuple(opening.queries):
        return False, state

    if not bool(F.feq(poly.evaluate_vector(opening.aggr, x_lo),
                      opening.eval_claim)):
        return False, state

    if params.mode == "rs":
        enc_aggr = enc.rs_encode(opening.aggr[None])[0]
    else:
        enc_aggr = enc.spielman_encode_padded(code, opening.aggr)
    comb = F.fsum(F.fmul(beta[None, :, :], opening.reply), axis=1)
    col_digests = _column_leaves(jnp.moveaxis(opening.reply, 1, 0))
    for qi, c in enumerate(idx):
        if not bool(F.feq(comb[qi], enc_aggr[c])):
            return False, state
        if not merkle.verify_leaf(root, col_digests[qi], c,
                                  opening.paths[qi], backend=BACKEND):
            return False, state
    return True, state


__all__ = ["PigeonParams", "PigeonCommitment", "PigeonOpening",
           "commit", "open", "verify", "COLUMN_SIZE"]
