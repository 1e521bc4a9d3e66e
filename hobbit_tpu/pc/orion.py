"""Orion polynomial commitment: expander-code rows + GKR encoding proof.

Reference ``commit_standard_orion`` / ``open_orion_standard``
(Our_PC.cpp:173-195, 523-601) + the vendored Orion GKR driven by
``prove_encodings_orion`` (prove_encodings.cpp:227-266): the commitment is
the Brakedown matrix commitment (message rows Spielman-encoded, chained
column Merkle leaves); the opening transmits the eq-weighted row aggregate
but replaces the verifier's re-encoding of it with a GKR proof over the
circuit that IS the expander encoding (``gkr.encoding_circuit``): the
indicator sumcheck reduces the queried codeword columns to one codeword-MLE
claim, the GKR reduces that to an input-MLE claim the verifier checks
directly against the transmitted aggregate.

The verifier therefore never runs the encoder — its work is the GKR
transcript replay with transparent wiring predicates (the same trust model
as the reference's inline Orion verifier over its _layered_circuit).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import numpy as np

import jax.numpy as jnp

from ..core import sumcheck as sc
from ..gkr import encoding_circuit as ec
from ..gkr import layered
from ..gkr import prover as gkr
from ..ops import blake3
from ..ops import encode as enc
from ..ops import expanders
from ..ops import field as F
from ..ops import merkle, mimc, poly
from . import brakedown as bd

OrionParams = bd.BrakedownParams
commit = bd.commit           # identical matrix commitment (Our_PC.cpp:173)


class OrionOpening(NamedTuple):
    eval_claim: jnp.ndarray
    aggr: jnp.ndarray               # [C, 2] transmitted aggregate row
    queries: Tuple[int, ...]
    reply: jnp.ndarray              # [q, R, 2]
    paths: jnp.ndarray
    ind_proof: sc.SumcheckProof     # indicator sumcheck -> codeword claim
    enc_proof: gkr.GkrProof         # encoding-circuit GKR


def _circuit_cache():
    if not hasattr(_circuit_cache, "d"):
        _circuit_cache.d = {}
    return _circuit_cache.d


def encoding_circuit_for(code: expanders.SpielmanCode):
    key = (code.n, code.codeword_len)
    cache = _circuit_cache()
    if key not in cache:
        cache[key] = ec.build_encoding_circuit(code)
    return cache[key]


def open(message, com: bd.BrakedownCommitment, x, params: OrionParams,
         state):
    """Open f at x; returns (OrionOpening, state)."""
    x_lo, x_hi = bd._split(x, params)
    beta = poly.beta_table(x_hi)[: params.rows]
    mat = message.reshape(params.rows, params.cols, 2)
    aggr = F.fsum(F.fmul(beta[:, None, :], mat), axis=0)
    acw = enc.spielman_encode_padded(com.code, aggr)     # [2C, 2]
    eval_claim = poly.evaluate_vector(aggr, x_lo)

    aggr_tree = merkle.commit_fields(aggr)
    state = mimc.absorb(state,
                        aggr_tree.root.astype(jnp.uint64).reshape(4, 2))
    state, qs = mimc.expand(state, params.queries)
    idx = tuple(int(v) % (2 * params.cols) for v in np.asarray(qs)[:, 0])

    cols_vals = jnp.moveaxis(com.encoded, 0, 1)
    reply = cols_vals[jnp.asarray(idx, dtype=jnp.int32)]
    n_groups = max(1, params.rows // 4)
    paths = jnp.stack([
        jnp.stack([merkle.open_leaf(com.tree, g * 2 * params.cols + c)
                   for g in range(n_groups)])
        for c in idx])

    # query-weighted indicator sumcheck: s^i weights per query so per-column
    # errors cannot cancel in the sum (PC_utils.cpp:203-210 semantics)
    from .shockwave import _weighted_indicator
    state, s = mimc.squeeze1(state)
    indicator = _weighted_indicator(idx, s, 2 * params.cols)
    ind_proof, state = sc.prove_2product(acw, indicator, state)
    rho = ind_proof.challenges

    # GKR over the encoding circuit: codeword~(rho) -> input-MLE claim
    circuit, builder = encoding_circuit_for(com.code)
    inputs = builder.make_inputs(aggr)
    enc_proof, state = gkr.prove(circuit, inputs, state, point=rho,
                                 claim=ind_proof.final_evals[0])
    return OrionOpening(
        eval_claim=eval_claim, aggr=aggr, queries=idx, reply=reply,
        paths=paths, ind_proof=ind_proof, enc_proof=enc_proof,
    ), state


def verify(root, x, opening: OrionOpening, params: OrionParams,
           code: expanders.SpielmanCode, state):
    """Returns (ok, state).  No encoding is performed."""
    x_lo, x_hi = bd._split(x, params)
    beta = poly.beta_table(x_hi)[: params.rows]

    aggr_tree = merkle.commit_fields(opening.aggr)
    state = mimc.absorb(state,
                        aggr_tree.root.astype(jnp.uint64).reshape(4, 2))
    state, qs = mimc.expand(state, params.queries)
    idx = tuple(int(v) % (2 * params.cols) for v in np.asarray(qs)[:, 0])
    if idx != tuple(opening.queries):
        return False, state

    if not bool(F.feq(poly.evaluate_vector(opening.aggr, x_lo),
                      opening.eval_claim)):
        return False, state

    # Merkle membership + per-column combination values
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

    # query-weighted indicator claim: sum_i s^i * comb_i over ALL queries
    from .shockwave import _weighted_indicator
    state, s = mimc.squeeze1(state)
    spow = poly.powers(s, len(idx))
    claim = F.fsum(F.fmul(spow, comb), axis=0)
    okp, rho, cur, state = sc.verify_product_sumcheck(opening.ind_proof,
                                                      claim, state, 2)
    ok = bool(okp)
    indicator = _weighted_indicator(idx, s, 2 * params.cols)
    ok = ok and bool(F.feq(opening.ind_proof.final_evals[1],
                           poly.evaluate_vector(indicator, rho)))

    # encoding GKR: codeword claim -> input claim checked against aggr
    circuit, builder = encoding_circuit_for(code)
    okg, W, in_claim, state = gkr.verify(opening.enc_proof, circuit, state,
                                         point=rho,
                                         claim=opening.ind_proof.final_evals[0])
    ok = ok and bool(okg)
    inputs = builder.make_inputs(opening.aggr)
    ok = ok and bool(F.feq(in_claim, F.fdot(W, inputs)))
    return ok, state


__all__ = ["OrionParams", "OrionOpening", "commit", "open", "verify",
           "encoding_circuit_for"]
