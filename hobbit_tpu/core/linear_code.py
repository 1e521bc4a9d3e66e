"""Linear-code (Spielman) encoding proof.

Proves that a claimed MLE evaluation of a codeword is consistent with the
committed/known message: since codeword = P * message for the implicit
generator matrix P,

    codeword~(rho) = <phi, message>,  phi = P^T eq(rho)

with phi computed by back-propagating the eq-table through the recursive
expander structure (``encode_transpose`` — the reverse-adjacency descent of
the reference's ``evaluate_parity_matrix``, sumcheck.cpp:2888-2928).  A
2-product sumcheck then reduces the claim to a message MLE evaluation; the
batch variant RLCs many codeword claims into one (``prove_linear_code
[_batch]``, sumcheck.cpp:3201-3235).

Verifier cost: O(edges) to recompute phi (transparent) — the reference
instead commits the parity matrix via shockwave (commit_parity_matrix);
that optimization slots in behind the same interface.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import numpy as np

import jax.numpy as jnp

from ..ops import expanders
from ..ops import field as F
from ..ops import mimc, poly
from . import sumcheck as sc


class LinearCodeProof(NamedTuple):
    inner: sc.SumcheckProof


def _phi(code: expanders.SpielmanCode, rho, padded_len: int):
    """P^T eq(rho) over the message domain, padded to the message pow2."""
    eq = poly.beta_table(rho)[: code.codeword_len]
    phi = expanders.encode_transpose(code, eq)
    if phi.shape[0] < padded_len:
        phi = jnp.concatenate(
            [phi, jnp.zeros((padded_len - phi.shape[0], 2), jnp.uint64)])
    return phi


def prove(code: expanders.SpielmanCode, message, rho, state):
    """Prove codeword~(rho) for codeword = encode(message) zero-padded to
    2n; returns (proof, claim, state)."""
    n = message.shape[0]
    phi = _phi(code, rho, n)
    claim = F.fdot(message, phi)
    proof, state = sc.prove_2product(message, phi, state)
    return LinearCodeProof(inner=proof), claim, state


def verify(proof: LinearCodeProof, code: expanders.SpielmanCode, rho, claim,
           state):
    """Returns (ok, point, message_eval, state)."""
    ok, point, cur, state = sc.verify_product_sumcheck(proof.inner, claim,
                                                      state, 2)
    phi = _phi(code, rho, 1 << point.shape[0])
    want = poly.evaluate_vector(phi, point)
    ok = jnp.logical_and(ok, F.feq(proof.inner.final_evals[1], want))
    return ok, point, proof.inner.final_evals[0], state


def prove_batch(code: expanders.SpielmanCode, messages: Sequence, rhos,
                weights, state):
    """RLC many codeword claims: sum_j w_j codeword_j~(rho_j).

    All messages share the code; one combined 2-product sumcheck with the
    stacked phi vectors folded by the same challenges."""
    n = messages[0].shape[0]
    msg_mat = jnp.stack(messages)          # [m, n, 2]
    phis = jnp.stack([_phi(code, rhos[j], n) for j in range(len(messages))])
    wphi = F.fmul(weights[:, None, :], phis)
    # combined: sum_x sum_j m_j[x] * w_j phi_j[x]: use mixed named arrays
    combined_m = msg_mat.reshape(-1, 2)
    combined_p = wphi.reshape(-1, 2)
    claim = F.fdot(combined_m, combined_p)
    proof, state = sc.prove_2product(combined_m, combined_p, state)
    return LinearCodeProof(inner=proof), claim, state


__all__ = ["LinearCodeProof", "prove", "verify", "prove_batch"]
