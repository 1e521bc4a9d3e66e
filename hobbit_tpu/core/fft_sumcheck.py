"""FFT-relation sumchecks: prove codeword-MLE evaluations against message
coefficients.

For a codeword c = FFT_n(m ‖ 0) (RS convention of this framework), the MLE
of c at point r satisfies

    c~(r) = sum_x m[x] * phi_r[x],   phi_r[x] = sum_j eq(r, j) * w^(j*x)

i.e. phi_r is the DFT of the eq-table of r — one batched FFT, rather than
the reference's bespoke iterative construction (``phiGInit``,
utils.cpp:694-755).  The claim then reduces to a 2-product sumcheck between
the zero-padded message and phi_r (reference ``prove_fft`` /
``prove_fft_matrix``, sumcheck.cpp:2975-3063).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

import jax.numpy as jnp

from ..ops import fft as fftm
from ..ops import field as F
from ..ops import poly
from . import sumcheck as sc


def phi_vector(r):
    """phi_r over the 2^|r| FFT domain: FFT of the eq-table."""
    return fftm.fft(poly.beta_table(r))


class FFTSumcheckProof(NamedTuple):
    inner: sc.SumcheckProof


def prove_fft(message, r, state):
    """Prove c~(r) where c = FFT(message ‖ 0...) over the 2^|r| domain.

    message: [m, 2] coefficients with m <= 2^|r| (zero-padded).
    Returns (proof, claim, state); proof.final point gives the message-MLE
    evaluation claim (proof.inner.final_evals[0]).
    """
    n = 1 << r.shape[0]
    assert message.shape[0] <= n
    padded = jnp.concatenate(
        [message,
         jnp.zeros((n - message.shape[0], 2), dtype=message.dtype)], axis=0)
    phi = phi_vector(r)
    claim = F.fdot(padded, phi)
    proof, state = sc.prove_2product(padded, phi, state)
    return FFTSumcheckProof(inner=proof), claim, state


def verify_fft(proof: FFTSumcheckProof, r, claim, state):
    """Verify; returns (ok, point, message_eval_claim, state).

    The verifier recomputes phi_r (O(n log n) — matching the reference's
    transparently-evaluated FFT matrix) and checks the phi final eval.
    """
    ok, point, cur, state = sc.verify_product_sumcheck(proof.inner, claim,
                                                      state, 2)
    phi = phi_vector(r)
    want_phi = poly.evaluate_vector(phi, point)
    ok = jnp.logical_and(ok, F.feq(proof.inner.final_evals[1], want_phi))
    return ok, point, proof.inner.final_evals[0], state


# ---------------------------------------------------------------------------
# Matrix variants (reference prove_fft_matrix / prove_ifft_matrix,
# sumcheck.cpp:2989-3063): rows of M are RS-extended x2 by row-FFT; the
# claim is the MLE of the row-FFT'd matrix at (r_col, r_row).  Reduce rows
# with eq(r_row) (the reference's prepare_matrix(transpose(M), r1)), then
# one phi 2-product sumcheck over the combined row.
# ---------------------------------------------------------------------------

def prove_fft_matrix(M, r, state):
    """M: [m, c, 2]; r: [log(2c) + log(m), 2] with the column bits first.
    Proves rowFFT(M)~(r) -> message-matrix claim at (point, r_row).
    Returns (proof, claim, state)."""
    c = M.shape[1]
    lc = int(np.log2(2 * c))
    r_col, r_row = r[:lc], r[lc:]
    eq_r = poly.beta_table(r_row)[: M.shape[0]]
    arr = F.fsum(F.fmul(eq_r[:, None, :], M), axis=0)       # [c, 2]
    return prove_fft(arr, r_col, state)


def verify_fft_matrix(proof: FFTSumcheckProof, r, claim, state, m: int):
    """Returns (ok, full_point, matrix_eval_claim, state): the caller binds
    matrix_eval_claim == M~(full_point).

    The x2 zero-pad makes the padded-message MLE equal
    (1 - point_top) * M~(point_low); divide the factor out so the claim is
    directly about M (the reference keeps the factor on the check side,
    sumcheck.cpp:3052)."""
    lc = proof.inner.polys.shape[0]
    r_col, r_row = r[:lc], r[lc:]
    ok, point, msg_eval, state = verify_fft(proof, r_col, claim, state)
    one = F.scalar(1)
    mat_eval = F.fmul(msg_eval, F.finv(F.fsub(one, point[lc - 1])))
    full_point = jnp.concatenate([point[: lc - 1], r_row], axis=0)
    return ok, full_point, mat_eval, state


def prove_ifft_matrix(M, r, state):
    """IFFT variant: rows are inverse-transformed (phi built with inverse
    twiddles and 1/n scale, reference sumcheck.cpp:3028-3063)."""
    c = M.shape[1]
    lc = int(np.log2(c))
    r_col, r_row = r[:lc], r[lc:]
    eq_r = poly.beta_table(r_row)[: M.shape[0]]
    arr = F.fsum(F.fmul(eq_r[:, None, :], M), axis=0)
    phi = phi_vector_inverse(r_col)
    claim = F.fdot(arr, phi)
    proof, state = sc.prove_2product(arr, phi, state)
    return FFTSumcheckProof(inner=proof), claim, state


def phi_vector_inverse(r):
    """phi for the IFFT relation: IFFT of the eq-table (includes 1/n)."""
    return fftm.ifft(poly.beta_table(r))


def verify_ifft_matrix(proof: FFTSumcheckProof, r, claim, state):
    """Returns (ok, point, matrix_row_eval, state)."""
    lc = proof.inner.polys.shape[0]
    r_col = r[:lc]
    ok, point, cur, state = sc.verify_product_sumcheck(proof.inner, claim,
                                                       state, 2)
    phi = phi_vector_inverse(r_col)
    want_phi = poly.evaluate_vector(phi, point)
    ok = jnp.logical_and(ok, F.feq(proof.inner.final_evals[1], want_phi))
    return ok, point, proof.inner.final_evals[0], state


__all__ = ["phi_vector", "phi_vector_inverse", "FFTSumcheckProof",
           "prove_fft", "verify_fft", "prove_fft_matrix",
           "verify_fft_matrix", "prove_ifft_matrix", "verify_ifft_matrix"]
