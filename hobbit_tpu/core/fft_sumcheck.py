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


__all__ = ["phi_vector", "FFTSumcheckProof", "prove_fft", "verify_fft"]
