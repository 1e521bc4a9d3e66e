"""Parity-matrix commitment for the Spielman linear-code proof.

Succinct replacement for the verifier's transparent phi recomputation
(reference ``commit_parity_matrix`` / ``open_parity_matrix``,
sumcheck.cpp:2671-2886): without it, checking the batched codeword claim
``sum_q u_q codeword~(rho_q)`` costs the verifier O(q * edges) to evaluate
``wphi[j, x] = u_j (P^T eq(rho_j))[x]`` at the sumcheck point.

TPU-first redesign: the column code of the tensor PC acts on vectors of
length ``rows`` (~sqrt(B)), so its generator matrix P [codeword_len, n] is
only ~2 * rows * n entries DENSE — small enough to materialize by encoding
the identity (one batched ``expanders.encode``) and commit with shockwave
as public preprocessing (input-independent; cached per code).  The
verifier's wphi evaluation then reduces to

    wphi~(point) = <P, W2>,   W2[r, x] = w[r] * eq(ipt)[x],
    w[r] = sum_{q : rho_q = bool(r)} u_q eq_q[q]

proven by ONE tiny 2-product sumcheck whose final weight evaluation the
verifier computes in O(q log) (boolean-point eq products), plus one
shockwave opening of the P commitment — no expander traversal at all.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

import jax.numpy as jnp

from ..ops import expanders
from ..ops import field as F
from ..ops import poly
from . import sumcheck as sc


class ParityData(NamedTuple):
    pmat: jnp.ndarray          # [cw2 * n, 2] dense generator, row-major
    sw_data: object            # shockwave commitment of pmat
    n: int                     # message length (power of two)
    cw2: int                   # codeword_len padded to a power of two

    @property
    def root(self):
        return self.sw_data.outer.root


class ParityProof(NamedTuple):
    p_sum: sc.SumcheckProof    # <P, W2> 2-product sumcheck
    open_pt: object            # shockwave opening of P at the final point


_CACHE: dict = {}


def _pow2_above(v: int) -> int:
    return 1 << int(np.ceil(np.log2(max(2, v))))


def commit_parity(code: expanders.SpielmanCode) -> ParityData:
    """Dense generator-matrix commitment (public preprocessing, cached).

    P[r, x] = encode(e_x)[r]; flattened row-major (x in the LOW bits) so
    the sumcheck point splits as (xz | rz)."""
    from ..pc import recursion as rec
    from ..pc import shockwave as sw

    key = (code.n, code.codeword_len, len(code.levels))
    hit = _CACHE.get(key)
    if hit is not None:
        return hit

    n = code.n
    cw2 = _pow2_above(code.codeword_len)
    eye = jnp.zeros((n, n, 2), dtype=jnp.uint64)
    eye = eye.at[jnp.arange(n), jnp.arange(n), 0].set(jnp.uint64(1))
    cols = expanders.encode(code, eye)            # [n, cw, 2]
    P = jnp.moveaxis(cols, 0, 1)                  # [cw, n, 2]
    if P.shape[0] < cw2:
        P = jnp.concatenate(
            [P, jnp.zeros((cw2 - P.shape[0], n, 2), jnp.uint64)], axis=0)
    flat = P.reshape(cw2 * n, 2)
    data = ParityData(pmat=flat, sw_data=sw.commit(flat, rec._sw_k(cw2 * n)),
                      n=n, cw2=cw2)
    _CACHE[key] = data
    return data


def _row_weights(qrows, coeffs, cw: int, cw2: int):
    """w[r] = sum over queries with rho_q = bool(r) of coeffs[q]; rows
    outside the codeword domain contribute nothing."""
    q = len(qrows)
    rarr = jnp.asarray(np.asarray(qrows, dtype=np.int64), dtype=jnp.int32)
    onehot = jnp.arange(cw2, dtype=jnp.int32)[None, :] == rarr[:, None]
    valid = jnp.asarray(np.asarray(qrows, dtype=np.int64) < cw)[:, None]
    contrib = jnp.where((onehot & valid)[:, :, None], coeffs[:, None, :],
                        jnp.uint64(0))
    return F.fsum(contrib, axis=0)                # [cw2, 2]


def _bool_eq_batch(idxs, pt):
    """eq(bool(idx_q), pt) for all q: [q, 2]."""
    rarr = np.asarray(idxs, dtype=np.int64)
    one = F.ones((len(idxs),))
    acc = one
    for b in range(pt.shape[0]):
        bit = jnp.asarray((rarr >> b) & 1)[:, None]
        term = jnp.where(bit == 1,
                         jnp.broadcast_to(pt[b], (len(idxs), 2)),
                         F.fsub(one, pt[b][None, :]))
        acc = F.fmul(acc, term)
    return acc


def prove_claim(pd: ParityData, qrows, coeffs, cw: int, ipt, state,
                sw_queries: int = 240):
    """Prove wphi~ = <P, W2>; returns (ParityProof, state)."""
    from ..pc import shockwave as sw

    w_rows = _row_weights(qrows, coeffs, cw, pd.cw2)
    eqx = poly.beta_table(ipt)                     # [n, 2]
    W2 = F.fmul(w_rows[:, None, :], eqx[None, :, :]).reshape(-1, 2)
    p_sum, state = sc.prove_2product(pd.pmat, W2, state)
    open_pt, state = sw.open(pd.sw_data, p_sum.challenges, state,
                             queries=sw_queries)
    return ParityProof(p_sum=p_sum, open_pt=open_pt), state


def verify_claim(proof: ParityProof, pmat_root, claim, qrows, coeffs,
                 cw: int, cw2: int, n: int, ipt, state,
                 sw_queries: int = 240):
    """Returns (ok, state); `claim` is the wphi evaluation being checked
    (the code sumcheck's final weight eval)."""
    from ..pc import recursion as rec
    from ..pc import shockwave as sw

    ok, pt, cur, state = sc.verify_product_sumcheck(proof.p_sum, claim,
                                                    state, 2)
    ln = int(np.log2(n))
    xz, rz = pt[:ln], pt[ln:]
    # queries landing on zero-padded codeword rows (>= codeword_len)
    # contribute nothing: P has no such row, mirroring _row_weights
    valid = jnp.asarray(np.asarray(qrows, dtype=np.int64) < cw)[:, None]
    coeffs_m = jnp.where(valid, coeffs, jnp.uint64(0))
    w_eval = F.fsum(F.fmul(coeffs_m, _bool_eq_batch(qrows, rz)), axis=0)
    want = F.fmul(w_eval, rec._eq_eval(ipt, xz))
    ok = jnp.logical_and(ok, F.feq(proof.p_sum.final_evals[1], want))

    k = rec._sw_k(cw2 * n)
    oks, state = sw.verify(pmat_root, proof.open_pt, pt, k, cw2 * n, state,
                           queries=sw_queries)
    ok = jnp.logical_and(ok, oks)
    ok = jnp.logical_and(ok, F.feq(proof.open_pt.eval_claim,
                                   proof.p_sum.final_evals[0]))
    return ok, state


__all__ = ["ParityData", "ParityProof", "commit_parity", "prove_claim",
           "verify_claim"]
