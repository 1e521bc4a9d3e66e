"""Tensor-code recursion provers: succinct replacements for the naive
aggregate transmission in the tensor PC openings.

Reference ``recursive_prover_RS`` (PC_utils.cpp:396-512) and
``recursive_prover_Spielman[_stream]`` (PC_utils.cpp:168-387): instead of
transmitting the B-sized aggregate and letting the verifier re-encode it,
the prover commits the aggregate with the shockwave inner PC (C_f) and
proves via sumchecks that the RLC of the queried codeword positions is
consistent with C_f.

RS mode: the queried tensor position (r, c) of the encoded aggregate is a
bilinear form  enc[r, c] = sum_{i,j} w_R^(r i) w_C^(c j) M[i, j]  (both
tensor stages are coefficient-DFTs), so the s-powers RLC of all queried
values equals <M, W> for a dense weight matrix W that the prover
materializes and the verifier evaluates at one point in O(q log B) with the
per-query product formula  prod_b (1 - y_b + y_b w^(r 2^b))  — the MLE of a
DFT row.  ONE 2-product sumcheck replaces the reference's two FFT-matrix
sumchecks (PC_utils.cpp:442-471); the final M evaluation is bound by a
shockwave opening of C_f, and f(x) itself by a second opening at x_lo.

Spielman mode: the column stage is an expander code, so the RLC of queried
values is first reduced by a batched linear-code sumcheck
(``prove_linear_code_batch``) to an evaluation of the row-extended column
matrix D[q, i] = sum_j w_C^(c_q j) M[i, j], and a second ("tie") 2-product
sumcheck reduces that evaluation to <M, Phi2> with Phi2 again
verifier-evaluable per query in O(log) — then C_f openings as above.
Deviation from the reference (documented): the reference shockwave-commits
the queried columns as C_c and proves both commitments; the tie sumcheck
makes C_c redundant (the D evaluation claim is forced by its reduction to
the C_f-bound M), so it is omitted.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import numpy as np

import jax.numpy as jnp

from ..core import linear_code as lc
from ..core import sumcheck as sc
from ..ops import encode as enc
from ..ops import expanders
from ..ops import field as F
from ..ops import mimc, poly
from . import shockwave as sw


def _dft_mle(base, pt):
    """MLE over j of w^(r j) at point pt, base = w^r: the product formula
    prod_b (1 - pt_b + pt_b * base^(2^b))."""
    one = F.scalar(1)
    acc = one
    cur = base
    for b in range(pt.shape[0]):
        acc = F.fmul(acc, F.fadd(F.fsub(one, pt[b]), F.fmul(pt[b], cur)))
        cur = F.fmul(cur, cur)
    return acc


def _pow_bases(omega, idxs):
    """[len(idxs), 2] scalars omega^idx."""
    return jnp.stack([F.fpow(omega, int(i)) for i in idxs])


def _bool_point(v: int, bits: int):
    """Index -> Boolean point [bits, 2] (low bit first)."""
    out = np.zeros((bits, 2), dtype=np.uint64)
    for b in range(bits):
        out[b, 0] = (v >> b) & 1
    return jnp.asarray(out)


def _sw_k(B: int) -> int:
    """Shockwave row count: ~sqrt(B), >=4, divides B."""
    k = 1 << (int(np.log2(B)) // 2)
    return max(4, k)


class RSRecursionProof(NamedTuple):
    p_main: sc.SumcheckProof
    open_pt: sw.ShockwaveOpening
    open_x: sw.ShockwaveOpening


class SpielmanRecursionProof(NamedTuple):
    p_code: lc.LinearCodeProof     # batched codeword claim -> D eval
    p_tie: sc.SumcheckProof        # D eval -> <M, Phi2>
    open_pt: sw.ShockwaveOpening   # C_f at the tie point
    open_x: sw.ShockwaveOpening    # C_f at x_lo


# ---------------------------------------------------------------------------
# RS recursion
# ---------------------------------------------------------------------------

def rs_prove(aggr, cf: sw.ShockwaveData, x_lo, qrows: Sequence[int],
             qcols: Sequence[int], rows: int, state,
             sw_queries: int = sw.QUERIES):
    """aggr: [B, 2] (B = rows * cols); cf = shockwave.commit(aggr), whose
    root the caller absorbed BEFORE deriving the queries.  Returns
    (RSRecursionProof, state)."""
    B = aggr.shape[0]
    cols = B // rows

    q = len(qrows)
    state, s = mimc.squeeze1(state)
    u = poly.powers(s, q)                       # [q, 2]
    wR = F.root_of_unity(int(np.log2(2 * rows)))
    wC = F.root_of_unity(int(np.log2(2 * cols)))
    baseR = _pow_bases(jnp.asarray(np.array(wR, np.uint64)), qrows)
    baseC = _pow_bases(jnp.asarray(np.array(wC, np.uint64)), qcols)

    W = jnp.zeros((rows, cols, 2), dtype=jnp.uint64)
    for qi in range(q):
        vr = poly.powers(baseR[qi], rows)       # [rows, 2]
        vc = poly.powers(baseC[qi], cols)       # [cols, 2]
        vr = F.fmul(u[qi][None, :], vr)
        W = F.fadd(W, F.fmul(vr[:, None, :], vc[None, :, :]))

    p_main, state = sc.prove_2product(aggr, W.reshape(B, 2), state)
    pt = p_main.challenges
    open_pt, state = sw.open(cf, pt, state, queries=sw_queries)
    open_x, state = sw.open(cf, x_lo, state, queries=sw_queries)
    return RSRecursionProof(p_main, open_pt, open_x), state


def rs_verify(proof: RSRecursionProof, cf_root, comb_vals, eval_claim,
              x_lo, qrows, qcols, rows: int, B: int, state,
              sw_queries: int = sw.QUERIES):
    """comb_vals: [q, 2] beta-combined (Merkle-verified) query replies.
    Returns (ok, state)."""
    cols = B // rows
    lc_bits = int(np.log2(cols))
    k = _sw_k(B)
    ok = True

    q = comb_vals.shape[0]
    state, s = mimc.squeeze1(state)
    u = poly.powers(s, q)
    claim = F.fdot(u, comb_vals)

    okm, pt, cur, state = sc.verify_product_sumcheck(proof.p_main, claim,
                                                     state, 2)
    ok = ok and bool(okm)
    z, y = pt[:lc_bits], pt[lc_bits:]
    wR = F.root_of_unity(int(np.log2(2 * rows)))
    wC = F.root_of_unity(int(np.log2(2 * cols)))
    baseR = _pow_bases(jnp.asarray(np.array(wR, np.uint64)), qrows)
    baseC = _pow_bases(jnp.asarray(np.array(wC, np.uint64)), qcols)
    want = None
    for qi in range(q):
        t = F.fmul(u[qi], F.fmul(_dft_mle(baseR[qi], y),
                                 _dft_mle(baseC[qi], z)))
        want = t if want is None else F.fadd(want, t)
    ok = ok and bool(F.feq(proof.p_main.final_evals[1], want))

    oks, state = sw.verify(cf_root, proof.open_pt, pt, k, B, state,
                           queries=sw_queries)
    ok = ok and bool(oks)
    ok = ok and bool(F.feq(proof.open_pt.eval_claim,
                           proof.p_main.final_evals[0]))
    okx, state = sw.verify(cf_root, proof.open_x, x_lo, k, B, state,
                           queries=sw_queries)
    ok = ok and bool(okx)
    ok = ok and bool(F.feq(proof.open_x.eval_claim, eval_claim))
    return ok, state


# ---------------------------------------------------------------------------
# Spielman recursion
# ---------------------------------------------------------------------------

def _pad_pow2_count(n: int) -> int:
    return 1 << int(np.ceil(np.log2(max(2, n))))


def spielman_prove(aggr, cf: sw.ShockwaveData, x_lo, qrows, qcols, rows: int,
                   code: expanders.SpielmanCode, state,
                   sw_queries: int = sw.QUERIES):
    """Spielman-column tensor recursion.  Returns (proof, state)."""
    B = aggr.shape[0]
    cols = B // rows

    q = len(qrows)
    qpad = _pad_pow2_count(q)
    state, s = mimc.squeeze1(state)
    u = poly.powers(s, qpad)
    cw_bits = int(np.log2(2 * rows))

    mat = aggr.reshape(rows, cols, 2)
    ext_rows = enc.rs_encode(mat)                     # [rows, 2c, 2]
    zero_msg = jnp.zeros((rows, 2), dtype=jnp.uint64)
    msgs = [ext_rows[:, c] for c in qcols] + \
           [zero_msg] * (qpad - q)
    rhos = [_bool_point(r, cw_bits) for r in qrows] + \
           [_bool_point(0, cw_bits)] * (qpad - q)
    weights = jnp.concatenate([u[:q], jnp.zeros((qpad - q, 2), jnp.uint64)])
    p_code, _, state = lc.prove_batch(code, msgs, rhos, weights, state)
    point = p_code.inner.challenges                   # [log(qpad*rows), 2]
    lr = int(np.log2(rows))
    ipt, qpt = point[:lr], point[lr:]

    # tie: D~(point) = sum_{i,j} M[i,j] * Phi2[i,j]
    wC = F.root_of_unity(int(np.log2(2 * cols)))
    baseC = _pow_bases(jnp.asarray(np.array(wC, np.uint64)), qcols)
    eq_q = poly.beta_table(qpt)                       # [qpad, 2]
    colfac = jnp.zeros((cols, 2), dtype=jnp.uint64)
    for qi in range(q):
        vc = poly.powers(baseC[qi], cols)
        colfac = F.fadd(colfac, F.fmul(eq_q[qi][None, :], vc))
    eq_i = poly.beta_table(ipt)                       # [rows, 2]
    Phi2 = F.fmul(eq_i[:, None, :], colfac[None, :, :])
    p_tie, state = sc.prove_2product(aggr, Phi2.reshape(B, 2), state)
    pt2 = p_tie.challenges

    open_pt, state = sw.open(cf, pt2, state, queries=sw_queries)
    open_x, state = sw.open(cf, x_lo, state, queries=sw_queries)
    return SpielmanRecursionProof(p_code, p_tie, open_pt, open_x), state


def spielman_verify(proof: SpielmanRecursionProof, cf_root, comb_vals,
                    eval_claim, x_lo, qrows, qcols, rows: int, B: int,
                    code: expanders.SpielmanCode, state,
                    sw_queries: int = sw.QUERIES):
    cols = B // rows
    k = _sw_k(B)
    ok = True

    q = comb_vals.shape[0]
    qpad = _pad_pow2_count(q)
    state, s = mimc.squeeze1(state)
    u = poly.powers(s, qpad)
    claim = F.fdot(u[:q], comb_vals)
    cw_bits = int(np.log2(2 * rows))

    okc, point, cur, state = sc.verify_product_sumcheck(proof.p_code.inner,
                                                        claim, state, 2)
    ok = ok and bool(okc)
    # transparent wphi check: wphi[j, x] = u_j * (P^T eq(rho_j))[x]
    lr = int(np.log2(rows))
    ipt, qpt = point[:lr], point[lr:]
    eq_q = poly.beta_table(qpt)
    want = None
    for qi in range(q):
        rho = _bool_point(qrows[qi], cw_bits)
        phi = lc._phi(code, rho, rows)
        t = F.fmul(F.fmul(u[qi], eq_q[qi]), poly.evaluate_vector(phi, ipt))
        want = t if want is None else F.fadd(want, t)
    ok = ok and bool(F.feq(proof.p_code.inner.final_evals[1], want))

    # tie sumcheck: claim = D~(point) = p_code final eval 0
    okt, pt2, cur2, state = sc.verify_product_sumcheck(
        proof.p_tie, proof.p_code.inner.final_evals[0], state, 2)
    ok = ok and bool(okt)
    lc_bits = int(np.log2(cols))
    z2, y2 = pt2[:lc_bits], pt2[lc_bits:]
    wC = F.root_of_unity(int(np.log2(2 * cols)))
    baseC = _pow_bases(jnp.asarray(np.array(wC, np.uint64)), qcols)
    colfac_e = None
    for qi in range(q):
        t = F.fmul(eq_q[qi], _dft_mle(baseC[qi], z2))
        colfac_e = t if colfac_e is None else F.fadd(colfac_e, t)
    eq_i_e = _eq_eval(ipt, y2)
    want2 = F.fmul(eq_i_e, colfac_e)
    ok = ok and bool(F.feq(proof.p_tie.final_evals[1], want2))

    oks, state = sw.verify(cf_root, proof.open_pt, pt2, k, B, state,
                           queries=sw_queries)
    ok = ok and bool(oks)
    ok = ok and bool(F.feq(proof.open_pt.eval_claim,
                           proof.p_tie.final_evals[0]))
    okx, state = sw.verify(cf_root, proof.open_x, x_lo, k, B, state,
                           queries=sw_queries)
    ok = ok and bool(okx)
    ok = ok and bool(F.feq(proof.open_x.eval_claim, eval_claim))
    return ok, state


def _eq_eval(r1, r2):
    one = F.scalar(1)
    acc = one
    for j in range(r1.shape[0]):
        acc = F.fmul(acc, F.fadd(
            F.fmul(F.fsub(one, r1[j]), F.fsub(one, r2[j])),
            F.fmul(r1[j], r2[j])))
    return acc


__all__ = ["RSRecursionProof", "SpielmanRecursionProof",
           "rs_prove", "rs_verify", "spielman_prove", "spielman_verify"]
