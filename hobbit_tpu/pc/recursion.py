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

from typing import NamedTuple, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..utils.jitting import maybe_jit

from ..core import linear_code as lc
from ..core import parity
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


def _pow_bases(omega, idxs, domain: int = 0):
    """[len(idxs), 2] scalars omega^idx (one power table + gather)."""
    n = domain or (max(idxs) + 1)
    tab = poly.powers(omega, n)
    return tab[jnp.asarray(idxs, dtype=jnp.int32)]


def _dft_mle_batch(bases, pt):
    """Vectorized `_dft_mle` over a batch of bases: [q, 2] -> [q, 2]."""
    one = F.ones((bases.shape[0],))
    acc = one
    cur = bases
    for b in range(pt.shape[0]):
        acc = F.fmul(acc, F.fadd(F.fsub(one, pt[b][None]),
                                 F.fmul(pt[b][None], cur)))
        cur = F.fmul(cur, cur)
    return acc


def _bool_point(v: int, bits: int):
    """Index -> Boolean point [bits, 2] (low bit first)."""
    out = np.zeros((bits, 2), dtype=np.uint64)
    for b in range(bits):
        out[b, 0] = (v >> b) & 1
    return jnp.asarray(out)


def _sw_k(B: int) -> int:
    """Shockwave row count (~sqrt) for SINGLE-POINT recursion opens.

    These serve the mul-tree layer commitments: many distinct small-B
    shapes, each compiled separately, so the sqrt split keeps every
    per-shape open cheap to compile (cols <= 2^10 at B = 2^19)."""
    return max(4, 1 << (int(np.log2(B)) // 2))


def _sw_k_multi(V: int) -> int:
    """Shockwave row count for the MULTI-point recursion commitment of V.

    Each of the 240 inner queries transmits a full k-row column
    (k*16 bytes), so k drives proof size: the sqrt choice (k=1024 at
    the flagship V=2^21) cost 3.9 MB of column replies per opened
    commitment.  Capping the column length at 2^15 (k = V/2^15) cuts
    replies ~16x; the longer aggregate is folded by WHIR, not
    transmitted, and this shape is UNIFIED across all five opens of a
    proof, so the one compile is amortized.

    The >=4 floor is applied LAST: shockwave requires k % 4 == 0, and
    tiny multi-open shapes (V <= 2^6) otherwise hit the sqrt cap at
    k = 2 and crash in _column_roots."""
    return max(4, min(V >> 15, 1 << (int(np.log2(V)) // 2)))


@maybe_jit(static_argnums=(3, 4, 5))
def _rlc_weight_matrix(u, baseR, baseC, rows: int, cols: int, step: int = 16):
    """W[i, j] = sum_q u_q baseR_q^i baseC_q^j as a chunked scan over q
    (a [step, rows, cols] intermediate instead of per-query Python loops —
    q is 700/5900 at the reference schedule)."""
    q = u.shape[0]
    qpad = ((q + step - 1) // step) * step
    if qpad != q:
        pad = qpad - q
        u = jnp.concatenate([u, jnp.zeros((pad, 2), jnp.uint64)])
        baseR = jnp.concatenate([baseR, F.ones((pad,))])
        baseC = jnp.concatenate([baseC, F.ones((pad,))])
    Vr = F.fmul(u[:, None, :], poly.powers_batch(baseR, rows))
    Vc = poly.powers_batch(baseC, cols)

    def body(acc, xs):
        vru, vc = xs                    # [step, rows, 2], [step, cols, 2]
        contrib = F.fsum(F.fmul(vru[:, :, None, :], vc[:, None, :, :]),
                         axis=0)
        return F.fadd(acc, contrib), None

    acc, _ = jax.lax.scan(
        body, jnp.zeros((rows, cols, 2), dtype=jnp.uint64),
        (Vr.reshape(-1, step, rows, 2), Vc.reshape(-1, step, cols, 2)))
    return acc


def _phi_onehot_evals(code, qrows, rows: int, ipt):
    """[q, 2] MLE evaluations at ipt of phi_q = P^T e_{qrows[q]} — all q
    one-hot back-propagations batched into one encode_transpose."""
    q = len(qrows)
    cw = code.codeword_len
    rarr = np.asarray(qrows, dtype=np.int64)
    hot = (rarr < cw).astype(np.uint64)
    eqm = jnp.zeros((q, cw, 2), dtype=jnp.uint64)
    eqm = eqm.at[jnp.arange(q), jnp.asarray(np.minimum(rarr, cw - 1)), 0].set(
        jnp.asarray(hot))
    phi = expanders.encode_transpose(code, eqm)       # [q, n, 2]
    if phi.shape[1] < rows:
        phi = jnp.concatenate(
            [phi, jnp.zeros((q, rows - phi.shape[1], 2), jnp.uint64)],
            axis=1)
    return poly.evaluate_vector(jnp.moveaxis(phi, 0, 1), ipt)


class RSRecursionProof(NamedTuple):
    p_main: sc.SumcheckProof
    open_pt: sw.ShockwaveOpening
    open_x: sw.ShockwaveOpening


class SpielmanRecursionProof(NamedTuple):
    p_code: lc.LinearCodeProof     # batched codeword claim -> D eval
    p_tie: sc.SumcheckProof        # D eval -> <M, Phi2>
    open_pt: sw.ShockwaveOpening   # C_f at the tie point
    open_x: sw.ShockwaveOpening    # C_f at x_lo
    p_parity: Optional[parity.ParityProof] = None  # committed-P wphi check


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
    baseR = _pow_bases(jnp.asarray(np.array(wR, np.uint64)), qrows, 2 * rows)
    baseC = _pow_bases(jnp.asarray(np.array(wC, np.uint64)), qcols, 2 * cols)

    W = _rlc_weight_matrix(u, baseR, baseC, rows, cols)

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
    baseR = _pow_bases(jnp.asarray(np.array(wR, np.uint64)), qrows, 2 * rows)
    baseC = _pow_bases(jnp.asarray(np.array(wC, np.uint64)), qcols, 2 * cols)
    want = F.fsum(F.fmul(u, F.fmul(_dft_mle_batch(baseR, y),
                                   _dft_mle_batch(baseC, z))), axis=0)
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
                   sw_queries: int = sw.QUERIES, use_parity: bool = True):
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
    eq_qp = poly.beta_table(qpt)

    p_parity = None
    if use_parity:
        coeffs = F.fmul(u[:q], eq_qp[:q])
        pd = parity.commit_parity(code)
        p_parity, state = parity.prove_claim(pd, qrows, coeffs,
                                             code.codeword_len, ipt, state,
                                             sw_queries=sw_queries)

    # tie: D~(point) = sum_{i,j} M[i,j] * Phi2[i,j]
    wC = F.root_of_unity(int(np.log2(2 * cols)))
    baseC = _pow_bases(jnp.asarray(np.array(wC, np.uint64)), qcols, 2 * cols)
    colfac = F.fsum(F.fmul(eq_qp[:q, None, :],
                           poly.powers_batch(baseC, cols)), axis=0)
    eq_i = poly.beta_table(ipt)                       # [rows, 2]
    Phi2 = F.fmul(eq_i[:, None, :], colfac[None, :, :])
    p_tie, state = sc.prove_2product(aggr, Phi2.reshape(B, 2), state)
    pt2 = p_tie.challenges

    open_pt, state = sw.open(cf, pt2, state, queries=sw_queries)
    open_x, state = sw.open(cf, x_lo, state, queries=sw_queries)
    return SpielmanRecursionProof(p_code, p_tie, open_pt, open_x,
                                  p_parity), state


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
    lr = int(np.log2(rows))
    ipt, qpt = point[:lr], point[lr:]
    eq_q = poly.beta_table(qpt)
    if proof.p_parity is not None:
        # committed-parity mode: wphi eval checked against the public
        # generator-matrix commitment (sumcheck.cpp:2671-2886 analog) —
        # O(q log) verifier work, no expander traversal
        pd = parity.commit_parity(code)
        coeffs = F.fmul(u[:q], eq_q[:q])
        okp, state = parity.verify_claim(
            proof.p_parity, pd.root, proof.p_code.inner.final_evals[1],
            qrows, coeffs, code.codeword_len, pd.cw2, pd.n, ipt, state,
            sw_queries=sw_queries)
        ok = ok and bool(okp)
    else:
        # transparent wphi check: wphi[j, x] = u_j * (P^T eq(rho_j))[x].
        # rho_j are Boolean row indices, so eq(rho_j) is one-hot and all q
        # back-propagations batch into ONE encode_transpose call.
        want = F.fsum(F.fmul(F.fmul(u[:q], eq_q[:q]),
                             _phi_onehot_evals(code, qrows, rows, ipt)),
                      axis=0)
        ok = ok and bool(F.feq(proof.p_code.inner.final_evals[1], want))

    # tie sumcheck: claim = D~(point) = p_code final eval 0
    okt, pt2, cur2, state = sc.verify_product_sumcheck(
        proof.p_tie, proof.p_code.inner.final_evals[0], state, 2)
    ok = ok and bool(okt)
    lc_bits = int(np.log2(cols))
    z2, y2 = pt2[:lc_bits], pt2[lc_bits:]
    wC = F.root_of_unity(int(np.log2(2 * cols)))
    baseC = _pow_bases(jnp.asarray(np.array(wC, np.uint64)), qcols, 2 * cols)
    colfac_e = F.fsum(F.fmul(eq_q[:q], _dft_mle_batch(baseC, z2)), axis=0)
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


# ---------------------------------------------------------------------------
# Multi-point recursion: ONE recursion argument covering every opening point
# of an Elastic multi-open (plus arbitrary extra evaluation points of the
# per-point aggregates).  The P aggregates are concatenated into a single
# vector V of size P2*B (p-index in the HIGH bits under the low-bits-first
# fold convention), shockwave-committed once, and a single gamma-RLC'd
# 2-product sumcheck of size P2*B replaces P separate recursions; every
# aggregate evaluation the outer protocol needs becomes one point of the
# shared shockwave multi-open.  Replaces the reference's per-point
# recursive_prover_* calls (PC_utils.cpp:168-512) with a batched argument.
# ---------------------------------------------------------------------------


class MultiRecursionProof(NamedTuple):
    p_main: sc.SumcheckProof                 # <V, W'> (RS) or tie (Spielman)
    p_code: Optional[object]                 # Spielman batched code claim
    sw_multi: sw.ShockwaveMultiOpening       # cf at [pt] + eval + extra pts
    p_parity: Optional[parity.ParityProof] = None  # committed-P wphi check


def pad_points(P: int) -> int:
    """P2: pad the point count to a power of two (1 stays 1)."""
    return 1 << int(np.ceil(np.log2(max(1, P))))


def concat_aggregates(aggrs, min_len: int = 0):
    """[P, B, 2] -> V [P2*B, 2]: point index in the high bits.

    ``min_len`` pads V (with zero aggregates) up to a caller-chosen
    length so every multi-open in a proof shares ONE compiled shape for
    the shockwave commit/open and the merge sumcheck — the TPU AOT
    compile path charges minutes per distinct shape of those programs.
    Zero segments contribute nothing to any claim; the verifier pads
    identically (same rule from public geometry)."""
    P, B = aggrs.shape[0], aggrs.shape[1]
    P2 = padded_points(P, B, min_len)
    V = aggrs.reshape(P * B, 2)
    if P2 > P:
        V = jnp.concatenate(
            [V, jnp.zeros(((P2 - P) * B, 2), dtype=jnp.uint64)], axis=0)
    return V


def padded_points(P: int, B: int, min_len: int = 0) -> int:
    """Shared P2 rule: natural power-of-two pad, raised to min_len/B."""
    P2 = pad_points(P)
    if min_len:
        assert min_len % B == 0
        P2 = max(P2, min_len // B)
    return P2


def _pad_sw_points(pts, sw_pad: int):
    """Pad the shockwave point list to a fixed count by repeating the
    first (sumcheck) point: duplicate claims are harmless under the
    delta-RLC merge, and a fixed count means one compiled multi-open
    shape per proof.  Prover and verifier apply the same rule."""
    if sw_pad and len(pts) < sw_pad:
        pts = list(pts) + [pts[0]] * (sw_pad - len(pts))
    return pts


def _multi_sw_points(pt, x_los, extra_points, P2: int):
    """Shockwave opening points over V's domain: the sumcheck point, the P
    elastic evaluation points (x_lo_p ++ bool(p)), then the extras."""
    lpb = int(np.log2(P2))
    pts = [pt]
    for p, lo in enumerate(x_los):
        pts.append(jnp.concatenate([lo, _bool_point(p, lpb)], axis=0)
                   if lpb else lo)
    for pidx, lo in extra_points:
        pts.append(jnp.concatenate([lo, _bool_point(int(pidx), lpb)], axis=0)
                   if lpb else lo)
    return pts


def rs_prove_multi(V, cf: sw.ShockwaveData, B: int, x_los, extra_points,
                   qrows, qcols, rows: int, state,
                   sw_queries: int = sw.QUERIES, sw_pad: int = 0):
    """V = concat_aggregates(aggrs); cf = shockwave.commit(V) whose root the
    caller absorbed BEFORE deriving the queries.  Returns (proof, state)."""
    P2 = V.shape[0] // B
    cols = B // rows
    q = len(qrows)

    state, gam = mimc.squeeze1(state)
    gammas = poly.powers(gam, P2)
    state, s = mimc.squeeze1(state)
    u = poly.powers(s, q)
    wR = F.root_of_unity(int(np.log2(2 * rows)))
    wC = F.root_of_unity(int(np.log2(2 * cols)))
    baseR = _pow_bases(jnp.asarray(np.array(wR, np.uint64)), qrows, 2 * rows)
    baseC = _pow_bases(jnp.asarray(np.array(wC, np.uint64)), qcols, 2 * cols)

    W = _rlc_weight_matrix(u, baseR, baseC, rows, cols)
    Wp = F.fmul(gammas[:, None, None, :], W[None])     # [P2, rows, cols, 2]
    p_main, state = sc.prove_2product(V, Wp.reshape(P2 * B, 2), state)

    sw_pts = _multi_sw_points(p_main.challenges, x_los, extra_points, P2)
    sw_pts = _pad_sw_points(sw_pts, sw_pad)
    sw_open, state = sw.open_multi(cf, sw_pts, state, queries=sw_queries)
    return MultiRecursionProof(p_main, None, sw_open), state


def rs_verify_multi(proof: MultiRecursionProof, cf_root, comb_vals,
                    eval_claims, x_los, extra_points, qrows, qcols,
                    rows: int, B: int, state, sw_queries: int = sw.QUERIES,
                    v_min_len: int = 0, sw_pad: int = 0):
    """comb_vals: [P, q, 2] per-point beta-combined (Merkle-verified) query
    replies.  Returns (ok, extra_evals, state) with extra_evals the bound
    evaluations at `extra_points` (same order)."""
    P, q = comb_vals.shape[0], comb_vals.shape[1]
    P2 = padded_points(P, B, v_min_len)
    cols = B // rows
    lcb, lr, lpb = int(np.log2(cols)), int(np.log2(rows)), int(np.log2(P2))

    state, gam = mimc.squeeze1(state)
    gammas = poly.powers(gam, P2)
    state, s = mimc.squeeze1(state)
    u = poly.powers(s, q)
    claim = F.fsum(F.fsum(
        F.fmul(gammas[:P, None, :], F.fmul(u[None], comb_vals)),
        axis=0), axis=0)

    ok, pt, cur, state = sc.verify_product_sumcheck(proof.p_main, claim,
                                                    state, 2)
    z, y, w = pt[:lcb], pt[lcb:lcb + lr], pt[lcb + lr:]
    wR = F.root_of_unity(int(np.log2(2 * rows)))
    wC = F.root_of_unity(int(np.log2(2 * cols)))
    baseR = _pow_bases(jnp.asarray(np.array(wR, np.uint64)), qrows, 2 * rows)
    baseC = _pow_bases(jnp.asarray(np.array(wC, np.uint64)), qcols, 2 * cols)
    wantW = F.fsum(F.fmul(u, F.fmul(_dft_mle_batch(baseR, y),
                                    _dft_mle_batch(baseC, z))), axis=0)
    gmle = poly.evaluate_vector(gammas, w)
    ok = jnp.logical_and(ok, F.feq(proof.p_main.final_evals[1],
                                   F.fmul(gmle, wantW)))

    sw_pts = _multi_sw_points(pt, x_los, extra_points, P2)
    n_real = len(sw_pts)
    sw_pts = _pad_sw_points(sw_pts, sw_pad)
    k = _sw_k_multi(P2 * B)
    oks, state = sw.verify_multi(cf_root, proof.sw_multi, sw_pts, k, P2 * B,
                                 state, queries=sw_queries)
    ok = jnp.logical_and(ok, oks)
    swc = proof.sw_multi.eval_claims
    ok = jnp.logical_and(ok, F.feq(swc[0], proof.p_main.final_evals[0]))
    ok = jnp.logical_and(ok, jnp.all(F.feq(swc[1:1 + P],
                                           eval_claims[:P])))
    return ok, swc[1 + P:n_real], state


def spielman_prove_multi(V, cf: sw.ShockwaveData, aggrs, x_los, extra_points,
                         qrows, qcols, rows: int,
                         code: expanders.SpielmanCode, state,
                         sw_queries: int = sw.QUERIES,
                         use_parity: bool = True, sw_pad: int = 0):
    """Spielman-column multi-point recursion: the batched linear-code proof
    runs on the gamma-RLC'd aggregate A (prover-side only); the tie
    sumcheck binds <V, gammavec (x) Phi2>.  Returns (proof, state)."""
    P, B = aggrs.shape[0], aggrs.shape[1]
    P2 = V.shape[0] // B
    cols = B // rows
    q = len(qrows)
    qpad = _pad_pow2_count(q)
    cw_bits = int(np.log2(2 * rows))
    lr = int(np.log2(rows))

    state, gam = mimc.squeeze1(state)
    gammas = poly.powers(gam, P2)
    A = F.fsum(F.fmul(gammas[:P, None, :], aggrs), axis=0)       # [B, 2]
    state, s = mimc.squeeze1(state)
    u = poly.powers(s, qpad)

    mat = A.reshape(rows, cols, 2)
    ext_rows = enc.rs_encode(mat)                     # [rows, 2c, 2]
    zero_msg = jnp.zeros((rows, 2), dtype=jnp.uint64)
    msgs = [ext_rows[:, c] for c in qcols] + [zero_msg] * (qpad - q)
    rhos = [_bool_point(r, cw_bits) for r in qrows] + \
           [_bool_point(0, cw_bits)] * (qpad - q)
    weights = jnp.concatenate([u[:q], jnp.zeros((qpad - q, 2), jnp.uint64)])
    p_code, _, state = lc.prove_batch(code, msgs, rhos, weights, state)
    point = p_code.inner.challenges
    ipt, qpt = point[:lr], point[lr:]
    eq_q = poly.beta_table(qpt)

    p_parity = None
    if use_parity:
        coeffs = F.fmul(u[:q], eq_q[:q])
        pd = parity.commit_parity(code)
        p_parity, state = parity.prove_claim(pd, qrows, coeffs,
                                             code.codeword_len, ipt, state,
                                             sw_queries=sw_queries)

    wC = F.root_of_unity(int(np.log2(2 * cols)))
    baseC = _pow_bases(jnp.asarray(np.array(wC, np.uint64)), qcols, 2 * cols)
    colfac = F.fsum(F.fmul(eq_q[:q, None, :],
                           poly.powers_batch(baseC, cols)), axis=0)
    eq_i = poly.beta_table(ipt)
    Phi2 = F.fmul(eq_i[:, None, :], colfac[None, :, :])
    Phi2g = F.fmul(gammas[:, None, None, :], Phi2[None])
    p_tie, state = sc.prove_2product(V, Phi2g.reshape(P2 * B, 2), state)

    sw_pts = _multi_sw_points(p_tie.challenges, x_los, extra_points, P2)
    sw_pts = _pad_sw_points(sw_pts, sw_pad)
    sw_open, state = sw.open_multi(cf, sw_pts, state, queries=sw_queries)
    return MultiRecursionProof(p_tie, p_code, sw_open, p_parity), state


def spielman_verify_multi(proof: MultiRecursionProof, cf_root, comb_vals,
                          eval_claims, x_los, extra_points, qrows, qcols,
                          rows: int, B: int, code: expanders.SpielmanCode,
                          state, sw_queries: int = sw.QUERIES,
                          v_min_len: int = 0, sw_pad: int = 0):
    """Returns (ok, extra_evals, state)."""
    P, q = comb_vals.shape[0], comb_vals.shape[1]
    P2 = padded_points(P, B, v_min_len)
    cols = B // rows
    lcb, lr, lpb = int(np.log2(cols)), int(np.log2(rows)), int(np.log2(P2))
    qpad = _pad_pow2_count(q)

    state, gam = mimc.squeeze1(state)
    gammas = poly.powers(gam, P2)
    state, s = mimc.squeeze1(state)
    u = poly.powers(s, qpad)
    claim = F.fsum(F.fsum(
        F.fmul(gammas[:P, None, :], F.fmul(u[None, :q], comb_vals)),
        axis=0), axis=0)

    ok, point, cur, state = sc.verify_product_sumcheck(
        proof.p_code.inner, claim, state, 2)
    ipt, qpt = point[:lr], point[lr:]
    eq_q = poly.beta_table(qpt)
    if proof.p_parity is not None:
        pd = parity.commit_parity(code)
        coeffs = F.fmul(u[:q], eq_q[:q])
        okp, state = parity.verify_claim(
            proof.p_parity, pd.root, proof.p_code.inner.final_evals[1],
            qrows, coeffs, code.codeword_len, pd.cw2, pd.n, ipt, state,
            sw_queries=sw_queries)
        ok = jnp.logical_and(ok, okp)
    else:
        want = F.fsum(F.fmul(F.fmul(u[:q], eq_q[:q]),
                             _phi_onehot_evals(code, qrows, rows, ipt)),
                      axis=0)
        ok = jnp.logical_and(ok, F.feq(proof.p_code.inner.final_evals[1],
                                       want))

    okt, pt2, cur2, state = sc.verify_product_sumcheck(
        proof.p_main, proof.p_code.inner.final_evals[0], state, 2)
    ok = jnp.logical_and(ok, okt)
    z2 = pt2[:lcb]
    y2 = pt2[lcb:lcb + lr]
    w2 = pt2[lcb + lr:]
    wC = F.root_of_unity(int(np.log2(2 * cols)))
    baseC = _pow_bases(jnp.asarray(np.array(wC, np.uint64)), qcols, 2 * cols)
    colfac_e = F.fsum(F.fmul(eq_q[:q], _dft_mle_batch(baseC, z2)), axis=0)
    eq_i_e = _eq_eval(ipt, y2)
    gmle = poly.evaluate_vector(gammas, w2)
    ok = jnp.logical_and(ok, F.feq(proof.p_main.final_evals[1],
                                   F.fmul(gmle, F.fmul(eq_i_e, colfac_e))))

    sw_pts = _multi_sw_points(pt2, x_los, extra_points, P2)
    n_real = len(sw_pts)
    sw_pts = _pad_sw_points(sw_pts, sw_pad)
    k = _sw_k_multi(P2 * B)
    oks, state = sw.verify_multi(cf_root, proof.sw_multi, sw_pts, k, P2 * B,
                                 state, queries=sw_queries)
    ok = jnp.logical_and(ok, oks)
    swc = proof.sw_multi.eval_claims
    ok = jnp.logical_and(ok, F.feq(swc[0], proof.p_main.final_evals[0]))
    ok = jnp.logical_and(ok, jnp.all(F.feq(swc[1:1 + P],
                                           eval_claims[:P])))
    return ok, swc[1 + P:n_real], state


def _eq_eval(r1, r2):
    one = F.scalar(1)
    acc = one
    for j in range(r1.shape[0]):
        acc = F.fmul(acc, F.fadd(
            F.fmul(F.fsub(one, r1[j]), F.fsub(one, r2[j])),
            F.fmul(r1[j], r2[j])))
    return acc


# ---------------------------------------------------------------------------
# GROUP recursion: ONE shockwave commitment + ONE merge sumcheck + ONE
# inner WHIR covering the openings of SEVERAL Elastic commitments (of
# possibly different geometries).  Every (entry, point) pair becomes one
# B_slot-sized segment of the shared vector V; entry aggregates shorter
# than B_slot zero-pad (their MLE then carries (1-x) factors on the pad
# coords, which the verifier accounts for transparently).  Each
# standalone instance costs ~200-400 KB of queries/levels/paths at the
# production schedule, so merging n instances saves ~(n-1) of those.
# ---------------------------------------------------------------------------


class GroupEntry(NamedTuple):
    """Static geometry of one commitment in a group opening."""
    length: int          # polynomial length (K * B)
    K: int
    B: int
    rows: int
    cols: int
    queries: int
    n_points: int        # opened points
    n_extras: int        # extra (lane) evaluation points


class GroupRecursionProof(NamedTuple):
    p_main: sc.SumcheckProof                 # <V, W_full> merge sumcheck
    sw_multi: sw.ShockwaveMultiOpening       # cf at [pt] + all segments


def group_layout(entries):
    """(B_slot, segment ranges, P2): entry e's points occupy segments
    [seg0_e, seg0_e + n_points_e); extras follow all points."""
    B_slot = max(e.B for e in entries)
    segs = []
    s = 0
    for e in entries:
        segs.append(s)
        s += e.n_points
    P2 = pad_points(s)
    return B_slot, tuple(segs), s, P2


def _pad_lo(lo, lb_e: int, lb_slot: int):
    """Zero-extend an x_lo of lb_e coords to lb_slot (pad coords bind the
    zero-padded tail of the segment: MLE_pad(x || 0s) = MLE(x))."""
    if lb_e == lb_slot:
        return lo
    return jnp.concatenate(
        [lo, jnp.zeros((lb_slot - lb_e, 2), jnp.uint64)], axis=0)


def _group_sw_points(pt, entries, x_los_per_entry, extras_per_entry,
                     segs, P2: int, lb_slot: int):
    """Shockwave points over V's domain: merge-sumcheck point, then every
    (entry, point) segment evaluation, then every entry's extras."""
    lpb = int(np.log2(P2)) if P2 > 1 else 0
    pts = [pt]
    for ei, e in enumerate(entries):
        lb_e = int(np.log2(e.B))
        for p in range(e.n_points):
            lo = _pad_lo(x_los_per_entry[ei][p], lb_e, lb_slot)
            s = segs[ei] + p
            pts.append(jnp.concatenate([lo, _bool_point(s, lpb)], axis=0)
                       if lpb else lo)
    for ei, e in enumerate(entries):
        lb_e = int(np.log2(e.B))
        for pidx, lo in extras_per_entry[ei]:
            s = segs[ei] + int(pidx)
            lo = _pad_lo(lo, lb_e, lb_slot)
            pts.append(jnp.concatenate([lo, _bool_point(s, lpb)], axis=0)
                       if lpb else lo)
    return pts


def _entry_weight(e: GroupEntry, u, qrows, qcols):
    """Entry e's RLC weight matrix W_e [rows*cols, 2] from ITS query
    residues (indices shared across the group, moduli per geometry)."""
    wR = F.root_of_unity(int(np.log2(2 * e.rows)))
    wC = F.root_of_unity(int(np.log2(2 * e.cols)))
    baseR = _pow_bases(jnp.asarray(np.array(wR, np.uint64)),
                       qrows % (2 * e.rows), 2 * e.rows)
    baseC = _pow_bases(jnp.asarray(np.array(wC, np.uint64)),
                       qcols % (2 * e.cols), 2 * e.cols)
    return _rlc_weight_matrix(u, baseR, baseC, e.rows, e.cols), baseR, baseC


def _sw_k_group(V: int) -> int:
    """Shockwave row count for the GROUP commitment: column length capped
    at 2^16 (k = V/2^16).  Columns are what queries transmit (k*16 B per
    query), WHIR folds the cols-length aggregate; 2^16 balances the two
    at the production schedule while keeping every WHIR array under the
    TPU compile service's expensive-op threshold (~2^18).  The k >= 16
    floor keeps SMALL groups' column length <= V/16 — XLA:CPU hits a
    pathological "very slow compile" on the WHIR fold replay around
    cols = 2^14 (the test tier runs on CPU)."""
    return max(4, min(max(16, V >> 16), 1 << (int(np.log2(V)) // 2)))


def group_concat(entries, aggrs_per_entry, segs, P2: int, B_slot: int):
    """V [P2*B_slot, 2]: segment s = (entry e, point p) holds aggr_{e,p}
    zero-padded to B_slot; segments past the last point are zero."""
    parts = []
    for ei, e in enumerate(entries):
        a = aggrs_per_entry[ei]                      # [P_e, B_e, 2]
        if e.B < B_slot:
            a = jnp.concatenate(
                [a, jnp.zeros((a.shape[0], B_slot - e.B, 2), jnp.uint64)],
                axis=1)
        parts.append(a.reshape(-1, 2))
    n_seg = segs[-1] + entries[-1].n_points
    V = jnp.concatenate(parts, axis=0)
    if P2 > n_seg:
        V = jnp.concatenate(
            [V, jnp.zeros(((P2 - n_seg) * B_slot, 2), jnp.uint64)], axis=0)
    return V


def rs_prove_group(V, cf, entries, segs, P2: int, B_slot: int,
                   x_los_per_entry, extras_per_entry, qrows_raw, qcols_raw,
                   state, sw_queries: int = 240):
    """Merge sumcheck + shared shockwave multi-open for a group opening.

    qrows_raw/qcols_raw: UNREDUCED query draws (device ints) shared by
    the group — each entry reduces them mod its own row/column domains.
    The caller committed V with shockwave (cf) and absorbed the root
    BEFORE deriving the queries.  Returns (GroupRecursionProof, state)."""
    q = qrows_raw.shape[0]
    lbs = int(np.log2(B_slot))

    state, gam = mimc.squeeze1(state)
    gammas = poly.powers(gam, P2)
    state, s = mimc.squeeze1(state)
    u = poly.powers(s, q)

    W_parts = []
    for ei, e in enumerate(entries):
        W_e, _, _ = _entry_weight(e, u, qrows_raw, qcols_raw)
        W_flat = W_e.reshape(e.B, 2)
        if e.B < B_slot:
            W_flat = jnp.concatenate(
                [W_flat, jnp.zeros((B_slot - e.B, 2), jnp.uint64)], axis=0)
        for p in range(e.n_points):
            sI = segs[ei] + p
            W_parts.append(F.fmul(gammas[sI][None, :], W_flat))
    n_seg = segs[-1] + entries[-1].n_points
    W_full = jnp.concatenate(W_parts, axis=0)
    if P2 > n_seg:
        W_full = jnp.concatenate(
            [W_full, jnp.zeros(((P2 - n_seg) * B_slot, 2), jnp.uint64)],
            axis=0)

    import os as _os
    import sys as _sys
    import time as _t
    _trace = _os.environ.get("HOBBIT_TRACE") == "1"
    _tt = _t.perf_counter()
    p_main, state = sc.prove_2product(V, W_full, state)
    if _trace:
        jax.block_until_ready(state)
        print(f"[rsg] merge N={V.shape[0]}: {_t.perf_counter()-_tt:.2f}s",
              file=_sys.stderr, flush=True)
        _tt = _t.perf_counter()
    sw_pts = _group_sw_points(p_main.challenges, entries, x_los_per_entry,
                              extras_per_entry, segs, P2, lbs)
    sw_open, state = sw.open_multi(cf, sw_pts, state, queries=sw_queries)
    if _trace:
        jax.block_until_ready(state)
        print(f"[rsg] open_multi P={len(sw_pts)}: "
              f"{_t.perf_counter()-_tt:.2f}s", file=_sys.stderr, flush=True)
    return GroupRecursionProof(p_main, sw_open), state


def rs_verify_group(proof: GroupRecursionProof, cf_root, comb_per_entry,
                    eval_claims_per_entry, entries, segs, P2: int,
                    B_slot: int, x_los_per_entry, extras_per_entry,
                    qrows_raw, qcols_raw, state, sw_queries: int = 240):
    """Returns (ok, extra_evals_per_entry, state)."""
    q = qrows_raw.shape[0]
    lbs = int(np.log2(B_slot))
    n_seg = segs[-1] + entries[-1].n_points
    lpb = int(np.log2(P2)) if P2 > 1 else 0

    state, gam = mimc.squeeze1(state)
    gammas = poly.powers(gam, P2)
    state, s = mimc.squeeze1(state)
    u = poly.powers(s, q)

    claim = F.scalar(0)
    for ei, e in enumerate(entries):
        comb = comb_per_entry[ei]                    # [P_e, q, 2]
        part = F.fsum(F.fmul(u[None], comb), axis=1)  # [P_e, 2]
        for p in range(e.n_points):
            claim = F.fadd(claim,
                           F.fmul(gammas[segs[ei] + p], part[p]))

    ok, pt, cur, state = sc.verify_product_sumcheck(proof.p_main, claim,
                                                    state, 2)
    pt_lo, w = pt[:lbs], pt[lbs:]
    one = F.scalar(1)
    beta_w = poly.beta_table(w) if lpb else jnp.zeros((1, 2),
                                                      jnp.uint64).at[0, 0].set(1)
    want = F.scalar(0)
    for ei, e in enumerate(entries):
        lcb = int(np.log2(e.cols))
        lr = int(np.log2(e.rows))
        z_e, y_e = pt_lo[:lcb], pt_lo[lcb:lcb + lr]
        wR = F.root_of_unity(int(np.log2(2 * e.rows)))
        wC = F.root_of_unity(int(np.log2(2 * e.cols)))
        baseR = _pow_bases(jnp.asarray(np.array(wR, np.uint64)),
                           qrows_raw % (2 * e.rows), 2 * e.rows)
        baseC = _pow_bases(jnp.asarray(np.array(wC, np.uint64)),
                           qcols_raw % (2 * e.cols), 2 * e.cols)
        We_t = F.fsum(F.fmul(u, F.fmul(_dft_mle_batch(baseR, y_e),
                                       _dft_mle_batch(baseC, z_e))),
                      axis=0)
        for b in range(lcb + lr, lbs):               # zero-pad coords
            We_t = F.fmul(We_t, F.fsub(one, pt_lo[b]))
        for p in range(e.n_points):
            sI = segs[ei] + p
            want = F.fadd(want, F.fmul(F.fmul(gammas[sI], beta_w[sI]),
                                       We_t))
    ok = jnp.logical_and(ok, F.feq(proof.p_main.final_evals[1], want))

    sw_pts = _group_sw_points(pt, entries, x_los_per_entry,
                              extras_per_entry, segs, P2, lbs)
    k = _sw_k_group(P2 * B_slot)
    oks, state = sw.verify_multi(cf_root, proof.sw_multi, sw_pts, k,
                                 P2 * B_slot, state, queries=sw_queries)
    ok = jnp.logical_and(ok, oks)
    swc = proof.sw_multi.eval_claims
    ok = jnp.logical_and(ok, F.feq(swc[0], proof.p_main.final_evals[0]))
    for ei, e in enumerate(entries):
        for p in range(e.n_points):
            sI = segs[ei] + p
            ok = jnp.logical_and(
                ok, F.feq(swc[1 + sI], eval_claims_per_entry[ei][p]))
    # extra claims follow all segment claims, entry-major
    extra_evals = []
    base = 1 + n_seg
    for ei, e in enumerate(entries):
        extra_evals.append(swc[base:base + e.n_extras])
        base += e.n_extras
    return ok, tuple(extra_evals), state


__all__ = ["RSRecursionProof", "SpielmanRecursionProof",
           "MultiRecursionProof", "pad_points", "padded_points",
           "concat_aggregates",
           "rs_prove", "rs_verify", "spielman_prove", "spielman_verify",
           "rs_prove_multi", "rs_verify_multi",
           "spielman_prove_multi", "spielman_verify_multi"]
