"""Virgo-style VPD (verifiable polynomial delegation) + univariate FRI.

TPU-native re-design of the vendored Virgo stack (reference
``virgo_fri.cpp`` (rate 2^-3, 33 queries, ``constants.h:20-29``),
``virgo_vpd_{prover,verifier}.cpp``, ``virgo_poly_commit.h``, wrappers
``virgo_commit/virgo_open``, virgo_PC.cpp:83-189):

Commit: the multilinear coefficient vector c (length n) is interpreted as
evaluations over the subgroup H = <w_n>; its low-degree extension u(X) is
evaluated on the disjoint coset L = eta * <w_{8n}> (rate 1/8) and Merkle-
committed (pair leaves (y, -y) so FRI queries open one leaf per level).

Open at x: y = f~(x) = sum_j c_j chi_j(x) = sum_{a in H} u(a) chi_hat(a)
with chi_hat the LDE over H of the tensor vector chi_j = prod_b x_b^(j_b).
The univariate sumcheck (Aurora/Virgo) decomposes
    u(X) chi_hat(X) = q(X) (X^n - 1) + X p(X) + y/n ,
the prover commits q and p on L, the verifier spot-checks the identity at
FRI query positions and an RLC'd FRI low-degree test over
w = u + alpha q + alpha^2 p + alpha^3 (X p) binds the degrees.  The
shifted term X*p(X) shares p's commitment (pointwise s*p(s) on the
domain) and is what enforces deg(p) <= n-2 individually: the joint FRI
bound deg < n on X*p pins p below n-1, closing the q' = q - d,
p' = p + d X^(n-1) forgery that a bound on p alone would admit.
chi_hat at query points is
computed transparently (one IFFT + Horner per query — the linear-verifier
model; the reference offloads this to its FFT-GKR tool).

FRI fold: f'(x^2) = (f(y)+f(-y))/2 + a (f(y)-f(-y))/(2y), the same algebra
as the reference's ``fold`` (Virgo.cpp:83-102); level l lives on
eta^(2^l) * <w_{L/2^l}>.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import numpy as np

import jax.numpy as jnp

from ..ops import blake3
from ..ops import fft as fftm
from ..ops import field as F
from ..ops import merkle, mimc, poly

RATE_BITS = 3                 # rate 2^-3 (constants.h:20)
QUERIES = 33                  # constants.h:26
FRI_FINAL_LOG = 4             # stop folding at degree < 2^4


def chi_table(x):
    """chi_j(x) = prod_b x_b^(bit b of j), j in [0, 2^|x|): the
    coefficient-basis analog of the eq table."""
    one = F.scalar(1)
    acc = jnp.stack([one])
    for b in range(x.shape[0]):
        scaled = F.fmul(acc, x[b][None, :])
        acc = jnp.concatenate([acc, scaled], axis=0)
    return acc


@functools.lru_cache(maxsize=None)
def _eta_pow(exp_log: int) -> tuple:
    """eta^(2^exp_log) as a python pair; eta = a 2^61-order element, so
    every eta^(2^l) stays outside the (much smaller) FFT subgroups and the
    coset L = eta^(2^l) <w> never meets H."""
    e = F.root_of_unity(61)
    for _ in range(exp_log):
        e = F.py_fmul(e, e)
    return e


def coset_eval(coeffs, domain_log: int, eta_log: int = 0):
    """Evaluate sum c_j X^j on eta^(2^eta_log) * <w_{2^domain_log}>."""
    n = coeffs.shape[0]
    L = 1 << domain_log
    eta = jnp.asarray(np.array(_eta_pow(eta_log), dtype=np.uint64))
    scaled = F.fmul(coeffs, poly.powers(eta, n))
    padded = jnp.concatenate(
        [scaled, jnp.zeros((L - n, 2), dtype=jnp.uint64)], axis=0)
    return fftm.fft(padded)


@functools.lru_cache(maxsize=None)
def _domain_inv_half(domain_log: int, eta_log: int):
    """[L/2, 2]: 1/(eta^(2^eta_log) w^i) for the first half of the domain."""
    L = 1 << domain_log
    w = F.root_of_unity(domain_log)
    cur = _eta_pow(eta_log)
    out = np.zeros((L // 2, 2), dtype=np.uint64)
    for i in range(L // 2):
        out[i] = F.py_finv(cur)
        cur = F.py_fmul(cur, w)
    return jnp.asarray(out)


def _domain_point(domain_log: int, eta_log: int, i: int):
    w = F.root_of_unity(domain_log)
    return jnp.asarray(np.array(
        F.py_fmul(_eta_pow(eta_log), F.py_fpow(w, i)), dtype=np.uint64))


@functools.lru_cache(maxsize=None)
def _domain_points(domain_log: int, eta_log: int = 0):
    """[L, 2] all points eta^(2^eta_log) * w^i of the level domain."""
    w = jnp.asarray(np.array(F.root_of_unity(domain_log), dtype=np.uint64))
    eta = jnp.asarray(np.array(_eta_pow(eta_log), dtype=np.uint64))
    return F.fmul(poly.powers(w, 1 << domain_log), eta[None, :])


def _pair_leaves(cw):
    """[L, 2] codeword -> [L/2, 4, 2] leaves (f(y), f(-y), 0, 0)."""
    half = cw.shape[0] // 2
    pairs = jnp.stack([cw[:half], cw[half:]], axis=1)
    pad = jnp.zeros((half, 2, 2), dtype=jnp.uint64)
    return jnp.concatenate([pairs, pad], axis=1)


def commit_codeword(cw) -> merkle.MerkleTree:
    return merkle.build_from_digests(blake3.hash_field_leaves(_pair_leaves(cw)))


_INV2 = None


def _inv2():
    global _INV2
    if _INV2 is None:
        _INV2 = jnp.asarray(np.array(F.py_finv((2, 0)), dtype=np.uint64))
    return _INV2


def _fold(cw, a, domain_log: int, eta_log: int):
    half = cw.shape[0] // 2
    fy, fny = cw[:half], cw[half:]
    inv2 = _inv2()
    even = F.fmul(F.fadd(fy, fny), inv2[None, :])
    odd = F.fmul(F.fmul(F.fsub(fy, fny), inv2[None, :]),
                 _domain_inv_half(domain_log, eta_log))
    return F.fadd(even, F.fmul(a[None, :], odd))


class FriProof(NamedTuple):
    roots: tuple                 # levels 1..T commitments
    final_coeffs: jnp.ndarray    # [final, 2] transmitted polynomial
    query_idx: Tuple[int, ...]   # level-0 half-domain positions
    level_pairs: tuple           # levels 1..T: [q, 4, 2] opened pair leaves
    level_paths: tuple           # levels 1..T: paths


def fri_prove(codeword, state, queries: int = QUERIES,
              final_log: int = FRI_FINAL_LOG):
    """LDT for degree < L/2^RATE_BITS on level-0 domain eta*<w_L>.

    The caller has absorbed its own level-0 commitment(s); level-0 query
    values are the caller's to provide at verify time."""
    domain_log = int(np.log2(codeword.shape[0]))
    cws, trees, roots = [codeword], [], []
    cur = codeword
    dl, el = domain_log, 0
    while dl - RATE_BITS > final_log:
        state, a = mimc.squeeze1(state)
        cur = _fold(cur, a, dl, el)
        dl -= 1
        el += 1
        tree = commit_codeword(cur)
        state = mimc.absorb(state, tree.root.astype(jnp.uint64).reshape(4, 2))
        cws.append(cur)
        trees.append(tree)
        roots.append(tree.root)

    # transmit the final polynomial's coefficients (degree bound enforced
    # by sending exactly 2^final_log of them)
    eta_inv = F.py_finv(_eta_pow(el))
    coeffs = fftm.ifft(cur)
    unscale = np.zeros((1 << final_log, 2), dtype=np.uint64)
    c = (1, 0)
    for j in range(1 << final_log):
        unscale[j] = c
        c = F.py_fmul(c, eta_inv)
    final = F.fmul(coeffs[: 1 << final_log], jnp.asarray(unscale))
    state = mimc.absorb(state, final)

    state, qs = mimc.expand(state, queries)
    half0 = codeword.shape[0] // 2
    idx = tuple(int(v) % half0 for v in np.asarray(qs)[:, 0])

    level_pairs, level_paths = [], []
    pos = np.asarray(idx)
    for li in range(1, len(cws)):
        half = cws[li].shape[0] // 2
        p = pos % half if half else pos * 0
        leaves = _pair_leaves(cws[li])[jnp.asarray(p, dtype=jnp.int32)]
        paths = merkle.open_leaves(trees[li - 1], [int(v) for v in p])
        level_pairs.append(leaves)
        level_paths.append(paths)
        pos = p
    return FriProof(roots=tuple(roots), final_coeffs=final, query_idx=idx,
                    level_pairs=tuple(level_pairs),
                    level_paths=tuple(level_paths)), state


def verify_fri(level0_pairs, proof: FriProof, domain_log0: int, state,
               queries: int = QUERIES, final_log: int = FRI_FINAL_LOG):
    """level0_pairs: [q, 2, 2] caller-authenticated (f(y), f(-y)) at the
    query positions.  Returns (ok, state)."""
    ok = True
    chals = []
    for r in proof.roots:
        state, a = mimc.squeeze1(state)
        chals.append(a)
        state = mimc.absorb(state, r.astype(jnp.uint64).reshape(4, 2))
    state = mimc.absorb(state, proof.final_coeffs)

    state, qs = mimc.expand(state, queries)
    half0 = 1 << (domain_log0 - 1)
    idx = tuple(int(v) % half0 for v in np.asarray(qs)[:, 0])
    ok = ok and idx == tuple(proof.query_idx)
    T = len(proof.roots)

    pos = np.asarray(idx)
    dl, el = domain_log0, 0
    pairs = level0_pairs
    inv2 = _inv2()
    for li in range(T + 1):
        half = 1 << (dl - 1)
        p = pos % half
        s_inv = _domain_inv_half(dl, el)
        for qi in range(len(idx)):
            fy, fny = pairs[qi, 0], pairs[qi, 1]
            even = F.fmul(F.fadd(fy, fny), inv2)
            odd = F.fmul(F.fmul(F.fsub(fy, fny), inv2), s_inv[int(p[qi])])
            if li < T:
                want = F.fadd(even, F.fmul(chals[li], odd))
                nhalf = half // 2
                np_, slot = int(p[qi]) % nhalf, int(p[qi]) // nhalf
                got = proof.level_pairs[li][qi, slot]
                ok = ok and bool(F.feq(want, got))
                digest = blake3.hash_field_leaves(
                    proof.level_pairs[li][qi][None])[0]
                if not merkle.verify_leaf(proof.roots[li], digest, np_,
                                          proof.level_paths[li][qi]):
                    ok = False
        if li < T:
            # next level's pairs for the following fold check
            pairs = proof.level_pairs[li][:, :2]
            pos = pos % half
            dl -= 1
            el += 1
        else:
            # last level: opened values must match the transmitted poly
            for qi in range(len(idx)):
                pt = _domain_point(dl, el, int(pos[qi] % half))
                want = poly.univariate_eval(proof.final_coeffs, pt)
                ok = ok and bool(F.feq(want, pairs[qi, 0]))
                pt2 = _domain_point(dl, el, int(pos[qi] % half) + half)
                want2 = poly.univariate_eval(proof.final_coeffs, pt2)
                ok = ok and bool(F.feq(want2, pairs[qi, 1]))
    return ok, state


# ---------------------------------------------------------------------------
# VPD: multilinear PC on top of FRI
# ---------------------------------------------------------------------------

class VpdCommitment(NamedTuple):
    u_cw: jnp.ndarray            # [8n, 2] codeword of u on L
    tree: merkle.MerkleTree
    n: int

    @property
    def root(self):
        return self.tree.root


class VpdOpening(NamedTuple):
    eval_claim: jnp.ndarray      # y = f~(x)
    q_root: jnp.ndarray
    p_root: jnp.ndarray
    fri: FriProof
    u_pairs: jnp.ndarray         # [q, 4, 2] openings of u at FRI positions
    u_paths: jnp.ndarray
    q_pairs: jnp.ndarray
    q_paths: jnp.ndarray
    p_pairs: jnp.ndarray
    p_paths: jnp.ndarray


def vpd_commit(coeffs) -> VpdCommitment:
    """coeffs: [n, 2] multilinear coefficient vector (n a power of two)."""
    n = coeffs.shape[0]
    # u = LDE over H of the vector: IFFT on H -> coefficients -> eval on L
    u_coeffs = fftm.ifft(coeffs)
    u_cw = coset_eval(u_coeffs, int(np.log2(n)) + RATE_BITS)
    return VpdCommitment(u_cw=u_cw, tree=commit_codeword(u_cw), n=n)


def _decompose(m_coeffs, n: int):
    """m = q (X^n - 1) + r: wrap-around coefficient folding."""
    L = m_coeffs.shape[0]
    qc = jnp.zeros((L, 2), dtype=jnp.uint64)
    r = m_coeffs
    # degree of m < 2n - 1 <= L: single wrap suffices when L >= 2n
    hi = m_coeffs[n:]
    r = F.fadd(m_coeffs[:n], hi[:n]) if hi.shape[0] >= n else F.fadd(
        m_coeffs[:n],
        jnp.concatenate([hi, jnp.zeros((n - hi.shape[0], 2), jnp.uint64)]))
    q = hi
    return q, r


def vpd_open(coeffs, com: VpdCommitment, x, state,
             queries: int = QUERIES):
    """Prove f~(x); returns (VpdOpening, state)."""
    n = com.n
    ln = int(np.log2(n))
    dl = ln + RATE_BITS
    chi = chi_table(x)                               # [n, 2]
    y = F.fdot(coeffs, chi)

    u_coeffs = fftm.ifft(coeffs)
    g_coeffs = fftm.ifft(chi)
    # m = u * g via pointwise mult on a 2n-sized subgroup evaluation
    big = 1 << (ln + 1)
    ue = fftm.fft(jnp.concatenate(
        [u_coeffs, jnp.zeros((big - n, 2), jnp.uint64)]))
    ge = fftm.fft(jnp.concatenate(
        [g_coeffs, jnp.zeros((big - n, 2), jnp.uint64)]))
    m_coeffs = fftm.ifft(F.fmul(ue, ge))             # deg <= 2n-2
    q_c, r_c = _decompose(m_coeffs, n)
    # r(X) = y/n + X p(X)
    ninv = jnp.asarray(np.array(F.py_finv((n % F.P, 0)), dtype=np.uint64))
    p_c = r_c[1:]

    q_cw = coset_eval(q_c, dl)
    p_cw = coset_eval(p_c, dl)
    q_tree = commit_codeword(q_cw)
    p_tree = commit_codeword(p_cw)

    state = mimc.absorb(state, y)
    state = mimc.absorb(state, q_tree.root.astype(jnp.uint64).reshape(4, 2))
    state = mimc.absorb(state, p_tree.root.astype(jnp.uint64).reshape(4, 2))
    state, alpha = mimc.squeeze1(state)
    a2 = F.fmul(alpha, alpha)
    a3 = F.fmul(a2, alpha)
    # X*p(X) on the domain = pointwise s * p(s); shares p's commitment but
    # carries the individual deg(p) <= n-2 bound (see module docstring)
    dom = _domain_points(dl)
    xp_cw = F.fmul(dom, p_cw)
    w_cw = F.fadd(F.fadd(com.u_cw, F.fmul(alpha[None, :], q_cw)),
                  F.fadd(F.fmul(a2[None, :], p_cw),
                         F.fmul(a3[None, :], xp_cw)))

    fri, state = fri_prove(w_cw, state, queries=queries)

    pos = np.asarray(fri.query_idx, dtype=np.int64)
    lid = [int(v) for v in pos]
    u_pairs = _pair_leaves(com.u_cw)[jnp.asarray(lid, jnp.int32)]
    q_pairs = _pair_leaves(q_cw)[jnp.asarray(lid, jnp.int32)]
    p_pairs = _pair_leaves(p_cw)[jnp.asarray(lid, jnp.int32)]
    return VpdOpening(
        eval_claim=y, q_root=q_tree.root, p_root=p_tree.root, fri=fri,
        u_pairs=u_pairs, u_paths=merkle.open_leaves(com.tree, lid),
        q_pairs=q_pairs, q_paths=merkle.open_leaves(q_tree, lid),
        p_pairs=p_pairs, p_paths=merkle.open_leaves(p_tree, lid),
    ), state


def vpd_verify(root, x, opening: VpdOpening, n: int, state,
               queries: int = QUERIES):
    """Returns (ok, state)."""
    ln = int(np.log2(n))
    dl = ln + RATE_BITS
    ok = True
    y = opening.eval_claim

    state = mimc.absorb(state, y)
    state = mimc.absorb(state, opening.q_root.astype(jnp.uint64).reshape(4, 2))
    state = mimc.absorb(state, opening.p_root.astype(jnp.uint64).reshape(4, 2))
    state, alpha = mimc.squeeze1(state)
    a2 = F.fmul(alpha, alpha)
    a3 = F.fmul(a2, alpha)

    # chi_hat coefficients (transparent O(n log n))
    chi = chi_table(x)
    g_coeffs = fftm.ifft(chi)
    ninv = jnp.asarray(np.array(F.py_finv((n % F.P, 0)), dtype=np.uint64))
    y_over_n = F.fmul(y, ninv)

    # level-0 pairs of w + per-query identity checks
    half0 = 1 << (dl - 1)
    w_pairs = []
    for qi, pidx in enumerate(opening.fri.query_idx):
        for (pairs, paths, root_) in ((opening.u_pairs, opening.u_paths, root),
                                      (opening.q_pairs, opening.q_paths,
                                       opening.q_root),
                                      (opening.p_pairs, opening.p_paths,
                                       opening.p_root)):
            digest = blake3.hash_field_leaves(pairs[qi][None])[0]
            if not merkle.verify_leaf(root_, digest, pidx, paths[qi]):
                ok = False
        wp = []
        for slot in range(2):
            i = pidx + slot * half0
            s = _domain_point(dl, 0, i)
            u_s = opening.u_pairs[qi, slot]
            q_s = opening.q_pairs[qi, slot]
            p_s = opening.p_pairs[qi, slot]
            g_s = poly.univariate_eval(g_coeffs, s)
            zh = F.fsub(F.fpow(s, n), F.scalar(1))
            lhs = F.fmul(u_s, g_s)
            rhs = F.fadd(F.fadd(F.fmul(q_s, zh), F.fmul(s, p_s)), y_over_n)
            ok = ok and bool(F.feq(lhs, rhs))
            wp.append(F.fadd(F.fadd(u_s, F.fmul(alpha, q_s)),
                             F.fadd(F.fmul(a2, p_s),
                                    F.fmul(a3, F.fmul(s, p_s)))))
        w_pairs.append(jnp.stack(wp))
    w_pairs = jnp.stack(w_pairs)

    okf, state = verify_fri(w_pairs, opening.fri, dl, state,
                            queries=queries)
    ok = ok and bool(okf)
    return ok, state


__all__ = ["chi_table", "FriProof", "fri_prove", "verify_fri",
           "VpdCommitment", "VpdOpening", "vpd_commit", "vpd_open",
           "vpd_verify", "QUERIES", "RATE_BITS", "coset_eval",
           "commit_codeword"]
