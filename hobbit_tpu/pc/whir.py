"""WHIR-style multilinear PC: sumcheck-driven FRI folding.

Reference ``whir_commit`` / ``_whir_prove`` (Virgo.cpp:160-178, 519-686):
commit the polynomial's coefficient form RS-extended x2, then alternate
k=4 eq-weighted sumcheck rounds (binding the evaluation claim) with FRI
fold-consistency queries between successively committed codewords, until
the polynomial is small enough to transmit.

Identities used (this framework's conventions, r_0 = LSB, r_j ~ X^(2^j)):
folding multilinear variable r_0 with challenge a maps coefficients
c' = c_even + a*c_odd, equivalently codeword values
f'(y^2) = (f(y)+f(-y))/2 + a*(f(y)-f(-y))/(2y) — the classic FRI fold
(reference ``fold``, Virgo.cpp:83-102).  Codewords are stored
coset-interleaved so one query's 16 preimage values are 4 adjacent Merkle
leaves (the reference's stride-16 shuffle, Virgo.cpp:169-176).

Query schedule: the reference targets ~100 bits per committed level via
``queries = 100 / log2(1/rate)`` (Virgo.cpp:544,584 — `repeats = 100;
//100-bit of security`).  Every level here re-encodes at rate 1/2, so the
same formula gives 100 in-domain queries per level — the default below.
Out-of-domain samples (the reference's "zetas", Virgo.cpp:560-651 /
compute_zetas:221-237) are implemented in both the single and batched
variants: after each level's commitment, one random point
z = (zeta, zeta^2, zeta^4, ...) is drawn, the prover transmits the
folded polynomial's evaluation there, and the claim is RLC-merged into
the running sumcheck constraint (beta += gamma*eq_z, claim += gamma*y).
This is exactly the reference's ``beta[j] += pow*_beta[j]; eval +=
pow*y[i]`` fold and supplies list-decoding binding on top of the
in-domain queries.
"""

from __future__ import annotations

import functools

from typing import List, NamedTuple, Tuple

import numpy as np

import jax.numpy as jnp

from ..ops import blake3
from ..ops import field as F
from ..ops import fft as fftm
from ..ops import merkle, mimc, poly
from ..utils.jitting import maybe_jit

K_FOLD = 4                      # variables folded per iteration
# Transmit the final polynomial below this many coefficients.  256 (vs
# the reference-style 64) keeps the transmitted tail at 4 KB while
# cutting the number of committed WHIR levels — each level costs a
# fixed block of TPU AOT compile time AND ~q Merkle paths of proof, so
# fewer levels is strictly better until the tail dominates Ps.
FINAL_SIZE = 1 << 8
QUERIES_PER_LEVEL = 100     # 100-bit target at rate 1/2 (Virgo.cpp:544)


class WhirCommitment(NamedTuple):
    codeword: jnp.ndarray       # [2n, 2] interleaved layout
    tree: merkle.MerkleTree
    n: int

    @property
    def root(self):
        return self.tree.root


class WhirLevel(NamedTuple):
    root: jnp.ndarray                  # [8] next codeword root
    queries: Tuple[int, ...]           # positions in the *next* domain
    cosets: jnp.ndarray                # [q, 16, 2] preimage values
    coset_paths: jnp.ndarray           # [q, 4, depth, 8] paths (4 leaves)
    next_leaves: jnp.ndarray           # [q, 4, 2] full Merkle leaf values
    next_paths: jnp.ndarray            # [q, depth, 8]
    ood_eval: Optional[jnp.ndarray] = None   # [2] MLE_v(zeta, zeta^2, ...)


class WhirProof(NamedTuple):
    sumcheck_polys: jnp.ndarray        # [rounds, 3, 2] quadratic coeffs
    levels: tuple                      # of WhirLevel
    final_poly: jnp.ndarray            # [FINAL, 2] coefficients (transmitted)


def _interleave(cw, groups: int = 1 << K_FOLD):
    """[m, 2] codeword -> coset-interleaved layout: the ``groups`` strided
    positions {p + t*m/groups} become consecutive."""
    m = cw.shape[0]
    return jnp.moveaxis(cw.reshape(groups, m // groups, 2), 0, 1).reshape(m, 2)


def _deinterleave_gather(cw_inter, positions, m: int,
                         groups: int = 1 << K_FOLD):
    """Gather the 16 coset values for each position p (of the folded domain
    m/groups): interleaved layout stores them at [p*groups + t]."""
    pos = jnp.asarray(positions, dtype=jnp.int32)
    idx = pos[:, None] * groups + jnp.arange(groups, dtype=jnp.int32)[None, :]
    return cw_inter[idx]                            # [q, groups, 2]


def _encode(coeffs):
    """coeffs [n, 2] -> interleaved RS codeword [2n, 2] + tree."""
    n = coeffs.shape[0]
    padded = jnp.concatenate(
        [coeffs, jnp.zeros((n, 2), dtype=coeffs.dtype)], axis=0)
    cw = fftm.fft(padded)
    inter = _interleave(cw)
    tree = merkle.commit_fields(inter)
    return inter, tree


def commit(values) -> WhirCommitment:
    """values: [n, 2] multilinear evaluations (hypercube)."""
    coeffs = poly.to_coefficient_form(values)
    inter, tree = _encode(coeffs)
    return WhirCommitment(codeword=inter, tree=tree, n=values.shape[0])


def _coset_fold(cosets, chals, positions, domain_log: int):
    """FRI-fold [q, 16, 2] coset values with 4 challenges -> [q, 2].

    positions: folded-domain positions p; level-i pair (t, t+8/2^i) sits at
    domain points +/- omega^(p + t*stride)."""
    q = cosets.shape[0]
    two_inv = F.make(*F.py_finv((2, 0)))
    m = 1 << domain_log                   # current (unfolded) domain size
    stride = m // (1 << K_FOLD)
    vals = cosets
    pos = np.asarray(positions, dtype=np.int64)
    cur_m = m
    cur_stride = stride
    for i in range(K_FOLD):
        half = vals.shape[1] // 2
        w = F.root_of_unity(int(np.log2(cur_m)))
        w_inv = F.py_finv(w)
        # y_t = omega^(p + t*cur_stride); 1/(y_t) = w_inv^(p + t*stride)
        exps = (pos[:, None] + np.arange(half)[None, :] * cur_stride)
        inv_y = _pow_table(w_inv, exps % cur_m)     # [q, half, 2]
        a, b = vals[:, :half], vals[:, half:]
        s = F.fmul(F.fadd(a, b), two_inv[None, None, :])
        d = F.fmul(F.fmul(F.fsub(a, b), two_inv[None, None, :]), inv_y)
        vals = F.fadd(s, F.fmul(chals[i][None, None, :], d))
        cur_m //= 2
        pos = pos % cur_m                 # y^2 position
        # stride stays: next level pairs are (t, t + half/2) in the kept half
    return vals[:, 0]


def _pow_table(base_py, exps):
    """base^exps for a python-int field tuple base and numpy int exps."""
    flat = exps.reshape(-1)
    uniq, inv = np.unique(flat, return_inverse=True)
    vals = np.zeros((len(uniq), 2), dtype=np.uint64)
    for i, e in enumerate(uniq):
        vals[i] = F.py_fpow(base_py, int(e))
    out = vals[inv].reshape(exps.shape + (2,))
    return jnp.asarray(out)


def prove(com: WhirCommitment, values, x, state,
          queries: int = QUERIES_PER_LEVEL):
    """Prove f~(x) = y for the committed values; returns (proof, y, state)."""
    n = com.n
    rounds_total = int(np.log2(n))
    beta = poly.beta_table(x)
    y = F.fdot(values, beta)

    v = values
    b = beta
    coeffs = poly.to_coefficient_form(values)
    cur_inter = com.codeword
    cur_tree = com.tree
    domain_log = int(np.log2(2 * n))

    sc_polys = []
    levels: List[WhirLevel] = []
    done = 0
    while v.shape[0] > FINAL_SIZE:
        chals = []
        for _ in range(K_FOLD):
            a1, b1 = F.fsub(v[1::2], v[0::2]), v[0::2]
            a2, b2 = F.fsub(b[1::2], b[0::2]), b[0::2]
            cA = F.fsum(F.fmul(a1, a2))
            cB = F.fadd(F.fsum(F.fmul(a1, b2)), F.fsum(F.fmul(a2, b1)))
            cC = F.fsum(F.fmul(b1, b2))
            coeffs3 = jnp.stack([cA, cB, cC])
            state, r = mimc.absorb_squeeze1(state, coeffs3)
            v = poly.fold_once(v, r)
            b = poly.fold_once(b, r)
            half = coeffs.shape[0] // 2
            ce = coeffs.reshape(half, 2, 2)
            coeffs = F.fadd(ce[:, 0], F.fmul(r[None, :], ce[:, 1]))
            sc_polys.append(coeffs3)
            chals.append(r)
        done += K_FOLD

        next_inter, next_tree = _encode(coeffs)
        state = mimc.absorb(state,
                            next_tree.root.astype(jnp.uint64).reshape(4, 2))
        # out-of-domain sample (the reference's zetas, Virgo.cpp:560-651 /
        # compute_zetas:221-237): bind the committed codeword at a random
        # point z = (zeta, zeta^2, zeta^4, ...) and RLC-merge the claim
        # into the running sumcheck constraint (beta += gamma*eq_z,
        # claim += gamma*y) — list-decoding binding on top of the
        # in-domain queries.
        state, zeta = mimc.squeeze1(state)
        zdims = int(np.log2(v.shape[0]))
        zc = [zeta]
        for _ in range(zdims - 1):
            zc.append(F.fmul(zc[-1], zc[-1]))
        zpt = jnp.stack(zc)                             # [zdims, 2]
        eqz = poly.beta_table(zpt)
        y_ood = F.fdot(v, eqz)
        state, gamma = mimc.absorb_squeeze1(state, y_ood.reshape(1, 2))
        b = F.fadd(b, F.fmul(gamma[None, :], eqz))
        state, qs = mimc.expand(state, queries)
        next_m = coeffs.shape[0] * 2
        positions = tuple(int(t) % next_m for t in np.asarray(qs)[:, 0])

        cosets = _deinterleave_gather(cur_inter, positions, 1 << domain_log)
        # coset leaves: interleaved index p*16 + t -> 4 leaves of 4 values;
        # one batched gather per tree (q*depth tiny dispatches otherwise)
        q = len(positions)
        cs_idx = [p * 4 + l for p in positions for l in range(4)]
        coset_paths = merkle.open_leaves(cur_tree, cs_idx)
        coset_paths = coset_paths.reshape(q, 4, *coset_paths.shape[1:])
        ii = np.asarray([_inter_index(p, next_m) for p in positions])
        row_idx = jnp.asarray((ii // 4)[:, None] * 4 + np.arange(4)[None, :])
        nleaves = next_inter[row_idx]                       # [q, 4, 2]
        next_paths = merkle.open_leaves(next_tree, (ii // 4).tolist())

        levels.append(WhirLevel(
            root=next_tree.root, queries=positions, cosets=cosets,
            coset_paths=coset_paths, next_leaves=nleaves,
            next_paths=next_paths, ood_eval=y_ood))
        cur_inter, cur_tree = next_inter, next_tree
        domain_log = int(np.log2(next_m))

    state = mimc.absorb(state, coeffs)
    sc_stack = (jnp.stack(sc_polys) if sc_polys
                else jnp.zeros((0, 3, 2), dtype=jnp.uint64))
    return WhirProof(
        sumcheck_polys=sc_stack, levels=tuple(levels),
        final_poly=coeffs,
    ), y, state


def _inter_index(p: int, m: int, groups: int = 1 << K_FOLD) -> int:
    """Position p of an m-sized codeword -> its index in interleaved layout."""
    return (p % (m // groups)) * groups + (p // (m // groups))


def verify(root, proof: WhirProof, x, y, state,
           queries: int = QUERIES_PER_LEVEL):
    """Returns (ok, state)."""
    from ..ops import blake3

    n = 1 << x.shape[0]
    ok = True
    claim = y
    eq_scalar = F.scalar(1)
    domain_log = int(np.log2(2 * n))
    cur_root = root
    cur_size = n
    ri = 0
    zero, one = F.scalar(0), F.scalar(1)
    done = 0
    oods = []        # [gamma, z-coords list, running eq factor, #consumed]

    for lvl in proof.levels:
        chals = []
        for _ in range(K_FOLD):
            c3 = proof.sumcheck_polys[ri]
            s0 = poly.eval_quadratic(c3, zero)
            s1 = poly.eval_quadratic(c3, one)
            ok = ok and bool(F.feq(F.fadd(s0, s1), claim))
            state, r = mimc.absorb_squeeze1(state, c3)
            claim = poly.eval_quadratic(c3, r)
            chals.append(r)
            # eq factor: beta fold at r against coordinate x_done
            xj = x[done]
            e = F.fadd(F.fmul(F.fsub(one, xj), F.fsub(one, r)),
                       F.fmul(xj, r))
            eq_scalar = F.fmul(eq_scalar, e)
            for c in oods:               # fold the OOD eq-vectors too
                zj = c[1][c[3]]
                ez = F.fadd(F.fmul(F.fsub(one, zj), F.fsub(one, r)),
                            F.fmul(zj, r))
                c[2] = F.fmul(c[2], ez)
                c[3] += 1
            done += 1
            ri += 1
        state = mimc.absorb(state, lvl.root.astype(jnp.uint64).reshape(4, 2))
        # out-of-domain sample (mirrors prove; Virgo.cpp:560-651)
        state, zeta = mimc.squeeze1(state)
        zdims = int(np.log2(cur_size // (1 << K_FOLD)))
        zc = [zeta]
        for _ in range(zdims - 1):
            zc.append(F.fmul(zc[-1], zc[-1]))
        y_ood = lvl.ood_eval
        ok = ok and y_ood is not None
        if y_ood is None:
            y_ood = jnp.zeros((2,), jnp.uint64)
        state, gamma = mimc.absorb_squeeze1(state, y_ood.reshape(1, 2))
        claim = F.fadd(claim, F.fmul(gamma, y_ood))
        oods.append([gamma, zc, one, 0])
        state, qs = mimc.expand(state, queries)
        next_m = (cur_size // (1 << K_FOLD)) * 2
        positions = tuple(int(t) % next_m for t in np.asarray(qs)[:, 0])
        ok = ok and positions == tuple(lvl.queries)

        # membership of the 16 coset values in the current tree — one
        # batched hash+verify over all q*4 leaves
        q = len(positions)
        coset_leaves = blake3.hash_field_leaves(
            lvl.cosets.reshape(q * 4, 4, 2))
        cs_idx = [p * 4 + l for p in positions for l in range(4)]
        okb = merkle.verify_leaves_batch(
            cur_root, coset_leaves, cs_idx,
            lvl.coset_paths.reshape(q * 4, -1, 8))
        ok = ok and bool(okb)

        # fold consistency against the next committed codeword
        folded = _coset_fold(lvl.cosets, chals, positions, domain_log)
        ii = np.asarray([_inter_index(p, next_m) for p in positions])
        picked = jnp.take_along_axis(
            lvl.next_leaves, jnp.asarray(ii % 4)[:, None, None], axis=1)[:, 0]
        ok = ok and bool(jnp.all(F.feq(folded, picked)))
        next_leaf_digests = blake3.hash_field_leaves(lvl.next_leaves)
        okb = merkle.verify_leaves_batch(
            lvl.root, next_leaf_digests, (ii // 4).tolist(), lvl.next_paths)
        ok = ok and bool(okb)

        cur_root = lvl.root
        cur_size //= 1 << K_FOLD
        domain_log = int(np.log2(next_m))

    state = mimc.absorb(state, proof.final_poly)
    # final: claim == eq_scalar * <vals, beta(x_rest)>
    #              + sum_c gamma_c * factor_c * <vals, beta(z_c rest)>
    vals = poly.from_coefficient_form(proof.final_poly)
    b_rest = poly.beta_table(x[done:])
    total = F.fmul(eq_scalar, F.fdot(vals, b_rest))
    for gamma, zc, factor, used in oods:
        bz = poly.beta_table(jnp.stack(zc[used:]))
        total = F.fadd(total,
                       F.fmul(F.fmul(gamma, factor), F.fdot(vals, bz)))
    ok = ok and bool(F.feq(total, claim))
    return ok, state


__all__ = ["WhirCommitment", "WhirProof", "commit", "prove", "verify",
           "WhirBatchProof", "prove_batch", "verify_batch",
           "K_FOLD", "FINAL_SIZE", "QUERIES_PER_LEVEL"]


# ---------------------------------------------------------------------------
# Instance-batched WHIR: prove/verify I same-size instances SIMULTANEOUSLY.
#
# The recursion layer opens dozens of equal-size aggregates per proof
# (shockwave multi-opens: two WHIR proofs per point per commitment).  Run
# sequentially, each proof's per-level Fiat-Shamir forces its own
# device->host round trip (~0.5s on a remote-attached chip) — the round
# trips, not the math, dominated the measured open phase.  Here every
# instance carries its own transcript branch (sub_i = MiMC(i+1, seed)
# forked off the parent state; the final branch states are absorbed back),
# all per-round hashing/folding/encoding/tree-building is vectorized over
# the instance axis, and query positions for ALL instances cross the link
# in ONE transfer per level.
# ---------------------------------------------------------------------------

class WhirBatchLevel(NamedTuple):
    roots: jnp.ndarray                 # [I, 8] next codeword roots
    queries: jnp.ndarray               # [I, q] positions (next domain)
    cosets: jnp.ndarray                # [I, q, 16, 2]
    coset_paths: jnp.ndarray           # [I, q*4, depth, 8]
    next_leaves: jnp.ndarray           # [I, q, 4, 2]
    next_paths: jnp.ndarray            # [I, q, depth, 8]
    ood_evals: Optional[jnp.ndarray] = None   # [I, 2] out-of-domain evals


class WhirBatchProof(NamedTuple):
    sumcheck_polys: jnp.ndarray        # [I, rounds, 3, 2]
    levels: tuple                      # of WhirBatchLevel
    final_polys: jnp.ndarray           # [I, FINAL, 2]
    n: int


def _pow_table_full(logm: int, inverse: bool = True):
    """Full [m, 2] power table of (the inverse of) the order-2^logm root,
    computed ON DEVICE by log-depth doubling: a host table would embed an
    m-entry constant into the lowered program, which the TPU AOT compile
    path serializes at ~1 s/MB (see utils/closure.py)."""
    w = F.root_of_unity(logm)
    if inverse:
        w = F.py_finv(w)
    return poly.powers(jnp.asarray(np.array(w, dtype=np.uint64)), 1 << logm)


def _inter_index_dev(p, m: int, groups: int = 1 << K_FOLD):
    """Device version of _inter_index (elementwise on int arrays)."""
    return (p % (m // groups)) * groups + p // (m // groups)


def _fork(state, I: int):
    """Parent state -> (advanced parent, [I, 2] per-instance branches)."""
    state, seed = mimc.squeeze1(state)
    ctr = jnp.zeros((I, 2), dtype=jnp.uint64)
    ctr = ctr.at[:, 0].set(jnp.arange(1, I + 1, dtype=jnp.uint64))
    return state, mimc.mimc_hash(ctr, seed[None, :])


def _babsorb(subs, vals):
    """Absorb vals [I, m, 2] element-chains into per-instance states.

    One flattened m*161-step scan over all rounds of all elements (the
    per-element loop lowered one 161-round While each; see
    mimc._absorb_chain)."""
    import jax

    I, m = vals.shape[0], vals.shape[1]
    if m == 0:
        return subs
    R = mimc.ROUNDS
    cs = jnp.concatenate(
        [jnp.zeros((1, 2), jnp.uint64), jnp.asarray(mimc._COMMON)], axis=0)
    cs = jnp.tile(cs, (m, 1))                       # [m*161, 2]
    ks = jnp.repeat(vals, R, axis=1)                # [I, m*161, 2]
    step_i = jnp.arange(m * R, dtype=jnp.int32)
    first = (step_i % R) == 0
    last = (step_i % R) == (R - 1)

    def step(carry, xs):
        h, out = carry                              # [I, 2] each
        k, c, fst, lst = xs
        x = jnp.where(fst, out, h)
        h2 = mimc._cube(F.fadd(F.fadd(x, k), c[None]))
        out2 = jnp.where(lst, F.fadd(h2, k), out)
        return (h2, out2), None

    (_, subs), _ = jax.lax.scan(
        step, (jnp.zeros_like(subs), subs),
        (jnp.moveaxis(ks, 1, 0), cs, first, last))
    return subs


def _bsqueeze(subs):
    k = F.scalar(mimc.K_MIMC)
    subs = mimc.mimc_hash(subs, k[None, :])
    return subs, subs


def _bexpand(subs, q: int):
    """Per-instance counter-mode query expansion; [I, q, 2]."""
    k = F.scalar(mimc.K_MIMC)
    seeds = mimc.mimc_hash(subs, k[None, :])
    ctr = jnp.zeros((q, 2), dtype=jnp.uint64)
    ctr = ctr.at[:, 0].set(jnp.arange(1, q + 1, dtype=jnp.uint64))
    outs = mimc.mimc_hash(ctr[None, :, :], seeds[:, None, :])
    return seeds, outs


def _batch_encode(coeffs):
    """[I, n, 2] -> (interleaved codewords [I, 2n, 2], BatchMerkleTree)."""
    I, n = coeffs.shape[0], coeffs.shape[1]
    padded = jnp.concatenate(
        [coeffs, jnp.zeros_like(coeffs)], axis=1)
    cw = fftm._batch_fft(padded, inverse=False)
    g = 1 << K_FOLD
    inter = jnp.moveaxis(cw.reshape(I, g, 2 * n // g, 2), 1, 2) \
        .reshape(I, 2 * n, 2)
    return inter, merkle.batch_commit_fields(inter)


def _norm_points(xs, gammas, I: int):
    """Normalize xs to [I, M, bits, 2] and gammas to [I, M, 2]."""
    xs = jnp.asarray(xs, dtype=jnp.uint64)
    if xs.ndim == 3:
        xs = xs[:, None]
    M = xs.shape[1]
    if gammas is None:
        gammas = jnp.zeros((I, M, 2), dtype=jnp.uint64).at[:, :, 0].set(1)
    return xs, jnp.asarray(gammas, dtype=jnp.uint64)


def prove_batch(values, xs, state, queries: int = QUERIES_PER_LEVEL,
                gammas=None):
    """Prove gamma-combined claims sum_j gamma_ij f_i~(x_ij) = y_i for I
    instances; returns (proof, ys, state).

    values [I, n, 2]; xs [I, log2 n, 2] (single claim per instance) or
    [I, M, log2 n, 2] with gammas [I, M, 2] (M weighted claims per
    instance — the weight vector is sum_j gamma_ij beta_{x_ij}, still
    multilinear, so the folding run is unchanged).  The level-0
    commitments are the caller's: their roots must be absorbed into
    `state` beforehand (the caller typically just committed them);
    level-0 codewords/trees are recomputed here batched.

    The entire folding run (encodes, tree builds, transcript, query
    gathers) is ONE compiled program per shape — on the remote-attached
    device the eager version paid a dispatch round trip per op."""
    I, n = values.shape[0], values.shape[1]
    xs, gammas = _norm_points(xs, gammas, I)
    sc_stack, levels, final, ys, state = _prove_batch_impl(
        values, xs, gammas, state, queries)
    return WhirBatchProof(sumcheck_polys=sc_stack, levels=levels,
                          final_polys=final, n=n), ys, state




def _batch_eq_table(zpt):
    """Batched eq table: zpt [I, k, 2] -> [I, 2^k, 2] with
    B[i, x] = prod_j (x_j ? z_ij : 1 - z_ij), bit j of x <-> z_ij."""
    I = zpt.shape[0]
    one = F.scalar(1)
    eqz = jnp.zeros((I, 1, 2), dtype=jnp.uint64).at[:, :, 0].set(1)
    for j in range(zpt.shape[1]):
        zj = zpt[:, j]
        eqz = jnp.concatenate(
            [F.fmul(eqz, F.fsub(one[None], zj)[:, None, :]),
             F.fmul(eqz, zj[:, None, :])], axis=1)
    return eqz


def _batch_ood_point(zeta, zdims: int):
    """[I, 2] zeta -> [I, zdims, 2] point (zeta, zeta^2, zeta^4, ...)."""
    zc = [zeta]
    for _ in range(zdims - 1):
        zc.append(F.fmul(zc[-1], zc[-1]))
    return jnp.stack(zc, axis=1)

@maybe_jit(static_argnums=(4,))
def _prove_batch_impl(values, xs, gammas, state, queries: int):
    import jax

    I, n = values.shape[0], values.shape[1]
    # [I, M, n, 2] beta tables in ONE vectorized instantiation
    ball = jax.vmap(jax.vmap(poly.beta_table))(xs)
    beta = F.fsum(F.fmul(gammas[:, :, None, :], ball), axis=1)
    ys = F.fsum(F.fmul(values, beta), axis=1)

    coeffs = poly.to_coefficient_form_batch(values)
    cur_inter, cur_tree = _batch_encode(coeffs)
    domain_log = int(np.log2(2 * n))

    state, subs = _fork(state, I)
    v, b = values, beta
    sc_polys = []
    levels: List[WhirBatchLevel] = []
    while v.shape[1] > FINAL_SIZE:
        # K_FOLD sumcheck rounds as ONE masked scan: arrays keep their
        # level-entry width with a zero-filled tail (zeros self-mask in
        # every coefficient sum and fold), so the round body lowers once
        # instead of K_FOLD times — compile cost on the TPU AOT service
        # is per lowered op.  Transcripts identical to the unrolled form.
        import jax

        def round_body(carry, _):
            v, b, coeffs, subs = carry
            a1, b1 = F.fsub(v[:, 1::2], v[:, 0::2]), v[:, 0::2]
            a2, b2 = F.fsub(b[:, 1::2], b[:, 0::2]), b[:, 0::2]
            cA = F.fsum(F.fmul(a1, a2), axis=1)
            cB = F.fadd(F.fsum(F.fmul(a1, b2), axis=1),
                        F.fsum(F.fmul(a2, b1), axis=1))
            cC = F.fsum(F.fmul(b1, b2), axis=1)
            coeffs3 = jnp.stack([cA, cB, cC], axis=1)      # [I, 3, 2]
            subs = _babsorb(subs, coeffs3)
            subs, r = _bsqueeze(subs)
            rb = r[:, None, :]
            v2 = F.fadd(b1, F.fmul(rb, a1))
            b2f = F.fadd(b2, F.fmul(rb, a2))
            ce = coeffs.reshape(coeffs.shape[0], coeffs.shape[1] // 2, 2, 2)
            c2 = F.fadd(ce[:, :, 0], F.fmul(rb[:, :, :], ce[:, :, 1]))
            v = jnp.concatenate([v2, jnp.zeros_like(v2)], axis=1)
            b = jnp.concatenate([b2f, jnp.zeros_like(b2f)], axis=1)
            coeffs = jnp.concatenate([c2, jnp.zeros_like(c2)], axis=1)
            return (v, b, coeffs, subs), (coeffs3, r)

        (v, b, coeffs, subs), (c3s, rs) = jax.lax.scan(
            round_body, (v, b, coeffs, subs), None, length=K_FOLD)
        m2 = v.shape[1] >> K_FOLD
        v, b = v[:, :m2], b[:, :m2]
        coeffs = coeffs[:, : coeffs.shape[1] >> K_FOLD]
        sc_polys.extend(list(c3s))                 # [K_FOLD] x [I, 3, 2]

        next_inter, next_tree = _batch_encode(coeffs)
        subs = _babsorb(
            subs, next_tree.roots.astype(jnp.uint64).reshape(I, 4, 2))
        # out-of-domain sample per instance (Virgo.cpp:560-651)
        subs, zeta = _bsqueeze(subs)
        zpt = _batch_ood_point(zeta, int(np.log2(v.shape[1])))
        eqz = _batch_eq_table(zpt)
        y_ood = F.fsum(F.fmul(v, eqz), axis=1)             # [I, 2]
        subs = _babsorb(subs, y_ood[:, None, :])
        subs, gamma = _bsqueeze(subs)
        b = F.fadd(b, F.fmul(gamma[:, None, :], eqz))
        subs, qs = _bexpand(subs, queries)
        next_m = coeffs.shape[1] * 2
        pos_d = (qs[:, :, 0] % next_m).astype(jnp.int64)   # stays on device

        g = 1 << K_FOLD
        cs_idx = pos_d[:, :, None] * g + jnp.arange(g)[None, None, :]
        cosets = jnp.take_along_axis(
            cur_inter, cs_idx.reshape(I, -1)[:, :, None], axis=1) \
            .reshape(I, queries, g, 2)
        leaf_idx = (pos_d[:, :, None] * 4
                    + jnp.arange(4)[None, None, :]).reshape(I, -1)
        coset_paths = merkle.batch_open_leaves(cur_tree, leaf_idx)
        ii = _inter_index_dev(pos_d, next_m)
        row_idx = (ii // 4)[:, :, None] * 4 \
            + jnp.arange(4, dtype=jnp.int64)[None, None, :]
        nleaves = jnp.take_along_axis(
            next_inter, row_idx.reshape(I, -1)[:, :, None], axis=1) \
            .reshape(I, queries, 4, 2)
        next_paths = merkle.batch_open_leaves(next_tree, ii // 4)
        levels.append(WhirBatchLevel(
            roots=next_tree.roots, queries=pos_d, cosets=cosets,
            coset_paths=coset_paths, next_leaves=nleaves,
            next_paths=next_paths, ood_evals=y_ood))
        cur_inter, cur_tree = next_inter, next_tree
        domain_log = int(np.log2(next_m))

    subs = _babsorb(subs, coeffs)
    state = mimc.absorb(state, subs)                 # rejoin the branches
    sc_stack = (jnp.stack(sc_polys, axis=1) if sc_polys
                else jnp.zeros((I, 0, 3, 2), dtype=jnp.uint64))
    return sc_stack, tuple(levels), coeffs, ys, state


def _batch_coset_fold(cosets, chals, positions, domain_log: int):
    """[I, q, 16, 2] coset values folded with per-instance challenge
    lists; positions stay on DEVICE (full inverse-root power tables are
    host-precomputed per size and indexed on device).  Returns
    [I, q, 2]."""
    two_inv = F.make(*F.py_finv((2, 0)))
    m = 1 << domain_log
    stride = m // (1 << K_FOLD)
    vals = cosets
    pos = jnp.asarray(positions, dtype=jnp.int64)
    cur_m = m
    for i in range(K_FOLD):
        half = vals.shape[2] // 2
        table = _pow_table_full(int(np.log2(cur_m)))
        exps = (pos[:, :, None]
                + jnp.arange(half, dtype=jnp.int64)[None, None, :] * stride)
        inv_y = table[exps % cur_m]                 # [I, q, half, 2]
        a, b = vals[:, :, :half], vals[:, :, half:]
        s = F.fmul(F.fadd(a, b), two_inv[None, None, None, :])
        d = F.fmul(F.fmul(F.fsub(a, b), two_inv[None, None, None, :]),
                   inv_y)
        vals = F.fadd(s, F.fmul(chals[i][:, None, None, :], d))
        cur_m //= 2
        pos = pos % cur_m
    return vals[:, :, 0]


def verify_batch(roots0_absorbed, proof: WhirBatchProof, xs, ys, state,
                 queries: int = QUERIES_PER_LEVEL, gammas=None):
    """Verify an I-instance batch; returns (ok, state) with ok a DEVICE
    boolean (force it once, at the caller's final aggregation point).

    roots0_absorbed: [I, 8] level-0 roots (must already be bound into
    `state` by the caller, mirroring prove_batch).  With multi-claim
    instances (xs [I, M, bits, 2], gammas [I, M, 2]) `ys` is [I, M, 2]
    and the verified claim is the gamma-combination."""
    I = proof.final_polys.shape[0]
    xs, gammas = _norm_points(xs, gammas, I)
    ys = jnp.asarray(ys, dtype=jnp.uint64)
    if ys.ndim == 2:
        ys = ys[:, None]
    return _verify_batch_impl(roots0_absorbed, proof.sumcheck_polys,
                              proof.levels, proof.final_polys, xs, gammas,
                              ys, state, queries, proof.n)


@maybe_jit(static_argnums=(8, 9))
def _verify_batch_impl(roots0, sc_polys, levels, final_polys, xs, gammas,
                       ys, state, queries: int, n: int):
    I = final_polys.shape[0]
    M = xs.shape[1]
    ok = jnp.array(True)
    state, subs = _fork(state, I)
    claims = F.fsum(F.fmul(gammas, ys), axis=1)            # [I, 2]
    one = F.scalar(1)
    eq_scalar = jnp.zeros((I, M, 2), dtype=jnp.uint64).at[:, :, 0].set(1)
    domain_log = int(np.log2(2 * n))
    cur_roots = roots0
    cur_size = n
    ri = 0
    done = 0
    oods = []        # [gamma [I,2], zpt [I,k,2], factor [I,2], #consumed]

    for lvl in levels:
        chals = []
        for _ in range(K_FOLD):
            c3 = sc_polys[:, ri]                           # [I, 3, 2]
            s0 = c3[:, 2]
            s1 = F.fadd(F.fadd(c3[:, 0], c3[:, 1]), c3[:, 2])
            ok = jnp.logical_and(ok, jnp.all(F.feq(F.fadd(s0, s1), claims)))
            subs = _babsorb(subs, c3)
            subs, r = _bsqueeze(subs)
            claims = F.fadd(F.fmul(F.fadd(F.fmul(c3[:, 0], r), c3[:, 1]),
                                   r), c3[:, 2])
            xj = xs[:, :, done]                            # [I, M, 2]
            e = F.fadd(F.fmul(F.fsub(one[None, None], xj),
                              F.fsub(one[None, None], r[:, None])),
                       F.fmul(xj, r[:, None]))
            eq_scalar = F.fmul(eq_scalar, e)
            for c in oods:               # fold the OOD eq-vectors too
                zj = c[1][:, c[3]]
                ez = F.fadd(F.fmul(F.fsub(one[None], zj),
                                   F.fsub(one[None], r)),
                            F.fmul(zj, r))
                c[2] = F.fmul(c[2], ez)
                c[3] += 1
            chals.append(r)
            done += 1
            ri += 1
        subs = _babsorb(
            subs, lvl.roots.astype(jnp.uint64).reshape(I, 4, 2))
        # out-of-domain sample (mirrors _prove_batch_impl)
        subs, zeta = _bsqueeze(subs)
        zpt = _batch_ood_point(zeta, int(np.log2(cur_size // (1 << K_FOLD))))
        y_ood = lvl.ood_evals
        subs = _babsorb(subs, y_ood[:, None, :])
        subs, gamma = _bsqueeze(subs)
        claims = F.fadd(claims, F.fmul(gamma, y_ood))
        ood_one = jnp.zeros((I, 2), dtype=jnp.uint64).at[:, 0].set(1)
        oods.append([gamma, zpt, ood_one, 0])
        subs, qs = _bexpand(subs, queries)
        next_m = (cur_size // (1 << K_FOLD)) * 2
        positions = (qs[:, :, 0] % next_m).astype(jnp.int64)
        ok = jnp.logical_and(ok, jnp.all(
            positions == lvl.queries.astype(jnp.int64)))
        q = queries

        coset_leaves = blake3.hash_field_leaves(
            lvl.cosets.reshape(I * q * 4, 4, 2)).reshape(I, q * 4, 8)
        leaf_idx = (positions[:, :, None] * 4
                    + jnp.arange(4, dtype=jnp.int64)[None, None, :]) \
            .reshape(I, -1)
        ok = jnp.logical_and(ok, merkle.batch_verify_leaves(
            cur_roots, coset_leaves, leaf_idx, lvl.coset_paths))

        folded = _batch_coset_fold(lvl.cosets, chals, positions,
                                   domain_log)
        ii = _inter_index_dev(positions, next_m)
        picked = jnp.take_along_axis(
            lvl.next_leaves, (ii % 4)[:, :, None, None],
            axis=2)[:, :, 0]
        ok = jnp.logical_and(ok, jnp.all(F.feq(folded, picked)))
        nl_digests = blake3.hash_field_leaves(
            lvl.next_leaves.reshape(I * q, 4, 2)).reshape(I, q, 8)
        ok = jnp.logical_and(ok, merkle.batch_verify_leaves(
            lvl.roots, nl_digests, ii // 4, lvl.next_paths))

        cur_roots = lvl.roots
        cur_size //= 1 << K_FOLD
        domain_log = int(np.log2(next_m))

    subs = _babsorb(subs, final_polys)
    state = mimc.absorb(state, subs)
    # final: claim_i == sum_j gamma_ij eq_ij * <final values_i, beta(x_ij_rest)>
    finals = jnp.stack([poly.from_coefficient_form(final_polys[i])
                        for i in range(I)])
    b_rest = jnp.stack([jnp.stack([poly.beta_table(xs[i, j, done:])
                                   for j in range(M)]) for i in range(I)])
    inner = F.fsum(F.fmul(finals[:, None], b_rest), axis=2)   # [I, M, 2]
    total = F.fsum(F.fmul(gammas, F.fmul(eq_scalar, inner)), axis=1)
    for gamma, zpt, factor, used in oods:
        bz = _batch_eq_table(zpt[:, used:])
        iz = F.fsum(F.fmul(finals, bz), axis=1)               # [I, 2]
        total = F.fadd(total, F.fmul(F.fmul(gamma, factor), iz))
    ok = jnp.logical_and(ok, jnp.all(F.feq(total, claims)))
    return ok, state
