"""Streaming fold-phase gate-consistency sumcheck.

Proves sum_{x} beta(r, x) * [add(x)*(L+R-O) + mul(x)*(L*R-O)] = 0 over an
N-gate trace in O(B) resident memory and TWO streaming passes (reference
``prove_gate_consistency``, sumcheck.cpp:796-981):

PASS 1 (fold): stream B-sized chunks; for each chunk emit the cross-term
"error" coefficients against the current fold buffers plus the chunk's own
term sums, absorb them, squeeze the chunk's fold weight w_i, and fold.
Exploits beta factorization beta_N(r,(x,i)) = beta_B(r_lo,x)*beta_K(r_hi,i):
the B-sized beta table is shared by all chunks and never folded.

IN-MEMORY: one mixed-degree sumcheck over the folded buffers proving
  w1*sum beta*sa*M + w2*sum beta*sm*L*R + w3*sum beta*sm*O = combined claim
with M = L+R-O (checked linearly from the L/R/O finals).

PASS 2 (bind): recompute per-chunk partial evaluations A_i(rho) and prove
fold_A(rho) = sum_i w_i * A_i(rho) with batched 2-product sumchecks against
the w vector, landing every stream on ONE point (rho, sigma) whose claimed
evaluations the caller checks against the witness / circuit commitments.

The verifier additionally recomputes the *true* claim
sum_i beta_K(i) * (S1_i + S2_i - S3_i) == 0 from the transmitted per-chunk
sums — Schwartz-Zippel over the w's forces those to be honest.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import numpy as np

import jax.numpy as jnp

from ..ops import field as F
from ..ops import mimc, poly
from ..streams.views import GateArrays
from . import sumcheck as sc

GROUPS_MEM = (("beta", "sa", "M"), ("beta", "sm", "L", "R"),
              ("beta", "sm", "O"))
BIND_NAMES = ("L", "R", "O", "sa", "sm")
GROUPS_BIND = tuple(("w", f"P{a}") for a in BIND_NAMES)


class GateConsistencyProof(NamedTuple):
    per_chunk: jnp.ndarray            # [K, 7, 2]
    mem_proof: sc.MixedSumcheckProof  # over folded buffers (point rho)
    bind_proof: sc.MixedSumcheckProof # over chunk partial evals (point sigma)
    stream_evals: dict                # name -> [2]: A(rho, sigma)


def _derived(ga: GateArrays):
    M = F.fsub(F.fadd(ga.L, ga.R), ga.O)
    return {"L": ga.L, "R": ga.R, "O": ga.O, "sa": ga.sel_add,
            "sm": ga.sel_mul, "M": M}


def _chunk_terms(beta, folds, cur):
    """Cross/pure coefficients for one chunk vs the fold state: 7 scalars."""
    b = beta
    s1_cross = F.fdot(b, F.fadd(F.fmul(folds["sa"], cur["M"]),
                                F.fmul(cur["sa"], folds["M"])))
    s1_pure = F.fdot(b, F.fmul(cur["sa"], cur["M"]))
    LbarRbar = F.fmul(folds["L"], folds["R"])
    LcRbar = F.fmul(cur["L"], folds["R"])
    LbarRc = F.fmul(folds["L"], cur["R"])
    LcRc = F.fmul(cur["L"], cur["R"])
    s2_k1 = F.fdot(b, F.fadd(F.fmul(cur["sm"], LbarRbar),
                             F.fmul(folds["sm"], F.fadd(LcRbar, LbarRc))))
    s2_k2 = F.fdot(b, F.fadd(F.fmul(folds["sm"], LcRc),
                             F.fmul(cur["sm"], F.fadd(LcRbar, LbarRc))))
    s2_pure = F.fdot(b, F.fmul(cur["sm"], LcRc))
    s3_cross = F.fdot(b, F.fadd(F.fmul(folds["sm"], cur["O"]),
                                F.fmul(cur["sm"], folds["O"])))
    s3_pure = F.fdot(b, F.fmul(cur["sm"], cur["O"]))
    return jnp.stack([s1_cross, s1_pure, s2_k1, s2_k2, s2_pure,
                      s3_cross, s3_pure])


from ..utils.jitting import maybe_jit


@maybe_jit
def _chunk_step(beta, folds, cur, C, state):
    """One fold-phase chunk: terms, FS absorb/squeeze, claim + fold update.
    One compiled kernel per shape — a single dispatch per streamed chunk.
    With an active mesh the B axis shards over every device (the per-chunk
    K-terms are segmented reductions; XLA inserts the psum)."""
    from ..parallel import mesh as meshmod
    beta = meshmod.shard_leading(beta)
    folds = {a: meshmod.shard_leading(v) for a, v in folds.items()}
    cur = {a: meshmod.shard_leading(v) for a, v in cur.items()}
    terms = _chunk_terms(beta, folds, cur)
    state, w = mimc.absorb_squeeze1(state, terms)
    w2 = F.fmul(w, w)
    w3 = F.fmul(w2, w)
    C0 = F.fadd(C[0], F.fadd(F.fmul(w, terms[0]), F.fmul(w2, terms[1])))
    C1 = F.fadd(C[1], F.fadd(F.fmul(w, terms[2]),
                             F.fadd(F.fmul(w2, terms[3]),
                                    F.fmul(w3, terms[4]))))
    C2 = F.fadd(C[2], F.fadd(F.fmul(w, terms[5]), F.fmul(w2, terms[6])))
    folds = {a: F.fadd(folds[a], F.fmul(w[None, :], cur[a])) for a in folds}
    return terms, w, folds, jnp.stack([C0, C1, C2]), state


@maybe_jit
def _bind_step(beta_rho, cur):
    return jnp.stack([F.fdot(beta_rho, cur[a]) for a in BIND_NAMES])


@maybe_jit
def _vchunk_step(terms, bk, C, true_claim, state):
    """Verifier-side per-chunk replay: one compiled kernel per shape."""
    state, w = mimc.absorb_squeeze1(state, terms)
    w2 = F.fmul(w, w)
    w3 = F.fmul(w2, w)
    C0 = F.fadd(C[0], F.fadd(F.fmul(w, terms[0]), F.fmul(w2, terms[1])))
    C1 = F.fadd(C[1], F.fadd(F.fmul(w, terms[2]),
                             F.fadd(F.fmul(w2, terms[3]),
                                    F.fmul(w3, terms[4]))))
    C2 = F.fadd(C[2], F.fadd(F.fmul(w, terms[5]), F.fmul(w2, terms[6])))
    s_i = F.fsub(F.fadd(terms[1], terms[4]), terms[6])
    true_claim = F.fadd(true_claim, F.fmul(bk, s_i))
    return w, jnp.stack([C0, C1, C2]), true_claim, state


def prove(chunk_fn: Callable[[int], GateArrays], num_chunks: int, B: int,
          r, state):
    """chunk_fn(i) -> GateArrays of size B (re-callable: pass 2 re-streams).

    r: [log2(num_chunks * B), 2] evaluation point.  num_chunks must be a
    power of two >= 2 (pad with empty chunks upstream).
    """
    K = num_chunks
    lb = int(np.log2(B))
    assert K >= 2 and (K & (K - 1)) == 0
    r_lo, r_hi = r[:lb], r[lb:]
    beta = poly.beta_table(r_lo)           # [B, 2], shared
    beta_K = poly.beta_table(r_hi)         # [K, 2]

    zeros = jnp.zeros((B, 2), dtype=jnp.uint64)
    folds = {a: zeros for a in ("L", "R", "O", "sa", "sm", "M")}
    ws = []
    per_chunk = []
    C = jnp.zeros((3, 2), dtype=jnp.uint64)

    for i in range(K):
        cur = _derived(chunk_fn(i))
        terms, w, folds, C, state = _chunk_step(beta, folds, cur, C, state)
        ws.append(w)
        per_chunk.append(terms)

    w_vec = jnp.stack(ws)                  # [K, 2]

    # ----- in-memory mixed sumcheck over folds ---------------------------
    state, gw = mimc.squeeze(state, 3)     # group RLC weights
    arrays = {"beta": beta, **folds}
    mem_proof, state = sc.prove_mixed(arrays, GROUPS_MEM, gw, state)
    rho = mem_proof.challenges             # [log B, 2]

    # ----- pass 2: binding -----------------------------------------------
    beta_rho = poly.beta_table(rho)
    Pmat = jnp.stack([_bind_step(beta_rho, _derived(chunk_fn(i)))
                      for i in range(K)])  # [K, 5, 2]
    bind_arrays = {"w": w_vec}
    for ai, a in enumerate(BIND_NAMES):
        bind_arrays[f"P{a}"] = Pmat[:, ai]
    state, uw = mimc.squeeze(state, len(BIND_NAMES))
    bind_proof, state = sc.prove_mixed(bind_arrays, GROUPS_BIND, uw, state)
    sigma = bind_proof.challenges          # [log K, 2]

    stream_evals = {a: bind_proof.final_evals[f"P{a}"] for a in BIND_NAMES}
    return GateConsistencyProof(
        per_chunk=jnp.stack(per_chunk), mem_proof=mem_proof,
        bind_proof=bind_proof, stream_evals=stream_evals,
    ), state


class GateConsistencyResult(NamedTuple):
    ok: jnp.ndarray
    point: jnp.ndarray       # [log N, 2] = (rho, sigma)
    stream_evals: dict       # claimed L/R/O/sa/sm evaluations at point


def verify(proof: GateConsistencyProof, B: int, r, state):
    """Replays the transcript; the returned stream_evals at `point` must be
    checked against the witness / circuit commitments by the caller."""
    K = proof.per_chunk.shape[0]
    lb = int(np.log2(B))
    r_lo, r_hi = r[:lb], r[lb:]
    beta_K = poly.beta_table(r_hi)
    ok = jnp.array(True)

    ws = []
    C = jnp.zeros((3, 2), dtype=jnp.uint64)
    true_claim = F.scalar(0)
    for i in range(K):
        w, C, true_claim, state = _vchunk_step(proof.per_chunk[i],
                                               beta_K[i], C, true_claim,
                                               state)
        ws.append(w)
    ok = jnp.logical_and(ok, F.feq(true_claim, F.scalar(0)))
    w_vec = jnp.stack(ws)
    C = [C[0], C[1], C[2]]

    state, gw = mimc.squeeze(state, 3)
    claim = F.fadd(F.fadd(F.fmul(gw[0], C[0]), F.fmul(gw[1], C[1])),
                   F.fmul(gw[2], C[2]))
    okm, rho, state = sc.verify_mixed(proof.mem_proof, claim, GROUPS_MEM,
                                      gw, state)
    ok = jnp.logical_and(ok, okm)
    fe = proof.mem_proof.final_evals
    # beta final eval must match eq(r_lo, rho); M must equal L+R-O
    ok = jnp.logical_and(ok, F.feq(fe["beta"], _eq_eval(r_lo, rho)))
    ok = jnp.logical_and(
        ok, F.feq(fe["M"], F.fsub(F.fadd(fe["L"], fe["R"]), fe["O"])))

    state, uw = mimc.squeeze(state, len(BIND_NAMES))
    bind_claim = None
    for ai, a in enumerate(BIND_NAMES):
        t = F.fmul(uw[ai], fe[a])
        bind_claim = t if bind_claim is None else F.fadd(bind_claim, t)
    okb, sigma, state = sc.verify_mixed(proof.bind_proof, bind_claim,
                                        GROUPS_BIND, uw, state)
    ok = jnp.logical_and(ok, okb)
    # w-vector MLE at sigma: verifier recomputes directly
    w_eval = poly.evaluate_vector(w_vec, sigma)
    ok = jnp.logical_and(ok, F.feq(proof.bind_proof.final_evals["w"], w_eval))

    point = jnp.concatenate([rho, sigma], axis=0)
    evals = {a: proof.bind_proof.final_evals[f"P{a}"] for a in BIND_NAMES}
    return GateConsistencyResult(ok=ok, point=point, stream_evals=evals), state


@maybe_jit
def _eq_eval(r1, r2):
    one = F.scalar(1)
    acc = one
    for j in range(r1.shape[0]):
        acc = F.fmul(acc, F.fadd(F.fmul(F.fsub(one, r1[j]), F.fsub(one, r2[j])),
                                 F.fmul(r1[j], r2[j])))
    return acc


# ---------------------------------------------------------------------------
# Lookup-aware variant (reference prove_gate_consistency_lookups,
# sumcheck.cpp:503-794) on the generic fold-phase engine: the identity
#   S(saL*L) + S(saR*R) + S(sm*L*R) - S(slkp*lkpO) - S(O) == 0
# binds lookup gates' streams (with FS weights lr0/lr1 inside saL/saR and
# lkpO) to the same evaluation point as the add/mul gates.
# ---------------------------------------------------------------------------

LOOKUP_NAMES = ("L", "R", "O", "saL", "saR", "sm", "slkp", "lkpO")
LOOKUP_GROUPS = (("saL", "L"), ("saR", "R"), ("sm", "L", "R"),
                 ("slkp", "lkpO"), ("O",))


def prove_lookups(chunk_fn: Callable[[int], dict], num_chunks: int, B: int,
                  r, state):
    """chunk_fn(i) -> dict of the LOOKUP_NAMES streams (size-B chunks; see
    views.gate_arrays_lookups).  Returns (FoldStreamProof, point, evals,
    state)."""
    from . import fold_stream as fs
    return fs.prove(chunk_fn, LOOKUP_NAMES, LOOKUP_GROUPS, num_chunks, B,
                    r, state)


def verify_lookups(proof, B: int, r, state):
    """Returns (ok, point, stream_evals, state); checks the gate identity
    over the per-group true sums."""
    from . import fold_stream as fs
    res, state = fs.verify(proof, B, r, state)
    S = res.group_sums
    lhs = F.fadd(F.fadd(S[0], S[1]), S[2])
    rhs = F.fadd(S[3], S[4])
    ok = jnp.logical_and(res.ok, F.feq(lhs, rhs))
    return ok, res.point, res.stream_evals, state


__all__ = ["GateConsistencyProof", "GateConsistencyResult", "prove",
           "verify", "prove_lookups", "verify_lookups",
           "LOOKUP_NAMES", "LOOKUP_GROUPS"]
