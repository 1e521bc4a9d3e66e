"""Streaming multiplication-tree product argument (O(B)-resident).

TPU-native re-design of the reference's
``prove_multiplication_tree_stream_shallow`` (sumcheck.cpp:1746-1915) +
``generate_3product_sumcheck_beta_stream_batch[_optimized]``
(sumcheck.cpp:1150-1621): prove the products of V vectors whose
concatenation is a stream of N field elements that is never materialized.

Structure (bottom = level 0 = the raw stream; level l+1 pairs-multiplies
level l):

  1. TOP    fold the stream to the 2B-sized level ``layers`` on the fly
            (reference ``read_mul_tree_layer``, witness_stream.cpp:2415) and
            run the in-memory multiplication tree over it
            (``prove_multiplication_tree_new``).
  2. LEVELS for l = layers-1 .. 0 prove the tree descent
            V_{l+1}(r) = sum_z eq(r, z) * V_l(z,0) * V_l(z,1)
            streamingly with the fold-phase machinery: per 2B-chunk emit
            cross/pure coefficients (K1, K2), absorb, fold with the squeezed
            chunk weight; an in-memory 3-product sumcheck over the folded
            buffers; a binding pass of per-chunk partial evaluations tied
            to the fold weights (the same two-pass pattern as the streaming
            gate consistency).  Each level consumes TWO passes over the
            level-l stream and O(B) device memory.
  3. COMMIT intermediate levels (0 < l < layers) are Elastic-PC-committed
            up front and opened at their chained claim points (reference
            ``commit_layers``/``open_layers``, sumcheck.cpp:983-1011); the
            level-0 claim is returned for the caller to bind against the
            witness / circuit commitments.

The per-chunk heavy math (dot products against the shared beta table, the
fold update) is pure vectorized VPU work; only the 2-scalar MiMC absorb per
chunk is sequential, so chunks are kept large (B = buffer space).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Sequence, Tuple

import numpy as np

import jax.numpy as jnp

from ..ops import field as F
from ..ops import mimc, poly
from ..utils.jitting import maybe_jit
from . import mul_tree
from . import sumcheck as sc

BIND_GROUPS = (("w", "PA"), ("w", "PB"))


@maybe_jit
def _level_chunk_step(beta, foldA, foldB, C, c, state):
    """One level fold-phase chunk (terms, absorb, squeeze, fold): one
    compiled kernel per shape."""
    A, Bv = c[0::2], c[1::2]
    k1 = F.fdot(beta, F.fadd(F.fmul(foldA, Bv), F.fmul(A, foldB)))
    k2 = F.fdot(beta, F.fmul(A, Bv))
    terms = jnp.stack([k1, k2])
    state, w = mimc.absorb_squeeze1(state, terms)
    C = F.fadd(C, F.fadd(F.fmul(w, k1), F.fmul(F.fmul(w, w), k2)))
    foldA = F.fadd(foldA, F.fmul(w[None, :], A))
    foldB = F.fadd(foldB, F.fmul(w[None, :], Bv))
    return terms, w, foldA, foldB, C, state


@maybe_jit
def _level_bind_step(beta_rho, c):
    return F.fdot(beta_rho, c[0::2]), F.fdot(beta_rho, c[1::2])


class LevelProof(NamedTuple):
    per_chunk: jnp.ndarray            # [K, 2, 2]: (K1 cross, K2 pure)
    mem_proof: sc.SumcheckProof       # 3-product (foldA, foldB, beta) -> rho
    bind_proof: sc.MixedSumcheckProof # chunk partial evals -> sigma


class StreamMulTreeProof(NamedTuple):
    top_proof: mul_tree.MulTreeProof
    level_proofs: Tuple[LevelProof, ...]   # level layers-1 down to 0
    num_layers: int
    chunk_size: int                        # B
    vectors: int
    size: int                              # per-vector length
    layer_roots: tuple                     # elastic roots (levels layers-1..1)
    layer_openings: tuple

    @property
    def output(self):
        return self.top_proof.output


# ---------------------------------------------------------------------------
# Oracles
# ---------------------------------------------------------------------------

def flat_oracle(flat, piece: int = 1 << 20) -> Callable:
    """Reference oracle over a materialized level-0 array ``flat`` [N, 2].

    chunk(level, i, csize) -> [csize, 2] values of the level-`level` product
    tree, computed by folding raw pieces so device-resident intermediates
    stay bounded even for deep levels.
    """
    flat = jnp.asarray(flat)

    def chunk(level: int, i: int, csize: int):
        span = csize << level
        raw = flat[i * span:(i + 1) * span]
        if level == 0:
            return raw
        step = max(1 << level, min(piece, span))
        outs = []
        for s in range(0, span, step):
            seg = raw[s:s + step].reshape(-1, 1 << level, 2)
            outs.append(F.fprod(seg, axis=1))
        return jnp.concatenate(outs, axis=0)

    return chunk


# ---------------------------------------------------------------------------
# Streaming level descent
# ---------------------------------------------------------------------------

def _mt_tick(name, t0, sync=None):
    import os
    import sys
    import time as _t
    if os.environ.get("HOBBIT_TRACE") == "1":
        if sync is not None:
            import jax
            jax.block_until_ready(sync)
        print(f"[mt] {name}: {_t.perf_counter() - t0:.2f}s",
              file=sys.stderr, flush=True)
    import time as _t2
    return _t2.perf_counter()


def _prove_level(cfn: Callable[[int], jnp.ndarray], K: int, B: int,
                 r, claim, state):
    """One tree-descent level: proves claim = sum_z eq(r,z) A(z) B(z) where
    A/B are the even/odd halves of the level stream (K chunks of 2B).

    Returns (LevelProof, new_point, new_claim, state)."""
    import time as _t
    t0 = _t.perf_counter()
    lb = int(np.log2(B))
    r_lo, r_hi = r[:lb], r[lb:]
    beta = poly.beta_table(r_lo)                      # [B, 2], shared

    zeros = jnp.zeros((B, 2), dtype=jnp.uint64)
    foldA, foldB = zeros, zeros
    ws, per_chunk = [], []
    C = F.scalar(0)
    for i in range(K):
        terms, w, foldA, foldB, C, state = _level_chunk_step(
            beta, foldA, foldB, C, cfn(i), state)
        ws.append(w)
        per_chunk.append(terms)
    w_vec = jnp.stack(ws)
    t0 = _mt_tick(f"level chunks K={K}", t0, state)

    # in-memory cubic sumcheck over the folds: sum_x foldA foldB beta = C
    mem_proof, state = sc.prove_3product(foldA, foldB, beta, state)
    rho = mem_proof.challenges                        # [log B, 2]
    t0 = _mt_tick("level mem3", t0, state)

    # pass 2: binding — per-chunk partial evals vs the w vector
    beta_rho = poly.beta_table(rho)
    PA, PB = [], []
    for i in range(K):
        pa, pb = _level_bind_step(beta_rho, cfn(i))
        PA.append(pa)
        PB.append(pb)
    bind_arrays = {"w": w_vec, "PA": jnp.stack(PA), "PB": jnp.stack(PB)}
    t0 = _mt_tick("level binds", t0, bind_arrays["PA"])
    state, uw = mimc.squeeze(state, 2)
    bind_proof, state = sc.prove_mixed(bind_arrays, BIND_GROUPS, uw, state)
    t0 = _mt_tick("level mixed", t0, state)
    sigma = bind_proof.challenges                     # [log K, 2]

    eA = bind_proof.final_evals["PA"]
    eB = bind_proof.final_evals["PB"]
    state, cmix = mimc.squeeze1(state)
    one = F.scalar(1)
    new_claim = F.fadd(F.fmul(F.fsub(one, cmix), eA), F.fmul(cmix, eB))
    new_point = jnp.concatenate([cmix[None, :], rho, sigma], axis=0)
    return LevelProof(jnp.stack(per_chunk), mem_proof, bind_proof), \
        new_point, new_claim, state


def _verify_level(lp: LevelProof, B: int, r, claim, state):
    """Replay one level; returns (ok, new_point, new_claim, state)."""
    K = lp.per_chunk.shape[0]
    lb = int(np.log2(B))
    r_lo, r_hi = r[:lb], r[lb:]
    beta_K = poly.beta_table(r_hi)
    ok = jnp.array(True)

    ws = []
    C = F.scalar(0)
    true_claim = F.scalar(0)
    for i in range(K):
        terms = lp.per_chunk[i]
        state, w = mimc.absorb_squeeze1(state, terms)
        w2 = F.fmul(w, w)
        C = F.fadd(C, F.fadd(F.fmul(w, terms[0]), F.fmul(w2, terms[1])))
        true_claim = F.fadd(true_claim, F.fmul(beta_K[i], terms[1]))
        ws.append(w)
    ok = jnp.logical_and(ok, F.feq(true_claim, claim))
    w_vec = jnp.stack(ws)

    okm, rho, _, state = sc.verify_product_sumcheck(lp.mem_proof, C, state, 3)
    ok = jnp.logical_and(ok, okm)
    fe = lp.mem_proof.final_evals
    ok = jnp.logical_and(ok, F.feq(fe[2], _eq_eval(r_lo, rho)))

    state, uw = mimc.squeeze(state, 2)
    bind_claim = F.fadd(F.fmul(uw[0], fe[0]), F.fmul(uw[1], fe[1]))
    okb, sigma, state = sc.verify_mixed(lp.bind_proof, bind_claim,
                                        BIND_GROUPS, uw, state)
    ok = jnp.logical_and(ok, okb)
    w_eval = poly.evaluate_vector(w_vec, sigma)
    ok = jnp.logical_and(ok, F.feq(lp.bind_proof.final_evals["w"], w_eval))

    eA = lp.bind_proof.final_evals["PA"]
    eB = lp.bind_proof.final_evals["PB"]
    state, cmix = mimc.squeeze1(state)
    one = F.scalar(1)
    new_claim = F.fadd(F.fmul(F.fsub(one, cmix), eA), F.fmul(cmix, eB))
    new_point = jnp.concatenate([cmix[None, :], rho, sigma], axis=0)
    return ok, new_point, new_claim, state


@maybe_jit
def _eq_eval(r1, r2):
    one = F.scalar(1)
    acc = one
    for j in range(r1.shape[0]):
        acc = F.fmul(acc, F.fadd(
            F.fmul(F.fsub(one, r1[j]), F.fsub(one, r2[j])),
            F.fmul(r1[j], r2[j])))
    return acc


# ---------------------------------------------------------------------------
# Driver
# ---------------------------------------------------------------------------

def _read_top(chunk_fn, layers: int, total: int, B: int):
    """Level-`layers` stream (size total / 2^layers), folded on the fly."""
    size_l = total >> layers
    if size_l <= 2 * B:
        return chunk_fn(layers, 0, size_l)
    parts = [chunk_fn(layers, i, 2 * B) for i in range(size_l // (2 * B))]
    return jnp.concatenate(parts, axis=0)


def prove(chunk_fn: Callable, vectors: int, size: int, state,
          B: int, commit_layers: bool = False, pc_rows: int = 4,
          pc_queries: int = 16):
    """Prove the per-vector products of a V x size stream.

    chunk_fn(level, i, csize) -> [csize, 2] chunk i of the level-`level`
    product-tree stream (level 0 = raw values, vector index in the HIGH
    bits so products never cross vector boundaries).

    Returns (StreamMulTreeProof, final_point, final_claim, state); the
    caller must check final_claim == V_0(final_point) against its
    witness-derived commitments (reference main.cpp:905-918 semantics).
    """
    total = vectors * size
    assert total & (total - 1) == 0
    if total <= 2 * B:
        flat = chunk_fn(0, 0, total)
        rows = [flat[i * size:(i + 1) * size] for i in range(vectors)]
        top, state = mul_tree.prove(rows, state)
        return StreamMulTreeProof(
            top_proof=top, level_proofs=(), num_layers=0, chunk_size=B,
            vectors=vectors, size=size, layer_roots=(), layer_openings=(),
        ), top.final_point, top.final_eval, state

    layers = int(np.log2(total // (2 * B)))

    # --- commit intermediate levels up front (reference commit_layers) ----
    roots = []
    commits = []
    if commit_layers:
        from ..pc import elastic
        from ..pc import standard as std
        for l in range(layers - 1, 0, -1):
            size_l = total >> l
            params = std.make_params(size_l, max(2, size_l // B), pc_rows,
                                     queries=pc_queries)
            com = elastic.commit_stream(
                lambda j, l=l, params=params: chunk_fn(l, j, params.B),
                params)
            commits.append((l, com, params))
            roots.append(com.root)
            state = mimc.absorb(state,
                                com.root.astype(jnp.uint64).reshape(4, 2))

    # --- top in-memory tree ------------------------------------------------
    import time as _t
    t0 = _t.perf_counter()
    top_stream = _read_top(chunk_fn, layers, total, B)
    t0 = _mt_tick("read_top", t0, top_stream)
    row = top_stream.shape[0] // vectors
    rows = [top_stream[i * row:(i + 1) * row] for i in range(vectors)]
    top, state = mul_tree.prove(rows, state)
    t0 = _mt_tick("top_tree", t0, state)
    point, claim = top.final_point, top.final_eval

    # --- streaming descent -------------------------------------------------
    level_proofs = []
    level_points = {}
    for l in range(layers - 1, -1, -1):
        K = total // ((1 << (l + 1)) * B)
        lp, point, claim, state = _prove_level(
            lambda i, l=l: chunk_fn(l, i, 2 * B), K, B, point, claim, state)
        level_proofs.append(lp)
        level_points[l] = (point, claim)

    # --- open committed levels at their chained points ---------------------
    openings = []
    if commit_layers:
        from ..pc import elastic
        for (l, com, params) in commits:
            pt, _ = level_points[l]
            opening, state = elastic.open_stream(
                lambda j, l=l, params=params: chunk_fn(l, j, params.B),
                com, pt, state)
            openings.append(opening)

    return StreamMulTreeProof(
        top_proof=top, level_proofs=tuple(level_proofs), num_layers=layers,
        chunk_size=B, vectors=vectors, size=size,
        layer_roots=tuple(roots), layer_openings=tuple(openings),
    ), point, claim, state


def verify(proof: StreamMulTreeProof, state, pc_rows: int = 4,
           pc_queries: int = 16):
    """Replay the transcript; returns (ok, final_point, final_claim, state).

    final_claim is the claimed V_0 MLE evaluation at final_point — the
    caller binds it to the witness-derived stream.  Committed intermediate
    levels are checked against their Elastic openings."""
    ok = jnp.array(True)
    B = proof.chunk_size
    total = proof.vectors * proof.size
    layers = proof.num_layers

    if layers > 0 and proof.layer_roots:
        for root in proof.layer_roots:
            state = mimc.absorb(state, root.astype(jnp.uint64).reshape(4, 2))

    okt, point, state = mul_tree.verify(proof.top_proof, state)
    ok = jnp.logical_and(ok, okt)
    claim = proof.top_proof.final_eval

    level_points = {}
    for idx, l in enumerate(range(layers - 1, -1, -1)):
        okl, point, claim, state = _verify_level(
            proof.level_proofs[idx], B, point, claim, state)
        ok = jnp.logical_and(ok, okl)
        level_points[l] = (point, claim)

    if proof.layer_roots:
        from ..pc import elastic
        from ..pc import standard as std
        for oi, l in enumerate(range(layers - 1, 0, -1)):
            size_l = total >> l
            params = std.make_params(size_l, max(2, size_l // B), pc_rows,
                                     queries=pc_queries)
            pt, cl = level_points[l]
            opening = proof.layer_openings[oi]
            oke, state = elastic.verify(proof.layer_roots[oi], pt, opening,
                                        params, state)
            ok = jnp.logical_and(ok, jnp.asarray(oke))
            ok = jnp.logical_and(ok, F.feq(opening.eval_claim, cl))

    return ok, point, claim, state


# ---------------------------------------------------------------------------
# Distance-batched level descent (reference generate_claims[_opt] +
# generate_3product_sumcheck_beta_stream_batch, sumcheck.cpp:1014-1621):
# the bottom layers are grouped in batches of `distance`; every batch's
# current level is proven in the SAME streaming pass, so the stream is
# traversed 2*distance times instead of 2*layers.  Batch tops are bound by
# Elastic layer commitments (commit_layers/open_layers); batch b's level-0
# claim lands on batch (b-1)'s committed top (or the raw stream for b=0).
# ---------------------------------------------------------------------------

class BatchedLevelsProof(NamedTuple):
    level_proofs: tuple      # distance tuples, each with `batches` LevelProofs
    claims0: jnp.ndarray     # [batches, 2] the streamed top claims
    batches: int
    distance: int
    chunk_size: int


def _extend_point(r_top, layers: int, distance: int, state):
    """r_ext = r_top ++ fresh: every batch-top point is a prefix of r_ext
    (the reference's r_temp construction, sumcheck.cpp:1869-1877)."""
    state, fresh = mimc.squeeze(state, layers - distance)
    return jnp.concatenate([r_top, fresh], axis=0), state


def _batch_prefixes(r_ext, total: int, layers: int, distance: int):
    """Batch b's starting point: log2(total) - (b+1)*distance bits."""
    batches = layers // distance
    return [r_ext[: int(np.log2(total)) - (b + 1) * distance]
            for b in range(batches)]


def prove_batched_levels(chunk_fn: Callable, total: int, layers: int,
                         distance: int, r_top, state, B: int,
                         r_ext=None):
    """Prove levels layers-1 .. 0 in `batches = layers/distance` groups.

    chunk_fn(level, i, csize) as in ``prove``; r_top: the point binding
    V_{layers} (from the in-memory top proof).  Batch b handles levels
    b*distance + (distance-1 .. 0); its starting claim V_{(b+1)*distance}
    at a truncation of r_top is computed BY STREAMING (generate_claims)
    and must be bound by the caller via the level commitments.

    Returns (BatchedLevelsProof, points, claims, state): per-batch final
    (point, claim) on level b*distance (level 0 for b=0)."""
    assert layers % distance == 0
    batches = layers // distance
    # batch batches-1 lands exactly on r_top and its streamed claim must
    # equal the top proof's final_eval.
    if r_ext is None:
        r_ext, state = _extend_point(r_top, layers, distance, state)
    points, claims = [], []
    for b in range(batches):
        Lb = (b + 1) * distance
        bits = int(np.log2(total)) - Lb
        pt = r_ext[:bits]
        # streamed claim: V_{Lb}~(pt) (generate_claims; prover-side)
        size_l = total >> Lb
        beta = poly.beta_table(pt)
        acc = F.scalar(0)
        csize = min(2 * B, size_l)
        for i in range(size_l // csize):
            c = chunk_fn(Lb, i, csize)
            acc = F.fadd(acc, F.fdot(beta[i * csize:(i + 1) * csize], c))
        points.append(pt)
        claims.append(acc)
    claims0 = jnp.stack(claims)
    state = mimc.absorb(state, claims0)

    level_rounds = []
    for i in range(distance - 1, -1, -1):
        round_proofs = []
        for b in range(batches):
            l = b * distance + i
            K = total // ((1 << (l + 1)) * B)
            if K < 1:
                K = 1
            lp, pt, cl, state = _prove_level(
                lambda k, l=l: chunk_fn(l, k, 2 * B), K, B,
                points[b], claims[b], state)
            round_proofs.append(lp)
            points[b], claims[b] = pt, cl
        level_rounds.append(tuple(round_proofs))

    proof = BatchedLevelsProof(
        level_proofs=tuple(level_rounds), claims0=claims0,
        batches=batches, distance=distance, chunk_size=B)
    return proof, list(points), list(claims), state


def verify_batched_levels(proof: BatchedLevelsProof, total: int, r_top,
                          state, r_ext=None):
    """Replay; returns (ok, points, claims, state).  The caller binds
    claims0 against the committed batch-top layers and the final claims
    against level b*distance (the raw stream for b=0)."""
    ok = jnp.array(True)
    batches, distance = proof.batches, proof.distance
    layers = batches * distance
    B = proof.chunk_size
    if r_ext is None:
        r_ext, state = _extend_point(r_top, layers, distance, state)
    points, claims = [], []
    for b in range(batches):
        Lb = (b + 1) * distance
        bits = int(np.log2(total)) - Lb
        points.append(r_ext[:bits])
        claims.append(proof.claims0[b])
    state = mimc.absorb(state, proof.claims0)

    for ri, i in enumerate(range(distance - 1, -1, -1)):
        for b in range(batches):
            okl, pt, cl, state = _verify_level(
                proof.level_proofs[ri][b], B, points[b], claims[b], state)
            ok = jnp.logical_and(ok, okl)
            points[b], claims[b] = pt, cl
    return ok, points, claims, state


# ---------------------------------------------------------------------------
# Batched driver: the reference main-path configuration (distance=5,
# main.cpp -> prove_multiplication_tree_stream_shallow with commit_layers).
# Batch-boundary tree levels are Elastic-committed; every boundary claim
# (the streamed batch-top claims AND the per-batch descent endpoints) is
# bound through a multi-point opening, so only batch 0's level-0 claim is
# left for the caller — exactly the plain driver's contract.
# ---------------------------------------------------------------------------

class BatchedMulTreeProof(NamedTuple):
    top_proof: mul_tree.MulTreeProof
    batched: BatchedLevelsProof
    num_layers: int
    distance: int
    chunk_size: int
    vectors: int
    size: int
    boundary_roots: tuple        # levels distance, 2*distance, ...
    boundary_openings: tuple     # multi-openings (2 points each)

    @property
    def output(self):
        return self.top_proof.output


def _boundary_params(total: int, level: int, B: int, pc_rows: int,
                     pc_queries: int):
    from ..pc import standard as std
    size_l = total >> level
    K = max(2, size_l // B)
    rows = min(pc_rows, max(4, (size_l // K) // 4))
    return std.make_params(size_l, K, rows, queries=pc_queries)


def prove_batched(chunk_fn: Callable, vectors: int, size: int, state,
                  B: int, distance: int, pc_rows: int = 4,
                  pc_queries: int = 16, defer: bool = False):
    """Distance-batched variant of ``prove`` (same return contract).

    Streams the level-0..layers range in ``layers/distance`` concurrent
    batches (2*distance passes over the stream instead of 2*layers); the
    batch-boundary levels are Elastic-committed and opened at both their
    chained points, replacing the plain driver's per-level chaining.

    defer=True returns a 5th element: the boundary openings are NOT run
    here — instead a list of pending (params, points, chunk_fn, tree)
    tuples is returned for the caller to fold into the proof's shared
    GROUP opening (one recursion instance per proof instead of one per
    boundary), along with the two claims each opening must bind."""
    total = vectors * size
    assert total & (total - 1) == 0
    if distance > 0 and total > 2 * B:
        layers = int(np.log2(total // (2 * B)))
        if layers < 2 * distance or layers % distance:
            # degrade to the largest divisor of layers <= distance (the
            # reference fixes distance=5 and sizes its sweeps to match;
            # the driver passes arbitrary trace sizes)
            cands = [d for d in range(min(distance, layers // 2), 1, -1)
                     if layers % d == 0]
            distance = cands[0] if cands else 0
    if total <= 2 * B or distance <= 0:
        proof, point, claim, state = prove(chunk_fn, vectors, size, state, B)
        if defer:
            return proof, point, claim, state, []
        return proof, point, claim, state
    batches = layers // distance

    # --- commit batch-boundary levels (reference commit_layers,
    # sumcheck.cpp:983-1011) ------------------------------------------------
    from ..pc import elastic
    commits = []
    for b in range(1, batches):
        l = b * distance
        params = _boundary_params(total, l, B, pc_rows, pc_queries)
        com = elastic.commit_stream(
            lambda j, l=l, params=params: chunk_fn(l, j, params.B), params)
        commits.append((l, com, params))
        state = mimc.absorb(state, com.root.astype(jnp.uint64).reshape(4, 2))

    # --- top in-memory tree ------------------------------------------------
    import time as _t
    t0 = _t.perf_counter()
    top_stream = _read_top(chunk_fn, layers, total, B)
    t0 = _mt_tick("read_top", t0, top_stream)
    row = top_stream.shape[0] // vectors
    rows = [top_stream[i * row:(i + 1) * row] for i in range(vectors)]
    top, state = mul_tree.prove(rows, state)
    t0 = _mt_tick("top_tree", t0, state)

    # --- batched descent ----------------------------------------------------
    r_ext, state = _extend_point(top.final_point, layers, distance, state)
    bl_proof, points, claims, state = prove_batched_levels(
        chunk_fn, total, layers, distance, top.final_point, state, B,
        r_ext=r_ext)
    prefixes = _batch_prefixes(r_ext, total, layers, distance)

    # --- bind boundary claims through multi-point openings ------------------
    # level l = b*distance (b >= 1) carries TWO claims: batch b's descent
    # endpoint (points[b], claims[b]) and batch (b-1)'s streamed top claim
    # claims0[b-1] at its r_ext prefix.  Batch batches-1's top claim is the
    # in-memory tree's endpoint (the verifier checks it against
    # top.final_eval directly).
    if defer:
        pending = []
        for (l, com, params) in commits:
            b = l // distance
            pts = (points[b], prefixes[b - 1])
            pending.append(dict(
                params=params, points=pts, tree=com.tree,
                chunk_fn=(lambda j, l=l, params=params:
                          chunk_fn(l, j, params.B))))
        proof = BatchedMulTreeProof(
            top_proof=top, batched=bl_proof, num_layers=layers,
            distance=distance, chunk_size=B, vectors=vectors, size=size,
            boundary_roots=tuple(com.root for (_, com, _) in commits),
            boundary_openings=())
        return proof, points[0], claims[0], state, pending

    openings = []
    for (l, com, params) in commits:
        b = l // distance
        pts = [points[b], prefixes[b - 1]]
        opening, state = elastic.open_stream_multi_recursive(
            lambda j, l=l, params=params: chunk_fn(l, j, params.B),
            com, pts, state)
        openings.append(opening)

    proof = BatchedMulTreeProof(
        top_proof=top, batched=bl_proof, num_layers=layers,
        distance=distance, chunk_size=B, vectors=vectors, size=size,
        boundary_roots=tuple(com.root for (_, com, _) in commits),
        boundary_openings=tuple(openings))
    return proof, points[0], claims[0], state


def verify_batched(proof, state, pc_rows: int = 4, pc_queries: int = 16,
                   defer: bool = False):
    """Replay a batched (or plain, by dispatch) mul-tree transcript.

    defer=True (group-opening mode): boundary openings are NOT verified
    here — a 5th return element lists, per boundary, the
    (params, points, root, want_claims) the caller must check against
    the proof's shared group opening."""
    if isinstance(proof, StreamMulTreeProof):
        out = verify(proof, state, pc_rows=pc_rows, pc_queries=pc_queries)
        if defer:
            return out + ([],)
        return out
    ok = jnp.array(True)
    B = proof.chunk_size
    total = proof.vectors * proof.size
    layers, distance = proof.num_layers, proof.distance
    batches = layers // distance

    from ..pc import elastic
    for root in proof.boundary_roots:
        state = mimc.absorb(state, root.astype(jnp.uint64).reshape(4, 2))

    okt, r_top, state = mul_tree.verify(proof.top_proof, state)
    ok = jnp.logical_and(ok, okt)

    r_ext, state = _extend_point(r_top, layers, distance, state)
    okb, points, claims, state = verify_batched_levels(
        proof.batched, total, r_top, state, r_ext=r_ext)
    ok = jnp.logical_and(ok, okb)
    # coarsest batch's streamed top claim == the in-memory tree endpoint
    ok = jnp.logical_and(ok, F.feq(proof.batched.claims0[batches - 1],
                                   proof.top_proof.final_eval))

    prefixes = _batch_prefixes(r_ext, total, layers, distance)
    if defer:
        checks = []
        for oi, b in enumerate(range(1, batches)):
            l = b * distance
            params = _boundary_params(total, l, B, pc_rows, pc_queries)
            checks.append(dict(
                params=params, points=(points[b], prefixes[b - 1]),
                root=proof.boundary_roots[oi],
                want=(claims[b], proof.batched.claims0[b - 1])))
        return ok, points[0], claims[0], state, checks

    for oi, b in enumerate(range(1, batches)):
        l = b * distance
        params = _boundary_params(total, l, B, pc_rows, pc_queries)
        pts = [points[b], prefixes[b - 1]]
        opening = proof.boundary_openings[oi]
        oke, _, state = elastic.verify_multi_recursive(
            proof.boundary_roots[oi], pts, opening, params, state)
        ok = jnp.logical_and(ok, jnp.asarray(oke))
        ok = jnp.logical_and(ok, F.feq(opening.eval_claims[0], claims[b]))
        ok = jnp.logical_and(ok, F.feq(opening.eval_claims[1],
                                       proof.batched.claims0[b - 1]))

    return ok, points[0], claims[0], state


__all__ = ["StreamMulTreeProof", "LevelProof", "BatchedLevelsProof",
           "BatchedMulTreeProof",
           "flat_oracle", "prove", "verify", "prove_batched",
           "verify_batched",
           "prove_batched_levels", "verify_batched_levels"]
