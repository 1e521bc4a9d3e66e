"""Top-level HOBBIT prover driver: the ``prove_circuit`` path.

Orchestrates the full pipeline of the reference's main proof flow
(``main.cpp:862-983``):

  1. commit the witness polynomial (4N layout: per gate slot
     (v_l, v_r, v_o, .) with the 4th lane carrying per-wire final values —
     the reference's 4*circuit_size witness stream);
  2. wiring-consistency product argument: offline-memory-checking multisets
     proven with the multiplication-tree argument + the permutation identity
     prod(read) * prod(final) == prod(write) * prod(init);
  3. logUp-style lookup product argument over the lookup tables (when the
     circuit has lookup gates);
  4. the streaming fold-phase gate-consistency sumcheck (lookup-aware
     when the circuit has tables);
  5. ONE witness PC opening at the gate-consistency point binding all
     three L/R/O lane evaluations, plus (by default) a commitment to the
     circuit-description polynomial whose opening binds the selector
     evaluations (the prove_arbitrary_circuit path, main.cpp:812-852).

Verifier status (documented): witness and selector evaluations are bound
cryptographically through the PC openings; the wiring/lookup RLC set
evaluations and the lookup ``lkpO`` stream are checked by *transparent
recomputation* (linear verifier — the same trust model as the reference's
inline self-verifying checks that accumulate ``vt``).  ROADMAP.md item 3
covers deriving those from the commitments too.
"""

from __future__ import annotations

import time
from typing import NamedTuple, Optional

import numpy as np

import jax.numpy as jnp

from ..config import HobbitConfig
from ..ops import field as F
from ..ops import mimc, poly
from ..pc import standard as pc
from ..streams import trace as trc
from ..streams import views
from . import gate_consistency as gc
from . import mul_tree
from . import mul_tree_stream as mts


class CircuitProof(NamedTuple):
    witness_root: jnp.ndarray
    wiring_proof: object             # MulTreeProof | StreamMulTreeProof
    lookup_proof: Optional[object]
    gc_proof: object                 # GateConsistencyProof | FoldStreamProof
    openings: tuple                  # 1 x pc.TensorOpening (all 3 lanes)
    num_gates: int
    num_chunks: int
    chunk_size: int
    lookup_mode: bool                # lookup-aware gate consistency used
    circuit_root: Optional[jnp.ndarray]   # committed circuit description
    circuit_opening: Optional[object]     # its opening at the gc point
    timings: dict


def _set_matrix(sets):
    """Pad product-argument sets to a common pow2 size (with ones) and
    flatten [V, size] -> [V*size] (vector index in the HIGH bits)."""
    size = 1 << int(np.ceil(np.log2(max(s.shape[0] for s in sets))))
    rows = []
    for s in sets:
        if s.shape[0] < size:
            s = jnp.concatenate([s, F.ones((size - s.shape[0],))], axis=0)
        rows.append(s)
    return jnp.concatenate(rows, axis=0), len(sets), size


def _pow2_above(n: int) -> int:
    return 1 << int(np.ceil(np.log2(max(2, n))))


from ..utils.jitting import maybe_jit


@maybe_jit
def build_witness_poly(tr: trc.Trace):
    """[4N', 2]: slot 4t+(0,1,2) = gate t's (v_l, v_r, v_o); slot 4t+3 =
    final value of wire t (padded)."""
    n = tr.num_gates
    w = tr.num_wires
    np2 = _pow2_above(max(n, w))
    lane = jnp.zeros((np2, 4, 2), dtype=jnp.uint64)
    lane = lane.at[:n, 0].set(tr.val_l)
    lane = lane.at[:n, 1].set(tr.val_r)
    lane = lane.at[:n, 2].set(tr.val_o)
    lane = lane.at[:w, 3].set(tr.fin_val)
    return lane.reshape(4 * np2, 2)


def _padded_gate_chunks(oracle: trc.TraceOracle, B: int, K: int):
    chunks = [views.gate_arrays(c) for c in oracle.gate_chunks(B)]
    zero = views.GateArrays(*(jnp.zeros((B, 2), jnp.uint64) for _ in range(5)))
    while len(chunks) < K:
        chunks.append(zero)
    return chunks[:K]


def prove(program: trc.CircuitProgram, inputs, config: HobbitConfig,
          pc_K: int = 4, pc_rows: Optional[int] = None,
          commit_circuit: bool = True):
    """Run the full proof; returns (CircuitProof, state)."""
    timings = {}
    t0 = time.time()
    oracle = trc.TraceOracle(program, inputs)
    tr = oracle.trace()
    timings["witness_gen"] = time.time() - t0

    # ---- 1. witness commitment -----------------------------------------
    # witness larger than the buffer: STREAMING Elastic commit (chunked
    # tensorcode + chained Merkle leaves, O(B) resident — the reference's
    # commit(fd_witness), Elastic_PC.cpp:174); else the in-memory PC.
    t0 = time.time()
    wpoly = build_witness_poly(tr)
    N4 = wpoly.shape[0]
    rows = pc_rows or max(4, config.tensor_row_size)
    # streaming commit when the witness exceeds the buffer, bounded to
    # K <= 32 chunks (tiny-buffer test configs fall back to the in-memory
    # PC; production buffers keep K small)
    use_elastic = (N4 > 2 * config.buffer_space
                   and N4 // config.buffer_space <= 32)
    if use_elastic:
        from ..pc import elastic
        K_el = max(pc_K, N4 // config.buffer_space)
        params = pc.make_params(N4, K_el, rows,
                                linear_time=config.linear_time,
                                queries=min(64, 790))
        commitment = elastic.commit_stream(
            lambda i: wpoly[i * params.B:(i + 1) * params.B], params)
    else:
        params = pc.make_params(N4, pc_K, rows,
                                linear_time=config.linear_time,
                                queries=min(64, 790))
        commitment = pc.commit(wpoly, params)
    state = mimc.fresh_state()
    state = mimc.absorb(state,
                        commitment.root.astype(jnp.uint64).reshape(4, 2))
    timings["commit"] = time.time() - t0

    # ---- 2. wiring consistency (memory checking + mul tree) -------------
    # sets larger than 2B run the STREAMING mul-tree (O(B)-resident fold-
    # phase descent, reference prove_multiplication_tree_stream_shallow).
    t0 = time.time()
    state, ab = mimc.squeeze(state, 2)
    a, b = ab[0], ab[1]
    reads, writes = views.wiring_read_write_sets(tr, a, b)
    init, fin = views.wiring_init_final_sets(tr, program.num_inputs, a, b)
    wflat, wV, wsize = _set_matrix([reads, writes, init, fin])
    B0 = config.buffer_space
    if wV * wsize > 2 * B0:
        wiring_proof, _, _, state = mts.prove(
            mts.flat_oracle(wflat), wV, wsize, state, B0)
    else:
        wiring_proof, state = mul_tree.prove(
            [poly.pad_pow2(reads, 1), poly.pad_pow2(writes, 1),
             poly.pad_pow2(init, 1), poly.pad_pow2(fin, 1)], state)
    timings["wiring"] = time.time() - t0

    # ---- 3. lookups ------------------------------------------------------
    lookup_proof = None
    if program.tables:
        t0 = time.time()
        table_size = max(len(t) for t in program.tables)
        table_size = _pow2_above(table_size)
        lr, lw, li, lf = views.lookup_sets(tr, program.tables, a, b,
                                           table_size=table_size)
        lflat, lV, lsize = _set_matrix([lr, lw, li, lf])
        if lV * lsize > 2 * B0:
            lookup_proof, _, _, state = mts.prove(
                mts.flat_oracle(lflat), lV, lsize, state, B0)
        else:
            lookup_proof, state = mul_tree.prove(
                [poly.pad_pow2(lr, 1), poly.pad_pow2(lw, 1),
                 poly.pad_pow2(li, 1), poly.pad_pow2(lf, 1)], state)
        timings["lookups"] = time.time() - t0

    # ---- 4. streaming gate consistency ----------------------------------
    # chunk geometry matches the witness padding: K * B == N4 / 4, so the
    # stream MLEs and the witness-lane MLEs share one domain.  Circuits
    # with lookup tables run the lookup-aware identity
    # (prove_gate_consistency_lookups, sumcheck.cpp:503).
    t0 = time.time()
    np2 = N4 // 4
    B = min(config.buffer_space, np2 // 2)
    K = np2 // B
    lookup_mode = bool(program.tables)
    if lookup_mode:
        state, lkw = mimc.squeeze(state, 2)
        streams = views.gate_arrays_lookups(tr, lkw[0], lkw[1])
        padded = {nm: jnp.concatenate(
            [v, jnp.zeros((np2 - v.shape[0], 2), jnp.uint64)])
            for nm, v in streams.items()}
        state, r = mimc.squeeze(state, int(np.log2(K * B)))
        gc_proof, _, _, state = gc.prove_lookups(
            lambda i: {nm: padded[nm][i * B:(i + 1) * B] for nm in padded},
            K, B, r, state)
    else:
        chunks = _padded_gate_chunks(oracle, B, K)
        state, r = mimc.squeeze(state, int(np.log2(K * B)))
        gc_proof, state = gc.prove(lambda i: chunks[i], K, B, r, state)
    timings["gate_consistency"] = time.time() - t0

    # ---- 5. witness opening at the gate-consistency point ---------------
    # The three lane points (L/R/O) differ only in the two LOW bits, which
    # live inside x_lo — the aggregate, queries and replies are identical,
    # so ONE opening binds all three lane evaluations (the verifier
    # evaluates the transmitted aggregate at each lane's x_lo).
    t0 = time.time()
    point = jnp.concatenate([gc_proof.mem_proof.challenges,
                             gc_proof.bind_proof.challenges], axis=0)
    log_n4 = int(np.log2(N4))
    zero = F.scalar(0)
    lane_pt = jnp.stack([zero, zero])
    full_pt = jnp.concatenate([lane_pt, point], axis=0)[:log_n4]
    if use_elastic:
        from ..pc import elastic
        opening, state = elastic.open_stream(
            lambda i: wpoly[i * params.B:(i + 1) * params.B],
            commitment, full_pt, state)
    else:
        opening, state = pc.open(wpoly, commitment, full_pt, params, state)
    openings = [opening]

    # ---- 5b. circuit-description commitment + opening --------------------
    # (prove_arbitrary_circuit, main.cpp:812-852: the circuit polynomial is
    # committed and opened like the witness; one opening binds all 8 lanes
    # and the verifier reconstructs the selector evaluations from them.)
    circuit_root = circuit_opening = None
    if commit_circuit:
        cpoly = views.circuit_lanes(tr, np2)
        cparams = pc.make_params(8 * np2, pc_K, rows,
                                 linear_time=config.linear_time,
                                 queries=min(64, 790))
        ccom = pc.commit(cpoly, cparams)
        circuit_root = ccom.root
        state = mimc.absorb(state,
                            ccom.root.astype(jnp.uint64).reshape(4, 2))
        c_pt = jnp.concatenate(
            [jnp.stack([zero, zero, zero]), point],
            axis=0)[: int(np.log2(8 * np2))]
        circuit_opening, state = pc.open(cpoly, ccom, c_pt, cparams, state)
    timings["open"] = time.time() - t0

    proof = CircuitProof(
        witness_root=commitment.root,
        wiring_proof=wiring_proof,
        lookup_proof=lookup_proof,
        gc_proof=gc_proof,
        openings=tuple(openings),
        num_gates=tr.num_gates,
        num_chunks=K,
        chunk_size=B,
        lookup_mode=lookup_mode,
        circuit_root=circuit_root,
        circuit_opening=circuit_opening,
        timings=timings,
    )
    return proof, state


def verify(proof: CircuitProof, program: trc.CircuitProgram, inputs,
           config: HobbitConfig, pc_K: int = 4,
           pc_rows: Optional[int] = None):
    """Full verification; transparently recomputes circuit-derived streams
    (see module docstring).  Returns (ok, state)."""
    ok = True
    state = mimc.fresh_state()
    state = mimc.absorb(state,
                        proof.witness_root.astype(jnp.uint64).reshape(4, 2))

    # wiring mul-tree + permutation identity; streaming proofs additionally
    # return the level-0 (point, claim) which we bind transparently below
    state, ab = mimc.squeeze(state, 2)
    streaming_w = isinstance(proof.wiring_proof, mts.StreamMulTreeProof)
    if streaming_w:
        okw, w_point, w_claim, state = mts.verify(proof.wiring_proof, state)
    else:
        okw, w_point, state = mul_tree.verify(proof.wiring_proof, state)
    ok = ok and bool(okw)
    out = proof.wiring_proof.output
    lhs = F.fmul(out[0], out[3])
    rhs = F.fmul(out[1], out[2])
    ok = ok and bool(F.feq(lhs, rhs))

    l_point = l_claim = None
    if proof.lookup_proof is not None:
        if isinstance(proof.lookup_proof, mts.StreamMulTreeProof):
            okl, l_point, l_claim, state = mts.verify(proof.lookup_proof,
                                                      state)
        else:
            okl, _, state = mul_tree.verify(proof.lookup_proof, state)
        ok = ok and bool(okl)
        out = proof.lookup_proof.output
        ok = ok and bool(F.feq(F.fmul(out[0], out[3]), F.fmul(out[1], out[2])))

    # gate consistency
    B = proof.chunk_size
    K = proof.num_chunks
    if proof.lookup_mode:
        state, lkw = mimc.squeeze(state, 2)
        state, r = mimc.squeeze(state, int(np.log2(K * B)))
        okg, gc_point, gc_evals, state = gc.verify_lookups(proof.gc_proof,
                                                           B, r, state)
        ok = ok and bool(okg)

        class _Res(NamedTuple):
            ok: bool
            point: jnp.ndarray
            stream_evals: dict
        res = _Res(ok=bool(okg), point=gc_point, stream_evals=gc_evals)
    else:
        state, r = mimc.squeeze(state, int(np.log2(K * B)))
        res, state = gc.verify(proof.gc_proof, B, r, state)
        ok = ok and bool(res.ok)

    # witness openings: bind the L/R/O stream evals to the commitment
    from ..pc import elastic
    tr = trc.execute(program, inputs)     # transparent recomputation part
    wpoly = build_witness_poly(tr)
    N4 = wpoly.shape[0]
    rows = pc_rows or max(4, config.tensor_row_size)
    use_elastic = (N4 > 2 * config.buffer_space
                   and N4 // config.buffer_space <= 32)
    K_w = max(pc_K, N4 // config.buffer_space) if use_elastic else pc_K
    params = pc.make_params(N4, K_w, rows, linear_time=config.linear_time,
                            queries=min(64, 790))
    log_n4 = int(np.log2(N4))
    zero, one = F.scalar(0), F.scalar(1)
    lb_pc = int(np.log2(params.B))
    opening = proof.openings[0]
    base_pt = jnp.concatenate([jnp.stack([zero, zero]), res.point],
                              axis=0)[:log_n4]
    if isinstance(opening, elastic.ElasticOpening):
        oko, state = elastic.verify(proof.witness_root, base_pt, opening,
                                    params, state)
    else:
        oko, state = pc.verify(proof.witness_root, base_pt, opening,
                               params, state)
    ok = ok and bool(oko)
    # one opening binds all three lanes: evaluate the transmitted
    # aggregate at each lane's x_lo
    npad = N4 // 4
    for li, lane_bits in enumerate(((zero, zero), (one, zero), (zero, one))):
        lane_pt = jnp.stack([lane_bits[0], lane_bits[1]])
        full_pt = jnp.concatenate([lane_pt, res.point], axis=0)[:log_n4]
        got = poly.evaluate_vector(opening.aggr, full_pt[:lb_pc])
        want = res.stream_evals[("L", "R", "O")[li]]
        if npad == K * B:
            ok = ok and bool(F.feq(got, want))

    # selector evaluations: bound by the circuit-description commitment
    # when present (prove_arbitrary_circuit path), else transparent
    n_total = K * B

    def _padded_eval(arr, point):
        full = jnp.concatenate(
            [arr, jnp.zeros((n_total - arr.shape[0], 2), jnp.uint64)])
        return poly.evaluate_vector(full, point)

    if proof.circuit_root is not None:
        np2 = N4 // 4
        cparams = pc.make_params(8 * np2, pc_K, rows,
                                 linear_time=config.linear_time,
                                 queries=min(64, 790))
        state = mimc.absorb(
            state, proof.circuit_root.astype(jnp.uint64).reshape(4, 2))
        c_pt = jnp.concatenate(
            [jnp.stack([zero, zero, zero]), res.point],
            axis=0)[: int(np.log2(8 * np2))]
        okc, state = pc.verify(proof.circuit_root, c_pt,
                               proof.circuit_opening, cparams, state)
        ok = ok and bool(okc)
        # the circuit commitment itself is public input: recompute its root
        cpoly = views.circuit_lanes(tr, np2)
        ccom = pc.commit(cpoly, cparams)
        ok = ok and bool(jnp.all(ccom.root == proof.circuit_root))
        # lane evals at the gc point from the single opening's aggregate
        lb_c = int(np.log2(cparams.B))
        lane_evals = []
        for lane in range(8):
            bits = jnp.stack([F.scalar((lane >> b) & 1) for b in range(3)])
            fp = jnp.concatenate([bits, res.point],
                                 axis=0)[: int(np.log2(8 * np2))]
            lane_evals.append(
                poly.evaluate_vector(proof.circuit_opening.aggr,
                                     fp[:lb_c]))
        add_e, mul_e, lkp_e = lane_evals[0], lane_evals[1], lane_evals[2]
        if proof.lookup_mode:
            saL = F.fadd(add_e, F.fmul(lkw[0], lkp_e))
            saR = F.fadd(add_e, F.fmul(lkw[1], lkp_e))
            ok = ok and bool(F.feq(res.stream_evals["saL"], saL))
            ok = ok and bool(F.feq(res.stream_evals["saR"], saR))
            ok = ok and bool(F.feq(res.stream_evals["sm"], mul_e))
            ok = ok and bool(F.feq(res.stream_evals["slkp"], lkp_e))
            # lkpO is a pointwise product stream — still transparent
            streams = views.gate_arrays_lookups(tr, lkw[0], lkw[1])
            want = _padded_eval(streams["lkpO"], res.point)
            ok = ok and bool(F.feq(res.stream_evals["lkpO"], want))
        else:
            ok = ok and bool(F.feq(res.stream_evals["sa"], add_e))
            ok = ok and bool(F.feq(res.stream_evals["sm"], mul_e))
    elif proof.lookup_mode:
        streams = views.gate_arrays_lookups(tr, lkw[0], lkw[1])
        for name in ("saL", "saR", "sm", "slkp", "lkpO"):
            want = _padded_eval(streams[name], res.point)
            ok = ok and bool(F.feq(res.stream_evals[name], want))
    else:
        ga = views.gate_arrays(tr)
        for name, arr in (("sa", ga.sel_add), ("sm", ga.sel_mul)):
            want = _padded_eval(arr, res.point)
            ok = ok and bool(F.feq(res.stream_evals[name], want))

    a, b = ab[0], ab[1]
    reads, writes = views.wiring_read_write_sets(tr, a, b)
    init, fin = views.wiring_init_final_sets(tr, program.num_inputs, a, b)
    if streaming_w:
        wflat, _, _ = _set_matrix([reads, writes, init, fin])
        ok = ok and bool(F.feq(w_claim,
                               poly.evaluate_vector(wflat, w_point)))
    else:
        sets = [poly.pad_pow2(reads, 1), poly.pad_pow2(writes, 1),
                poly.pad_pow2(init, 1), poly.pad_pow2(fin, 1)]
        depth = int(np.log2(max(s.shape[0] for s in sets)))
        ind_r = w_point[:depth]
        for j, s in enumerate(sets):
            if s.shape[0] == 1 << depth:
                want = poly.evaluate_vector(s, ind_r)
                ok = ok and bool(F.feq(proof.wiring_proof.partial_evals[j],
                                       want))

    if l_point is not None and program.tables:
        table_size = _pow2_above(max(len(t) for t in program.tables))
        lr, lw, li_, lf = views.lookup_sets(tr, program.tables, a, b,
                                            table_size=table_size)
        lflat, _, _ = _set_matrix([lr, lw, li_, lf])
        ok = ok and bool(F.feq(l_claim,
                               poly.evaluate_vector(lflat, l_point)))

    return ok, state


__all__ = ["CircuitProof", "prove", "verify", "build_witness_poly"]
