"""Top-level HOBBIT prover driver: the ``prove_circuit`` path (protocol v2).

Orchestrates the full pipeline of the reference's main proof flow
(``main.cpp:862-983`` + the committed-circuit ``prove_arbitrary_circuit``
variant ``main.cpp:812-852``), re-designed around LANE-interleaved
committed polynomials so the verifier is succinct — it never executes the
circuit and derives every protocol stream evaluation LINEARLY from PC
openings:

  wpoly [4*np2]   per-gate lanes (L, R, O, fin)    — streaming commit;
                  lane 3 = fpoly (death-order final wire values), so one
                  commitment binds both
  cpoly [16*np2]  static circuit description       — public preprocessing
                  (selectors, table ids, wiring indices, access counters,
                  death-order wire metadata); its root is a public input
                  computed once per circuit by ``commit_circuit``
  lpoly [4*np2]   lookup lanes (Lm, Rm, Om, rankm), masked to lookup gates
  tpoly [TS]      final lookup access counts

Protocol phases (each O(B)-resident when the oracle streams):
  1. commitments (one streaming pass each);
  2. wiring-consistency product argument over the 4-slot-stride multisets
     (reads | writes | init | final), proven with the streaming mul-tree;
     the level-0 claim is bound to wpoly/fpoly/cpoly lane evaluations;
  3. lookup product argument over (reads | writes | table-init |
     table-final); bound to lpoly/cpoly/tpoly + public table MLEs;
  4. fold-phase gate-consistency sumcheck with the v2 identity
       sa*(L+R-O) + sm*(L*R-O) = 0
     plus masked-lane consistency Lm = lkp*L, Rm = lkp*R, Om = lkp*O
     (the reference's lkpO stream and lr0/lr1 weights disappear — the
     masked lanes are committed directly);
  5. multi-point PC openings (shared query replies per commitment).

Verifier cost: transcript replay + openings + O(TS) public-table work —
no circuit execution (closes the binding intent of main.cpp:812-852).
"""

from __future__ import annotations

import time
from typing import NamedTuple, Optional

import numpy as np

import jax.numpy as jnp

from ..config import HobbitConfig
from ..ops import field as F
from ..ops import mimc, poly
from ..pc import elastic
from ..pc import standard as pc
from ..streams import trace as trc
from ..streams import views
from ..streams import wiring as ws
from . import fold_stream as fs
from . import gate_consistency as gc
from . import mul_tree_stream as mts


class NaiveOpens(NamedTuple):
    """Per-commitment multi-opens (recursion=False mode)."""
    w: object
    c: object
    l: object
    t: object


class CircuitProof(NamedTuple):
    witness_root: jnp.ndarray
    lookup_root: Optional[jnp.ndarray]
    counts_root: Optional[jnp.ndarray]
    wiring_proof: object             # StreamMulTreeProof
    lookup_proof: Optional[object]
    gc_proof: object                 # GateConsistencyProof | FoldStreamProof
    # recursion mode: ONE ElasticGroupOpening binding wpoly (lane 3 =
    # fpoly), cpoly (committed mode), lpoly, tpoly AND the deferred
    # wiring/lookup boundary levels through a single shared recursion;
    # naive mode: NaiveOpens of per-commitment ElasticMultiOpenings
    open_proof: object
    num_gates: int
    lookup_mode: bool
    timings: dict


class Geometry(NamedTuple):
    np2: int
    size_l: int          # lookup set size (pow2 >= max(np2, TS))
    table_size: int      # per-table padded size
    num_tables: int
    TS: int              # num_tables * table_size
    B_gc: int
    K_gc: int

    @property
    def log_np2(self):
        return int(np.log2(self.np2))


def _trace(phase: str, dt: float, sync=None):
    """Env-gated phase progress (HOBBIT_TRACE=1): localizes stalls on
    remote-attached devices where a cold run can take minutes per phase.
    ``sync``: value to block on first — without it, async dispatch skews
    attribution (a phase's device work drains at the NEXT sync point)."""
    import os
    import sys
    if os.environ.get("HOBBIT_TRACE") == "1":
        if sync is not None:
            import jax
            jax.block_until_ready(sync)
        print(f"[prove] {phase}: {dt:.1f}s", file=sys.stderr, flush=True)


def _trace_sync(val):
    """Block on ``val`` when HOBBIT_TRACE=1 so phase timings are honest."""
    import os
    if val is not None and os.environ.get("HOBBIT_TRACE") == "1":
        import jax
        jax.block_until_ready(val)


def _pow2_above(n: int) -> int:
    return 1 << int(np.ceil(np.log2(max(2, n))))


def geometry(program: trc.CircuitProgram, config: HobbitConfig) -> Geometry:
    np2 = _pow2_above(max(program.num_gates, program.num_wires, 4))
    if program.tables:
        table_size = _pow2_above(max(len(t) for t in program.tables))
        num_tables = len(program.tables)
        # TS rounded to a power of two (extra entries are real table slots
        # with value 0 and count 0 — they cancel between init and final)
        TS = table_size << max(0, int(np.ceil(np.log2(num_tables))))
        size_l = _pow2_above(max(np2, TS))
    else:
        table_size = num_tables = TS = 0
        size_l = np2
    B_gc = min(config.buffer_space, np2 // 2)
    return Geometry(np2=np2, size_l=size_l, table_size=table_size,
                    num_tables=num_tables, TS=TS, B_gc=B_gc,
                    K_gc=np2 // B_gc)


def _pc_params(length: int, config: HobbitConfig,
               pc_rows: Optional[int], queries: Optional[int] = None,
               b_cap: Optional[int] = None):
    """b_cap: upper bound on the chunk size B.  The tpoly commitment uses
    b_cap = wpoly's B so its segment never RAISES the group opening's
    slot size (at small circuits with big lookup tables, TS/2 can exceed
    the witness chunk — an 8x larger shared vector otherwise)."""
    K = max(2, length // config.buffer_space)
    if b_cap is not None and length // K > b_cap:
        K = max(2, length // b_cap)
    B = length // K
    rows = min(pc_rows or max(4, config.tensor_row_size), max(4, B // 4))
    if queries is None:
        queries = config.pc_queries
    if queries is None:
        # reference streaming schedule (Elastic_PC.cpp:626-629)
        queries = 5900 if config.linear_time else 700
    return pc.make_params(length, K, rows, linear_time=config.linear_time,
                          queries=queries)


def _chunked(vec, B: int):
    """chunk_fn over a resident vector."""
    return lambda i: vec[i * B:(i + 1) * B]


def _absorb_root(state, root):
    return mimc.absorb(state, root.astype(jnp.uint64).reshape(4, 2))


# ---------------------------------------------------------------------------
# Public preprocessing: the circuit-description commitment
# ---------------------------------------------------------------------------

def commit_circuit(program: trc.CircuitProgram, config: HobbitConfig,
                   pc_rows: Optional[int] = None):
    """Commit cpoly (input-independent; compute once per circuit).

    Returns (commitment, params).  The root is a PUBLIC INPUT of
    verification: both sides may recompute it from the circuit, or trust a
    previously computed value (the reference's committed 16N "circuit"
    stream, witness_stream.cpp:2123-2162 / main.cpp:821-852)."""
    g = geometry(program, config)
    length = 16 * g.np2
    params = _pc_params(length, config, pc_rows)
    gates_B = params.B // 16

    def chunk_fn(i):
        return views.circuit_lane_chunk(program, i * gates_B,
                                        (i + 1) * gates_B)

    # resident fast path only for moderate sizes; larger circuits stream
    # the static lanes chunk by chunk (O(B) resident)
    full = _cpoly_full(program, g) if length <= (1 << 24) else None
    com = elastic.commit_stream(chunk_fn, params, full=full)
    return com, params


def _cpoly_full(program: trc.CircuitProgram, g: Geometry):
    """Resident [16*np2, 2] cpoly (single host->device transfer)."""
    return views.circuit_lane_chunk(program, 0, g.np2)


# ---------------------------------------------------------------------------
# Prover
# ---------------------------------------------------------------------------

def prove(program: trc.CircuitProgram, inputs, config: HobbitConfig,
          pc_rows: Optional[int] = None, streaming: Optional[bool] = None,
          circuit_com=None):
    """Run the full proof; returns (CircuitProof, state).

    streaming=None materializes the trace when it fits comfortably
    (fast path) and streams otherwise; True forces O(B)-resident passes.
    circuit_com: reuse of the ``commit_circuit`` output."""
    g = geometry(program, config)
    timings = {}
    if streaming is None:
        streaming = program.num_gates > 4 * config.buffer_space

    t0 = time.time()
    oracle = trc.TraceOracle(program, inputs, materialize=not streaming)
    lookup_mode = bool(program.tables)

    if circuit_com is None:
        circuit_com, _ = commit_circuit(program, config, pc_rows)
    state = mimc.fresh_state()
    state = _absorb_root(state, circuit_com.root)
    timings["setup"] = time.time() - t0
    _trace("setup", timings["setup"])

    # ---- 1. commitments --------------------------------------------------
    # wpoly lane 3 carries fpoly (death-order final wire values): one
    # commitment + one multi-open binds both (the former standalone f
    # commitment cost its own ~0.5 MB opening at the flagship config)
    t0 = time.time()
    w_params = _pc_params(4 * g.np2, config, pc_rows)
    w_gates = w_params.B // 4

    wpoly_full = lpoly_full = None
    if not streaming:
        tr = oracle.trace()
        tr_pad = trc._slice_pad(tr, 0, tr.num_gates, g.np2)
        fpoly_full = jnp.pad(tr.fin_val,
                             ((0, g.np2 - tr.num_wires), (0, 0)))
        wpoly_full = views.witness_lane_chunk(tr_pad, fin=fpoly_full)
        w_chunks = _chunked(wpoly_full, w_params.B)
    else:
        def w_chunks_gen():
            fin_gen = oracle.final_chunks(w_gates)
            zero_f = jnp.zeros((w_gates, 2), jnp.uint64)
            zero_tr = None
            got = 0
            for tr_c in oracle.gate_chunks(w_gates):
                got += 1
                fin = next(fin_gen, None)
                yield views.witness_lane_chunk(
                    tr_c, fin=zero_f if fin is None else fin[1])
            for _ in range(w_params.K - got):
                fin = next(fin_gen, None)
                lanes = jnp.zeros((w_gates, 4, 2), jnp.uint64)
                if fin is not None:
                    lanes = lanes.at[:, 3].set(fin[1])
                yield lanes.reshape(w_params.B, 2)
        w_chunks = _seq_chunks(w_chunks_gen, w_params.K)
    w_com = elastic.commit_stream(w_chunks, w_params, full=wpoly_full)
    state = _absorb_root(state, w_com.root)

    l_com = t_com = None
    l_params = t_params = None
    counts = None
    if lookup_mode:
        l_params = _pc_params(4 * g.np2, config, pc_rows)
        l_gates = l_params.B // 4
        rank_state = views.LookupRankStream(g.num_tables, g.table_size)

        if not streaming:
            ranks, _, _ = rank_state.chunk_ranks(tr_pad)
            lpoly_full = views.lookup_lane_chunk(tr_pad, ranks)
            l_chunks = _chunked(lpoly_full, l_params.B)
        else:
            def l_chunks_gen():
                got = 0
                for tr_c in oracle.gate_chunks(l_gates):
                    got += 1
                    ranks, _, _ = rank_state.chunk_ranks(tr_c)
                    yield views.lookup_lane_chunk(tr_c, ranks)
                for _ in range(l_params.K - got):
                    yield jnp.zeros((l_params.B, 2), jnp.uint64)
            l_chunks = _seq_chunks(l_chunks_gen, l_params.K)
        l_com = elastic.commit_stream(l_chunks, l_params, full=lpoly_full)
        state = _absorb_root(state, l_com.root)
        counts = rank_state.final_counts()

        t_params = _pc_params(g.TS, config, pc_rows,
                                  b_cap=w_params.B)
        counts_p = jnp.pad(counts.astype(jnp.uint64),
                           (0, g.TS - counts.shape[0]))
        counts_f = jnp.stack([counts_p, jnp.zeros_like(counts_p)], axis=-1)
        t_chunks = _chunked(counts_f, t_params.B)
        t_com = elastic.commit_stream(t_chunks, t_params, full=counts_f)
        state = _absorb_root(state, t_com.root)
    _trace_sync(state)
    timings["commit"] = time.time() - t0
    _trace("commit", timings["commit"])

    # ---- 2. wiring consistency ------------------------------------------
    t0 = time.time()
    state, ab = mimc.squeeze(state, 2)
    a, b = ab[0], ab[1]
    B0 = config.buffer_space
    if not streaming:
        wflat = _materialized_wiring_flat(oracle, g, a, b)
        w_oracle = mts.flat_oracle(wflat)
    else:
        w_oracle = ws.SequentialFoldOracle(
            ws.wiring_stream_factory(oracle, g.np2, B0, a, b), 16 * g.np2)
    w_pending = []
    if config.recursion:
        wiring_proof, p_w, c_w, state, w_pending = mts.prove_batched(
            w_oracle, 4, 4 * g.np2, state, B0, config.mt_distance,
            pc_rows=pc_rows or 4, pc_queries=config.resolved_pc_queries(),
            defer=True)
    else:
        wiring_proof, p_w, c_w, state = mts.prove_batched(
            w_oracle, 4, 4 * g.np2, state, B0, config.mt_distance,
            pc_rows=pc_rows or 4, pc_queries=config.resolved_pc_queries())
    _trace_sync(state)
    timings["wiring"] = time.time() - t0
    _trace("wiring", timings["wiring"])

    # ---- 3. lookups ------------------------------------------------------
    lookup_proof = p_l = c_l = None
    if lookup_mode:
        t0 = time.time()
        if not streaming:
            lflat = _materialized_lookup_flat(oracle, g, a, b)
            l_oracle = mts.flat_oracle(lflat)
        else:
            l_oracle = ws.SequentialFoldOracle(
                ws.lookup_stream_factory(oracle, g.size_l, B0, a, b,
                                         g.table_size, g.TS), 4 * g.size_l)
        if config.recursion:
            lookup_proof, p_l, c_l, state, l_pending = mts.prove_batched(
                l_oracle, 4, g.size_l, state, B0, config.mt_distance,
                pc_rows=pc_rows or 4,
                pc_queries=config.resolved_pc_queries(), defer=True)
            w_pending += l_pending
        else:
            lookup_proof, p_l, c_l, state = mts.prove_batched(
                l_oracle, 4, g.size_l, state, B0, config.mt_distance,
                pc_rows=pc_rows or 4,
                pc_queries=config.resolved_pc_queries())
        _trace_sync(state)
        timings["lookups"] = time.time() - t0
        _trace("lookups", timings["lookups"])

    # ---- 4. gate consistency --------------------------------------------
    t0 = time.time()
    state, r_gc = mimc.squeeze(state, g.log_np2)
    if lookup_mode:
        gc_proof, _, _, state = fs.prove(
            _SeqDictChunks(oracle, g), views.GC2_NAMES, views.GC2_GROUPS,
            g.K_gc, g.B_gc, r_gc, state)
    else:
        gc_proof, state = gc.prove(_SeqGateArrays(oracle, g), g.K_gc,
                                   g.B_gc, r_gc, state)
    _trace_sync(state)
    timings["gate_consistency"] = time.time() - t0
    _trace("gate_consistency", timings["gate_consistency"])

    # ---- 5. openings -----------------------------------------------------
    t0 = time.time()
    pts = _opening_points(gc_proof, p_w, p_l, g, lookup_mode)

    cpoly_full = c_chunks = None
    if config.committed_circuit:
        c_params = _pc_params(16 * g.np2, config, pc_rows)
        c_gates = c_params.B // 16
        cpoly_full = _cpoly_full(program, g) \
            if not streaming and 16 * g.np2 <= (1 << 26) else None

        def c_chunks(i):
            return views.circuit_lane_chunk(program, i * c_gates,
                                            (i + 1) * c_gates)
    if lookup_mode:
        rank_state2 = views.LookupRankStream(g.num_tables, g.table_size)
        l_gates = l_params.B // 4

        def l_chunks_gen2():
            rank_state2.reset()
            got = 0
            for tr_c in oracle.gate_chunks(l_gates):
                got += 1
                ranks, _, _ = rank_state2.chunk_ranks(tr_c)
                yield views.lookup_lane_chunk(tr_c, ranks)
            for _ in range(l_params.K - got):
                yield jnp.zeros((l_params.B, 2), jnp.uint64)

    if config.recursion:
        # ALL multi-opens of the proof (witness/circuit/lookup/counts +
        # the deferred wiring/lookup boundary levels) share ONE group
        # recursion: one shockwave commitment, one merge sumcheck, one
        # inner WHIR — ~200-400 KB per avoided standalone instance
        lb_w = int(np.log2(w_params.B))
        items = [elastic.GroupItem(
            params=w_params, points=tuple(pts["w"]),
            chunk_fn=(None if not streaming
                      else _seq_chunks(w_chunks_gen, w_params.K)),
            full=wpoly_full if not streaming else None,
            extra_points=_extra_points(_W_LANE_SPEC, pts["w"], 2, lb_w),
            tree=w_com.tree)]
        if not streaming:
            items[0] = items[0]._replace(chunk_fn=w_chunks)
        if config.committed_circuit:
            lb_c = int(np.log2(c_params.B))
            items.append(elastic.GroupItem(
                params=c_params, points=tuple(pts["c"]), chunk_fn=c_chunks,
                full=cpoly_full,
                extra_points=_extra_points(_c_lane_spec(lookup_mode),
                                           pts["c"], 4, lb_c),
                tree=circuit_com.tree))
        if lookup_mode:
            lb_l = int(np.log2(l_params.B))
            items.append(elastic.GroupItem(
                params=l_params, points=tuple(pts["l"]),
                chunk_fn=_seq_chunks(l_chunks_gen2, l_params.K),
                full=lpoly_full,
                extra_points=_extra_points(_L_LANE_SPEC, pts["l"], 2, lb_l),
                tree=l_com.tree))
            items.append(elastic.GroupItem(
                params=t_params, points=tuple(pts["t"]),
                chunk_fn=_chunked(counts_f, t_params.B), full=counts_f,
                tree=t_com.tree))
        for pend in w_pending:
            items.append(elastic.GroupItem(
                params=pend["params"], points=tuple(pend["points"]),
                chunk_fn=pend["chunk_fn"], tree=pend["tree"]))
        open_proof, state = elastic.open_group_recursive(
            items, state, sw_queries=config.shockwave_queries)
    else:
        w_open, state = _open_multi(
            w_chunks if not streaming
            else _seq_chunks(w_chunks_gen, w_params.K),
            w_com, pts["w"], state, config, full=wpoly_full,
            spec=_W_LANE_SPEC, lane_bits=2)
        c_open = None
        if config.committed_circuit:
            c_open, state = _open_multi(c_chunks, circuit_com, pts["c"],
                                        state, config, full=cpoly_full,
                                        spec=_c_lane_spec(lookup_mode),
                                        lane_bits=4)
        l_open = t_open = None
        if lookup_mode:
            l_open, state = _open_multi(
                _seq_chunks(l_chunks_gen2, l_params.K), l_com, pts["l"],
                state, config, full=lpoly_full, spec=_L_LANE_SPEC,
                lane_bits=2)
            t_open, state = _open_multi(
                _chunked(counts_f, t_params.B), t_com, pts["t"], state,
                config, full=counts_f)
        open_proof = NaiveOpens(w=w_open, c=c_open, l=l_open, t=t_open)
    _trace_sync(state)
    timings["open"] = time.time() - t0
    _trace("open", timings["open"])

    proof = CircuitProof(
        witness_root=w_com.root,
        lookup_root=None if l_com is None else l_com.root,
        counts_root=None if t_com is None else t_com.root,
        wiring_proof=wiring_proof, lookup_proof=lookup_proof,
        gc_proof=gc_proof, open_proof=open_proof,
        num_gates=program.num_gates,
        lookup_mode=lookup_mode, timings=timings,
    )
    return proof, state


class _SeqChunks:
    """Sequential chunk_fn over a restartable generator factory."""

    def __init__(self, factory, K):
        self.factory = factory
        self.K = K
        self._gen = None
        self._next = 0

    def __call__(self, i):
        if i == 0 or self._gen is None:
            assert i == 0, "sequential access required"
            self._gen = self.factory()
            self._next = 0
        assert i == self._next
        self._next += 1
        return next(self._gen)


def _seq_chunks(factory, K, restartable=True):
    return _SeqChunks(factory, K)


class _SeqGateArrays:
    """chunk_fn(i) -> GateArrays for the plain gate-consistency prover."""

    def __init__(self, oracle: trc.TraceOracle, g: Geometry):
        self.oracle = oracle
        self.g = g
        self._gen = None
        self._next = 0

    def __call__(self, i):
        if i == 0 or self._gen is None:
            assert i == 0
            self._gen = self._make()
            self._next = 0
        assert i == self._next
        self._next += 1
        return next(self._gen)

    def _make(self):
        got = 0
        for tr_c in self.oracle.gate_chunks(self.g.B_gc):
            got += 1
            yield views.gate_arrays(tr_c)
        zero = jnp.zeros((self.g.B_gc, 2), jnp.uint64)
        for _ in range(self.g.K_gc - got):
            yield views.GateArrays(zero, zero, zero, zero, zero)


class _SeqDictChunks:
    """chunk_fn(i) -> dict of GC2 streams for the lookup-mode identity."""

    def __init__(self, oracle: trc.TraceOracle, g: Geometry):
        self.oracle = oracle
        self.g = g
        self._gen = None
        self._next = 0

    def __call__(self, i):
        if i == 0 or self._gen is None:
            assert i == 0
            self._gen = self._make()
            self._next = 0
        assert i == self._next
        self._next += 1
        return next(self._gen)

    def _make(self):
        got = 0
        for tr_c in self.oracle.gate_chunks(self.g.B_gc):
            got += 1
            yield views.gc_streams_v2(tr_c)
        zero = jnp.zeros((self.g.B_gc, 2), jnp.uint64)
        for _ in range(self.g.K_gc - got):
            yield {nm: zero for nm in views.GC2_NAMES}


def _materialized_wiring_flat(oracle, g: Geometry, a, b):
    tr = oracle.trace()
    tr_pad = trc._slice_pad(tr, 0, tr.num_gates, g.np2)
    reads, writes = views.wiring_rw_chunk(tr_pad, a, b)
    init, fin = views.wiring_if_chunk(
        jnp.pad(tr.fin_idx, (0, g.np2 - tr.num_wires)),
        jnp.pad(tr.fin_val, ((0, g.np2 - tr.num_wires), (0, 0))),
        jnp.pad(tr.fin_cnt, (0, g.np2 - tr.num_wires)),
        tr.num_wires, oracle.program.num_inputs, a, b)
    return jnp.concatenate([reads, writes, init, fin], axis=0)


def _materialized_lookup_flat(oracle, g: Geometry, a, b):
    tr = oracle.trace()
    tr_pad = trc._slice_pad(tr, 0, tr.num_gates, g.np2)
    rs = views.LookupRankStream(g.num_tables, g.table_size)
    ranks, addr_eff, is_lkp = rs.chunk_ranks(tr_pad)
    reads, writes = views.lookup_rw_chunk(tr_pad, ranks, addr_eff, is_lkp,
                                          g.table_size, g.num_tables, a, b)
    ones = jnp.zeros((g.size_l - g.np2, 2), jnp.uint64).at[:, 0].set(1)
    reads = jnp.concatenate([reads, ones], axis=0)
    writes = jnp.concatenate([writes, ones], axis=0)
    init, fin = views.lookup_table_sets(
        oracle.program.tables, rs.final_counts(), a, b, g.size_l,
        g.table_size, g.TS)
    return jnp.concatenate([reads, writes, init, fin], axis=0)


# ---------------------------------------------------------------------------
# Lane-evaluation points: every protocol check needs evaluations of the
# committed lane polynomials at (lane bits || point tail).  Lane 0 of each
# opened point IS the opening's eval claim; the nonzero lanes become
# `extra_points` of the recursive multi-open (bound through the shared
# shockwave commitment) or direct aggregate evaluations in naive mode.
# ---------------------------------------------------------------------------

_W_LANE_SPEC = ((0, 1), (0, 2), (1, 1), (1, 2), (1, 3))
_L_LANE_SPEC = ((0, views.L_RM), (0, views.L_OM),
                (1, views.L_RM), (1, views.L_OM), (1, views.L_RANK))


def _c_lane_spec(lookup_mode: bool):
    lanes = [(0, views.C_MUL)]
    if lookup_mode:
        lanes.append((0, views.C_LKP))
    lanes += [(1, l) for l in (views.C_MUL, views.C_LKP, views.C_IDXL,
                               views.C_IDXR, views.C_IDXO, views.C_ACCL,
                               views.C_ACCR, views.C_FIDX, views.C_FCNT,
                               views.C_FINP)]
    if lookup_mode:
        lanes += [(2, views.C_TID), (2, views.C_LKP)]
    return tuple(lanes)


def _lane_lo(point, lane: int, lane_bits: int, lb: int):
    """Low-bits point for `lane`: lane bits replace the first lane_bits
    coordinates of the opened point; truncate to the aggregate domain.

    Host-side numpy on purpose: each distinct point length otherwise
    compiles its own stack/concatenate kernels (~1s apiece on the
    remote-attached platform) for pure data movement."""
    point = np.asarray(point)
    bits = np.zeros((lane_bits, 2), dtype=np.uint64)
    for j in range(lane_bits):
        bits[j, 0] = (lane >> j) & 1
    return np.concatenate([bits, point[lane_bits:]], axis=0)[:lb]


def _extra_points(spec, pts_list, lane_bits: int, lb: int):
    return tuple((pidx, _lane_lo(pts_list[pidx], lane, lane_bits, lb))
                 for pidx, lane in spec)


class _LaneEvals:
    """ev(pidx, lane): bound lane evaluation of a multi-opened commitment.

    Recursive mode reads the shockwave-bound extra claims; naive mode
    evaluates the transmitted aggregates."""

    def __init__(self, spec, opening, pts_list, lane_bits, lb, extra_evals):
        self.spec = tuple(spec)
        self.opening = opening
        self.pts_list = pts_list
        self.lane_bits = lane_bits
        self.lb = lb
        self.extra_evals = extra_evals

    def __call__(self, pidx: int, lane: int):
        if lane == 0:
            return self.opening.eval_claims[pidx]
        if self.extra_evals is not None:
            return self.extra_evals[self.spec.index((pidx, lane))]
        lo = _lane_lo(self.pts_list[pidx], lane, self.lane_bits, self.lb)
        return poly.evaluate_vector(self.opening.aggrs[pidx], lo)


class _GroupLaneEvals:
    """ev(pidx, lane) over ONE entry of a group opening: lane 0 is the
    entry's eval claim at point pidx; nonzero lanes are the entry's
    recursion-bound extra claims (same spec order as the prover)."""

    def __init__(self, spec, eval_claims, extra_evals):
        self.spec = tuple(spec)
        self.eval_claims = eval_claims
        self.extra_evals = extra_evals

    def __call__(self, pidx: int, lane: int):
        if lane == 0:
            return self.eval_claims[pidx]
        return self.extra_evals[self.spec.index((pidx, lane))]


def _open_multi(chunk_fn, com, pts_list, state, config: HobbitConfig,
                full=None, spec=(), lane_bits: int = 0,
                v_min_len: int = 0, sw_pad: int = 0):
    """Dispatch naive vs recursive multi-open per config.recursion."""
    if config.recursion:
        lb = int(np.log2(com.params.B))
        return elastic.open_stream_multi_recursive(
            chunk_fn, com, pts_list, state, full=full,
            extra_points=_extra_points(spec, pts_list, lane_bits, lb),
            sw_queries=config.shockwave_queries,
            v_min_len=v_min_len, sw_pad=sw_pad)
    return elastic.open_stream_multi(chunk_fn, com, pts_list, state,
                                     full=full)


def _verify_multi(root, pts_list, opening, params, state,
                  config: HobbitConfig, spec=(), lane_bits: int = 0,
                  v_min_len: int = 0, sw_pad: int = 0):
    """Returns (ok, lane_evals, state)."""
    if config.recursion:
        lb = int(np.log2(params.B))
        extra = _extra_points(spec, pts_list, lane_bits, lb)
        ok, extra_evals, state = elastic.verify_multi_recursive(
            root, pts_list, opening, params, state, extra_points=extra,
            sw_queries=config.shockwave_queries,
            v_min_len=v_min_len, sw_pad=sw_pad)
        if extra_evals is None:          # structural reject (query mismatch)
            return jnp.array(False), None, state
        ev = _LaneEvals(spec, opening, pts_list, lane_bits,
                        int(np.log2(params.B)), extra_evals)
        return ok, ev, state
    ok, state = elastic.verify_multi(root, pts_list, opening, params, state)
    ev = _LaneEvals(spec, opening, pts_list, lane_bits,
                    int(np.log2(params.B)), None)
    return bool(ok), ev, state


def _direct_circuit_lanes(program: trc.CircuitProgram, g: Geometry, pts_c):
    """clane(pidx, lane) for the UNCOMMITTED-circuit mode.

    The verifier KNOWS the circuit (reference ``prove_circuit``,
    main.cpp:862-983) and evaluates the description MLE itself — no
    opening is transmitted.  Every pts_c point is (4 zero lane bits ||
    rest); clane(p, lane) is the cpoly MLE at (lane bits || rest_p),
    which restricts to lane vector `lane`'s MLE at rest_p because the
    lane bits are binary.  One batched kernel evaluates all 16 lanes at
    every point (O(np2) device work per point — the same class as
    recomputing the public circuit root)."""
    lanes = views.circuit_lane_chunk(program, 0, g.np2).reshape(
        g.np2, views.C_LANES, 2)
    rest = np.stack([np.asarray(p)[4:] for p in pts_c])   # [P, log_np2, 2]
    evs = _direct_lane_kernel(lanes, jnp.asarray(rest))   # [P, 16, 2]
    return lambda pidx, lane: evs[pidx, lane]


def _direct_lane_kernel(lanes, rest):
    return _direct_lane_jit(lanes, rest)


from ..utils.jitting import maybe_jit as _maybe_jit


@_maybe_jit
def _direct_lane_jit(lanes, rest):
    import jax

    def per_point(r):
        beta = poly.beta_table(r)                         # [np2, 2]
        return F.fsum(F.fmul(beta[:, None, :], lanes), axis=0)

    return jax.vmap(per_point)(rest)                      # [P, 16, 2]


def _opening_points(gc_proof, p_w, p_l, g: Geometry, lookup_mode: bool):
    """Per-commitment lists of full opening points (host numpy — point
    assembly is pure data movement; device concatenates cost one XLA
    compile per distinct shape)."""
    z1 = np.zeros((1, 2), dtype=np.uint64)
    rho_gc = np.concatenate([np.asarray(gc_proof.mem_proof.challenges),
                             np.asarray(gc_proof.bind_proof.challenges)],
                            axis=0)
    p_w = np.asarray(p_w)
    tau_w = p_w[2:2 + g.log_np2]
    pts = {
        "w": [np.concatenate([z1, z1, rho_gc], axis=0),
              np.concatenate([z1, z1, tau_w], axis=0)],
        "c": [np.concatenate([z1, z1, z1, z1, rho_gc], axis=0),
              np.concatenate([z1, z1, z1, z1, tau_w], axis=0)],
    }
    if lookup_mode:
        tau_l = np.asarray(p_l)[: int(np.log2(g.size_l))]
        tau_l_np2 = tau_l[: g.log_np2]
        pts["c"].append(np.concatenate([z1, z1, z1, z1, tau_l_np2], axis=0))
        pts["l"] = [np.concatenate([z1, z1, rho_gc], axis=0),
                    np.concatenate([z1, z1, tau_l_np2], axis=0)]
        pts["t"] = [tau_l[: int(np.log2(g.TS))]]
    return pts


# ---------------------------------------------------------------------------
# Verifier (succinct: transcript replay + openings + O(TS) table work)
# ---------------------------------------------------------------------------

def _scale_high(point, lo_bits: int):
    """prod_{j >= lo_bits} (1 - point_j): restriction of an eq-eval to the
    low block (streams shorter than the domain, zero-padded)."""
    one = F.scalar(1)
    acc = one
    for j in range(lo_bits, point.shape[0]):
        acc = F.fmul(acc, F.fsub(one, point[j]))
    return acc


def verify(proof: CircuitProof, program: trc.CircuitProgram,
           config: HobbitConfig, circuit_root,
           pc_rows: Optional[int] = None):
    """Full succinct verification; returns (ok, state).

    Public inputs: the circuit-description root (from ``commit_circuit`` —
    recompute once or trust), the geometry, and the lookup tables.  The
    gate trace is NEVER re-executed."""
    g = geometry(program, config)
    ok = jnp.array(True)
    state = mimc.fresh_state()
    state = _absorb_root(state, circuit_root)
    state = _absorb_root(state, proof.witness_root)
    if proof.lookup_mode:
        state = _absorb_root(state, proof.lookup_root)
        state = _absorb_root(state, proof.counts_root)

    state, ab = mimc.squeeze(state, 2)
    a, b = ab[0], ab[1]

    # ---- wiring mul-tree + permutation identity -------------------------
    w_checks = []
    if config.recursion:
        okw, p_w, c_w, state, w_checks = mts.verify_batched(
            proof.wiring_proof, state, pc_rows=pc_rows or 4,
            pc_queries=config.resolved_pc_queries(), defer=True)
    else:
        okw, p_w, c_w, state = mts.verify_batched(
            proof.wiring_proof, state, pc_rows=pc_rows or 4,
            pc_queries=config.resolved_pc_queries())
    ok = jnp.logical_and(ok, okw)
    out = proof.wiring_proof.output
    ok = jnp.logical_and(ok, F.feq(F.fmul(out[0], out[3]),
                                   F.fmul(out[1], out[2])))

    p_l = c_l = None
    if proof.lookup_mode:
        if config.recursion:
            okl, p_l, c_l, state, l_checks = mts.verify_batched(
                proof.lookup_proof, state, pc_rows=pc_rows or 4,
                pc_queries=config.resolved_pc_queries(), defer=True)
            w_checks += l_checks
        else:
            okl, p_l, c_l, state = mts.verify_batched(
                proof.lookup_proof, state, pc_rows=pc_rows or 4,
                pc_queries=config.resolved_pc_queries())
        ok = jnp.logical_and(ok, okl)
        out = proof.lookup_proof.output
        ok = jnp.logical_and(ok, F.feq(F.fmul(out[0], out[3]),
                                       F.fmul(out[1], out[2])))

    # ---- gate consistency ----------------------------------------------
    state, r_gc = mimc.squeeze(state, g.log_np2)
    if proof.lookup_mode:
        res, state = fs.verify(proof.gc_proof, g.B_gc, r_gc, state)
        ok = jnp.logical_and(ok, res.ok)
        S = res.group_sums
        ok = jnp.logical_and(ok, F.feq(F.fadd(S[0], S[1]), S[2]))
        ok = jnp.logical_and(ok, F.feq(S[3], S[4]))
        ok = jnp.logical_and(ok, F.feq(S[5], S[6]))
        ok = jnp.logical_and(ok, F.feq(S[7], S[8]))
        gc_point, gc_evals = res.point, res.stream_evals
    else:
        res, state = gc.verify(proof.gc_proof, g.B_gc, r_gc, state)
        ok = jnp.logical_and(ok, res.ok)
        gc_point, gc_evals = res.point, res.stream_evals

    # ---- openings --------------------------------------------------------
    pts = _opening_points(proof.gc_proof, p_w, p_l, g, proof.lookup_mode)
    w_params = _pc_params(4 * g.np2, config, pc_rows)
    c_params = _pc_params(16 * g.np2, config, pc_rows)
    cntE = None
    if config.recursion:
        if not isinstance(proof.open_proof, elastic.ElasticGroupOpening):
            return False, state      # structural: proof/config mode mismatch
        lb_w = int(np.log2(w_params.B))
        items = [elastic.GroupItem(
            params=w_params, points=tuple(pts["w"]),
            extra_points=_extra_points(_W_LANE_SPEC, pts["w"], 2, lb_w))]
        roots = [proof.witness_root]
        if config.committed_circuit:
            lb_c = int(np.log2(c_params.B))
            items.append(elastic.GroupItem(
                params=c_params, points=tuple(pts["c"]),
                extra_points=_extra_points(_c_lane_spec(proof.lookup_mode),
                                           pts["c"], 4, lb_c)))
            roots.append(circuit_root)
        if proof.lookup_mode:
            l_params = _pc_params(4 * g.np2, config, pc_rows)
            t_params = _pc_params(g.TS, config, pc_rows,
                                  b_cap=w_params.B)
            lb_l = int(np.log2(l_params.B))
            items.append(elastic.GroupItem(
                params=l_params, points=tuple(pts["l"]),
                extra_points=_extra_points(_L_LANE_SPEC, pts["l"], 2,
                                           lb_l)))
            roots.append(proof.lookup_root)
            items.append(elastic.GroupItem(params=t_params,
                                           points=tuple(pts["t"])))
            roots.append(proof.counts_root)
        bound0 = len(items)
        for check in w_checks:
            items.append(elastic.GroupItem(params=check["params"],
                                           points=tuple(check["points"])))
            roots.append(check["root"])
        opening = proof.open_proof
        if len(opening.eval_claims) != len(items) or \
           len(opening.replies) != len(items):
            return False, state      # structural: entry count mismatch
        okg, extra_pe, state = elastic.verify_group_recursive(
            roots, items, opening, state,
            sw_queries=config.shockwave_queries)
        ok = jnp.logical_and(ok, okg)
        ec = opening.eval_claims
        wlane = _GroupLaneEvals(_W_LANE_SPEC, ec[0], extra_pe[0])
        idx = 1
        if config.committed_circuit:
            clane = _GroupLaneEvals(_c_lane_spec(proof.lookup_mode),
                                    ec[idx], extra_pe[idx])
            idx += 1
        else:
            clane = _direct_circuit_lanes(program, g, pts["c"])
        llane = None
        if proof.lookup_mode:
            llane = _GroupLaneEvals(_L_LANE_SPEC, ec[idx], extra_pe[idx])
            idx += 1
            cntE = ec[idx][0]
            idx += 1
        # deferred boundary claim binding (wiring/lookup batch tops)
        for bi, check in enumerate(w_checks):
            ok = jnp.logical_and(ok, F.feq(ec[bound0 + bi][0],
                                           check["want"][0]))
            ok = jnp.logical_and(ok, F.feq(ec[bound0 + bi][1],
                                           check["want"][1]))
    else:
        if not isinstance(proof.open_proof, NaiveOpens):
            return False, state      # structural: proof/config mode mismatch
        opens = proof.open_proof
        oko, wlane, state = _verify_multi(proof.witness_root, pts["w"],
                                          opens.w, w_params, state, config,
                                          spec=_W_LANE_SPEC, lane_bits=2)
        ok = jnp.logical_and(ok, oko)
        if (opens.c is None) != (not config.committed_circuit):
            return False, state      # structural: proof/config mode mismatch
        if config.committed_circuit:
            oko, clane, state = _verify_multi(
                circuit_root, pts["c"], opens.c, c_params, state, config,
                spec=_c_lane_spec(proof.lookup_mode), lane_bits=4)
            ok = jnp.logical_and(ok, oko)
        else:
            clane = _direct_circuit_lanes(program, g, pts["c"])
        llane = None
        if proof.lookup_mode:
            l_params = _pc_params(4 * g.np2, config, pc_rows)
            t_params = _pc_params(g.TS, config, pc_rows,
                                  b_cap=w_params.B)
            oko, llane, state = _verify_multi(proof.lookup_root, pts["l"],
                                              opens.l, l_params, state,
                                              config, spec=_L_LANE_SPEC,
                                              lane_bits=2)
            ok = jnp.logical_and(ok, oko)
            oko, _, state = _verify_multi(proof.counts_root, pts["t"],
                                          opens.t, t_params, state, config)
            ok = jnp.logical_and(ok, oko)
            cntE = opens.t.eval_claims[0]
        if wlane is None or clane is None or (proof.lookup_mode and
                                              llane is None):
            return False, state      # structural reject (query mismatch)

    # ---- lane evaluations ------------------------------------------------
    # lane 0 of each opened point is that opening's eval claim; nonzero
    # lanes are recursion-bound extra claims (or, in naive mode, direct
    # evaluations of the transmitted aggregates).
    tau_w = p_w[2:2 + g.log_np2]

    # ---- gate-consistency stream binding --------------------------------
    L_gc, R_gc, O_gc = wlane(0, 0), wlane(0, 1), wlane(0, 2)
    ok = jnp.logical_and(ok, F.feq(gc_evals["L"], L_gc))
    ok = jnp.logical_and(ok, F.feq(gc_evals["R"], R_gc))
    ok = jnp.logical_and(ok, F.feq(gc_evals["O"], O_gc))
    ok = jnp.logical_and(ok, F.feq(gc_evals["sa"], clane(0, views.C_ADD)))
    ok = jnp.logical_and(ok, F.feq(gc_evals["sm"], clane(0, views.C_MUL)))
    if proof.lookup_mode:
        ok = jnp.logical_and(ok, F.feq(gc_evals["M"],
                                       F.fsub(F.fadd(L_gc, R_gc), O_gc)))
        ok = jnp.logical_and(ok, F.feq(gc_evals["slkp"],
                                       clane(0, views.C_LKP)))
        ok = jnp.logical_and(ok, F.feq(gc_evals["Lm"], llane(0, views.L_LM)))
        ok = jnp.logical_and(ok, F.feq(gc_evals["Rm"], llane(0, views.L_RM)))
        ok = jnp.logical_and(ok, F.feq(gc_evals["Om"], llane(0, views.L_OM)))

    # ---- wiring level-0 claim derivation --------------------------------
    sigma_w = p_w[:2]
    v_w = p_w[2 + g.log_np2:]
    beta_s = poly.beta_table(sigma_w)        # [4, 2]
    beta_v = poly.beta_table(v_w)            # [4, 2]
    one = F.scalar(1)

    idxE = (clane(1, views.C_IDXL), clane(1, views.C_IDXR),
            clane(1, views.C_IDXO))
    accE = (clane(1, views.C_ACCL), clane(1, views.C_ACCR), None)
    valE = (wlane(1, 0), wlane(1, 1), wlane(1, 2))
    rgE = F.fadd(F.fadd(clane(1, views.C_ADD), clane(1, views.C_MUL)),
                 clane(1, views.C_LKP))
    reads_e = one
    for s in range(3):
        term = F.fadd(idxE[s], F.fmul(a, valE[s]))
        if accE[s] is not None:
            term = F.fadd(term, F.fmul(b, accE[s]))
        reads_e = F.fadd(reads_e, F.fmul(beta_s[s], term))
    writes_e = F.fadd(reads_e, F.fmul(
        b, F.fmul(F.fadd(F.fadd(beta_s[0], beta_s[1]), beta_s[2]), rgE)))
    fvalE = wlane(1, 3)              # fpoly = wpoly lane 3 at tau_w
    fidxE = clane(1, views.C_FIDX)
    fcntE = clane(1, views.C_FCNT)
    finpE = clane(1, views.C_FINP)
    init_e = F.fadd(one, F.fmul(beta_s[0], F.fadd(
        fidxE, F.fadd(F.fmul(a, fvalE), F.fmul(b, finpE)))))
    fin_e = F.fadd(one, F.fmul(beta_s[0], F.fadd(
        fidxE, F.fadd(F.fmul(a, fvalE), F.fmul(b, fcntE)))))
    v0_w = F.fadd(
        F.fadd(F.fmul(beta_v[0], reads_e), F.fmul(beta_v[1], writes_e)),
        F.fadd(F.fmul(beta_v[2], init_e), F.fmul(beta_v[3], fin_e)))
    ok = jnp.logical_and(ok, F.feq(c_w, v0_w))

    # ---- lookup level-0 claim derivation --------------------------------
    if proof.lookup_mode:
        log_sl = int(np.log2(g.size_l))
        tau_l = p_l[:log_sl]
        v_l = p_l[log_sl:]
        beta_vl = poly.beta_table(v_l)
        scale_np2 = _scale_high(tau_l, g.log_np2)

        LmE, RmE = llane(1, views.L_LM), llane(1, views.L_RM)
        OmE, rankE = llane(1, views.L_OM), llane(1, views.L_RANK)
        tidE = clane(2, views.C_TID)
        lkpE = clane(2, views.C_LKP)
        addrE = F.fadd(F.fmul(F.scalar(g.table_size), tidE),
                       F.fadd(LmE, F.fmul(F.scalar(256), RmE)))
        lkread = F.fadd(one, F.fmul(scale_np2, F.fadd(
            addrE, F.fadd(F.fmul(a, OmE), F.fmul(b, rankE)))))
        lkwrite = F.fadd(lkread, F.fmul(scale_np2, F.fmul(b, lkpE)))

        # table init/final: public O(TS) evaluation + committed counts
        log_ts = int(np.log2(g.TS))
        tau_ts = tau_l[:log_ts]
        scale_ts = _scale_high(tau_l, log_ts)
        tab_addr = jnp.arange(g.TS, dtype=jnp.int64)
        tab_vals = views.padded_table_values(program.tables, g.table_size,
                                             g.TS)
        pub = F.fadd(
            jnp.stack([tab_addr.astype(jnp.uint64),
                       jnp.zeros_like(tab_addr, dtype=jnp.uint64)],
                      axis=-1),
            F.fmul(a[None, :],
                   jnp.stack([tab_vals, jnp.zeros_like(tab_vals)], axis=-1)))
        pubE = poly.evaluate_vector(pub, tau_ts)
        init_e = F.fadd(one, F.fmul(scale_ts, pubE))
        fin_e = F.fadd(one, F.fmul(scale_ts,
                                   F.fadd(pubE, F.fmul(b, cntE))))
        v0_l = F.fadd(
            F.fadd(F.fmul(beta_vl[0], lkread), F.fmul(beta_vl[1], lkwrite)),
            F.fadd(F.fmul(beta_vl[2], init_e), F.fmul(beta_vl[3], fin_e)))
        ok = jnp.logical_and(ok, F.feq(c_l, v0_l))

    return bool(ok), state


__all__ = ["CircuitProof", "Geometry", "geometry", "commit_circuit",
           "prove", "verify"]
