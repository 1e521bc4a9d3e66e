"""Gate-trace substrate: level-batched circuit programs and trace oracles.

The reference re-evaluates the workload circuit in a producer pthread that
emits ``tr_tuple{value,idx,access,type}`` records into a ring buffer
(``src/Seval.cpp:96-222``, ``src/witness_stream.cpp``).  The TPU-native
re-design replaces the thread with a *re-executable, vectorized program*:

* a circuit is a static list of LEVELS; all gates in a level depend only on
  earlier levels, so evaluation is a per-level gather -> op -> scatter over
  a wire-slot memory (every level is one fused tensor op);
* wire labels are renamed to reusable SLOTS by a host-side linear-scan
  allocator, so live memory is O(max live wires), not O(gates) — the
  analog of the reference's ``delete_gate`` reclamation;
* access counters and final read counts depend only on topology, never on
  values, so they are precomputed once on the host (numpy) — the streaming
  passes get them for free.

Offline memory checking convention (mirrors Seval.cpp gate emitters):
creation performs READ(o, v, 0) / WRITE(o, v, 1); each use performs
READ(w, v, c) / WRITE(w, v, c+1); FINAL(w, v, c_last).  Multiset identity:
READS u FINAL == WRITES u INIT with INIT = (w, v, 0).
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from ..ops import field as F

# Gate types (tr_tuple.type, Seval.h:4-17)
T_PAD = 0       # padding / no-op (reference uses 0 for delete records)
T_ADD = 1
T_MUL = 2
T_LOOKUP0 = 3   # type >= 3: lookup into table (type - 3)


class Level(NamedTuple):
    """One topological level of gates (all arrays length m)."""
    types: np.ndarray     # [m] uint8
    idx_o: np.ndarray     # [m] int64 global wire labels
    idx_l: np.ndarray     # [m]
    idx_r: np.ndarray     # [m]


class CircuitProgram(NamedTuple):
    levels: tuple                 # of Level
    num_inputs: int               # wires 0..num_inputs-1 are inputs
    num_wires: int                # num_inputs + total gates
    num_gates: int
    # static analysis results:
    slot_of_wire: np.ndarray      # [num_wires] int64 slot assignment
    num_slots: int
    acc_l: np.ndarray             # [num_gates] read count of l before gate
    acc_r: np.ndarray             # [num_gates] (after l's increment if same)
    final_count: np.ndarray       # [num_wires] total read count
    tables: tuple                 # of np.ndarray [table_size] uint64 (real)


class Trace(NamedTuple):
    """Materialized trace: per-gate tuples (device arrays)."""
    types: jnp.ndarray    # [N] int32
    idx_o: jnp.ndarray    # [N] int64
    idx_l: jnp.ndarray
    idx_r: jnp.ndarray
    val_o: jnp.ndarray    # [N, 2]
    val_l: jnp.ndarray
    val_r: jnp.ndarray
    acc_l: jnp.ndarray    # [N] int64
    acc_r: jnp.ndarray
    # final pass (one record per wire, ordered by wire label):
    fin_idx: jnp.ndarray  # [W] int64
    fin_val: jnp.ndarray  # [W, 2]
    fin_cnt: jnp.ndarray  # [W] int64

    @property
    def num_gates(self) -> int:
        return int(self.types.shape[0])

    @property
    def num_wires(self) -> int:
        return int(self.fin_idx.shape[0])


def analyze(levels: Sequence[Level], num_inputs: int,
            tables: Sequence[np.ndarray] = ()) -> CircuitProgram:
    """Host-side static analysis (vectorized): access counters, final read
    counts, and register-slot allocation."""
    num_gates = sum(len(l.types) for l in levels)
    num_wires = num_inputs + num_gates

    # --- access counters: acc of read k = 1 + (# earlier reads of wire) ---
    # reads in sequential order: (l, r) per gate, gates in level order.
    all_l = np.concatenate([l.idx_l for l in levels]) if levels else \
        np.zeros(0, np.int64)
    all_r = np.concatenate([l.idx_r for l in levels]) if levels else \
        np.zeros(0, np.int64)
    reads = np.stack([all_l, all_r], axis=1).reshape(-1)
    order = np.argsort(reads, kind="stable")
    sorted_reads = reads[order]
    pos = np.arange(len(reads), dtype=np.int64)
    if len(reads):
        run_start = np.concatenate(
            [[True], sorted_reads[1:] != sorted_reads[:-1]])
        start_idx = np.maximum.accumulate(np.where(run_start, pos, 0))
        ranks_sorted = pos - start_idx
        ranks = np.empty(len(reads), dtype=np.int64)
        ranks[order] = ranks_sorted
    else:
        ranks = np.zeros(0, dtype=np.int64)
    accs = (ranks + 1).reshape(num_gates, 2)
    acc_l, acc_r = accs[:, 0].copy(), accs[:, 1].copy()
    final_count = np.ones(num_wires, dtype=np.int64)
    np.add.at(final_count, reads, 1)

    # --- last-read level per wire -> slot reuse ---------------------------
    last_use = np.full(num_wires, -1, dtype=np.int64)
    for li, lvl in enumerate(levels):
        np.maximum.at(last_use, lvl.idx_l, li)
        np.maximum.at(last_use, lvl.idx_r, li)

    slot_of_wire = np.full(num_wires, -1, dtype=np.int64)
    slot_of_wire[:num_inputs] = np.arange(num_inputs)
    next_slot = num_inputs
    free = np.zeros(0, dtype=np.int64)
    # group wires by expiry level (slot freed at last_use + 1)
    expiry: dict = {}
    for li, lvl in enumerate(levels):
        dead = expiry.pop(li, None)
        if dead is not None:
            free = np.concatenate([free, slot_of_wire[dead]])
        m = len(lvl.types)
        take = min(len(free), m)
        slots = np.empty(m, dtype=np.int64)
        if take:
            slots[:take] = free[len(free) - take:]
            free = free[: len(free) - take]
        if m > take:
            slots[take:] = np.arange(next_slot, next_slot + m - take)
            next_slot += m - take
        slot_of_wire[lvl.idx_o] = slots
        lus = last_use[lvl.idx_o]
        for lu in np.unique(lus[lus >= 0]):
            ws = lvl.idx_o[lus == lu]
            key = int(lu) + 1
            expiry[key] = np.concatenate([expiry[key], ws]) \
                if key in expiry else ws
    num_slots = next_slot

    return CircuitProgram(
        levels=tuple(levels), num_inputs=num_inputs, num_wires=num_wires,
        num_gates=num_gates, slot_of_wire=slot_of_wire, num_slots=num_slots,
        acc_l=acc_l, acc_r=acc_r, final_count=final_count,
        tables=tuple(np.asarray(t, dtype=np.uint64) for t in tables),
    )


def _apply_level(mem, lvl: Level, slot_of, tables):
    """One level: gather inputs, compute, scatter outputs.  mem: [S, 2]."""
    sl = jnp.asarray(slot_of[lvl.idx_l])
    sr = jnp.asarray(slot_of[lvl.idx_r])
    so = jnp.asarray(slot_of[lvl.idx_o])
    vl = mem[sl]
    vr = mem[sr]
    types = jnp.asarray(lvl.types.astype(np.int32))
    add_v = F.fadd(vl, vr)
    mul_v = F.fmul(vl, vr)
    out = jnp.where((types == T_ADD)[:, None], add_v, mul_v)
    if tables:
        # lookup gates: value = table[type-3][key], key = vl.re + 256*vr.re
        key = (vl[:, 0] + np.uint64(256) * vr[:, 0]).astype(jnp.int64)
        for ti, tab in enumerate(tables):
            tabv = jnp.asarray(tab)
            safe = jnp.clip(key, 0, tabv.shape[0] - 1)
            lk = jnp.stack([tabv[safe],
                            jnp.zeros_like(tabv[safe])], axis=-1)
            out = jnp.where((types == T_LOOKUP0 + ti)[:, None], lk, out)
    mem = mem.at[so].set(out)
    return mem, (vl, vr, out)


def execute(program: CircuitProgram, inputs,
            prefer_native: bool = True) -> Trace:
    """Evaluate the whole program, materializing the trace.

    inputs: [num_inputs, 2] field array.  Returns per-gate tuples in level
    order plus the final-pass records for all wires.

    With ``prefer_native`` (default) the gate evaluation runs in the C++
    runtime when available (the reference's producer, Seval.cpp; ~20M
    gates/s host-side) — bit-identical to the device path, which remains
    the fallback and the reference implementation for tests."""
    from ..utils.jitting import JIT_ENABLED
    if JIT_ENABLED and program.num_gates > 0:
        # production path: evaluate ON DEVICE as one compiled program —
        # only the inputs cross the host->device link (the trace itself
        # never does; on a remote-attached TPU that link dominates)
        return _execute_device_jit(program, inputs)
    if prefer_native:
        try:
            from ..runtime import native_rt as rt
            if rt.available() and program.num_gates > 0:
                return _execute_native(program, inputs, rt)
        except Exception:
            pass
    return _execute_device(program, inputs)


_DEVICE_EVAL_CACHE: dict = {}


def _execute_device_jit(program: CircuitProgram, inputs) -> Trace:
    import jax

    key = id(program)
    hit = _DEVICE_EVAL_CACHE.get(key)
    if hit is None or hit[0] is not program:
        def run(x):
            return _execute_device(program, x)

        hit = (program, jax.jit(run))
        _DEVICE_EVAL_CACHE[key] = hit
    return hit[1](inputs)


def _execute_native(program: CircuitProgram, inputs, rt) -> Trace:
    x = np.ascontiguousarray(np.asarray(inputs, dtype=np.uint64))
    L, R, O = rt.eval_program(program, x)
    idx_o = np.concatenate([l.idx_o for l in program.levels])
    label_vals = np.zeros((program.num_wires, 2), dtype=np.uint64)
    label_vals[: program.num_inputs] = x
    label_vals[idx_o] = O
    types = np.concatenate([l.types for l in program.levels]).astype(np.int32)
    idx_l = np.concatenate([l.idx_l for l in program.levels])
    idx_r = np.concatenate([l.idx_r for l in program.levels])
    # ship the three value streams as ONE host->device transfer
    vals = jnp.asarray(np.stack([L, R, O]))
    return Trace(
        types=jnp.asarray(types),
        idx_o=jnp.asarray(idx_o), idx_l=jnp.asarray(idx_l),
        idx_r=jnp.asarray(idx_r),
        val_o=vals[2], val_l=vals[0], val_r=vals[1],
        acc_l=jnp.asarray(program.acc_l), acc_r=jnp.asarray(program.acc_r),
        fin_idx=jnp.arange(program.num_wires, dtype=jnp.int64),
        fin_val=jnp.asarray(label_vals),
        fin_cnt=jnp.asarray(program.final_count),
    )


def _execute_device(program: CircuitProgram, inputs) -> Trace:
    mem = jnp.zeros((program.num_slots, 2), dtype=jnp.uint64)
    mem = mem.at[jnp.asarray(program.slot_of_wire[:program.num_inputs])].set(inputs)

    vls, vrs, vos = [], [], []
    label_vals = jnp.zeros((program.num_wires, 2), dtype=jnp.uint64)
    label_vals = label_vals.at[:program.num_inputs].set(inputs)
    for lvl in program.levels:
        mem, (vl, vr, vo) = _apply_level(mem, lvl, program.slot_of_wire,
                                         program.tables)
        vls.append(vl)
        vrs.append(vr)
        vos.append(vo)
        label_vals = label_vals.at[jnp.asarray(lvl.idx_o)].set(vo)

    types = np.concatenate([l.types for l in program.levels]).astype(np.int32)
    idx_o = np.concatenate([l.idx_o for l in program.levels])
    idx_l = np.concatenate([l.idx_l for l in program.levels])
    idx_r = np.concatenate([l.idx_r for l in program.levels])

    all_vals = label_vals                          # ordered by wire label

    return Trace(
        types=jnp.asarray(types),
        idx_o=jnp.asarray(idx_o), idx_l=jnp.asarray(idx_l),
        idx_r=jnp.asarray(idx_r),
        val_o=jnp.concatenate(vos, axis=0),
        val_l=jnp.concatenate(vls, axis=0),
        val_r=jnp.concatenate(vrs, axis=0),
        acc_l=jnp.asarray(program.acc_l), acc_r=jnp.asarray(program.acc_r),
        fin_idx=jnp.arange(program.num_wires, dtype=jnp.int64),
        fin_val=all_vals,
        fin_cnt=jnp.asarray(program.final_count),
    )


class TraceOracle:
    """Re-streamable chunk source over a program + inputs.

    ``materialize=True`` keeps the whole trace resident (fast, memory O(N));
    ``materialize=False`` re-executes the program on every pass and yields
    chunks level-window by level-window, keeping only the slot memory and
    one chunk resident — the space-efficient mode (sublinear in N whenever
    the circuit's live width is)."""

    def __init__(self, program: CircuitProgram, inputs, materialize=True):
        self.program = program
        self.inputs = inputs
        self.materialize = materialize
        self._trace: Optional[Trace] = None
        if materialize:
            self._trace = execute(program, inputs)

    @property
    def num_gates(self) -> int:
        return self.program.num_gates

    @property
    def num_wires(self) -> int:
        return self.program.num_wires

    def trace(self) -> Trace:
        if self._trace is None:
            return execute(self.program, self.inputs)
        return self._trace

    def gate_chunks(self, chunk: int):
        """Yield Trace slices of ``chunk`` gates (zero-padded at the end)."""
        tr = self.trace()
        n = tr.num_gates
        for s in range(0, n, chunk):
            e = min(s + chunk, n)
            yield _slice_pad(tr, s, e, chunk)

    def final_chunks(self, chunk: int):
        tr = self.trace()
        w = tr.num_wires
        for s in range(0, w, chunk):
            e = min(s + chunk, w)
            pad = chunk - (e - s)
            idx = jnp.pad(tr.fin_idx[s:e], (0, pad))
            val = jnp.pad(tr.fin_val[s:e], ((0, pad), (0, 0)))
            cnt = jnp.pad(tr.fin_cnt[s:e], (0, pad))
            yield idx, val, cnt, e - s


def _slice_pad(tr: Trace, s: int, e: int, chunk: int) -> Trace:
    pad = chunk - (e - s)

    def p1(a):
        return jnp.pad(a[s:e], (0, pad))

    def p2(a):
        return jnp.pad(a[s:e], ((0, pad), (0, 0)))

    return Trace(
        types=p1(tr.types), idx_o=p1(tr.idx_o), idx_l=p1(tr.idx_l),
        idx_r=p1(tr.idx_r), val_o=p2(tr.val_o), val_l=p2(tr.val_l),
        val_r=p2(tr.val_r), acc_l=p1(tr.acc_l), acc_r=p1(tr.acc_r),
        fin_idx=tr.fin_idx[0:0], fin_val=tr.fin_val[0:0],
        fin_cnt=tr.fin_cnt[0:0],
    )


__all__ = [
    "T_PAD", "T_ADD", "T_MUL", "T_LOOKUP0",
    "Level", "CircuitProgram", "Trace", "analyze", "execute", "TraceOracle",
]
