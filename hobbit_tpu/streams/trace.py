"""Gate-trace substrate: level-batched circuit programs and trace oracles.

The reference re-evaluates the workload circuit in a producer pthread that
emits ``tr_tuple{value,idx,access,type}`` records into a ring buffer
(``src/Seval.cpp:96-222``, ``src/witness_stream.cpp``).  The TPU-native
re-design replaces the thread with a *re-executable, vectorized program*:

* a circuit is a static list of LEVELS; all gates in a level depend only on
  earlier levels, so evaluation is a per-level gather -> op -> scatter over
  a wire-slot memory (every level is one fused tensor op);
* wire labels are renamed to reusable SLOTS by a host-side linear-scan
  allocator — inputs included: an input's slot is allocated at its first
  use and freed after its last, so live memory is O(max live wires), not
  O(gates) — the analog of the reference's ``delete_gate`` reclamation;
* access counters and final read counts depend only on topology, never on
  values, so they are precomputed once on the host (numpy) — the streaming
  passes get them for free.

Streaming (``materialize=False``) is REAL: ``stream_segments`` re-executes
the program level window by level window with only the slot memory and the
current level's arrays resident on device; final wire values are emitted
the moment a wire dies (its slot is about to be reclaimed), exactly like
the reference's ``delete_gate`` records (``Seval.cpp:119-222``).  The
canonical order of the final stream is therefore DEATH ORDER —
``(death_level, wire_label)`` — identical in the materialized and windowed
modes (the materialized path applies the statically-known permutation).

Offline memory checking convention (mirrors Seval.cpp gate emitters):
creation performs READ(o, v, 0) / WRITE(o, v, 1); each use performs
READ(w, v, c) / WRITE(w, v, c+1); FINAL(w, v, c_last).  Multiset identity:
READS u FINAL == WRITES u INIT with INIT = (w, v, 0) for gate wires and
(w, v, 1) for inputs.
"""

from __future__ import annotations

from typing import Callable, List, NamedTuple, Optional, Sequence, Union

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


class LevelPlan(NamedTuple):
    """Static per-level execution plan (all host numpy).

    Execution order within one level step:
      1. emit finals of wires dying now (``die_*``: slot gather from mem —
         their slots are about to be reclaimed);
      2. feed inputs first used at this level (``feed_*``: scatter into
         freshly-allocated slots);
      3. execute the gates (gather sl/sr -> op -> scatter so).
    """
    types: np.ndarray     # [m]
    sl: np.ndarray        # [m] slot of left operand
    sr: np.ndarray
    so: np.ndarray
    idx_o: np.ndarray     # [m] wire labels (for trace records)
    idx_l: np.ndarray
    idx_r: np.ndarray
    acc_l: np.ndarray     # [m] access counters
    acc_r: np.ndarray
    feed_slots: np.ndarray    # [f] slots to fill from the input source
    feed_labels: np.ndarray   # [f] input wire labels
    die_slots: np.ndarray     # [d] slots holding dying wires' values
    die_labels: np.ndarray    # [d]
    die_cnt: np.ndarray       # [d] final access counts


class CircuitProgram(NamedTuple):
    levels: tuple                 # of Level
    num_inputs: int               # wires 0..num_inputs-1 are inputs
    num_wires: int                # num_inputs + total gates
    num_gates: int
    # static analysis results:
    plans: tuple                  # of LevelPlan
    num_slots: int                # peak live wires (the space bound)
    acc_l: np.ndarray             # [num_gates] read count of l before gate
    acc_r: np.ndarray             # [num_gates] (after l's increment if same)
    final_count: np.ndarray       # [num_wires] total read count
    final_perm: np.ndarray        # [num_wires] wire labels in death order
    die0_labels: np.ndarray       # unread inputs (die before level 0)
    tables: tuple                 # of np.ndarray [table_size] uint64 (real)
    slot_of_wire: np.ndarray      # [num_wires] (-1 for never-slotted wires)


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
    # final pass (one record per wire, in DEATH order):
    fin_idx: jnp.ndarray  # [W] int64
    fin_val: jnp.ndarray  # [W, 2]
    fin_cnt: jnp.ndarray  # [W] int64

    @property
    def num_gates(self) -> int:
        return int(self.types.shape[0])

    @property
    def num_wires(self) -> int:
        return int(self.fin_idx.shape[0])


# ---------------------------------------------------------------------------
# Input sources
# ---------------------------------------------------------------------------

class InputSource:
    """Input assignment that can be gathered by wire label.

    Array-backed sources keep the assignment resident; functional sources
    (``fn(labels: np.ndarray) -> np.ndarray [m, 2]``) regenerate values on
    demand — the analog of the reference producer re-initializing its
    inputs procedurally on every streaming pass (``Seval.cpp:1292-1299``),
    which is what makes the whole pipeline O(B)-resident end to end."""

    def __init__(self, num_inputs: int, array=None, fn: Callable = None):
        assert (array is None) != (fn is None)
        self.num_inputs = num_inputs
        self._array = array
        self._fn = fn

    @classmethod
    def wrap(cls, inputs, num_inputs: Optional[int] = None) -> "InputSource":
        if isinstance(inputs, InputSource):
            return inputs
        if callable(inputs):
            return cls(num_inputs, fn=inputs)
        return cls(int(inputs.shape[0]), array=inputs)

    def gather(self, labels: np.ndarray):
        """[m, 2] device values of the given input wires."""
        if self._array is not None:
            return jnp.asarray(self._array)[jnp.asarray(labels)]
        return jnp.asarray(np.asarray(self._fn(np.asarray(labels)),
                                      dtype=np.uint64))

    def all(self):
        if self._array is not None:
            return jnp.asarray(self._array)
        return self.gather(np.arange(self.num_inputs, dtype=np.int64))


def prng_input_source(num_inputs: int, seed: int = 0,
                      small: Optional[int] = None) -> InputSource:
    """Counter-based (splitmix64) input stream: value[i] is a pure function
    of (seed, i), so any window can be regenerated in O(window)."""
    bound = np.uint64(small) if small is not None else np.uint64(F.P)

    mix = np.uint64((seed * 0x9E3779B97F4A7C15 + 0x9E3779B97F4A7C15)
                    & 0xFFFFFFFFFFFFFFFF)

    def fn(labels: np.ndarray) -> np.ndarray:
        x = labels.astype(np.uint64) + mix
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        x = x ^ (x >> np.uint64(31))
        vals = x % bound
        return np.stack([vals, np.zeros_like(vals)], axis=-1)

    return InputSource(num_inputs, fn=fn)


# ---------------------------------------------------------------------------
# Static analysis
# ---------------------------------------------------------------------------

def analyze(levels: Sequence[Level], num_inputs: int,
            tables: Sequence[np.ndarray] = ()) -> CircuitProgram:
    """Host-side static analysis (vectorized): access counters, final read
    counts, liveness (inputs included), death order, and the slot plans."""
    levels = [l for l in levels if len(l.types)]
    num_gates = sum(len(l.types) for l in levels)
    num_wires = num_inputs + num_gates
    L = len(levels)

    # --- access counters: acc of read k = 1 + (# earlier reads of wire) ---
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

    # --- liveness ---------------------------------------------------------
    BIG = np.int64(1 << 60)
    first_use = np.full(num_wires, BIG, dtype=np.int64)
    last_use = np.full(num_wires, -1, dtype=np.int64)
    creation = np.full(num_wires, -1, dtype=np.int64)   # inputs: -1
    for li, lvl in enumerate(levels):
        np.minimum.at(first_use, lvl.idx_l, li)
        np.minimum.at(first_use, lvl.idx_r, li)
        np.maximum.at(last_use, lvl.idx_l, li)
        np.maximum.at(last_use, lvl.idx_r, li)
        creation[lvl.idx_o] = li

    # death_after[w]: number of level steps after which the final record
    # for w is emitted (and its slot reclaimed)
    death_after = np.where(last_use >= 0, last_use + 1,
                           np.where(creation >= 0, creation + 1, 0))
    # never-read wires created at level li die "after li" but their value
    # only exists after the level runs -> same convention (emit happens at
    # the start of step death_after, i.e. before level death_after runs).

    wires = np.arange(num_wires, dtype=np.int64)
    final_perm = wires[np.lexsort((wires, death_after))]

    # --- slot allocation + per-level plans --------------------------------
    # death groups: final_perm is sorted by death_after, so per-level death
    # lists are contiguous slices of it
    sorted_death = death_after[final_perm]
    die_bounds = np.searchsorted(sorted_death, np.arange(L + 2))

    def die_group(li: int) -> np.ndarray:
        return final_perm[die_bounds[li]:die_bounds[li + 1]]

    # feed groups: read inputs grouped by first-use level
    read_inputs = np.nonzero(first_use[:num_inputs] < BIG)[0]
    fu = first_use[read_inputs]
    forder = np.argsort(fu, kind="stable")
    feed_sorted = read_inputs[forder]
    feed_bounds = np.searchsorted(fu[forder], np.arange(L + 1))

    def feed_group(li: int) -> np.ndarray:
        return feed_sorted[feed_bounds[li]:feed_bounds[li + 1]]

    die0_labels = die_group(0)
    # sanity: level-0 deaths are exactly unread inputs
    assert np.all(die0_labels < num_inputs) if len(die0_labels) else True

    slot_of_wire = np.full(num_wires, -1, dtype=np.int64)
    next_slot = 0
    free = np.zeros(0, dtype=np.int64)

    def _alloc(n: int) -> np.ndarray:
        nonlocal next_slot, free
        take = min(len(free), n)
        out = np.empty(n, dtype=np.int64)
        if take:
            out[:take] = free[len(free) - take:]
            free = free[: len(free) - take]
        if n > take:
            out[take:] = np.arange(next_slot, next_slot + n - take)
            next_slot += n - take
        return out

    plans = []
    for li, lvl in enumerate(levels):
        # 1. deaths at step li (li == 0: unread inputs, handled separately)
        dw = die_group(li) if li > 0 else np.zeros(0, dtype=np.int64)
        die_slots = slot_of_wire[dw] if len(dw) else dw
        free = np.concatenate([free, die_slots])
        # 2. feeds
        fw = feed_group(li)
        feed_slots = _alloc(len(fw))
        slot_of_wire[fw] = feed_slots
        # 3. outputs
        out_slots = _alloc(len(lvl.types))
        slot_of_wire[lvl.idx_o] = out_slots
        plans.append(LevelPlan(
            types=lvl.types.astype(np.int32),
            sl=slot_of_wire[lvl.idx_l].copy(),
            sr=slot_of_wire[lvl.idx_r].copy(),
            so=out_slots,
            idx_o=lvl.idx_o, idx_l=lvl.idx_l, idx_r=lvl.idx_r,
            acc_l=np.zeros(0, np.int64), acc_r=np.zeros(0, np.int64),
            feed_slots=feed_slots, feed_labels=fw,
            die_slots=die_slots, die_labels=dw,
            die_cnt=final_count[dw] if len(dw) else dw,
        ))
    # trailing deaths (step L): wires read at the last level
    tail_w = die_group(L)
    tail = LevelPlan(
        types=np.zeros(0, np.int32),
        sl=np.zeros(0, np.int64), sr=np.zeros(0, np.int64),
        so=np.zeros(0, np.int64),
        idx_o=np.zeros(0, np.int64), idx_l=np.zeros(0, np.int64),
        idx_r=np.zeros(0, np.int64),
        acc_l=np.zeros(0, np.int64), acc_r=np.zeros(0, np.int64),
        feed_slots=np.zeros(0, np.int64), feed_labels=np.zeros(0, np.int64),
        die_slots=slot_of_wire[tail_w] if len(tail_w) else tail_w,
        die_labels=tail_w,
        die_cnt=final_count[tail_w] if len(tail_w) else tail_w,
    )
    plans.append(tail)

    # fill per-gate access counters into the plans
    off = 0
    plans2 = []
    for li, lvl in enumerate(levels):
        m = len(lvl.types)
        plans2.append(plans[li]._replace(acc_l=acc_l[off:off + m],
                                         acc_r=acc_r[off:off + m]))
        off += m
    plans2.append(plans[-1])

    return CircuitProgram(
        levels=tuple(levels), num_inputs=num_inputs, num_wires=num_wires,
        num_gates=num_gates, plans=tuple(plans2), num_slots=next_slot,
        acc_l=acc_l, acc_r=acc_r, final_count=final_count,
        final_perm=final_perm, die0_labels=die0_labels,
        tables=tuple(np.asarray(t, dtype=np.uint64) for t in tables),
        slot_of_wire=slot_of_wire,
    )


# ---------------------------------------------------------------------------
# Level execution kernels
# ---------------------------------------------------------------------------

def _level_values(mem, sl, sr, so, types, tables):
    """One level: gather inputs, compute, scatter outputs.  mem: [S, 2]."""
    vl = mem[sl]
    vr = mem[sr]
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
    return mem, vl, vr, out


_LEVEL_JIT_CACHE: dict = {}


def _level_step_jit(num_tables: int):
    hit = _LEVEL_JIT_CACHE.get(num_tables)
    if hit is None:
        def run(mem, sl, sr, so, types, tables):
            return _level_values(mem, sl, sr, so, types, tuple(tables))
        hit = jax.jit(run)
        _LEVEL_JIT_CACHE[num_tables] = hit
    return hit


class GateSegment(NamedTuple):
    """Variable-length per-level gate records (device values + host meta)."""
    types: np.ndarray
    idx_o: np.ndarray
    idx_l: np.ndarray
    idx_r: np.ndarray
    acc_l: np.ndarray
    acc_r: np.ndarray
    val_l: jnp.ndarray
    val_r: jnp.ndarray
    val_o: jnp.ndarray


class FinalSegment(NamedTuple):
    labels: np.ndarray
    counts: np.ndarray
    values: jnp.ndarray


def stream_segments(program: CircuitProgram, inputs,
                    emit_gates: bool = True, emit_finals: bool = True):
    """Re-execute the program, yielding ("gates", GateSegment) and
    ("finals", FinalSegment) events in stream order.

    Device residency: slot memory [num_slots, 2] + one level's arrays.
    The trace this produces is bit-identical to ``execute`` (which is the
    materialized reference implementation)."""
    src = InputSource.wrap(inputs, program.num_inputs)
    mem = jnp.zeros((max(program.num_slots, 1), 2), dtype=jnp.uint64)
    tables = program.tables

    if emit_finals and len(program.die0_labels):
        vals = src.gather(program.die0_labels)
        yield "finals", FinalSegment(
            labels=program.die0_labels,
            counts=program.final_count[program.die0_labels], values=vals)

    step = _level_step_jit(len(tables))
    for plan in program.plans:
        if emit_finals and len(plan.die_labels):
            yield "finals", FinalSegment(
                labels=plan.die_labels, counts=plan.die_cnt,
                values=mem[jnp.asarray(plan.die_slots)])
        if len(plan.feed_labels):
            mem = mem.at[jnp.asarray(plan.feed_slots)].set(
                src.gather(plan.feed_labels))
        if len(plan.types):
            mem, vl, vr, vo = step(
                mem, jnp.asarray(plan.sl), jnp.asarray(plan.sr),
                jnp.asarray(plan.so), jnp.asarray(plan.types), tables)
            if emit_gates:
                yield "gates", GateSegment(
                    types=plan.types, idx_o=plan.idx_o, idx_l=plan.idx_l,
                    idx_r=plan.idx_r, acc_l=plan.acc_l, acc_r=plan.acc_r,
                    val_l=vl, val_r=vr, val_o=vo)


# ---------------------------------------------------------------------------
# Materialized execution (reference implementation for tests + fast path)
# ---------------------------------------------------------------------------

def execute(program: CircuitProgram, inputs,
            prefer_native: bool = True) -> Trace:
    """Evaluate the whole program, materializing the trace.

    Returns per-gate tuples in level order plus the final-pass records for
    all wires in DEATH order.

    With ``prefer_native`` (default) the gate evaluation runs in the C++
    runtime when available (the reference's producer, Seval.cpp; ~20M
    gates/s host-side) — bit-identical to the device path."""
    from ..utils.jitting import JIT_ENABLED
    src = InputSource.wrap(inputs, program.num_inputs)
    # The whole-program device jit unrolls one block per level plan; deep
    # circuits (SHA-256: ~1200 levels) blow the compile budget, so those
    # take the native/eager path even in jit mode.
    if JIT_ENABLED and program.num_gates > 0 and len(program.plans) <= 128:
        # production path: evaluate ON DEVICE as one compiled program —
        # only the inputs cross the host->device link
        return _execute_device_jit(program, src.all())
    if prefer_native and src._array is not None:
        try:
            from ..runtime import native_rt as rt
            if rt.available() and program.num_gates > 0:
                return _execute_native(program, src.all(), rt)
        except Exception:
            pass
    return _execute_device(program, src.all())


_DEVICE_EVAL_CACHE: dict = {}
_DEVICE_EVAL_CACHE_MAX = 16


def _execute_device_jit(program: CircuitProgram, inputs) -> Trace:
    from ..utils.closure import hoist_arrays

    key = id(program)
    hit = _DEVICE_EVAL_CACHE.get(key)
    if hit is None or hit[0] is not program:
        # All program metadata rides in as ARGUMENTS (uploaded to device
        # once, here), never as closure constants — see utils/closure.py.
        z = np.zeros(0, np.int64)
        slim = program._replace(
            levels=(), acc_l=z, acc_r=z, final_count=z, final_perm=z,
            die0_labels=z, slot_of_wire=z)
        arrs, rebuild = hoist_arrays((slim, _flat_meta(program)))
        arrs = [jnp.asarray(a) for a in arrs]

        @jax.jit
        def run(x, arrs):
            prog, flat = rebuild(arrs)
            return _execute_device(prog, x, flat)

        hit = (program, run, arrs)
        _DEVICE_EVAL_CACHE[key] = hit
        if len(_DEVICE_EVAL_CACHE) > _DEVICE_EVAL_CACHE_MAX:
            _DEVICE_EVAL_CACHE.pop(next(iter(_DEVICE_EVAL_CACHE)))
    return hit[1](inputs, hit[2])


class _FlatMeta(NamedTuple):
    """Concatenated per-gate/per-wire program metadata (static per program).

    Kept separate from ``CircuitProgram`` so the device-execute jit can take
    it as an ARGUMENT: closing over these arrays would embed O(num_gates)
    constants into the lowered program, which on the remote-attached
    platform costs ~100 s per compile and re-traffics the constants every
    call (see utils/closure.py)."""
    types: np.ndarray      # [N] int32
    idx_o: np.ndarray      # [N] int64
    idx_l: np.ndarray
    idx_r: np.ndarray
    acc_l: np.ndarray
    acc_r: np.ndarray
    final_perm: np.ndarray  # [W]
    final_cnt: np.ndarray   # [W] final_count in death order


def _flat_meta(program: CircuitProgram) -> _FlatMeta:
    z = np.zeros(0, np.int64)
    cat = (lambda xs: np.concatenate(xs) if xs else z)
    return _FlatMeta(
        types=cat([l.types for l in program.levels]).astype(np.int32),
        idx_o=cat([l.idx_o for l in program.levels]),
        idx_l=cat([l.idx_l for l in program.levels]),
        idx_r=cat([l.idx_r for l in program.levels]),
        acc_l=program.acc_l, acc_r=program.acc_r,
        final_perm=program.final_perm,
        final_cnt=program.final_count[program.final_perm],
    )


def _execute_native(program: CircuitProgram, inputs, rt) -> Trace:
    x = np.ascontiguousarray(np.asarray(inputs, dtype=np.uint64))
    L, R, O = rt.eval_program(program, x)
    flat = _flat_meta(program)
    label_vals = np.zeros((program.num_wires, 2), dtype=np.uint64)
    label_vals[: program.num_inputs] = x
    label_vals[flat.idx_o] = O
    # ship the three value streams as ONE host->device transfer
    vals = jnp.asarray(np.stack([L, R, O]))
    perm = jnp.asarray(flat.final_perm)
    return Trace(
        types=jnp.asarray(flat.types),
        idx_o=jnp.asarray(flat.idx_o), idx_l=jnp.asarray(flat.idx_l),
        idx_r=jnp.asarray(flat.idx_r),
        val_o=vals[2], val_l=vals[0], val_r=vals[1],
        acc_l=jnp.asarray(program.acc_l), acc_r=jnp.asarray(program.acc_r),
        fin_idx=perm, fin_val=jnp.asarray(label_vals[flat.final_perm]),
        fin_cnt=jnp.asarray(flat.final_cnt),
    )


def _execute_device(program: CircuitProgram, inputs,
                    flat: Optional[_FlatMeta] = None) -> Trace:
    """Device evaluation of the whole program.

    ``program``/``flat`` may carry tracers for their array leaves (the jit
    path passes them as arguments via ``hoist_arrays``); every shape-bearing
    field (num_slots, num_inputs, per-plan lengths) is a static Python int.
    """
    if flat is None:
        flat = _flat_meta(program)
    mem = jnp.zeros((max(program.num_slots, 1), 2), dtype=jnp.uint64)
    label_vals = jnp.zeros((program.num_wires, 2), dtype=jnp.uint64)
    label_vals = label_vals.at[:program.num_inputs].set(inputs)

    vls, vrs, vos = [], [], []
    for plan in program.plans:
        if len(plan.feed_labels):
            mem = mem.at[jnp.asarray(plan.feed_slots)].set(
                inputs[jnp.asarray(plan.feed_labels)])
        if not len(plan.types):
            continue
        mem, vl, vr, vo = _level_values(
            mem, jnp.asarray(plan.sl), jnp.asarray(plan.sr),
            jnp.asarray(plan.so), jnp.asarray(plan.types), program.tables)
        vls.append(vl)
        vrs.append(vr)
        vos.append(vo)
        label_vals = label_vals.at[jnp.asarray(plan.idx_o)].set(vo)

    perm = jnp.asarray(flat.final_perm)
    return Trace(
        types=jnp.asarray(flat.types),
        idx_o=jnp.asarray(flat.idx_o), idx_l=jnp.asarray(flat.idx_l),
        idx_r=jnp.asarray(flat.idx_r),
        val_o=jnp.concatenate(vos, axis=0),
        val_l=jnp.concatenate(vls, axis=0),
        val_r=jnp.concatenate(vrs, axis=0),
        acc_l=jnp.asarray(flat.acc_l), acc_r=jnp.asarray(flat.acc_r),
        fin_idx=perm, fin_val=label_vals[perm],
        fin_cnt=jnp.asarray(flat.final_cnt),
    )


# ---------------------------------------------------------------------------
# Chunked oracles
# ---------------------------------------------------------------------------

def _concat_segments(parts, fields):
    if len(parts) == 1:
        return parts[0]
    out = []
    for fi in range(len(fields)):
        vals = [p[fi] for p in parts]
        if isinstance(vals[0], np.ndarray):
            out.append(np.concatenate(vals))
        else:
            out.append(jnp.concatenate(vals, axis=0))
    return type(parts[0])(*out)


def _rechunk(segments, chunk: int, total: int, pad_fn, slice_fn):
    """Group variable-length segments into fixed ``chunk``-length pieces."""
    buf: list = []
    have = 0
    emitted = 0
    for seg in segments:
        n = len(seg[0])
        if n == 0:
            continue
        buf.append(seg)
        have += n
        while have >= chunk:
            merged = _concat_segments(buf, merged_fields(seg))
            out = slice_fn(merged, 0, chunk)
            rest_n = have - chunk
            buf = [slice_fn(merged, chunk, chunk + rest_n)] if rest_n else []
            have = rest_n
            emitted += chunk
            yield out
    if have or emitted < total:
        if buf:
            merged = _concat_segments(buf, merged_fields(buf[0]))
        else:
            merged = None
        yield pad_fn(merged, have)


def merged_fields(seg):
    return seg._fields


def _gate_seg_slice(seg: GateSegment, a: int, b: int) -> GateSegment:
    return GateSegment(*(v[a:b] for v in seg))


def _gate_seg_pad(seg: Optional[GateSegment], have: int,
                  chunk: int) -> GateSegment:
    pad = chunk - have

    def p1np(a):
        return np.pad(np.asarray(a), (0, pad))

    def p2(a):
        return jnp.pad(a, ((0, pad), (0, 0)))

    if seg is None:
        z1 = np.zeros(chunk, np.int64)
        z2 = jnp.zeros((chunk, 2), jnp.uint64)
        return GateSegment(z1.astype(np.int32), z1, z1, z1, z1, z1,
                           z2, z2, z2)
    return GateSegment(
        types=p1np(seg.types), idx_o=p1np(seg.idx_o), idx_l=p1np(seg.idx_l),
        idx_r=p1np(seg.idx_r), acc_l=p1np(seg.acc_l), acc_r=p1np(seg.acc_r),
        val_l=p2(seg.val_l), val_r=p2(seg.val_r), val_o=p2(seg.val_o))


def _final_seg_slice(seg: FinalSegment, a: int, b: int) -> FinalSegment:
    return FinalSegment(*(v[a:b] for v in seg))


def _final_seg_pad(seg: Optional[FinalSegment], have: int,
                   chunk: int) -> FinalSegment:
    pad = chunk - have
    if seg is None:
        z1 = np.zeros(chunk, np.int64)
        return FinalSegment(z1, z1, jnp.zeros((chunk, 2), jnp.uint64))
    return FinalSegment(
        labels=np.pad(np.asarray(seg.labels), (0, pad)),
        counts=np.pad(np.asarray(seg.counts), (0, pad)),
        values=jnp.pad(seg.values, ((0, pad), (0, 0))))


def gate_segment_to_trace(seg: GateSegment) -> Trace:
    """Device Trace view of a gate segment (empty final part)."""
    e = jnp.zeros(0, dtype=jnp.int64)
    e2 = jnp.zeros((0, 2), dtype=jnp.uint64)
    return Trace(
        types=jnp.asarray(seg.types.astype(np.int32)),
        idx_o=jnp.asarray(seg.idx_o), idx_l=jnp.asarray(seg.idx_l),
        idx_r=jnp.asarray(seg.idx_r),
        val_o=seg.val_o, val_l=seg.val_l, val_r=seg.val_r,
        acc_l=jnp.asarray(seg.acc_l), acc_r=jnp.asarray(seg.acc_r),
        fin_idx=e, fin_val=e2, fin_cnt=e)


def _prefetch(gen, depth: int = 2):
    """Producer-thread wrapper: run ``gen`` in a background thread so the
    NEXT chunk's witness re-execution (host-side level walking + device
    dispatches) overlaps the consumer's proving kernels — the TPU analog
    of the reference's double-buffered Seval producer thread
    (Seval.cpp:107-152).  FIFO order is preserved, so transcripts are
    bit-identical to the synchronous path."""
    import queue
    import threading

    q = queue.Queue(maxsize=depth)
    end = object()

    def run():
        try:
            for item in gen:
                q.put(item)
        except BaseException as e:          # re-raised at the consumer
            q.put(e)
            return
        q.put(end)

    threading.Thread(target=run, daemon=True).start()
    while True:
        item = q.get()
        if item is end:
            return
        if isinstance(item, BaseException):
            raise item
        yield item


class TraceOracle:
    """Re-streamable chunk source over a program + inputs.

    ``materialize=True`` keeps the whole trace resident (fast, memory O(N));
    ``materialize=False`` re-executes the program on every pass via
    ``stream_segments``, keeping only the slot memory and one chunk
    resident — the space-efficient mode (sublinear in N whenever the
    circuit's live width is)."""

    def __init__(self, program: CircuitProgram, inputs, materialize=True):
        self.program = program
        self.inputs = InputSource.wrap(inputs, program.num_inputs)
        self.materialize = materialize
        self._trace: Optional[Trace] = None
        if materialize:
            self._trace = execute(program, self.inputs)

    @property
    def num_gates(self) -> int:
        return self.program.num_gates

    @property
    def num_wires(self) -> int:
        return self.program.num_wires

    def peak_resident(self, chunk: int) -> int:
        """Field elements resident on device in streaming mode."""
        return self.program.num_slots + chunk

    def trace(self) -> Trace:
        if self._trace is None:
            return execute(self.program, self.inputs)
        return self._trace

    def gate_chunks(self, chunk: int):
        """Yield Trace slices of ``chunk`` gates (zero-padded at the end)."""
        if self._trace is not None:
            tr = self._trace
            n = tr.num_gates
            for s in range(0, n, chunk):
                e = min(s + chunk, n)
                yield _slice_pad(tr, s, e, chunk)
            return
        segs = (seg for kind, seg in
                stream_segments(self.program, self.inputs,
                                emit_finals=False) if kind == "gates")
        yield from _prefetch(
            gate_segment_to_trace(gseg)
            for gseg in _rechunk(segs, chunk, self.program.num_gates,
                                 lambda s, h: _gate_seg_pad(s, h, chunk),
                                 _gate_seg_slice))

    def final_chunks(self, chunk: int):
        """Yield (idx [c], val [c,2], cnt [c], n_valid) final records in
        death order."""
        if self._trace is not None:
            tr = self._trace
            w = tr.num_wires
            for s in range(0, w, chunk):
                e = min(s + chunk, w)
                pad = chunk - (e - s)
                idx = jnp.pad(tr.fin_idx[s:e], (0, pad))
                val = jnp.pad(tr.fin_val[s:e], ((0, pad), (0, 0)))
                cnt = jnp.pad(tr.fin_cnt[s:e], (0, pad))
                yield idx, val, cnt, e - s
            return
        segs = (seg for kind, seg in
                stream_segments(self.program, self.inputs,
                                emit_gates=False) if kind == "finals")
        total = self.program.num_wires

        def produce():
            done = 0
            for fseg in _rechunk(segs, chunk, total,
                                 lambda s, h: _final_seg_pad(s, h, chunk),
                                 _final_seg_slice):
                valid = min(chunk, total - done)
                done += valid
                yield (jnp.asarray(fseg.labels), fseg.values,
                       jnp.asarray(fseg.counts), valid)

        yield from _prefetch(produce())


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
    "Level", "LevelPlan", "CircuitProgram", "Trace", "InputSource",
    "prng_input_source", "analyze", "execute", "stream_segments",
    "GateSegment", "FinalSegment", "gate_segment_to_trace", "TraceOracle",
]
