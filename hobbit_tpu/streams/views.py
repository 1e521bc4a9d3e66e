"""Named stream views derived from the gate trace.

TPU-native equivalents of the reference's virtual streams
(``read_stream``, witness_stream.cpp:2106-2353): each view is a pure chunk
transform from trace tensors to protocol vectors.

* ``witness``            — (v_l, v_r, v_o) per gate + final wire values
* gate-consistency       — (L, R, O, sel_add, sel_mul) arrays
* wiring consistency     — offline-memory-checking multisets, RLC'd as
                           ``addr + 1 + a*val + b*access``
                           ("wiring_consistency_check[_opt]", :2179-2311)
* lookups                — table memory checking with value-dependent
                           access ranks computed by sort/segment ops
                           ("lookup_basic"/"lookup_check", :2198-2275)

Two gate-consistency views exist: the basic one (lookup gates contribute
zero; table correctness carried by the lookup product argument) and the
lookup-aware one (``gate_arrays_lookups``) matching the reference's
linearized lr0*L+lr1*R-O fold (sumcheck.cpp:503) — the prover driver picks
the latter whenever the circuit has tables.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import numpy as np

import jax.numpy as jnp

from ..ops import field as F
from ..utils.jitting import maybe_jit
from . import trace as trc


def _as_field_int(x):
    """int64/int32 array -> field elements (real part)."""
    return jnp.stack([x.astype(jnp.uint64),
                      jnp.zeros_like(x, dtype=jnp.uint64)], axis=-1)


# ---------------------------------------------------------------------------
# witness stream (PC input): 3N gate values + W final values
# ---------------------------------------------------------------------------

def witness_values(tr: trc.Trace):
    """[3N + W, 2]: per gate (v_l, v_r, v_o), then final wire values."""
    gate_part = jnp.stack([tr.val_l, tr.val_r, tr.val_o], axis=1)
    return jnp.concatenate([gate_part.reshape(-1, 2), tr.fin_val], axis=0)


# ---------------------------------------------------------------------------
# gate-consistency arrays
# ---------------------------------------------------------------------------

class GateArrays(NamedTuple):
    L: jnp.ndarray        # [n, 2]
    R: jnp.ndarray
    O: jnp.ndarray
    sel_add: jnp.ndarray  # [n, 2] 1 for add gates else 0
    sel_mul: jnp.ndarray


@maybe_jit
def gate_arrays(tr: trc.Trace) -> GateArrays:
    add = (tr.types == trc.T_ADD)
    mul = (tr.types == trc.T_MUL)
    return GateArrays(
        L=tr.val_l, R=tr.val_r, O=tr.val_o,
        sel_add=_as_field_int(add.astype(jnp.int64)),
        sel_mul=_as_field_int(mul.astype(jnp.int64)),
    )


@maybe_jit
def gate_arrays_lookups(tr: trc.Trace, lr0, lr1) -> dict:
    """Lookup-aware gate-consistency streams (reference
    ``prove_gate_consistency_lookups``, sumcheck.cpp:503-794).

    Per gate the identity  saL*L + saR*R + sm*L*R - slkp*lkpO - O == 0
    holds with  saL/saR = 1 on add gates, (lr0, lr1) on lookup gates;
    sm = 1 on mul gates; slkp = 1 and lkpO = lr0*L + lr1*R - O on lookup
    gates.  lr0/lr1 are Fiat-Shamir weights binding the lookup gates' L/R/O
    streams into the same sumcheck point as add/mul gates."""
    add = (tr.types == trc.T_ADD)
    mul = (tr.types == trc.T_MUL)
    lkp = (tr.types >= trc.T_LOOKUP0)
    pad = (tr.types == trc.T_PAD)
    one = F.ones(())[None, :]
    zero = jnp.zeros((1, 2), dtype=jnp.uint64)
    saL = jnp.where(add[:, None], one,
                    jnp.where(lkp[:, None], lr0[None, :], zero))
    saR = jnp.where(add[:, None], one,
                    jnp.where(lkp[:, None], lr1[None, :], zero))
    sm = jnp.where(mul[:, None], one, zero)
    slkp = jnp.where(lkp[:, None], one, zero)
    lkpO = F.fsub(F.fadd(F.fmul(lr0[None, :], tr.val_l),
                         F.fmul(lr1[None, :], tr.val_r)), tr.val_o)
    lkpO = jnp.where(lkp[:, None], lkpO, zero)
    O = jnp.where(pad[:, None], zero, tr.val_o)
    return {"L": tr.val_l, "R": tr.val_r, "O": O, "saL": saL, "saR": saR,
            "sm": sm, "slkp": slkp, "lkpO": lkpO}


def gate_consistency_terms(ga: GateArrays):
    """Per-gate relation value: sel_add*(L+R-O) + sel_mul*(L*R-O).

    Sums to zero over a correct trace (pad/lookup gates contribute 0)."""
    add_t = F.fmul(ga.sel_add, F.fsub(F.fadd(ga.L, ga.R), ga.O))
    mul_t = F.fmul(ga.sel_mul, F.fsub(F.fmul(ga.L, ga.R), ga.O))
    return F.fadd(add_t, mul_t)


# ---------------------------------------------------------------------------
# wiring consistency (offline memory checking)
# ---------------------------------------------------------------------------

def _rlc(addr_f, val, acc_f, a, b):
    """addr + 1 + a*val + b*acc."""
    e = F.fadd(addr_f, F.scalar(1)[None, :])
    e = F.fadd(e, F.fmul(a[None, :], val))
    return F.fadd(e, F.fmul(b[None, :], acc_f))


@maybe_jit
def wiring_read_write_sets(tr: trc.Trace, a, b):
    """3 read/write RLC pairs per gate: (l, r, o-creation).

    Returns (reads [3n, 2], writes [3n, 2]); pad gates yield neutral 1s.
    """
    n = tr.types.shape[0]
    addr = jnp.stack([tr.idx_l, tr.idx_r, tr.idx_o], axis=1).reshape(-1)
    val = jnp.stack([tr.val_l, tr.val_r, tr.val_o], axis=1).reshape(-1, 2)
    acc = jnp.stack([tr.acc_l, tr.acc_r,
                     jnp.zeros_like(tr.acc_l)], axis=1).reshape(-1)
    reads = _rlc(_as_field_int(addr), val, _as_field_int(acc), a, b)
    writes = _rlc(_as_field_int(addr), val, _as_field_int(acc + 1), a, b)
    pad = jnp.repeat(tr.types == trc.T_PAD, 3)
    one = F.ones(())[None, :]
    reads = jnp.where(pad[:, None], one, reads)
    writes = jnp.where(pad[:, None], one, writes)
    return reads, writes


@maybe_jit(static_argnums=(1,))
def wiring_init_final_sets(tr: trc.Trace, num_inputs: int, a, b):
    """INIT = (w, v, 0) for gate wires / (w, v, 1) for inputs;
    FINAL = (w, v, final_count).  Both [W, 2]."""
    w = tr.fin_idx
    is_input = (w < num_inputs).astype(jnp.int64)
    init = _rlc(_as_field_int(w), tr.fin_val, _as_field_int(is_input), a, b)
    fin = _rlc(_as_field_int(w), tr.fin_val, _as_field_int(tr.fin_cnt), a, b)
    return init, fin


# ---------------------------------------------------------------------------
# circuit-description stream (prove_arbitrary_circuit path)
# ---------------------------------------------------------------------------

def circuit_description(tr: trc.Trace):
    """Committed circuit polynomial: per gate 8 values
    (type, idx_o, idx_l, idx_r, acc_l, acc_r, sel_add, sel_mul) then per
    wire (idx, final_count).  [8N + 2W, 2].

    (The reference's 16N "circuit" stream carries the same information:
    gate types + wiring addresses + access counts, witness_stream.cpp
    :2123-2162.)
    """
    add = (tr.types == trc.T_ADD).astype(jnp.int64)
    mul = (tr.types == trc.T_MUL).astype(jnp.int64)
    per_gate = jnp.stack([
        _as_field_int(tr.types.astype(jnp.int64)),
        _as_field_int(tr.idx_o), _as_field_int(tr.idx_l),
        _as_field_int(tr.idx_r),
        _as_field_int(tr.acc_l), _as_field_int(tr.acc_r),
        _as_field_int(add), _as_field_int(mul),
    ], axis=1).reshape(-1, 2)
    per_wire = jnp.stack([
        _as_field_int(tr.fin_idx), _as_field_int(tr.fin_cnt),
    ], axis=1).reshape(-1, 2)
    return jnp.concatenate([per_gate, per_wire], axis=0)


@maybe_jit(static_argnums=(1,))
def circuit_lanes(tr: trc.Trace, npad: int):
    """8-lane circuit-description polynomial [8*npad, 2]: per gate slot
    (add_ind, mul_ind, lkp_ind, idx_o, idx_l, idx_r, acc_l, acc_r), lane
    index in the LOW 3 bits (same layout trick as the witness poly).

    The committed form of the reference's 16N "circuit" stream
    (witness_stream.cpp:2123-2162): one PC opening at a sumcheck point
    binds every selector evaluation (selector MLEs for the lookup-aware
    identity are linear in these lanes: saL = add + lr0 * lkp, etc)."""
    n = tr.types.shape[0]
    add = (tr.types == trc.T_ADD).astype(jnp.int64)
    mul = (tr.types == trc.T_MUL).astype(jnp.int64)
    lkp = (tr.types >= trc.T_LOOKUP0).astype(jnp.int64)
    lanes = jnp.zeros((npad, 8, 2), dtype=jnp.uint64)
    cols = (add, mul, lkp, tr.idx_o, tr.idx_l, tr.idx_r, tr.acc_l, tr.acc_r)
    for li, c in enumerate(cols):
        lanes = lanes.at[:n, li].set(_as_field_int(c))
    return lanes.reshape(8 * npad, 2)


# ---------------------------------------------------------------------------
# lookup argument sets (table memory checking)
# ---------------------------------------------------------------------------

def lookup_ranks(addr, num_buckets: int):
    """Per-occurrence rank of addr among earlier equal occurrences, plus
    total counts per bucket.  Pure sort/segment ops (device-friendly)."""
    import jax

    n = addr.shape[0]
    order = jnp.argsort(addr, stable=True)
    sa = addr[order]
    pos = jnp.arange(n, dtype=jnp.int64)
    if n > 1:
        run_start = jnp.concatenate([jnp.array([True]), sa[1:] != sa[:-1]])
    else:
        run_start = jnp.ones((n,), dtype=bool)
    start_idx = jax.lax.cummax(jnp.where(run_start, pos, 0))
    ranks_sorted = pos - start_idx
    ranks = jnp.zeros(n, dtype=jnp.int64).at[order].set(ranks_sorted)
    counts = jnp.zeros(num_buckets, dtype=jnp.int64).at[addr].add(1)
    return ranks, counts


@maybe_jit(static_argnums=(4,))
def lookup_sets(tr: trc.Trace, tables, a, b, table_size: int = 1 << 16):
    """Read/write sets per lookup gate + init/final sets per table entry.

    Address = table_id * table_size + key; value = table[key];
    RLC e = addr + 1 + a*val + b*rank.
    Returns (reads [n,2], writes [n,2], init [T*S,2], final [T*S,2]).
    """
    is_lkp = tr.types >= trc.T_LOOKUP0
    tid = jnp.where(is_lkp, tr.types - trc.T_LOOKUP0, 0).astype(jnp.int64)
    key = jnp.where(
        is_lkp,
        (tr.val_l[:, 0] + np.uint64(256) * tr.val_r[:, 0]).astype(jnp.int64),
        0)
    key = jnp.clip(key, 0, table_size - 1)
    num_tables = len(tables)
    addr = tid * table_size + key
    sentinel = num_tables * table_size        # extra bucket for non-lookups
    addr_eff = jnp.where(is_lkp, addr, sentinel)
    ranks, counts = lookup_ranks(addr_eff, sentinel + 1)
    counts = counts[:sentinel]

    addr_f = _as_field_int(addr)
    val = tr.val_o
    reads = _rlc(addr_f, val, _as_field_int(ranks), a, b)
    writes = _rlc(addr_f, val, _as_field_int(ranks + 1), a, b)
    one = F.ones(())[None, :]
    reads = jnp.where(is_lkp[:, None], reads, one)
    writes = jnp.where(is_lkp[:, None], writes, one)

    # init/final over all table entries
    tab_addr = jnp.arange(num_tables * table_size, dtype=jnp.int64)
    tab_vals = jnp.concatenate([
        jnp.pad(jnp.asarray(t, dtype=jnp.uint64), (0, table_size - len(t)))
        for t in tables]) if tables else jnp.zeros(0, dtype=jnp.uint64)
    tab_val_f = jnp.stack([tab_vals, jnp.zeros_like(tab_vals)], axis=-1)
    zero = jnp.zeros_like(tab_addr)
    init = _rlc(_as_field_int(tab_addr), tab_val_f, _as_field_int(zero), a, b)
    fin = _rlc(_as_field_int(tab_addr), tab_val_f, _as_field_int(counts), a, b)
    return reads, writes, init, fin


# ---------------------------------------------------------------------------
# Protocol-v2 lane polynomials (the succinct-verifier layout)
#
# Every committed stream is a power-of-two LANE interleave so that one PC
# opening at a point (lane_bits || tau) binds every lane's evaluation at
# tau (the transmitted aggregate is evaluated at each lane's low bits).
# All protocol set streams are then LINEAR in lane evaluations, so the
# verifier derives every set/stream evaluation from openings — it never
# executes the circuit (reference binding intent: main.cpp:812-852).
#
#   wpoly  [4*np2]  lanes (L, R, O, 0)            — witness, per gate
#   fpoly  [np2]    death-order final values      — witness, per wire
#   cpoly  [16*np2] static circuit description    — public preprocessing
#   lpoly  [4*np2]  lanes (Lm, Rm, Om, rankm)     — lookup aux (masked)
#   tpoly  [TS]     final lookup access counts    — lookup aux
# ---------------------------------------------------------------------------

# cpoly lane indices
C_ADD, C_MUL, C_LKP, C_TID = 0, 1, 2, 3
C_IDXL, C_IDXR, C_IDXO, C_ACCL, C_ACCR = 4, 5, 6, 7, 8
C_FIDX, C_FCNT, C_FINP = 9, 10, 11
C_LANES = 16

# lpoly lane indices
L_LM, L_RM, L_OM, L_RANK = 0, 1, 2, 3


def witness_lane_chunk(tr: trc.Trace, fin=None):
    """[4*B, 2] chunk of wpoly from a B-gate trace chunk: slot 4t+lane =
    (v_l, v_r, v_o, fin_t).

    Lane 3 carries the death-order final wire values (the former
    standalone fpoly): slot index t < num_wires holds fin_val[t], so ONE
    commitment binds both the gate lanes and the final-value polynomial
    (fpoly's MLE = wpoly restricted to lane bits (1,1)).  ``fin`` is the
    aligned [B, 2] final-value chunk (zeros when absent)."""
    B = tr.types.shape[0]
    lanes = jnp.zeros((B, 4, 2), dtype=jnp.uint64)
    lanes = lanes.at[:, 0].set(tr.val_l)
    lanes = lanes.at[:, 1].set(tr.val_r)
    lanes = lanes.at[:, 2].set(tr.val_o)
    if fin is not None:
        lanes = lanes.at[:, 3].set(fin)
    return lanes.reshape(4 * B, 2)


import collections as _collections

_CIRCUIT_LANE_CACHE: "_collections.OrderedDict" = _collections.OrderedDict()
_CIRCUIT_LANE_CACHE_MAX = 4


def _circuit_lanes_host(program: trc.CircuitProgram) -> np.ndarray:
    """Full host-side cpoly gate/wire lane matrix [num_slots?, C_LANES]
    (real parts only; imaginary is zero).  Cached per program — chunk
    extraction is then a contiguous slice instead of O(N) concats."""
    key = id(program)
    hit = _CIRCUIT_LANE_CACHE.get(key)
    if hit is not None and hit[0] is program:
        _CIRCUIT_LANE_CACHE.move_to_end(key)
        return hit[1]
    n = program.num_gates
    W = program.num_wires
    m = max(n, W)
    lanes = np.zeros((m, C_LANES), dtype=np.uint64)
    types = np.concatenate(
        [l.types for l in program.levels]).astype(np.int64) if n else \
        np.zeros(0, np.int64)
    if n:
        idx_l = np.concatenate([l.idx_l for l in program.levels])
        idx_r = np.concatenate([l.idx_r for l in program.levels])
        idx_o = np.concatenate([l.idx_o for l in program.levels])
        lkp = (types >= trc.T_LOOKUP0).astype(np.uint64)
        lanes[:n, C_ADD] = (types == trc.T_ADD)
        lanes[:n, C_MUL] = (types == trc.T_MUL)
        lanes[:n, C_LKP] = lkp
        lanes[:n, C_TID] = np.where(
            lkp > 0, (types - trc.T_LOOKUP0).astype(np.uint64), 0)
        lanes[:n, C_IDXL] = idx_l.astype(np.uint64)
        lanes[:n, C_IDXR] = idx_r.astype(np.uint64)
        lanes[:n, C_IDXO] = idx_o.astype(np.uint64)
        lanes[:n, C_ACCL] = program.acc_l.astype(np.uint64)
        lanes[:n, C_ACCR] = program.acc_r.astype(np.uint64)
    fp = program.final_perm
    lanes[:W, C_FIDX] = fp.astype(np.uint64)
    lanes[:W, C_FCNT] = program.final_count[fp].astype(np.uint64)
    lanes[:W, C_FINP] = (fp < program.num_inputs).astype(np.uint64)
    _CIRCUIT_LANE_CACHE[key] = (program, lanes)
    if len(_CIRCUIT_LANE_CACHE) > _CIRCUIT_LANE_CACHE_MAX:
        _CIRCUIT_LANE_CACHE.popitem(last=False)
    return lanes


def circuit_lane_chunk(program: trc.CircuitProgram, a: int, b: int):
    """[16*(b-a), 2] chunk of cpoly for gate slots [a, b) — all STATIC host
    data (no execution): selectors, table ids, wiring indices, access
    counters, death-order wire metadata.  Slots beyond the data are zero."""
    host = _circuit_lanes_host(program)
    m = b - a
    out = np.zeros((m, C_LANES, 2), dtype=np.uint64)
    if a < host.shape[0]:
        e = min(b, host.shape[0])
        out[: e - a, :, 0] = host[a:e]
    return jnp.asarray(out.reshape(C_LANES * m, 2))


def lookup_lane_chunk(tr: trc.Trace, ranks):
    """[4*B, 2] chunk of lpoly: lanes (Lm, Rm, Om, rankm), every lane
    masked by the lookup-gate indicator (zero elsewhere)."""
    B = tr.types.shape[0]
    is_lkp = (tr.types >= trc.T_LOOKUP0)[:, None]
    zero = jnp.zeros((1, 2), dtype=jnp.uint64)
    lanes = jnp.zeros((B, 4, 2), dtype=jnp.uint64)
    lanes = lanes.at[:, L_LM].set(jnp.where(is_lkp, tr.val_l, zero))
    lanes = lanes.at[:, L_RM].set(jnp.where(is_lkp, tr.val_r, zero))
    lanes = lanes.at[:, L_OM].set(jnp.where(is_lkp, tr.val_o, zero))
    rank_f = jnp.stack([ranks.astype(jnp.uint64),
                        jnp.zeros_like(ranks, dtype=jnp.uint64)], axis=-1)
    lanes = lanes.at[:, L_RANK].set(jnp.where(is_lkp, rank_f, zero))
    return lanes.reshape(4 * B, 2)


class LookupRankStream:
    """Streaming per-occurrence lookup ranks + running counts.

    Resident state: one device counts table of size num_tables*table_size
    (O(tables), independent of the circuit).  ``chunk_ranks`` is
    deterministic given the chunk sequence, so re-streaming reproduces the
    same ranks (the reference's 4-stage lookup stream semantics,
    witness_stream.cpp:2198-2275)."""

    def __init__(self, num_tables: int, table_size: int):
        self.num_tables = num_tables
        self.table_size = table_size
        self.reset()

    def reset(self):
        self.counts = jnp.zeros(
            (self.num_tables * self.table_size + 1,), dtype=jnp.int64)

    @staticmethod
    def chunk_addr(tr: trc.Trace, table_size: int, num_tables: int):
        is_lkp = tr.types >= trc.T_LOOKUP0
        tid = jnp.where(is_lkp, tr.types - trc.T_LOOKUP0, 0).astype(jnp.int64)
        key = jnp.where(
            is_lkp,
            (tr.val_l[:, 0] + np.uint64(256) * tr.val_r[:, 0]
             ).astype(jnp.int64), 0)
        key = jnp.clip(key, 0, table_size - 1)
        addr = tid * table_size + key
        sentinel = num_tables * table_size
        return jnp.where(is_lkp, addr, sentinel), is_lkp

    def chunk_ranks(self, tr: trc.Trace):
        """-> (ranks [B], addr_eff [B], is_lkp [B]); updates counts."""
        addr_eff, is_lkp = self.chunk_addr(tr, self.table_size,
                                           self.num_tables)
        within, _ = lookup_ranks(addr_eff, self.num_tables * self.table_size
                                 + 1)
        prior = self.counts[addr_eff]
        self.counts = self.counts.at[addr_eff].add(1)
        return prior + within, addr_eff, is_lkp

    def final_counts(self):
        return self.counts[:-1]


# ---- v2 set streams (4-slot stride; LINEAR in the committed lanes) --------

def wiring_rw_chunk(tr: trc.Trace, a, b):
    """(reads [4B, 2], writes [4B, 2]) for a B-gate chunk: slot 4t+s with
    s = (l, r, o, pad); element = idx + 1 + a*val + b*acc, pad slots and
    pad gates are the multiplicative identity 1."""
    B = tr.types.shape[0]
    rg = (tr.types != trc.T_PAD)
    addr = jnp.stack([tr.idx_l, tr.idx_r, tr.idx_o,
                      jnp.zeros_like(tr.idx_o)], axis=1)
    val = jnp.stack([tr.val_l, tr.val_r, tr.val_o,
                     jnp.zeros_like(tr.val_o)], axis=1)
    acc = jnp.stack([tr.acc_l, tr.acc_r, jnp.zeros_like(tr.acc_l),
                     jnp.zeros_like(tr.acc_l)], axis=1)
    real = jnp.stack([rg, rg, rg, jnp.zeros_like(rg)], axis=1)
    addr_f = _as_field_int(addr.reshape(-1))
    val_f = val.reshape(-1, 2)
    acc_f = _as_field_int(acc.reshape(-1))
    real_f = real.reshape(-1)
    one = F.ones(())[None, :]
    reads = _rlc(addr_f, val_f, acc_f, a, b)
    writes = _rlc(addr_f, val_f, _as_field_int(acc.reshape(-1) + 1), a, b)
    reads = jnp.where(real_f[:, None], reads, one)
    writes = jnp.where(real_f[:, None], writes, one)
    return reads, writes


def wiring_if_chunk(fin_idx, fin_val, fin_cnt, n_valid: int, num_inputs: int,
                    a, b):
    """(init [4B, 2], final [4B, 2]) for a B-record final chunk in death
    order: record at slot 4t, other slots 1."""
    B = fin_idx.shape[0]
    is_input = (fin_idx < num_inputs).astype(jnp.int64)
    init1 = _rlc(_as_field_int(fin_idx), fin_val, _as_field_int(is_input),
                 a, b)
    fin1 = _rlc(_as_field_int(fin_idx), fin_val, _as_field_int(fin_cnt),
                a, b)
    valid = (jnp.arange(B) < n_valid)[:, None]
    one = F.ones(())[None, :]
    init1 = jnp.where(valid, init1, one)
    fin1 = jnp.where(valid, fin1, one)
    ones = jnp.broadcast_to(one[None, :, :], (B, 3, 2)).astype(jnp.uint64)
    init4 = jnp.concatenate([init1[:, None, :], ones], axis=1)
    fin4 = jnp.concatenate([fin1[:, None, :], ones], axis=1)
    return init4.reshape(4 * B, 2), fin4.reshape(4 * B, 2)


def lookup_rw_chunk(tr: trc.Trace, ranks, addr_eff, is_lkp, table_size: int,
                    num_tables: int, a, b):
    """(reads [B, 2], writes [B, 2]) lookup-table memory checking sets:
    element = addr + 1 + a*val + b*rank (val = the looked-up output)."""
    addr_f = _as_field_int(jnp.where(is_lkp, addr_eff, 0))
    reads = _rlc(addr_f, tr.val_o, _as_field_int(ranks), a, b)
    writes = _rlc(addr_f, tr.val_o, _as_field_int(ranks + 1), a, b)
    one = F.ones(())[None, :]
    reads = jnp.where(is_lkp[:, None], reads, one)
    writes = jnp.where(is_lkp[:, None], writes, one)
    return reads, writes


def padded_table_values(tables, table_size: int, TS: int):
    """[TS] uint64 public table values: each table zero-padded to
    ``table_size``, the whole vector zero-padded to TS (pow2)."""
    vals = jnp.concatenate([
        jnp.pad(jnp.asarray(t, dtype=jnp.uint64), (0, table_size - len(t)))
        for t in tables])
    return jnp.pad(vals, (0, TS - vals.shape[0]))


def lookup_table_sets(tables, counts, a, b, size: int, table_size: int,
                      TS: int):
    """(init [size, 2], final [size, 2]) over TS table slots (public
    addresses/values; counts = committed final access counts; slots beyond
    TS are the multiplicative identity 1, slots beyond the real tables are
    real entries with value 0 / count 0 — they cancel between the two
    sets)."""
    tab_addr = jnp.arange(TS, dtype=jnp.int64)
    tab_vals = padded_table_values(tables, table_size, TS)
    tab_val_f = jnp.stack([tab_vals, jnp.zeros_like(tab_vals)], axis=-1)
    counts = jnp.pad(counts.astype(jnp.int64), (0, TS - counts.shape[0]))
    zero = jnp.zeros_like(tab_addr)
    init = _rlc(_as_field_int(tab_addr), tab_val_f, _as_field_int(zero), a, b)
    fin = _rlc(_as_field_int(tab_addr), tab_val_f, _as_field_int(counts),
               a, b)
    one = F.ones(())[None, :]
    pad = size - TS
    if pad > 0:
        padv = jnp.broadcast_to(one, (pad, 2)).astype(jnp.uint64)
        init = jnp.concatenate([init, padv], axis=0)
        fin = jnp.concatenate([fin, padv], axis=0)
    return init, fin


def gc_streams_v2(tr: trc.Trace, ranks=None):
    """Named streams for the v2 lookup-aware gate-consistency identity:
      sa*(L+R-O) + sm*(L*R-O) = 0   plus the masked-lane consistency
      Lm = lkp*L, Rm = lkp*R, Om = lkp*O
    (lkpO and the lr0/lr1 weights of the reference identity disappear:
    the masked lanes are committed directly in lpoly)."""
    add = (tr.types == trc.T_ADD)
    mul = (tr.types == trc.T_MUL)
    lkp = (tr.types >= trc.T_LOOKUP0)
    one = F.ones(())[None, :]
    zero = jnp.zeros((1, 2), dtype=jnp.uint64)
    sa = jnp.where(add[:, None], one, zero)
    sm = jnp.where(mul[:, None], one, zero)
    slkp = jnp.where(lkp[:, None], one, zero)
    # M is UNMASKED L+R-O (the sa factor inside the (sa, M) group already
    # zeroes non-add gates); its stream eval is the linear check L+R-O.
    Mu = F.fsub(F.fadd(tr.val_l, tr.val_r), tr.val_o)
    out = {"L": tr.val_l, "R": tr.val_r, "O": tr.val_o, "M": Mu,
           "sa": sa, "sm": sm, "slkp": slkp,
           "Lm": jnp.where(lkp[:, None], tr.val_l, zero),
           "Rm": jnp.where(lkp[:, None], tr.val_r, zero),
           "Om": jnp.where(lkp[:, None], tr.val_o, zero)}
    return out


GC2_NAMES = ("L", "R", "O", "M", "sa", "sm", "slkp", "Lm", "Rm", "Om")
GC2_GROUPS = (("sa", "M"), ("sm", "L", "R"), ("sm", "O"),
              ("Lm",), ("slkp", "L"),
              ("Rm",), ("slkp", "R"),
              ("Om",), ("slkp", "O"))


__all__ = [
    "witness_values", "GateArrays", "gate_arrays", "gate_consistency_terms",
    "wiring_read_write_sets", "wiring_init_final_sets",
    "circuit_description", "lookup_ranks", "lookup_sets",
    "C_ADD", "C_MUL", "C_LKP", "C_TID", "C_IDXL", "C_IDXR", "C_IDXO",
    "C_ACCL", "C_ACCR", "C_FIDX", "C_FCNT", "C_FINP", "C_LANES",
    "L_LM", "L_RM", "L_OM", "L_RANK",
    "witness_lane_chunk", "circuit_lane_chunk", "lookup_lane_chunk",
    "LookupRankStream", "wiring_rw_chunk", "wiring_if_chunk",
    "lookup_rw_chunk", "lookup_table_sets", "padded_table_values",
    "gc_streams_v2",
    "GC2_NAMES", "GC2_GROUPS",
]
