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


__all__ = [
    "witness_values", "GateArrays", "gate_arrays", "gate_consistency_terms",
    "wiring_read_write_sets", "wiring_init_final_sets",
    "circuit_description", "lookup_ranks", "lookup_sets",
]
