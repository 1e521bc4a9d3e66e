"""Workload circuit builders (the reference's ``fun`` 1-9 families).

Circuits are built as *levelized gate programs*: every builder emits levels
of independent gates (vectorized numpy label arrays), honoring the label
contract of ``streams.trace`` (gate g in global level order owns wire
``num_inputs + g``).  Evaluation is then one gather->op->scatter per level
on device — the TPU-native replacement for the reference's sequential
producer thread (``Seval.cpp:486-1285``).

Provided families (reference ``Seval_Oracle`` dispatch):
  1 arbitrary deep add/mul circuit          (fun1, Seval.cpp:486-515)
  2 lookup range proof                      (fun2, :624-665)
  3 bit-decomposition range proof           (fun3, :572-622)
  4 SHA-256 with lookup tables              (fun4, :689-955)  [sha256.py]
  5 AES encryption with S-box lookups       (fun5, :991-1083) [aes.py]
  6 SQL range query (LTU/EQ comparisons)    (fun6, :1085-1168)
  7 dummy computation chain                 (fun7, :880-898)
  8 pruned (sparse) MLP inference           (fun8, :1170-1236)
  9 dense MLP inference                     (fun9, :1238-1285)
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

from ..ops import field as F
from ..streams import trace as trc


class Builder:
    """Incremental levelized circuit builder.

    Consecutive emissions whose operands do not read the pending level's
    outputs are PACKED into one level (wider levels -> fewer, larger
    vectorized gather/scatter steps on device)."""

    def __init__(self, num_inputs: int, tables: Sequence[np.ndarray] = ()):
        self.num_inputs = num_inputs
        self.tables = [np.asarray(t, dtype=np.uint64) for t in tables]
        self.next_label = num_inputs
        self._buckets: List[List[trc.Level]] = []   # per-depth emissions
        self._wire_depth = np.zeros(max(num_inputs, 1), dtype=np.int64)
        self._floor = 0

    def barrier(self):
        """Force subsequent emissions BELOW everything emitted so far.

        ASAP packing otherwise floats independent gates up into the same
        wide level; barriers give circuits a block structure whose live
        width — and therefore the streaming executor's slot memory — is
        O(block), the levelized analog of the reference producer's
        gate-by-gate ``delete_gate`` reclamation (Seval.cpp:119-222)."""
        self._floor = len(self._buckets)

    def _emit(self, types, idx_l, idx_r):
        types = np.asarray(types, dtype=np.uint8)
        idx_l = np.asarray(idx_l, dtype=np.int64)
        idx_r = np.asarray(idx_r, dtype=np.int64)
        m = len(types)
        idx_o = np.arange(self.next_label, self.next_label + m, dtype=np.int64)
        self.next_label += m
        # ASAP schedule: this emission's depth = 1 + max operand depth
        depth = max(int(max(self._wire_depth[idx_l].max(initial=-1),
                            self._wire_depth[idx_r].max(initial=-1))) + 1,
                    self._floor)
        if len(self._wire_depth) < self.next_label:
            grow = np.zeros(self.next_label - len(self._wire_depth),
                            dtype=np.int64)
            self._wire_depth = np.concatenate([self._wire_depth, grow])
        self._wire_depth[idx_o] = depth
        while len(self._buckets) <= depth:
            self._buckets.append([])
        self._buckets[depth].append(trc.Level(types=types, idx_o=idx_o,
                                              idx_l=idx_l, idx_r=idx_r))
        return idx_o

    @property
    def levels(self) -> List[trc.Level]:
        out = []
        for bucket in self._buckets:
            if bucket:
                out.append(trc.Level(
                    types=np.concatenate([p.types for p in bucket]),
                    idx_o=np.concatenate([p.idx_o for p in bucket]),
                    idx_l=np.concatenate([p.idx_l for p in bucket]),
                    idx_r=np.concatenate([p.idx_r for p in bucket]),
                ))
        return out

    def add(self, l, r):
        l, r = np.broadcast_arrays(np.asarray(l), np.asarray(r))
        return self._emit(np.full(l.shape, trc.T_ADD), l, r)

    def mul(self, l, r):
        l, r = np.broadcast_arrays(np.asarray(l), np.asarray(r))
        return self._emit(np.full(l.shape, trc.T_MUL), l, r)

    def lookup(self, table_id, l, r):
        l, r = np.broadcast_arrays(np.asarray(l), np.asarray(r))
        return self._emit(np.full(l.shape, trc.T_LOOKUP0 + table_id), l, r)

    def mixed(self, types, l, r):
        return self._emit(types, l, r)

    def sum_tree(self, labels):
        """Binary add-reduction; odd leftovers carry to the next round."""
        labels = np.asarray(labels)
        while len(labels) > 1:
            p = len(labels) // 2
            summed = self.add(labels[0 : 2 * p : 2], labels[1 : 2 * p : 2])
            if len(labels) % 2:
                summed = np.concatenate([summed, labels[-1:]])
            labels = summed
        return labels[0]

    def build(self) -> trc.CircuitProgram:
        return trc.analyze(self.levels, self.num_inputs, self.tables)


# ---------------------------------------------------------------------------
# Lookup tables (reference Seval.cpp:26-95)
# ---------------------------------------------------------------------------

def range_table(bits: int = 8) -> np.ndarray:
    """Identity/range table: T[k] = k for k < 2^bits."""
    return np.arange(1 << bits, dtype=np.uint64)


def xor_table(bits: int = 8) -> np.ndarray:
    """T[a + 2^bits * b] = a xor b."""
    n = 1 << bits
    a = np.arange(n, dtype=np.uint64)
    return (a[None, :] ^ a[:, None]).reshape(-1)


def eq_table(bits: int = 8) -> np.ndarray:
    n = 1 << bits
    a = np.arange(n)
    return (a[None, :] == a[:, None]).astype(np.uint64).reshape(-1)


def ltu_table(bits: int = 8) -> np.ndarray:
    """T[a + 2^bits * b] = 1 if a < b (unsigned)."""
    n = 1 << bits
    a = np.arange(n)
    return (a[None, :].T < a[None, :]).astype(np.uint64).T.reshape(-1)


# ---------------------------------------------------------------------------
# Workload circuits
# ---------------------------------------------------------------------------

def fun1_arbitrary(log_n: int, depth: int) -> trc.CircuitProgram:
    """Deep arbitrary circuit: width 2^log_n, alternating add/mul levels;
    each level combines a rolled copy of the previous one."""
    n = 1 << log_n
    b = Builder(num_inputs=n)
    cur = np.arange(n, dtype=np.int64)
    for d in range(depth):
        rolled = np.roll(cur, 1)
        cur = b.add(cur, rolled) if d % 2 == 0 else b.mul(cur, rolled)
    b.sum_tree(cur)
    return b.build()


def fun1_inputs(n: int):
    """Reference input convention: v[i] = i % 1024 (witness_stream.cpp:2110)."""
    vals = np.arange(n, dtype=np.uint64) % 1024
    return F.make(vals, np.zeros(n, dtype=np.uint64))


def fun2_range_proof_lookup(log_n: int, bits: int = 8) -> trc.CircuitProgram:
    """Prove each input is in [0, 2^bits) via range-table lookups, then
    aggregate (the lookup output must equal the input; we also sum them).

    Input wire n is a constant-zero wire (the unused second lookup operand);
    use ``fun2_inputs`` to build assignments."""
    n = 1 << log_n
    b = Builder(num_inputs=n + 1, tables=[range_table(bits)])
    zero_ref = np.full(n, n, dtype=np.int64)
    out = b.lookup(0, np.arange(n, dtype=np.int64), zero_ref)
    b.sum_tree(out)
    return b.build()


def fun2_inputs(log_n: int, bits: int = 8, seed: int = 0):
    n = 1 << log_n
    rng = np.random.default_rng(seed)
    vals = rng.integers(0, 1 << bits, size=n + 1, dtype=np.uint64)
    vals[n] = 0
    return F.make(vals, np.zeros_like(vals))


def fun3_range_proof_bits(log_n: int, bits: int = 8) -> trc.CircuitProgram:
    """Naive range proof: inputs are bit decompositions; check b*b = b via
    mul gates and recombine with powers of two.

    Inputs: n*bits bit wires followed by n claimed values; the recombined
    sums land in the trace for consistency checking."""
    n = 1 << log_n
    b = Builder(num_inputs=n * bits + n)
    bit_ids = np.arange(n * bits, dtype=np.int64).reshape(n, bits)
    # b_i^2 (equals b_i iff boolean)
    b.mul(bit_ids.reshape(-1), bit_ids.reshape(-1))
    # recombination: sum_i b_i * 2^i needs constant wires; use doubling:
    # acc = b_{k-1}; acc = 2*acc + b_{k-2} = (acc+acc) + b_...
    acc = bit_ids[:, bits - 1]
    for i in range(bits - 2, -1, -1):
        acc = b.add(acc, acc)
        acc = b.add(acc, bit_ids[:, i])
    b.sum_tree(acc)
    return b.build()


def fun6_sql_range_query(log_n: int, bits: int = 8,
                         block_rows: Optional[int] = None
                         ) -> trc.CircuitProgram:
    """SQL range query: for each row value v, compute (low < v) * (v < high)
    via LTU lookups against bound wires, and sum the selector bits.

    ``block_rows``: process rows in blocks of that many, chaining a running
    count across blocks with barriers between them.  Live width (and hence
    the streaming executor's slot memory) becomes O(block_rows) instead of
    O(n) — the deep-and-narrow shape of the reference's row loop
    (Seval.cpp:1085-1168), widened just enough to keep the TPU's vector
    units fed."""
    n = 1 << log_n
    b = Builder(num_inputs=n + 2, tables=[ltu_table(bits), eq_table(bits)])
    low1 = np.asarray([n], dtype=np.int64)        # input wire n
    high1 = np.asarray([n + 1], dtype=np.int64)   # input wire n+1
    R = block_rows or n
    acc = None
    for s in range(0, n, R):
        m = min(R, n - s)
        rows = np.arange(s, s + m, dtype=np.int64)
        gt_low = b.lookup(0, np.broadcast_to(low1, m), rows)   # low < v
        lt_high = b.lookup(0, rows, np.broadcast_to(high1, m)) # v < high
        sel = b.mul(gt_low, lt_high)
        part = np.asarray([b.sum_tree(sel)], dtype=np.int64)
        acc = part if acc is None else b.add(acc, part)
        if block_rows is not None:
            b.barrier()
    return b.build()


def fun7_dummy(log_n: int, depth: int = 4) -> trc.CircuitProgram:
    """Dummy chain: repeated squaring of each input."""
    n = 1 << log_n
    b = Builder(num_inputs=n)
    cur = np.arange(n, dtype=np.int64)
    for _ in range(depth):
        cur = b.mul(cur, cur)
    b.sum_tree(cur)
    return b.build()


def fun9_mlp(in_dim: int, hidden: Sequence[int]) -> trc.CircuitProgram:
    """Dense MLP inference: inputs = activations then all weight matrices
    (row-major).  Each layer: products x_j * W_ij, add-tree reduction,
    square activation (field-friendly nonlinearity, as in zkCNN-style
    arithmetizations)."""
    dims = [in_dim] + list(hidden)
    n_weights = sum(dims[i] * dims[i + 1] for i in range(len(hidden)))
    b = Builder(num_inputs=in_dim + n_weights)
    x = np.arange(in_dim, dtype=np.int64)
    w_off = in_dim
    for li in range(len(hidden)):
        din, dout = dims[li], dims[li + 1]
        W = (np.arange(din * dout, dtype=np.int64) + w_off).reshape(dout, din)
        w_off += din * dout
        prods = b.mul(np.tile(x, dout), W.reshape(-1))        # [dout*din]
        prods = prods.reshape(dout, din)
        cols = prods
        while cols.shape[1] > 1:
            p = cols.shape[1] // 2
            summed = b.add(cols[:, 0 : 2 * p : 2].reshape(-1),
                           cols[:, 1 : 2 * p : 2].reshape(-1)).reshape(dout, p)
            if cols.shape[1] % 2:
                summed = np.concatenate([summed, cols[:, -1:]], axis=1)
            cols = summed
        lin = cols[:, 0]
        x = b.mul(lin, lin) if li < len(hidden) - 1 else lin   # activation
    b.sum_tree(x)
    return b.build()


def fun8_pruned_mlp(in_dim: int, hidden: Sequence[int], density: float = 0.25,
                    seed: int = 7) -> trc.CircuitProgram:
    """Sparse (pruned) MLP: same as fun9 but only a ``density`` fraction of
    weights exist; sparsity pattern drawn from a seeded PRNG."""
    rng = np.random.default_rng(seed)
    dims = [in_dim] + list(hidden)
    masks = [rng.random((dims[i + 1], dims[i])) < density
             for i in range(len(hidden))]
    for m in masks:  # ensure every output neuron has at least one input
        empty = ~m.any(axis=1)
        m[empty, 0] = True
    n_weights = sum(int(m.sum()) for m in masks)
    b = Builder(num_inputs=in_dim + n_weights)
    x = np.arange(in_dim, dtype=np.int64)
    w_off = in_dim
    for li in range(len(hidden)):
        m = masks[li]
        dout = m.shape[0]
        rows_i, cols_i = np.nonzero(m)
        k = len(rows_i)
        w_ids = np.arange(k, dtype=np.int64) + w_off
        w_off += k
        prods = b.mul(x[cols_i], w_ids)
        # per-neuron reduction via repeated pairing within segments
        outs = np.zeros(dout, dtype=np.int64)
        for o in range(dout):
            seg = prods[rows_i == o]
            while len(seg) > 1:
                p = len(seg) // 2
                summed = b.add(seg[0 : 2 * p : 2], seg[1 : 2 * p : 2])
                if len(seg) % 2:
                    summed = np.concatenate([summed, seg[-1:]])
                seg = summed
            outs[o] = seg[0]
        x = b.mul(outs, outs) if li < len(hidden) - 1 else outs
    b.sum_tree(x)
    return b.build()


def random_inputs(program: trc.CircuitProgram, seed: int = 0,
                  small: Optional[int] = None):
    """Random input assignment (small=k bounds values below k for lookup
    circuits)."""
    rng = np.random.default_rng(seed)
    hi = small if small is not None else F.P
    vals = rng.integers(0, hi, size=program.num_inputs, dtype=np.uint64)
    return F.make(vals, np.zeros_like(vals))


__all__ = [
    "Builder", "range_table", "xor_table", "eq_table", "ltu_table",
    "fun1_arbitrary", "fun1_inputs", "fun2_range_proof_lookup",
    "fun3_range_proof_bits", "fun6_sql_range_query", "fun7_dummy",
    "fun8_pruned_mlp", "fun9_mlp", "random_inputs",
]
