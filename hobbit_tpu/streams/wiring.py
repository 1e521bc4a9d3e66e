"""Streaming set-stream oracles for the product (mul-tree) arguments.

The wiring-consistency and lookup multisets are virtual streams derived
from the gate trace (reference ``read_stream`` dispatch,
witness_stream.cpp:2106-2353).  This module provides the glue between the
re-executable ``TraceOracle`` and the streaming mul-tree's
``chunk_fn(level, i, csize)`` protocol:

* a LEVEL-0 GENERATOR yields the raw set stream piece by piece (each set
  is produced by its own pass over the trace — the reference's multi-stage
  memory stream, witness_stream.cpp:1340-1698);
* ``SequentialFoldOracle`` folds 2^level consecutive values on the fly to
  serve any product-tree level, restarting the generator whenever a new
  pass begins (i == 0).  Resident memory: one raw piece + the fold carry —
  O(B).

The mul-tree engine accesses chunks strictly sequentially within a pass,
which is exactly what a re-streamable generator supports.
"""

from __future__ import annotations

from typing import Callable, Iterator, Optional

import numpy as np

import jax.numpy as jnp

from ..ops import field as F
from . import trace as trc
from . import views


class SequentialFoldOracle:
    """chunk_fn(level, i, csize) over a restartable level-0 generator.

    ``gen_factory()`` must yield device [m, 2] pieces covering the whole
    level-0 stream in order (total elements = ``total``)."""

    def __init__(self, gen_factory: Callable[[], Iterator], total: int):
        self.gen_factory = gen_factory
        self.total = total
        self._gen = None
        self._level = None
        self._next = None
        self._carry = None     # folded-but-unemitted values [k, 2]

    def _restart(self, level: int):
        self._gen = self.gen_factory()
        self._level = level
        self._next = 0
        self._carry = jnp.zeros((0, 2), dtype=jnp.uint64)
        self._raw = jnp.zeros((0, 2), dtype=jnp.uint64)

    def __call__(self, level: int, i: int, csize: int):
        if i == 0 or self._gen is None or level != self._level or \
           i != self._next:
            assert i == 0, "SequentialFoldOracle requires sequential access"
            self._restart(level)
        self._next = i + 1
        fold = 1 << level
        need = csize
        out = []
        have = 0
        carry = self._carry
        raw = self._raw
        while have < need:
            if carry.shape[0]:
                take = min(carry.shape[0], need - have)
                out.append(carry[:take])
                carry = carry[take:]
                have += take
                continue
            # refill carry: consume raw until a multiple of `fold`, fold it
            while raw.shape[0] < fold:
                piece = next(self._gen)
                raw = piece if raw.shape[0] == 0 else \
                    jnp.concatenate([raw, piece], axis=0)
            usable = (raw.shape[0] // fold) * fold
            blk = raw[:usable].reshape(-1, fold, 2)
            carry = F.fprod(blk, axis=1) if fold > 1 else raw[:usable]
            raw = raw[usable:]
        self._carry = carry
        self._raw = raw
        return jnp.concatenate(out, axis=0) if len(out) > 1 else out[0]


def _ones(n: int):
    out = jnp.zeros((n, 2), dtype=jnp.uint64)
    return out.at[:, 0].set(1)


def wiring_stream_factory(oracle: trc.TraceOracle, np2: int, B: int, a, b):
    """Level-0 generator factory for the wiring multiset stream
    [reads | writes | init | final], each of length 4*np2 (4-slot stride).

    Each set is one pass over the trace; reads/writes re-execute the gate
    stream, init/final the death-ordered final stream.

    Pieces cover B gates (4B set elements) each: transient piece memory is
    still O(B) and the per-pass dispatch count — the cost that dominates on
    remote-attached chips — drops 4x vs B-element pieces."""
    gates_B = min(max(1, B), np2)
    n_gate_chunks = int(np.ceil(oracle.num_gates / gates_B))
    pad_gate = np2 // gates_B - n_gate_chunks
    n_fin_chunks = int(np.ceil(oracle.num_wires / gates_B))
    pad_fin = np2 // gates_B - n_fin_chunks

    def gen():
        for which in (0, 1):                       # reads, writes
            for tr in oracle.gate_chunks(gates_B):
                yield views.wiring_rw_chunk(tr, a, b)[which]
            for _ in range(pad_gate):
                yield _ones(4 * gates_B)
        for which in (0, 1):                       # init, final
            for idx, val, cnt, nv in oracle.final_chunks(gates_B):
                yield views.wiring_if_chunk(
                    idx, val, cnt, nv, oracle.program.num_inputs,
                    a, b)[which]
            for _ in range(pad_fin):
                yield _ones(4 * gates_B)

    return gen


def lookup_stream_factory(oracle: trc.TraceOracle, size_l: int, B: int,
                          a, b, table_size: int, TS: int):
    """Level-0 generator factory for the lookup multiset stream
    [reads | writes | init | final], each of length size_l (1 per gate /
    table slot).  Reads/writes re-execute with a fresh rank stream; the
    init/final table sets are public-data transforms."""
    program = oracle.program
    num_tables = len(program.tables)
    # pad-gate elements and pure pad positions are both the identity 1, so
    # only the TOTAL per-set length (size_l) matters for the pad count;
    # pieces of 4B elements cut the dispatch count (transient, still O(B))
    gates_B = min(max(1, 4 * B), size_l)
    n_gate_chunks = int(np.ceil(oracle.num_gates / gates_B))
    pad_gate = size_l // gates_B - n_gate_chunks

    def gen():
        for which in (0, 1):
            rs = views.LookupRankStream(num_tables, table_size)
            for tr in oracle.gate_chunks(gates_B):
                ranks, addr_eff, is_lkp = rs.chunk_ranks(tr)
                yield views.lookup_rw_chunk(tr, ranks, addr_eff, is_lkp,
                                            table_size, num_tables,
                                            a, b)[which]
            for _ in range(pad_gate):
                yield _ones(gates_B)
        # counts for the final set: one more counting pass
        rs = views.LookupRankStream(num_tables, table_size)
        for tr in oracle.gate_chunks(gates_B):
            rs.chunk_ranks(tr)
        counts = rs.final_counts()
        init, fin = views.lookup_table_sets(program.tables, counts, a, b,
                                            size_l, table_size, TS)
        for which, s in ((0, init), (1, fin)):
            for st in range(0, size_l, gates_B):
                yield s[st:st + gates_B]

    return gen


__all__ = ["SequentialFoldOracle", "wiring_stream_factory",
           "lookup_stream_factory"]
