"""ctypes bindings for the native C++ runtime (hobbit_rt.so).

Builds lazily with g++ -O3 on first use (cached next to the source); every
entry point has a pure-Python/JAX fallback so the framework works without a
toolchain.  The native paths cover the HOST side of the pipeline — witness
production (the reference's producer thread), BLAKE3/Merkle hashing of
host-resident data, field helpers — while all protocol math stays on
device."""

from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess
from typing import List, Optional

import numpy as np

_DIR = pathlib.Path(__file__).resolve().parent
_SRC = _DIR / "native" / "hobbit_rt.cpp"
_SO = _DIR / "native" / "hobbit_rt.so"

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def build(force: bool = False) -> bool:
    """Compile the native library; returns True on success."""
    if _SO.exists() and not force and \
       _SO.stat().st_mtime >= _SRC.stat().st_mtime:
        return True
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-std=c++17", "-shared",
             "-fPIC", "-pthread", str(_SRC), "-o", str(_SO)],
            check=True, capture_output=True)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def _u64p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64))


def _u32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32))


def _i64p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is None and not _TRIED:
        _TRIED = True
        if build():
            _LIB = ctypes.CDLL(str(_SO))
            _LIB.rt_merkle_tree.restype = ctypes.c_int64
            _LIB.rt_producer_start.restype = ctypes.c_void_p
    return _LIB


def available() -> bool:
    return lib() is not None


# ---------------------------------------------------------------------------
# BLAKE3 / Merkle
# ---------------------------------------------------------------------------

def blake3_compress64(msgs: np.ndarray) -> np.ndarray:
    """msgs [n, 16] uint32 -> digests [n, 8] uint32 (native)."""
    msgs = np.ascontiguousarray(msgs, dtype=np.uint32)
    n = msgs.shape[0]
    out = np.empty((n, 8), dtype=np.uint32)
    lib().rt_blake3_compress64(_u32p(msgs), _u32p(out), ctypes.c_int64(n))
    return out


def hash_field_leaves(fields: np.ndarray) -> np.ndarray:
    """fields [n, 4, 2] uint64 -> [n, 8] uint32 digests (native)."""
    fields = np.ascontiguousarray(fields, dtype=np.uint64)
    n = fields.shape[0]
    out = np.empty((n, 8), dtype=np.uint32)
    lib().rt_blake3_field_leaves(_u64p(fields), _u32p(out),
                                 ctypes.c_int64(n))
    return out


def merkle_tree(leaves: np.ndarray):
    """leaves [n, 8] uint32 (n pow2) -> (levels [2n-1, 8], root_offset)."""
    leaves = np.ascontiguousarray(leaves, dtype=np.uint32)
    n = leaves.shape[0]
    out = np.empty((2 * n - 1, 8), dtype=np.uint32)
    off = lib().rt_merkle_tree(_u32p(leaves), _u32p(out), ctypes.c_int64(n))
    return out, int(off)


# ---------------------------------------------------------------------------
# Witness evaluation / producer
# ---------------------------------------------------------------------------

def _flatten_program(program):
    """CircuitProgram -> flat parallel arrays for the C side."""
    types, il, ir, io = [], [], [], []
    for lvl in program.levels:
        types.append(lvl.types.astype(np.uint32))
        il.append(lvl.idx_l.astype(np.int64))
        ir.append(lvl.idx_r.astype(np.int64))
        io.append(lvl.idx_o.astype(np.int64))
    types = np.concatenate(types) if types else np.zeros(0, np.uint32)
    il = np.concatenate(il) if il else np.zeros(0, np.int64)
    ir = np.concatenate(ir) if ir else np.zeros(0, np.int64)
    io = np.concatenate(io) if io else np.zeros(0, np.int64)
    # lookup convention (streams/trace._apply_level): 1-D tables with
    # key = l.re + 256 * r.re; tab_off = [num_tables + 1] offsets
    tables = program.tables or []
    tab_vals, tab_off = [], [0]
    off = 0
    for t in tables:
        t = np.asarray(t, dtype=np.uint64).reshape(-1)
        tab_vals.append(t)
        off += len(t)
        tab_off.append(off)
    tab_vals = (np.concatenate(tab_vals) if tab_vals
                else np.zeros(1, np.uint64))
    return types, il, ir, io, tab_vals, np.asarray(tab_off, dtype=np.int64)


def eval_program(program, inputs) -> tuple:
    """Native full evaluation; returns (L, R, O) uint64 [n, 2] arrays."""
    types, il, ir, io, tabs, toff = _flatten_program(program)
    n = len(types)
    x = np.ascontiguousarray(np.asarray(inputs, dtype=np.uint64))
    L = np.empty((n, 2), dtype=np.uint64)
    R = np.empty((n, 2), dtype=np.uint64)
    O = np.empty((n, 2), dtype=np.uint64)
    lib().rt_eval(_u32p(types), _i64p(il), _i64p(ir), _i64p(io), _u64p(x),
                  _u64p(tabs), _i64p(toff), ctypes.c_int64(n),
                  ctypes.c_int64(x.shape[0]), _u64p(L), _u64p(R), _u64p(O))
    return L, R, O


class WitnessProducer:
    """Background double-buffered chunk producer (Seval_Oracle analog).

    Yields (L, R, O) chunks of ``chunk_gates`` gates; re-streams the
    circuit forever, so multiple proving passes just keep calling
    ``next_chunk``.  Use as a context manager to guarantee shutdown."""

    def __init__(self, program, inputs, chunk_gates: int):
        # slot-renamed program: the native producer's working memory is
        # O(program.num_slots) — the liveness allocator's peak — not O(N);
        # inputs stream into slots at their scheduled first-use position
        # (the reference's slot-reclaiming emitter, Seval.cpp:119-222)
        types, sl, sr, so = [], [], [], []
        feed_pos, feed_slot, feed_label = [], [], []
        pos = 0
        for plan in program.plans:
            feed_pos.extend([pos] * len(plan.feed_slots))
            feed_slot.extend(np.asarray(plan.feed_slots).tolist())
            feed_label.extend(np.asarray(plan.feed_labels).tolist())
            types.append(np.asarray(plan.types, dtype=np.uint32))
            sl.append(np.asarray(plan.sl, dtype=np.int64))
            sr.append(np.asarray(plan.sr, dtype=np.int64))
            so.append(np.asarray(plan.so, dtype=np.int64))
            pos += len(plan.types)
        cat = (lambda xs, dt: np.concatenate(xs).astype(dt) if xs
               else np.zeros(0, dt))
        types = cat(types, np.uint32)
        sl, sr, so = (cat(sl, np.int64), cat(sr, np.int64),
                      cat(so, np.int64))
        fpos = np.asarray(feed_pos, dtype=np.int64)
        fslot = np.asarray(feed_slot, dtype=np.int64)
        flabel = np.asarray(feed_label, dtype=np.int64)
        _, _, _, _, tabs, toff = _flatten_program(program)
        x = np.ascontiguousarray(np.asarray(inputs, dtype=np.uint64))
        self.chunk_gates = chunk_gates
        self.num_gates = len(types)
        self._keep = (types, sl, sr, so, tabs, toff, x,
                      fpos, fslot, flabel)
        num_tables = len(toff) - 1
        self._h = lib().rt_producer_start(
            _u32p(types), _i64p(sl), _i64p(sr), _i64p(so), _u64p(x),
            _u64p(tabs), _i64p(toff), ctypes.c_int64(num_tables),
            ctypes.c_int64(self.num_gates), ctypes.c_int64(x.shape[0]),
            ctypes.c_int64(int(program.num_slots)),
            _i64p(fpos), _i64p(fslot), _i64p(flabel),
            ctypes.c_int64(len(fpos)), ctypes.c_int64(chunk_gates))
        self._buf = np.empty((chunk_gates, 3, 2), dtype=np.uint64)

    def next_chunk(self):
        lib().rt_producer_next(ctypes.c_void_p(self._h), _u64p(self._buf))
        c = self._buf
        return c[:, 0].copy(), c[:, 1].copy(), c[:, 2].copy()

    def close(self):
        if self._h:
            lib().rt_producer_stop(ctypes.c_void_p(self._h))
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


__all__ = ["available", "build", "blake3_compress64", "hash_field_leaves",
           "merkle_tree", "eval_program", "WitnessProducer"]
