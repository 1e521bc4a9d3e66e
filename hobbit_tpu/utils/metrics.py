"""Tracing / profiling / proof-size accounting.

The reference's observability surface (SURVEY section 5): ad-hoc
``clock()`` spans printed as ``Pt/Ps/Vt/streaming time`` (main.cpp:856),
the ``routine_time`` stream-read accumulator (sumcheck.cpp:29), field
multiplication counters gated by ``isCounting`` (fieldElement.cpp:35-52),
and the ``double &vt, &ps`` pair threaded through every API.  Here the
same roles live in one small registry: named wall-clock spans, named
counters, and a proof-size ledger in the reference's units (field element
= 16 bytes, digest = 32 bytes).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict


class Metrics:
    def __init__(self):
        self.spans: Dict[str, float] = defaultdict(float)
        self.counters: Dict[str, int] = defaultdict(int)
        self._bytes: int = 0

    @contextlib.contextmanager
    def span(self, name: str):
        """Accumulating wall-clock span (the reference's chrono pairs)."""
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.spans[name] += time.perf_counter() - t0

    def count(self, name: str, n: int = 1):
        self.counters[name] += n

    # -- proof-size ledger (the `ps` accumulator, in KB like main.cpp) -----
    def add_fields(self, n: int):
        self._bytes += 16 * n

    def add_digests(self, n: int):
        self._bytes += 32 * n

    @property
    def proof_kb(self) -> float:
        return self._bytes / 1024.0

    def report(self) -> dict:
        return {
            "spans_sec": dict(self.spans),
            "counters": dict(self.counters),
            "proof_kb": self.proof_kb,
        }


GLOBAL = Metrics()


def _dedup_digests(indices, depth: int) -> int:
    """Digests transmitted for one tree's query batch after shared-node
    dedup (the reference's ``visited[]`` rule, merkle_tree.h:46-48 /
    merkle_tree.cpp:326-360)."""
    from ..ops.merkle import dedup_path_size
    return dedup_path_size([int(i) for i in indices], 1 << depth)


def _whir_level_paths(lvl) -> int:
    """Dedup'd digest count for a WhirLevel / WhirBatchLevel's two path
    bundles: 4 coset leaves (ids p*4+l) of the current tree + one leaf
    (interleave(p)//4) of the next tree, per query."""
    import numpy as np
    from ..pc.whir import _inter_index

    qarr = np.asarray(lvl.queries)
    if qarr.ndim == 1:
        qarr = qarr[None, :]                 # unify single/batch layouts
    d_cos = lvl.coset_paths.shape[-2]
    d_nxt = lvl.next_paths.shape[-2]
    next_m = 1 << (d_nxt + 2)                # next tree: m/4 leaves
    total = 0
    for row in qarr:
        cs = [int(p) * 4 + l for p in row for l in range(4)]
        total += _dedup_digests(cs, d_cos)
        nx = [_inter_index(int(p), next_m) // 4 for p in row]
        total += _dedup_digests(nx, d_nxt)
    return total


def _sizer_queries_paths(nt) -> tuple:
    """Openings storing (queries, paths[..., depth, 8])."""
    return (32 * _dedup_digests(nt.queries, nt.paths.shape[-2]), ("paths",))


def _sizer_leaf_ids_paths(nt) -> tuple:
    # query indices are Fiat-Shamir-derived (the verifier recomputes
    # them), so they are never transmitted — always skipped; fused-open
    # instances carry them as device arrays instead of host tuples
    skip = ("paths", "leaf_ids", "rows_idx", "cols_idx")
    ids = nt.leaf_ids
    if hasattr(ids, "shape"):
        import numpy as _np
        ids = [int(v) for v in _np.asarray(ids)]
    else:
        ids = list(ids)
    if not ids:                              # legacy instance: raw count
        return (int(nt.paths.nbytes), skip)
    return (32 * _dedup_digests(ids, nt.paths.shape[-2]), skip)


def _sizer_whir_level(nt) -> tuple:
    return (32 * _whir_level_paths(nt), ("coset_paths", "next_paths"))


# Per-opening dedup accounting: type name -> fn(nt) -> (bytes, handled
# field names).  Unregistered types fall back to raw nbytes (an upper
# bound, never an understatement).
def _sizer_group(nt) -> tuple:
    """ElasticGroupOpening: per-entry dedup'd paths; derived indices free."""
    import numpy as _np
    total = 0
    for ids, paths in zip(nt.leaf_ids, nt.paths):
        ids = [int(v) for v in _np.asarray(ids)]
        total += 32 * _dedup_digests(ids, paths.shape[-2])
    return (total, ("paths", "leaf_ids"))


_PATH_SIZERS = {
    "ElasticGroupOpening": _sizer_group,
    "ShockwaveOpening": _sizer_queries_paths,
    "ElasticOpening": _sizer_leaf_ids_paths,
    "ElasticRecursiveOpening": _sizer_leaf_ids_paths,
    "ElasticMultiOpening": _sizer_leaf_ids_paths,
    "ElasticMultiRecOpening": _sizer_leaf_ids_paths,
    "TensorOpening": _sizer_leaf_ids_paths,
    "RecursiveOpening": _sizer_leaf_ids_paths,
    "WhirLevel": _sizer_whir_level,
    "WhirBatchLevel": _sizer_whir_level,
}


def proof_size_kb(proof, dedup: bool = True) -> float:
    """Transmitted proof size in KB (the reference's ``Ps``, main.cpp:856).

    Walks the proof pytree: every device array is transmitted data — field
    elements are [..., 2] uint64 (16 B each), digests [..., 8] uint32
    (32 B each), so ``nbytes`` matches the reference's accounting.
    Host-side metadata (ints, tuples of ints, the timings dict) is free.

    Merkle authentication paths are counted with shared nodes deduplicated
    (the reference's ``visited[]`` rule, src/merkle_tree.h:46-48) for every
    registered opening type; pass ``dedup=False`` for the raw bound."""
    total = 0

    def walk(x):
        nonlocal total
        if hasattr(x, "_fields"):            # NamedTuple
            skip = ()
            sizer = _PATH_SIZERS.get(type(x).__name__) if dedup else None
            if sizer is not None:
                nbytes, skip = sizer(x)
                total += nbytes
            for name, v in zip(x._fields, x):
                if name == "timings" or name in skip:
                    continue
                walk(v)
        elif isinstance(x, dict):
            for v in x.values():
                walk(v)
        elif isinstance(x, (list, tuple)):
            for v in x:
                walk(v)
        elif hasattr(x, "nbytes") and hasattr(x, "dtype"):
            total += int(x.nbytes)

    walk(proof)
    return total / 1024.0


def size_breakdown(proof, min_kb: float = 10.0, prefix: str = "") -> list:
    """[(path, kb)] for every pytree node whose RAW byte count exceeds
    ``min_kb`` — the drill-down tool behind proof-size work.  Raw (no
    path dedup), so parents may exceed the dedup'd ``proof_size_kb``."""
    out = []

    def walk(x, path):
        if hasattr(x, "_fields"):
            for name, v in zip(x._fields, x):
                if name == "timings":
                    continue
                walk(v, f"{path}.{name}")
        elif isinstance(x, dict):
            for k, v in x.items():
                walk(v, f"{path}[{k}]")
        elif isinstance(x, (list, tuple)):
            for i, v in enumerate(x):
                walk(v, f"{path}[{i}]")
        elif hasattr(x, "nbytes") and hasattr(x, "dtype"):
            kb = int(x.nbytes) / 1024.0
            if kb >= min_kb:
                out.append((path, round(kb, 1)))

    walk(proof, prefix)
    return sorted(out, key=lambda t: -t[1])


__all__ = ["Metrics", "GLOBAL", "proof_size_kb", "size_breakdown"]
