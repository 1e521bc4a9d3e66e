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


def proof_size_kb(proof) -> float:
    """Transmitted proof size in KB (the reference's ``Ps``, main.cpp:856).

    Walks the proof pytree: every device array is transmitted data — field
    elements are [..., 2] uint64 (16 B each), digests [..., 8] uint32
    (32 B each), so ``nbytes`` is exactly the reference's accounting.
    Host-side metadata (ints, tuples of ints, the timings dict) is free."""
    import numpy as np

    total = 0

    def walk(x):
        nonlocal total
        if hasattr(x, "_fields"):            # NamedTuple
            for name, v in zip(x._fields, x):
                if name == "timings":
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


__all__ = ["Metrics", "GLOBAL", "proof_size_kb"]
