"""Metrics / tracing registry tests."""

import time

from hobbit_tpu.utils.metrics import Metrics


def test_spans_counters_and_proof_ledger():
    m = Metrics()
    with m.span("commit"):
        time.sleep(0.01)
    with m.span("commit"):
        time.sleep(0.01)
    m.count("field_mults", 100)
    m.count("field_mults", 23)
    m.add_fields(64)      # 1 KB
    m.add_digests(32)     # 1 KB
    rep = m.report()
    assert rep["spans_sec"]["commit"] >= 0.02
    assert rep["counters"]["field_mults"] == 123
    assert abs(rep["proof_kb"] - 2.0) < 1e-9
