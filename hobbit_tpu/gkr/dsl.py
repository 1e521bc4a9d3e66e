"""Circuit DSL -> layered circuit.

Mirrors the reference's text format and programmatic generators
(``GKR.cpp:378-435``): statements like ``P V3 = V1 + V2 E`` (add) /
``P V3 = V1 * V2 E`` (mul) over single-assignment variables, layered
automatically with relay insertion by ``LayeredBuilder``; plus the
matrix-to-matrix and test-circuit generators (``parse_m2m`` /
``parse_test_circuit``).
"""

from __future__ import annotations

import re
from typing import Dict, List, Tuple

import numpy as np

from . import layered

_STMT = re.compile(
    r"P\s+V(\d+)\s*=\s*V(\d+)\s*([+*])\s*V(\d+)\s+E")


def parse(text: str, num_inputs: int) -> Tuple[layered.LayeredCircuit, Dict]:
    """Parse DSL text.  Variables V0..V{num_inputs-1} are inputs; each
    statement defines a new variable.  Returns (circuit, var->wire map)."""
    b = layered.LayeredBuilder(num_inputs)
    wires: Dict[int, tuple] = {i: b.input_wire(i) for i in range(num_inputs)}
    for m in _STMT.finditer(text):
        out, a, op, c = int(m.group(1)), int(m.group(2)), m.group(3), \
            int(m.group(4))
        if a not in wires or c not in wires:
            raise ValueError(f"undefined variable in: {m.group(0)}")
        if out in wires:
            raise ValueError(f"reassignment of V{out}")
        wa, wc = wires[a], wires[c]
        wires[out] = b.add(wa, wc) if op == "+" else b.mul(wa, wc)
    return b.build(), {"builder": b, "wires": wires}


def matmul_circuit(n: int) -> Tuple[layered.LayeredCircuit, "layered.LayeredBuilder"]:
    """n x n matrix product circuit: inputs = A (row-major) then B
    (reference parse_m2m)."""
    b = layered.LayeredBuilder(2 * n * n)
    A = [[b.input_wire(i * n + j) for j in range(n)] for i in range(n)]
    B = [[b.input_wire(n * n + i * n + j) for j in range(n)] for i in range(n)]
    for i in range(n):
        for j in range(n):
            b.inner_product(A[i], [B[k][j] for k in range(n)])
    return b.build(), b


def test_circuit(log_n: int, depth: int) -> Tuple[layered.LayeredCircuit, "layered.LayeredBuilder"]:
    """Alternating add/mul mesh (reference parse_test_circuit)."""
    n = 1 << log_n
    b = layered.LayeredBuilder(n)
    cur = [b.input_wire(i) for i in range(n)]
    for d in range(depth):
        op = b.add if d % 2 == 0 else b.mul
        cur = [op(cur[i], cur[(i + 1) % n]) for i in range(n)]
    b.sum_tree(cur)
    return b.build(), b


__all__ = ["parse", "matmul_circuit", "test_circuit"]
