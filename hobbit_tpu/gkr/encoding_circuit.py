"""GKR circuit that IS the Spielman expander encoding.

TPU-native analog of the reference's ``prove_encodings.cpp:50-122``: the
gates mirror the expander adjacency (there via ``_C/D[dep].r_neighbor``
reverse-neighbor lists; here via the stored edge lists of
``ops.expanders.SpielmanCode``), so proving the circuit with GKR proves
that a codeword was encoded correctly — the heart of the Orion opening.

Every expander output node t becomes a weighted sum
``sum_{(s,t,w)} w * x[s]``, built as one layer of weighted relays
(w * (x_s + 0)) followed by a binary sum tree; the recursive code structure
[x ‖ z ‖ w] is laid out by relaying all segments to a common final layer.
Relay chains stand in for the reference's subset ("dad") wiring — fine for
the bench-scale encodings the recursion uses (the aggregate row, length
~sqrt(N)).
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from ..ops import expanders
from . import layered


def _weighted_sum(b: layered.LayeredBuilder, terms):
    """terms: [(wire, weight)] -> wire of sum_i w_i * x_i.

    Weighted relays pair each operand with the cached zero wire of its own
    layer (avoids re-relaying the input zero through every layer)."""
    wires = []
    for wire, w in terms:
        zt = (wire[0], b._zero_index(wire[0]))
        wires.append(b.gate(layered.G_ADD, wire, zt,
                            w=(int(w[0]), int(w[1]))))
    return b.sum_tree(wires)


def _spmv_gates(b: layered.LayeredBuilder, edges: expanders.ExpanderEdges,
                in_wires: List) -> List:
    """Emit gates computing y = edges * x for wire list x."""
    src = np.asarray(edges.src)
    dst = np.asarray(edges.dst)
    w = np.asarray(edges.weight)
    out = []
    for t in range(edges.n_out):
        mask = dst == t
        terms = [(in_wires[int(s)], w[e])
                 for e, s in zip(np.nonzero(mask)[0], src[mask])]
        if not terms:
            out.append(b.zero)
        else:
            out.append(_weighted_sum(b, terms))
    return out


def build_encoding_circuit(code: expanders.SpielmanCode
                           ) -> Tuple[layered.LayeredCircuit,
                                      layered.LayeredBuilder]:
    """Circuit: input = message [n] (+ zero wire), output layer = the
    codeword [codeword_len] in stream order [x ‖ z ‖ w] per level."""
    b = layered.LayeredBuilder(code.n)
    x_wires = [b.input_wire(i) for i in range(code.n)]

    def rec(v_wires: List, li: int) -> List:
        lvl = code.levels[li]
        mid = _spmv_gates(b, lvl.C, v_wires)
        if li + 1 < len(code.levels):
            z = rec(mid, li + 1)
        else:
            z = mid
        w = _spmv_gates(b, lvl.D, z)
        return v_wires + z + w

    cw_wires = rec(x_wires, 0) if code.levels else x_wires

    # relay every codeword wire to a common layer, then emit the output
    # layer in codeword order (consecutive gates of the final layer)
    top = max(w[0] for w in cw_wires)
    zt = (top, b._zero_index(top))
    relayed = [(top, b._relay_to(w, top)) for w in cw_wires]
    for w in relayed:
        b.gate(layered.G_ADD, w, zt)
    return b.build(), b


__all__ = ["build_encoding_circuit"]
