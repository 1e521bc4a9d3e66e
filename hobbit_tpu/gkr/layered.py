"""Layered circuits for the GKR protocol.

Unlike the trace substrate (arbitrary DAG with memory checking), GKR wants
strictly layered wiring: every gate of layer i reads two wires of layer
i+1 (the reference's ``layeredCircuit`` with Add/Mul gates + Copy relays,
``src/circuit.h`` / ``GKR.cpp:21-170``).  This module provides the
structure, a vectorized evaluator, and a DAG->layered conversion that
inserts relay gates (Copy modeled as x + zero).
"""

from __future__ import annotations

from typing import List, NamedTuple, Sequence

import numpy as np

import jax.numpy as jnp

from ..ops import field as F

G_ADD = 0
G_MUL = 1


class GkrLayer(NamedTuple):
    types: np.ndarray    # [m] int8 (G_ADD | G_MUL)
    u: np.ndarray        # [m] int64 left operand index (in layer below)
    v: np.ndarray        # [m] int64 right operand index
    w: object = None     # optional [m, 2] uint64 per-gate constant weight:
                         # out = w * (V[u] op V[v])  (the reference Orion
                         # custom_linear_comb gates, Orion_prover.cpp)


class LayeredCircuit(NamedTuple):
    layers: tuple        # layers[0] acts on the input; last layer = output
    input_size: int

    @property
    def depth(self) -> int:
        return len(self.layers)

    def layer_size(self, i: int) -> int:
        return len(self.layers[i].types) if i >= 0 else self.input_size


def evaluate(circuit: LayeredCircuit, inputs):
    """Evaluate all layers; returns list of value arrays [inputs, l0, ...]."""
    vals = [inputs]
    cur = inputs
    for lyr in circuit.layers:
        vu = cur[jnp.asarray(lyr.u)]
        vv = cur[jnp.asarray(lyr.v)]
        add_v = F.fadd(vu, vv)
        mul_v = F.fmul(vu, vv)
        cur = jnp.where((jnp.asarray(lyr.types) == G_ADD)[:, None],
                        add_v, mul_v)
        if lyr.w is not None:
            cur = F.fmul(cur, jnp.asarray(lyr.w))
        vals.append(cur)
    return vals


class LayeredBuilder:
    """Programmatic layered-circuit builder (reference GKR.cpp:399-435).

    Wire handles are (layer, index) pairs; reading a wire from an older
    layer auto-inserts relay (x+0) chains.  Slot 0 of the input and every
    layer is reserved as a constant-zero relay."""

    def __init__(self, input_size: int):
        # input slot `input_size` is the zero wire
        self.input_size = input_size + 1
        self.zero = (0, input_size)
        self.layers: List[List] = []     # per layer: [types, u, v] lists
        self._weights: dict = {}         # layer -> {gate: weight}

    def _ensure_layer(self, li: int):
        while len(self.layers) < li:
            self.layers.append([[], [], []])

    def _relay_to(self, wire, target_layer: int):
        layer, idx = wire
        while layer < target_layer:
            self._ensure_layer(layer + 1)
            t, u, v = self.layers[layer]
            zero_idx = self._zero_index(layer)
            t.append(G_ADD)
            u.append(idx)
            v.append(zero_idx)
            idx = len(t) - 1
            layer += 1
        return idx

    def _zero_index(self, layer: int) -> int:
        """Index of the zero wire at `layer` (relayed zero chain, slot 0 of
        each built layer by convention: we lazily create it)."""
        if layer == 0:
            return self.input_size - 1
        t, u, v = self.layers[layer - 1]
        if not getattr(self, "_zero_at", None):
            self._zero_at = {}
        if layer not in self._zero_at:
            zi_below = self._zero_index(layer - 1)
            t.append(G_ADD)
            u.append(zi_below)
            v.append(zi_below)
            self._zero_at[layer] = len(t) - 1
        return self._zero_at[layer]

    def gate(self, gtype: int, a, b, w=None):
        """a, b: wire handles; returns handle in layer max(la, lb)+1.

        w: optional constant weight (field pair (re, im) or int): the gate
        computes w * (a op b)."""
        target = max(a[0], b[0])
        ia = self._relay_to(a, target)
        ib = self._relay_to(b, target)
        self._ensure_layer(target + 1)
        t, u, v = self.layers[target]
        t.append(gtype)
        u.append(ia)
        v.append(ib)
        self._weights.setdefault(target, {})[len(t) - 1] = w
        return (target + 1, len(t) - 1)

    def add(self, a, b):
        return self.gate(G_ADD, a, b)

    def mul(self, a, b):
        return self.gate(G_MUL, a, b)

    def wadd(self, a, w):
        """Weighted relay: w * a (as w * (a + 0))."""
        return self.gate(G_ADD, a, self.zero, w=w)

    def sub(self, a, b):
        """a - b == a + (p-1)*b needs a constant; model as a + neg(b) where
        neg(b) = b * minus-one wire — requires a (-1) input; for the DSL we
        lower sub to add(a, mul(b, minus_one_input))."""
        raise NotImplementedError("lower sub at the DSL level")

    def input_wire(self, i: int):
        return (0, i)

    def sum_tree(self, wires: Sequence):
        wires = list(wires)
        while len(wires) > 1:
            nxt = [self.add(wires[2 * i], wires[2 * i + 1])
                   for i in range(len(wires) // 2)]
            if len(wires) % 2:
                nxt.append(wires[-1])
            wires = nxt
        return wires[0]

    def mul_tree(self, wires: Sequence):
        wires = list(wires)
        while len(wires) > 1:
            nxt = [self.mul(wires[2 * i], wires[2 * i + 1])
                   for i in range(len(wires) // 2)]
            if len(wires) % 2:
                nxt.append(wires[-1])
            wires = nxt
        return wires[0]

    def inner_product(self, xs: Sequence, ys: Sequence):
        prods = [self.mul(x, y) for x, y in zip(xs, ys)]
        return self.sum_tree(prods)

    def build(self) -> LayeredCircuit:
        # drop trailing empty layers; relay all dangling outputs? GKR needs
        # the final layer only; keep as-is.
        layers = []
        for li, (t, u, v) in enumerate(self.layers):
            if not t:
                break
            wd = self._weights.get(li, {})
            w = None
            if any(x is not None for x in wd.values()):
                w = np.zeros((len(t), 2), dtype=np.uint64)
                w[:, 0] = 1
                for gi, wv in wd.items():
                    if wv is None:
                        continue
                    if isinstance(wv, (int, np.integer)):
                        w[gi] = (int(wv) % F.P, 0)
                    else:
                        w[gi] = (int(wv[0]), int(wv[1]))
            layers.append(GkrLayer(
                types=np.asarray(t, dtype=np.int8),
                u=np.asarray(u, dtype=np.int64),
                v=np.asarray(v, dtype=np.int64),
                w=w))
        return LayeredCircuit(layers=tuple(layers),
                              input_size=self.input_size)

    def make_inputs(self, values):
        """values [input_size-1, 2] -> padded with the zero wire."""
        z = jnp.zeros((1, 2), dtype=jnp.uint64)
        return jnp.concatenate([values, z], axis=0)


__all__ = ["G_ADD", "G_MUL", "GkrLayer", "LayeredCircuit", "LayeredBuilder",
           "evaluate"]
