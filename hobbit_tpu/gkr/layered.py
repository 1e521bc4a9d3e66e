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
# Reference gate-type parity (inputCircuit.hpp:13-15, circuit.h:50-89):
# every gate is the bilinear form  out = w * (a*uv + b*u + c*v + d)  with
# per-type coefficient patterns (Sub/AntiSub/Naab/AntiNaab/Not/Xor) or
# per-gate constants (Addc/Mulc).  Copy/Relay = (0,1,0,0); the reference's
# AddMul (sum-of-products) is covered by Mul gates + the per-gate weight w
# (custom_linear_comb, Orion_prover.cpp); subset ("dad") wiring is lowered
# to relay chains by the builder (a documented structural deviation).
G_SUB = 2        # u - v
G_ANTISUB = 3    # v - u
G_NAAB = 4       # (1 - u) * v
G_ANTINAAB = 5   # u * (1 - v)
G_ADDC = 6       # u + cst
G_MULC = 7       # cst * u
G_COPY = 8       # u            (Relay)
G_NOT = 9        # 1 - u
G_XOR = 10       # u + v - 2uv


class GkrLayer(NamedTuple):
    types: np.ndarray    # [m] int8 gate types
    u: np.ndarray        # [m] int64 left operand index (in layer below)
    v: np.ndarray        # [m] int64 right operand index
    w: object = None     # optional [m, 2] uint64 per-gate constant weight:
                         # out = w * (bilinear form)  (the reference Orion
                         # custom_linear_comb gates, Orion_prover.cpp)
    cst: object = None   # optional [m, 2] per-gate constant (Addc/Mulc)


_M1 = None  # P - 1 (minus one), filled lazily


def _coeff_patterns():
    """type -> (alpha, beta, gamma, delta) python field pairs."""
    global _M1
    if _M1 is None:
        _M1 = (F.P - 1, 0)
    one, zero, m1 = (1, 0), (0, 0), _M1
    m2 = (F.P - 2, 0)
    return {
        G_ADD: (zero, one, one, zero),
        G_MUL: (one, zero, zero, zero),
        G_SUB: (zero, one, m1, zero),
        G_ANTISUB: (zero, m1, one, zero),
        G_NAAB: (m1, zero, one, zero),
        G_ANTINAAB: (m1, one, zero, zero),
        G_ADDC: (zero, one, zero, None),      # delta = cst
        G_MULC: (zero, None, zero, zero),     # beta = cst
        G_COPY: (zero, one, zero, zero),
        G_NOT: (zero, m1, zero, one),
        G_XOR: (m2, one, one, zero),
    }


def gate_coeffs(lyr: GkrLayer):
    """[m, 2] arrays (alpha, beta, gamma, delta) with w folded in:
    out = alpha*uv + beta*u + gamma*v + delta."""
    m = len(lyr.types)
    pats = _coeff_patterns()
    out = []
    cst = np.asarray(lyr.cst, dtype=np.uint64) if lyr.cst is not None \
        else np.zeros((m, 2), dtype=np.uint64)
    for slot in range(4):
        arr = np.zeros((m, 2), dtype=np.uint64)
        for t, pat in pats.items():
            sel = lyr.types == t
            if not sel.any():
                continue
            p = pat[slot]
            if p is None:
                arr[sel] = cst[sel]
            else:
                arr[sel] = np.asarray(p, dtype=np.uint64)
        out.append(jnp.asarray(arr))
    alpha, beta, gamma, delta = out
    if lyr.w is not None:
        wv = jnp.asarray(lyr.w)
        alpha, beta, gamma, delta = (F.fmul(wv, alpha), F.fmul(wv, beta),
                                     F.fmul(wv, gamma), F.fmul(wv, delta))
    return alpha, beta, gamma, delta


class LayeredCircuit(NamedTuple):
    layers: tuple        # layers[0] acts on the input; last layer = output
    input_size: int

    @property
    def depth(self) -> int:
        return len(self.layers)

    def layer_size(self, i: int) -> int:
        return len(self.layers[i].types) if i >= 0 else self.input_size


def evaluate(circuit: LayeredCircuit, inputs):
    """Evaluate all layers; returns list of value arrays [inputs, l0, ...].

    Gate semantics: out = alpha*uv + beta*u + gamma*v + delta with the
    per-type/per-gate coefficients of ``gate_coeffs`` (w folded in)."""
    vals = [inputs]
    cur = inputs
    for lyr in circuit.layers:
        vu = cur[jnp.asarray(lyr.u)]
        vv = cur[jnp.asarray(lyr.v)]
        alpha, beta, gamma, delta = gate_coeffs(lyr)
        cur = F.fadd(
            F.fadd(F.fmul(alpha, F.fmul(vu, vv)), F.fmul(beta, vu)),
            F.fadd(F.fmul(gamma, vv), delta))
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
        self._csts: dict = {}            # layer -> {gate: Addc/Mulc const}

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

    def gate(self, gtype: int, a, b, w=None, cst=None):
        """a, b: wire handles; returns handle in layer max(la, lb)+1.

        w: optional constant weight (field pair (re, im) or int): the gate
        computes w * (bilinear form); cst: the Addc/Mulc constant."""
        target = max(a[0], b[0])
        ia = self._relay_to(a, target)
        ib = self._relay_to(b, target)
        self._ensure_layer(target + 1)
        t, u, v = self.layers[target]
        t.append(gtype)
        u.append(ia)
        v.append(ib)
        self._weights.setdefault(target, {})[len(t) - 1] = w
        if cst is not None:
            self._csts.setdefault(target, {})[len(t) - 1] = cst
        return (target + 1, len(t) - 1)

    def add(self, a, b):
        return self.gate(G_ADD, a, b)

    def mul(self, a, b):
        return self.gate(G_MUL, a, b)

    def wadd(self, a, w):
        """Weighted relay: w * a (as w * (a + 0))."""
        return self.gate(G_ADD, a, self.zero, w=w)

    def sub(self, a, b):
        """a - b (reference Minus/Sub gate)."""
        return self.gate(G_SUB, a, b)

    def antisub(self, a, b):
        return self.gate(G_ANTISUB, a, b)

    def naab(self, a, b):
        """(1 - a) * b (reference Naab)."""
        return self.gate(G_NAAB, a, b)

    def antinaab(self, a, b):
        return self.gate(G_ANTINAAB, a, b)

    def xor_g(self, a, b):
        """a xor b for boolean wires: a + b - 2ab."""
        return self.gate(G_XOR, a, b)

    def not_g(self, a):
        return self.gate(G_NOT, a, self.zero)

    def addc(self, a, c):
        return self.gate(G_ADDC, a, self.zero, cst=c)

    def mulc(self, a, c):
        return self.gate(G_MULC, a, self.zero, cst=c)

    def copy(self, a):
        return self.gate(G_COPY, a, self.zero)

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
            cd = self._csts.get(li, {})
            cst = None
            if cd:
                cst = np.zeros((len(t), 2), dtype=np.uint64)
                for gi, cv in cd.items():
                    if isinstance(cv, (int, np.integer)):
                        cst[gi] = (int(cv) % F.P, 0)
                    else:
                        cst[gi] = (int(cv[0]), int(cv[1]))
            layers.append(GkrLayer(
                types=np.asarray(t, dtype=np.int8),
                u=np.asarray(u, dtype=np.int64),
                v=np.asarray(v, dtype=np.int64),
                w=w, cst=cst))
        return LayeredCircuit(layers=tuple(layers),
                              input_size=self.input_size)

    def make_inputs(self, values):
        """values [input_size-1, 2] -> padded with the zero wire."""
        z = jnp.zeros((1, 2), dtype=jnp.uint64)
        return jnp.concatenate([values, z], axis=0)


__all__ = ["G_ADD", "G_MUL", "G_SUB", "G_ANTISUB", "G_NAAB", "G_ANTINAAB",
           "G_ADDC", "G_MULC", "G_COPY", "G_NOT", "G_XOR",
           "GkrLayer", "LayeredCircuit", "LayeredBuilder",
           "evaluate", "gate_coeffs"]
