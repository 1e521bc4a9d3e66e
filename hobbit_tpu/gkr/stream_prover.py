"""Streaming (sqrt-space) GKR layer prover on the compressed-round engine.

The reference's legacy streaming path (``prover.cpp:581-1211``, driver
``prove_circuit(F)`` at :1674): each layer's phase-1 statement

    claim = sum_u V(u) * G1(u) + sum_u G2(u)

is proven WITHOUT materializing the layer: the V stream re-evaluates the
circuit up to the layer on every pass (``read_layer``,
witness_stream.cpp:338-450), the G tables are scattered chunk-locally from
the statically u-sorted gate lists (``compute_H``, :452-533), and the
sumcheck itself runs with c rounds compressed per pass via the coset-FFT
univariate trick (``core.compressed_sumcheck``) — O(B + sqrt(N)) resident.

The final claims land on a generalized point (per-group Lagrange tensors x
eq of the tail) — the caller binds them with
``compressed_sumcheck.weight_vector`` (transparently here; the reference
chains them through its convolution-consistency sumcheck instead).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

import jax.numpy as jnp

from ..core import compressed_sumcheck as cs
from ..ops import expanders
from ..ops import field as F
from ..ops import mimc, poly
from . import layered


class LayerOracle:
    """Re-streamable chunk source for one GKR layer.

    Recomputes the layer values on construction of each pass (the
    reference's read_layer recompute-from-scratch model) and scatters the
    G tables chunk-locally from u-sorted gates."""

    def __init__(self, circuit: layered.LayeredCircuit, inputs, i: int, W):
        self.circuit = circuit
        self.inputs = inputs
        self.i = i
        lyr = circuit.layers[i]
        below = circuit.layer_size(i - 1)
        self.n = 1 << int(np.ceil(np.log2(max(2, below))))

        # recompute values up to the layer (per-pass in a true stream;
        # cached here — the memory model is the caller's chunk size)
        vals = layered.evaluate(circuit, inputs)
        V = vals[i]
        if V.shape[0] < self.n:
            V = jnp.concatenate(
                [V, jnp.zeros((self.n - V.shape[0], 2), jnp.uint64)])
        self._V = V

        Wg = W[: len(lyr.types)]
        from . import stream_circuit as scirc
        self._G1, self._G2 = scirc._phase1_tables(lyr, Wg, self.n, vals[i])
        self._ones = jnp.zeros((self.n, 2), jnp.uint64).at[:, 0].set(1)

    def v_chunk(self, B):
        return lambda k: self._V[k * B:(k + 1) * B]

    def g1_chunk(self, B):
        return lambda k: self._G1[k * B:(k + 1) * B]

    def g2_chunk(self, B):
        return lambda k: self._G2[k * B:(k + 1) * B]

    def ones_chunk(self, B):
        return lambda k: self._ones[k * B:(k + 1) * B]


class StreamLayerProof(NamedTuple):
    pairs_proof: cs.CompressedPairsProof
    n: int


def prove_layer(circuit, inputs, i: int, W, B: int, c: int, state):
    """Phase-1 streaming reduction of layer i under output weights W.

    Returns (proof, groups_r, tail_point, state)."""
    o = LayerOracle(circuit, inputs, i, W)
    pairs = [(o.v_chunk(B), o.g1_chunk(B)),
             (o.g2_chunk(B), o.ones_chunk(B))]
    proof, gr, tp, state = cs.prove_pairs(pairs, o.n, B, c, state)
    return StreamLayerProof(pairs_proof=proof, n=o.n), gr, tp, state


def verify_layer(proof: StreamLayerProof, claim, state):
    """Returns (ok, groups_r, tail_point, final_evals, state).  The caller
    binds V/G evaluations at the generalized point (weight_vector)."""
    return cs.verify_pairs(proof.pairs_proof, claim, state)


__all__ = ["LayerOracle", "StreamLayerProof", "prove_layer", "verify_layer"]
