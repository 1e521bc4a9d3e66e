"""Full streaming GKR circuit driver on the compressed-round engine.

The analog of the reference's ``prove_circuit(F)`` (prover.cpp:1674-1808):
chain per-layer phase-1/phase-2 claims across the WHOLE layered circuit
with the sqrt-space compressed-round sumcheck
(``core.compressed_sumcheck``), merging the two next-layer claims as
a0*V(u*) + a1*V(v*) exactly like the in-memory path.

Per layer i (output -> input), with the bilinear gate decomposition of
``layered.gate_coeffs`` (a_g..d_g = W[o] * (alpha..delta)):

  phase 1:  claim = sum_u V(u) G1(u) + G2(u)
            G1 = T_a + T_b, G2 = T_c + T_d  (u-scattered tables)
            -> compressed pairs sumcheck -> generalized point w1
  phase 2:  the four table evaluations at w1 are themselves 2-product
            statements over v (tables a2..d2 built from the w1 weight
            vector) -> compressed pairs sumcheck -> w2
  merge:    claim' = a0 V(w1) + a1 V(w2), W' = a0*w1 + a1*w2.

The verifier replays both compressed sumchecks per layer and recomputes
the four wiring predicates at (w1, w2) transparently (the reference's
inline-verifier model; O(layer) work per layer).  The final claim lands on
the input MLE at the last merged weight vector — checked directly against
the inputs (or bindable via a PC supporting generalized tensor points).

Memory model: per-layer weight vectors/values are O(layer width) resident
(the reference's streaming path likewise keeps per-layer beta tables);
the sumcheck passes themselves are O(B + 2^c) via chunked folding.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

import jax.numpy as jnp

from ..core import compressed_sumcheck as cs
from ..core import sumcheck as sc
from ..ops import expanders
from ..ops import field as F
from ..ops import mimc, poly
from . import layered


class StreamGkrLayerProof(NamedTuple):
    p1: cs.CompressedPairsProof
    a_evals: jnp.ndarray          # [4, 2] T_a..T_d at w1
    p2: cs.CompressedPairsProof


class StreamGkrProof(NamedTuple):
    output: jnp.ndarray
    layer_proofs: tuple
    input_eval: jnp.ndarray


def _pow2(n: int) -> int:
    m = 1
    while m < n:
        m <<= 1
    return m


def _pad(v, n):
    if v.shape[0] == n:
        return v
    return jnp.concatenate(
        [v, jnp.zeros((n - v.shape[0], 2), dtype=jnp.uint64)])


def _chunk(vec, B):
    return lambda k: vec[k * B:(k + 1) * B]


def _layer_cfg(n: int, B: int, c: int):
    """Per-layer chunk size / compression bits (c must divide the group
    bits log2(n/B))."""
    B_l = min(B, n)
    gbits = int(np.log2(n // B_l))
    c_l = max(1, min(c, gbits)) if gbits else 1
    while gbits % c_l:
        c_l -= 1
    return B_l, c_l


def _tables(lyr, Wg, n, weights_u, vals_below):
    """The four v-scattered phase-2 tables from a u-weight vector."""
    alpha, beta_c, gamma, delta = layered.gate_coeffs(lyr)
    a_g = F.fmul(alpha, Wg)
    b_g = F.fmul(beta_c, Wg)
    c_g = F.fmul(gamma, Wg)
    d_g = F.fmul(delta, Wg)
    wu = weights_u[jnp.asarray(lyr.u)]
    ov = np.argsort(lyr.v, kind="stable")
    dv = jnp.asarray(lyr.v[ov])
    a2 = expanders.modular_scatter(dv, F.fmul(a_g, wu)[ov], n)
    b2 = expanders.modular_scatter(dv, F.fmul(b_g, wu)[ov], n)
    c2 = expanders.modular_scatter(dv, F.fmul(c_g, wu)[ov], n)
    d2 = expanders.modular_scatter(dv, F.fmul(d_g, wu)[ov], n)
    return a2, b2, c2, d2


def _phase1_tables(lyr, Wg, n, vals_below):
    alpha, beta_c, gamma, delta = layered.gate_coeffs(lyr)
    a_g = F.fmul(alpha, Wg)
    b_g = F.fmul(beta_c, Wg)
    c_g = F.fmul(gamma, Wg)
    d_g = F.fmul(delta, Wg)
    Vv_gate = vals_below[jnp.asarray(lyr.v)]
    ou = np.argsort(lyr.u, kind="stable")
    du = jnp.asarray(lyr.u[ou])
    T_a = expanders.modular_scatter(du, F.fmul(a_g, Vv_gate)[ou], n)
    T_b = expanders.modular_scatter(du, b_g[ou], n)
    T_c = expanders.modular_scatter(du, F.fmul(c_g, Vv_gate)[ou], n)
    T_d = expanders.modular_scatter(du, d_g[ou], n)
    return F.fadd(T_a, T_b), F.fadd(T_c, T_d)


def prove_circuit(circuit: layered.LayeredCircuit, inputs, state,
                  B: int = 1 << 12, c: int = 2, engine: str = "two_pass"):
    """Prove the whole circuit evaluation; returns (StreamGkrProof, state).

    engine="two_pass" (default) runs each phase with the fold-phase +
    binding engine — TWO passes over the value stream per phase, matching
    the reference's pass complexity (prover.cpp:861-1211 + its
    convolution-consistency chaining, utils.cpp:149-179).
    engine="coset" uses the per-group coset-compressed rounds (one pass
    per c-variable group)."""
    vals = layered.evaluate(circuit, inputs)
    d = circuit.depth

    output = vals[d]
    state = mimc.absorb(state, output)
    m_out = _pow2(len(circuit.layers[d - 1].types))
    state, g = mimc.squeeze(state, int(np.log2(max(2, m_out))))
    W = poly.beta_table(g)[: len(circuit.layers[d - 1].types)]
    claim = F.fdot(W, output)
    state = mimc.absorb(state, claim)

    layer_proofs = []
    for i in range(d - 1, -1, -1):
        lyr = circuit.layers[i]
        n = _pow2(circuit.layer_size(i - 1))
        B_l, c_l = _layer_cfg(n, B, c)
        V = _pad(vals[i], n)
        Wg = W[: len(lyr.types)]

        G1, G2 = _phase1_tables(lyr, Wg, n, vals[i])
        ones = jnp.zeros((n, 2), jnp.uint64).at[:, 0].set(1)
        pairs1 = [(_chunk(V, B_l), _chunk(G1, B_l)),
                  (_chunk(G2, B_l), _chunk(ones, B_l))]
        if engine == "two_pass":
            p1, pt1, state = cs.prove_pairs_two_pass(pairs1, n, B_l, state)
            w1 = poly.beta_table(pt1)[:n]
            V_u = p1.binding.final_evals["pv0"]
        else:
            p1, gr1, tp1, state = cs.prove_pairs(pairs1, n, B_l, c_l, state)
            w1 = cs.weight_vector(gr1, tp1, c_l, n)
            V_u = p1.tail.final_evals["V0"]

        a2, b2, c2, d2 = _tables(lyr, Wg, n, w1, vals[i])
        a_evals = jnp.stack([
            F.fdot(a2, V), F.fsum(b2), F.fdot(c2, V), F.fsum(d2)])
        state = mimc.absorb(state, a_evals)
        state, w4 = mimc.squeeze(state, 4)
        H1 = F.fadd(F.fmul(w4[0][None, :], a2), F.fmul(w4[2][None, :], c2))
        H2 = F.fadd(F.fmul(w4[1][None, :], b2), F.fmul(w4[3][None, :], d2))
        pairs2 = [(_chunk(V, B_l), _chunk(H1, B_l)),
                  (_chunk(H2, B_l), _chunk(ones, B_l))]
        if engine == "two_pass":
            p2, pt2, state = cs.prove_pairs_two_pass(pairs2, n, B_l, state)
            w2 = poly.beta_table(pt2)[:n]
            V_v = p2.binding.final_evals["pv0"]
        else:
            p2, gr2, tp2, state = cs.prove_pairs(pairs2, n, B_l, c_l, state)
            w2 = cs.weight_vector(gr2, tp2, c_l, n)
            V_v = p2.tail.final_evals["V0"]

        layer_proofs.append(StreamGkrLayerProof(p1=p1, a_evals=a_evals,
                                                p2=p2))

        state = mimc.absorb(state, jnp.stack([V_u, V_v]))
        state, a01 = mimc.squeeze(state, 2)
        claim = F.fadd(F.fmul(a01[0], V_u), F.fmul(a01[1], V_v))
        W = F.fadd(F.fmul(a01[0][None, :], w1), F.fmul(a01[1][None, :], w2))
        W = W[: circuit.layer_size(i - 1)]

    return StreamGkrProof(output=output, layer_proofs=tuple(layer_proofs),
                          input_eval=claim), state


def verify_circuit(proof: StreamGkrProof, circuit: layered.LayeredCircuit,
                   state, B: int = 1 << 12, c: int = 2):
    # engine dispatch is per-layer on the proof objects themselves
    """Replays the transcript.  Returns (ok, W, claim, state): the caller
    checks claim == <W, inputs> (direct, or via a PC opening)."""
    d = circuit.depth
    ok = jnp.array(True)

    state = mimc.absorb(state, proof.output)
    m_out = _pow2(len(circuit.layers[d - 1].types))
    state, g = mimc.squeeze(state, int(np.log2(max(2, m_out))))
    W = poly.beta_table(g)[: len(circuit.layers[d - 1].types)]
    claim = F.fdot(W, proof.output)
    state = mimc.absorb(state, claim)

    one = F.scalar(1)
    for idx, i in enumerate(range(d - 1, -1, -1)):
        lyr = circuit.layers[i]
        n = _pow2(circuit.layer_size(i - 1))
        B_l, c_l = _layer_cfg(n, B, c)
        lp = proof.layer_proofs[idx]
        Wg = W[: len(lyr.types)]

        if isinstance(lp.p1, cs.TwoPassPairsProof):
            okp, pt1, fe1, state = cs.verify_pairs_two_pass(lp.p1, claim,
                                                            state)
            w1 = poly.beta_table(pt1)[:n]
        else:
            okp, gr1, tp1, fe1, state = cs.verify_pairs(lp.p1, claim, state)
            w1 = cs.weight_vector(gr1, tp1, c_l, n)
        ok = jnp.logical_and(ok, okp)
        V_u = fe1["V0"]
        # ones pair must evaluate to 1; G1/G2 evals match the a_evals
        ok = jnp.logical_and(ok, F.feq(fe1["H1"], one))
        state = mimc.absorb(state, lp.a_evals)
        ok = jnp.logical_and(ok, F.feq(
            fe1["H0"], F.fadd(lp.a_evals[0], lp.a_evals[1])))
        ok = jnp.logical_and(ok, F.feq(
            fe1["V1"], F.fadd(lp.a_evals[2], lp.a_evals[3])))

        state, w4 = mimc.squeeze(state, 4)
        combined = None
        for j in range(4):
            t = F.fmul(w4[j], lp.a_evals[j])
            combined = t if combined is None else F.fadd(combined, t)
        if isinstance(lp.p2, cs.TwoPassPairsProof):
            okp2, pt2, fe2, state = cs.verify_pairs_two_pass(lp.p2,
                                                             combined, state)
            w2 = poly.beta_table(pt2)[:n]
        else:
            okp2, gr2, tp2, fe2, state = cs.verify_pairs(lp.p2, combined,
                                                         state)
            w2 = cs.weight_vector(gr2, tp2, c_l, n)
        ok = jnp.logical_and(ok, okp2)
        V_v = fe2["V0"]
        ok = jnp.logical_and(ok, F.feq(fe2["H1"], one))

        # transparent wiring predicates at (w1, w2)
        alpha, beta_c, gamma, delta = layered.gate_coeffs(lyr)
        wu = w1[jnp.asarray(lyr.u)]
        wv = w2[jnp.asarray(lyr.v)]
        wuv = F.fmul(wu, wv)
        preds = [F.fsum(F.fmul(F.fmul(coeff, Wg), wuv))
                 for coeff in (alpha, beta_c, gamma, delta)]
        # H1(w2) = w4_0 a2(w2) + w4_2 c2(w2); H2(w2) = w4_1 b2 + w4_3 d2
        h1 = F.fadd(F.fmul(w4[0], preds[0]), F.fmul(w4[2], preds[2]))
        h2 = F.fadd(F.fmul(w4[1], preds[1]), F.fmul(w4[3], preds[3]))
        ok = jnp.logical_and(ok, F.feq(fe2["H0"], h1))
        ok = jnp.logical_and(ok, F.feq(fe2["V1"], h2))

        state = mimc.absorb(state, jnp.stack([V_u, V_v]))
        state, a01 = mimc.squeeze(state, 2)
        claim = F.fadd(F.fmul(a01[0], V_u), F.fmul(a01[1], V_v))
        W = F.fadd(F.fmul(a01[0][None, :], w1), F.fmul(a01[1][None, :], w2))
        W = W[: circuit.layer_size(i - 1)]

    ok = jnp.logical_and(ok, F.feq(claim, proof.input_eval))
    return ok, W, claim, state


__all__ = ["StreamGkrProof", "StreamGkrLayerProof", "prove_circuit",
           "verify_circuit"]
