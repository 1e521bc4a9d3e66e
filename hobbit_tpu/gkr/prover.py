"""GKR prover/verifier over layered circuits (Libra-style two-phase).

Per layer (output -> input), the claim W-weighted-sum of layer values is
reduced through two mixed sumchecks (reference in-memory GKR,
``prover_standard.cpp`` / the streaming per-layer ``prove_circuit(F)`` of
``prover.cpp:1674-1808``):

Every gate is the bilinear form out = a*uv + b*u + c*v + d (all 14
reference gate families, see ``layered.gate_coeffs``); per layer with
per-gate coefficients a_g..d_g = W[o] * (alpha..delta):

phase 1 (over u):  claim = sum_u [ V(u) * G1(u) + G2(u) ]
    G1[u] = sum_{gates with left u} (a_g * V[v] + b_g)   (= T_a + T_b)
    G2[u] = sum_{gates with left u} (c_g * V[v] + d_g)   (= T_c + T_d)
phase 2 (over v):  proves the four table evaluations at u*:
    T_a(u*) = sum_v a2(v) V(v),   a2[v] = sum_g a_g bu*[u_g]
    T_b(u*) = sum_v b2(v)         (and c2/d2 likewise)

a2~(v*)..d2~(v*) are evaluations of static wiring predicates that the
verifier recomputes directly (O(layer) transparent work — the reference's
inline-verifier model).  The two next-layer claims V(u*), V(v*)
merge via random (a0, a1) into the next weight vector
W' = a0*eq(u*) + a1*eq(v*).

All tables are built with sorted modular scatters (static gate orderings
precomputed per layer); every sumcheck is the vectorized mixed engine.
"""

from __future__ import annotations

from typing import List, NamedTuple

import numpy as np

import jax.numpy as jnp

from ..core import sumcheck as sc
from ..ops import expanders
from ..ops import field as F
from ..ops import mimc, poly
from . import layered

P1_GROUPS = (("V", "G1"), ("G2",))
P2_GROUPS = (("V", "a2"), ("b2",), ("V", "c2"), ("d2",))


class LayerMeta(NamedTuple):
    order_u: np.ndarray     # gate order sorted by u
    order_v: np.ndarray     # gate order sorted by v
    n_below: int            # padded (pow2) size of the layer below
    n_here: int             # padded size of this layer


class GkrLayerProof(NamedTuple):
    p1: sc.MixedSumcheckProof
    p2: sc.MixedSumcheckProof
    a_evals: jnp.ndarray    # [4, 2] (T_a, T_b, T_c, T_d) at u*


class GkrProof(NamedTuple):
    output: jnp.ndarray           # [m_out, 2] claimed outputs
    layer_proofs: tuple
    input_eval: jnp.ndarray       # [2] input MLE eval at final point
    final_point: jnp.ndarray      # [log n_in, 2]
    # Virgo-VPD input binding (reference prover_standard.cpp:661-775:
    # the standard GKR commits the input with a VPD commitment instead of
    # transmitting the final claim openly): root + openings at the last
    # layer's (u*, v*)
    input_root: object = None
    input_opens: tuple = ()


def _pow2(n: int) -> int:
    m = 1
    while m < n:
        m <<= 1
    return m


def _metas(circuit: layered.LayeredCircuit) -> List[LayerMeta]:
    metas = []
    for i, lyr in enumerate(circuit.layers):
        below = circuit.layer_size(i - 1)
        metas.append(LayerMeta(
            order_u=np.argsort(lyr.u, kind="stable"),
            order_v=np.argsort(lyr.v, kind="stable"),
            n_below=_pow2(below),
            n_here=_pow2(len(lyr.types)),
        ))
    return metas


def _pad(v, n):
    if v.shape[0] == n:
        return v
    return jnp.concatenate(
        [v, jnp.zeros((n - v.shape[0], 2), dtype=jnp.uint64)])


def prove(circuit: layered.LayeredCircuit, inputs, state,
          point=None, claim=None, bind_input: bool = False,
          vpd_queries: int = 33):
    """Prove the evaluation; returns (GkrProof, state).

    With ``point`` given, the proof starts from an external claim about the
    output MLE at that point (claim = output~(point), zero-padded domain)
    instead of transmitting the output layer — the entry used by the Orion
    encoding proof, where the claim comes from the column-indicator
    sumcheck (reference prove_encodings_orion, prove_encodings.cpp:227).

    bind_input=True commits the (padded) input vector with a Virgo VPD
    before the layer walk and opens it at the last layer's (u*, v*) — the
    reference's standard-GKR input binding (prover_standard.cpp:661-775);
    the verifier then checks the chained claim against the two bound
    openings instead of trusting ``input_eval``."""
    from ..pc import virgo

    vals = layered.evaluate(circuit, inputs)
    metas = _metas(circuit)
    d = circuit.depth

    icom = None
    icoeffs = None
    if bind_input:
        # VPD is monomial-basis (chi table); the GKR claim is an
        # evaluation-basis MLE value — Moebius-convert once
        icoeffs = poly.to_coefficient_form(_pad(vals[0], metas[0].n_below))
        icom = virgo.vpd_commit(icoeffs)
        state = mimc.absorb(state,
                            icom.root.astype(jnp.uint64).reshape(4, 2))

    output = vals[d]
    if point is None:
        state = mimc.absorb(state, output)
        m_out = metas[d - 1].n_here
        state, g = mimc.squeeze(state, int(np.log2(m_out)))
        W = poly.beta_table(g)[: len(circuit.layers[d - 1].types)]
        claim = F.fdot(W, output)
        state = mimc.absorb(state, claim)
    else:
        W = poly.beta_table(point)[: len(circuit.layers[d - 1].types)]
        output = jnp.zeros((0, 2), dtype=jnp.uint64)

    layer_proofs = []
    for i in range(d - 1, -1, -1):
        lyr = circuit.layers[i]
        meta = metas[i]
        V = _pad(vals[i], meta.n_below)
        Wg = _pad(W, len(lyr.types))[: len(lyr.types)]
        alpha, beta_c, gamma, delta = layered.gate_coeffs(lyr)
        a_g = F.fmul(alpha, Wg)
        b_g = F.fmul(beta_c, Wg)
        c_g = F.fmul(gamma, Wg)
        d_g = F.fmul(delta, Wg)
        Vv_gate = vals[i][jnp.asarray(lyr.v)]

        ou = meta.order_u
        du = jnp.asarray(lyr.u[ou])
        T_a = expanders.modular_scatter(
            du, F.fmul(a_g, Vv_gate)[ou], meta.n_below)
        T_b = expanders.modular_scatter(du, b_g[ou], meta.n_below)
        T_c = expanders.modular_scatter(
            du, F.fmul(c_g, Vv_gate)[ou], meta.n_below)
        T_d = expanders.modular_scatter(du, d_g[ou], meta.n_below)

        ones2 = jnp.stack([F.scalar(1), F.scalar(1)])
        p1, state = sc.prove_mixed(
            {"V": V, "G1": F.fadd(T_a, T_b), "G2": F.fadd(T_c, T_d)},
            P1_GROUPS, ones2, state)
        u_star = p1.challenges
        V_u = p1.final_evals["V"]

        # phase 2 tables at u*
        beta_u = poly.beta_table(u_star)
        bu_gate = beta_u[jnp.asarray(lyr.u)]
        ov = meta.order_v
        dv = jnp.asarray(lyr.v[ov])
        a2 = expanders.modular_scatter(
            dv, F.fmul(a_g, bu_gate)[ov], meta.n_below)
        b2 = expanders.modular_scatter(
            dv, F.fmul(b_g, bu_gate)[ov], meta.n_below)
        c2 = expanders.modular_scatter(
            dv, F.fmul(c_g, bu_gate)[ov], meta.n_below)
        d2 = expanders.modular_scatter(
            dv, F.fmul(d_g, bu_gate)[ov], meta.n_below)

        a_evals = jnp.stack([
            F.fdot(a2, V), F.fsum(b2), F.fdot(c2, V), F.fsum(d2)])
        state = mimc.absorb(state, a_evals)
        state, w4 = mimc.squeeze(state, 4)
        p2, state = sc.prove_mixed(
            {"V": V, "a2": a2, "b2": b2, "c2": c2, "d2": d2},
            P2_GROUPS, w4, state)
        v_star = p2.challenges
        V_v = p2.final_evals["V"]

        layer_proofs.append(GkrLayerProof(p1=p1, p2=p2, a_evals=a_evals))

        # chain: W' = a0 eq(u*) + a1 eq(v*), claim' = a0 V(u*) + a1 V(v*)
        state = mimc.absorb(state, jnp.stack([V_u, V_v]))
        state, a01 = mimc.squeeze(state, 2)
        claim = F.fadd(F.fmul(a01[0], V_u), F.fmul(a01[1], V_v))
        W = F.fadd(F.fmul(a01[0][None, :], beta_u),
                   F.fmul(a01[1][None, :], poly.beta_table(v_star)))
        W = W[: circuit.layer_size(i - 1)]
        final_point = None

    # input layer: claim = a0 V~(u*) + a1 V~(v*) over the padded inputs;
    # either supplied openly (caller must bind it) or bound via VPD opens
    input_root = None
    input_opens = ()
    if bind_input:
        op_u, state = virgo.vpd_open(icoeffs, icom, u_star, state,
                                     queries=vpd_queries)
        op_v, state = virgo.vpd_open(icoeffs, icom, v_star, state,
                                     queries=vpd_queries)
        input_root = icom.root
        input_opens = (op_u, op_v)
    input_eval = claim
    return GkrProof(output=output, layer_proofs=tuple(layer_proofs),
                    input_eval=input_eval,
                    final_point=jnp.zeros((0, 2), jnp.uint64),
                    input_root=input_root, input_opens=input_opens), state


def verify(proof: GkrProof, circuit: layered.LayeredCircuit, state,
           point=None, claim=None, vpd_queries: int = 33):
    """Replays the transcript.  Returns (ok, weight_vector, claim, state):
    the caller must check claim == <weight_vector, inputs~> (direct input
    check or via a PC opening of the input polynomial).

    With ``point``/``claim`` given, starts from the external output-MLE
    claim (matching prove(point=...)).

    If the proof carries a VPD input binding (prove(bind_input=True)),
    the final claim is checked HERE against the two bound openings — the
    returned claim is then already verified and the caller needs no
    further input check."""
    from ..pc import virgo

    metas = _metas(circuit)
    d = circuit.depth
    ok = jnp.array(True)

    if proof.input_root is not None:
        state = mimc.absorb(
            state, proof.input_root.astype(jnp.uint64).reshape(4, 2))

    if point is None:
        state = mimc.absorb(state, proof.output)
        m_out = metas[d - 1].n_here
        state, g = mimc.squeeze(state, int(np.log2(m_out)))
        W = poly.beta_table(g)[: len(circuit.layers[d - 1].types)]
        claim = F.fdot(W, proof.output)
        state = mimc.absorb(state, claim)
    else:
        W = poly.beta_table(point)[: len(circuit.layers[d - 1].types)]

    ones2 = jnp.stack([F.scalar(1), F.scalar(1)])
    for idx, i in enumerate(range(d - 1, -1, -1)):
        lyr = circuit.layers[i]
        meta = metas[i]
        lp = proof.layer_proofs[idx]

        okp, u_star, state = sc.verify_mixed(lp.p1, claim, P1_GROUPS,
                                             ones2, state)
        ok = jnp.logical_and(ok, okp)
        V_u = lp.p1.final_evals["V"]

        state = mimc.absorb(state, lp.a_evals)
        # G1(u*) and G2(u*) must match the phase-2-proven table evals
        ok = jnp.logical_and(ok, F.feq(
            lp.p1.final_evals["G1"], F.fadd(lp.a_evals[0], lp.a_evals[1])))
        ok = jnp.logical_and(ok, F.feq(
            lp.p1.final_evals["G2"], F.fadd(lp.a_evals[2], lp.a_evals[3])))
        state, w4 = mimc.squeeze(state, 4)
        combined = None
        for j in range(4):
            t = F.fmul(w4[j], lp.a_evals[j])
            combined = t if combined is None else F.fadd(combined, t)
        okp2, v_star, state = sc.verify_mixed(lp.p2, combined, P2_GROUPS,
                                              w4, state)
        ok = jnp.logical_and(ok, okp2)
        V_v = lp.p2.final_evals["V"]

        # wiring predicates at (u*, v*): transparent recomputation
        beta_u = poly.beta_table(u_star)
        beta_v = poly.beta_table(v_star)
        Wg = W[: len(lyr.types)]
        alpha, beta_c, gamma, delta = layered.gate_coeffs(lyr)
        bu = beta_u[jnp.asarray(lyr.u)]
        bv = beta_v[jnp.asarray(lyr.v)]
        bub = F.fmul(bu, bv)
        for name, coeff in (("a2", alpha), ("b2", beta_c),
                            ("c2", gamma), ("d2", delta)):
            pred = F.fsum(F.fmul(F.fmul(coeff, Wg), bub))
            ok = jnp.logical_and(ok, F.feq(lp.p2.final_evals[name], pred))

        state = mimc.absorb(state, jnp.stack([V_u, V_v]))
        state, a01 = mimc.squeeze(state, 2)
        claim = F.fadd(F.fmul(a01[0], V_u), F.fmul(a01[1], V_v))
        W = F.fadd(F.fmul(a01[0][None, :], beta_u),
                   F.fmul(a01[1][None, :], beta_v))
        W = W[: circuit.layer_size(i - 1)]

    if proof.input_root is not None:
        if len(proof.input_opens) != 2:
            return jnp.array(False), W, claim, state
        op_u, op_v = proof.input_opens
        n_in = metas[0].n_below
        oku, state = virgo.vpd_verify(proof.input_root, u_star, op_u,
                                      n_in, state, queries=vpd_queries)
        okv, state = virgo.vpd_verify(proof.input_root, v_star, op_v,
                                      n_in, state, queries=vpd_queries)
        ok = jnp.logical_and(ok, jnp.logical_and(jnp.asarray(oku),
                                                 jnp.asarray(okv)))
        bound = F.fadd(F.fmul(a01[0], op_u.eval_claim),
                       F.fmul(a01[1], op_v.eval_claim))
        ok = jnp.logical_and(ok, F.feq(claim, bound))
    ok = jnp.logical_and(ok, F.feq(claim, proof.input_eval))
    return ok, W, claim, state


__all__ = ["GkrProof", "GkrLayerProof", "prove", "verify"]
