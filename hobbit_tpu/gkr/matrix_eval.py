"""Sparse-matrix evaluation argument (memory-checking GKR).

TPU-native analog of the reference's ``prove_matrix_evaluations``
(``GKR_standard.cpp:179-487``): for a sparse matrix given as entries
(row_i, col_i, val_i), prove

    M~(r1, r2) = sum_i val_i * beta1(row_i) * beta2(col_i)

where beta1/beta2 are the eq tables at r1/r2.  The per-entry beta values
are fetched through an offline-memory-checking argument: every entry
reads beta1[row_i] / beta2[col_i] with an access counter, and the
read/write/init/final multiset products are proven inside one layered
GKR circuit (the reference's ``parse_matrix_evaluations`` structure:
RLC tuple h = idx + a*access + b*value via ip gates, mul-trees over the
four sets per axis, and the final ip of rw-products with the values).

The circuit's output layer carries [Rr, Wr, Ir, Fr, Rc, Wc, Ic, Fc, EV];
the verifier checks the two permutation identities
Rr*Fr == Wr*Ir (rows) and Rc*Fc == Wc*Ic (cols) and returns EV bound to
the GKR input claim (which the caller checks against the input MLE —
beta tables are publicly recomputable from r1/r2).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import numpy as np

import jax.numpy as jnp

from ..ops import field as F
from ..ops import mimc, poly
from . import layered
from . import prover as gkr


class MatrixEvalLayout(NamedTuple):
    circuit: layered.LayeredCircuit
    out_idx: Tuple[int, ...]       # final-layer indices of the 9 outputs
    M: int
    b1: int
    b2: int

    @property
    def num_values(self) -> int:
        return 5 * self.M + 2 * self.b1 + 2 * self.b2 + 2 * self.M \
            + self.b1 + self.b2 + 3


def _ranks_and_finals(idx: np.ndarray, size: int):
    """1-based occurrence rank per element + total counts per index."""
    counts = np.zeros(size, dtype=np.int64)
    ranks = np.zeros(len(idx), dtype=np.int64)
    for i, j in enumerate(idx):
        counts[j] += 1
        ranks[i] = counts[j]
    return ranks, counts


def build_circuit(M: int, b1: int, b2: int) -> MatrixEvalLayout:
    """Input layout (flat): [r,ra,c,ca,v]*M | fa1[b1] | fa2[b2] |
    rw[2M] | idx1[b1] | idx2[b2] | beta1[b1] | beta2[b2] | one | a | b."""
    n_in = 5 * M + b1 + b2 + 2 * M + b1 + b2 + b1 + b2 + 3
    b = layered.LayeredBuilder(n_in)
    w = b.input_wire
    off_fa1 = 5 * M
    off_fa2 = off_fa1 + b1
    off_rw = off_fa2 + b2
    off_i1 = off_rw + 2 * M
    off_i2 = off_i1 + b1
    off_b1 = off_i2 + b2
    off_b2 = off_b1 + b1
    one_w = w(off_b2 + b2)
    a_w = w(off_b2 + b2 + 1)
    b_w = w(off_b2 + b2 + 2)

    def axis(ent_off: int, acc_off: int, rw_off: int, idx_off: int,
             beta_off: int, fa_off: int, n_idx: int):
        Rs, Ws = [], []
        for i in range(M):
            ridx = w(5 * i + ent_off)
            racc = w(5 * i + acc_off)
            rw_i = w(rw_off + 2 * i)
            accm1 = b.sub(racc, one_w)
            Rs.append(b.inner_product([ridx, accm1, rw_i],
                                      [one_w, a_w, b_w]))
            Ws.append(b.inner_product([ridx, racc, rw_i],
                                      [one_w, a_w, b_w]))
        Is, Fs = [], []
        for j in range(n_idx):
            ij = w(idx_off + j)
            bj = w(beta_off + j)
            fj = w(fa_off + j)
            Is.append(b.inner_product([ij, bj], [one_w, b_w]))
            Fs.append(b.inner_product([ij, fj, bj], [one_w, a_w, b_w]))
        return (b.mul_tree(Rs), b.mul_tree(Ws),
                b.mul_tree(Is), b.mul_tree(Fs))

    Rr, Wr, Ir, Fr = axis(0, 1, off_rw, off_i1, off_b1, off_fa1, b1)
    # column rw values are the odd transcript slots
    Rc, Wc = [], []
    for i in range(M):
        cidx = w(5 * i + 2)
        cacc = w(5 * i + 3)
        rw_i = w(off_rw + 2 * i + 1)
        accm1 = b.sub(cacc, one_w)
        Rc.append(b.inner_product([cidx, accm1, rw_i], [one_w, a_w, b_w]))
        Wc.append(b.inner_product([cidx, cacc, rw_i], [one_w, a_w, b_w]))
    Ic, Fc = [], []
    for j in range(b2):
        ij = w(off_i2 + j)
        bj = w(off_b2 + j)
        fj = w(off_fa2 + j)
        Ic.append(b.inner_product([ij, bj], [one_w, b_w]))
        Fc.append(b.inner_product([ij, fj, bj], [one_w, a_w, b_w]))
    Rc, Wc = b.mul_tree(Rc), b.mul_tree(Wc)
    Ic, Fc = b.mul_tree(Ic), b.mul_tree(Fc)

    # evaluation: sum_i rw0_i * rw1_i * v_i
    prods = [b.mul(b.mul(w(off_rw + 2 * i), w(off_rw + 2 * i + 1)),
                   w(5 * i + 4)) for i in range(M)]
    EV = b.sum_tree(prods)

    outs = [Rr, Wr, Ir, Fr, Rc, Wc, Ic, Fc, EV]
    target = max(wr[0] for wr in outs)
    out_idx = []
    for wr in outs:
        relayed = (target, b._relay_to(wr, target))
        final = b.gate(layered.G_COPY, relayed, b.zero)
        out_idx.append(final[1])
    return MatrixEvalLayout(circuit=b.build(), out_idx=tuple(out_idx),
                            M=M, b1=b1, b2=b2)


def make_inputs(layout: MatrixEvalLayout, rows, cols, vals, r1, r2, a, b):
    """Assemble the input vector; rows/cols int arrays, vals [M, 2]."""
    M, b1, b2 = layout.M, layout.b1, layout.b2
    rows = np.asarray(rows, dtype=np.int64)
    cols = np.asarray(cols, dtype=np.int64)
    ra, fa1 = _ranks_and_finals(rows, b1)
    ca, fa2 = _ranks_and_finals(cols, b2)
    beta1 = poly.beta_table(r1)[:b1]
    beta2 = poly.beta_table(r2)[:b2]

    n = layout.num_values
    v = np.zeros((n, 2), dtype=np.uint64)
    ent = v[: 5 * M].reshape(M, 5, 2)
    ent[:, 0, 0] = rows.astype(np.uint64)
    ent[:, 1, 0] = ra.astype(np.uint64)
    ent[:, 2, 0] = cols.astype(np.uint64)
    ent[:, 3, 0] = ca.astype(np.uint64)
    ent[:, 4] = np.asarray(vals, dtype=np.uint64)
    off = 5 * M
    v[off: off + b1, 0] = fa1.astype(np.uint64)
    off += b1
    v[off: off + b2, 0] = fa2.astype(np.uint64)
    off += b2
    b1_np = np.asarray(beta1)
    b2_np = np.asarray(beta2)
    rw = v[off: off + 2 * M].reshape(M, 2, 2)
    rw[:, 0] = b1_np[rows]
    rw[:, 1] = b2_np[cols]
    off += 2 * M
    v[off: off + b1, 0] = np.arange(b1, dtype=np.uint64)
    off += b1
    v[off: off + b2, 0] = np.arange(b2, dtype=np.uint64)
    off += b2
    v[off: off + b1] = b1_np
    off += b1
    v[off: off + b2] = b2_np
    off += b2
    v[off, 0] = 1
    v[off + 1] = np.asarray(a)
    v[off + 2] = np.asarray(b)
    return jnp.asarray(v)


class MatrixEvalProof(NamedTuple):
    gkr_proof: object        # gkr.GkrProof
    M: int
    b1: int
    b2: int


def prove(rows, cols, vals, r1, r2, state,
          layout: MatrixEvalLayout = None):
    """Prove M~(r1, r2); returns (proof, inputs, state).

    The challenges a, b for the memory-check RLC come from the transcript
    (the reference samples them outside and feeds them as inputs)."""
    M = len(np.asarray(rows))
    b1 = 1 << r1.shape[0]
    b2 = 1 << r2.shape[0]
    if layout is None:
        layout = build_circuit(M, b1, b2)
    state, ab = mimc.squeeze(state, 2)
    inputs = make_inputs(layout, rows, cols, vals, r1, r2, ab[0], ab[1])
    gp, state = gkr.prove(layout.circuit, _padded_inputs(layout, inputs),
                          state)
    return MatrixEvalProof(gkr_proof=gp, M=M, b1=b1, b2=b2), inputs, state


def _padded_inputs(layout: MatrixEvalLayout, inputs):
    z = jnp.zeros((1, 2), dtype=jnp.uint64)
    return jnp.concatenate([inputs, z], axis=0)


def verify(proof: MatrixEvalProof, r1, r2, state,
           layout: MatrixEvalLayout = None):
    """Returns (ok, eval_claim, input_weight, input_claim, state).

    eval_claim is the proven M~(r1, r2).  The caller must bind
    (input_weight, input_claim) to the input vector — directly (the beta
    tables and index/constant blocks are publicly recomputable; the
    matrix entries + rw transcript come from the prover's data) or via a
    PC opening when the inputs are committed."""
    if layout is None:
        layout = build_circuit(proof.M, proof.b1, proof.b2)
    state, ab = mimc.squeeze(state, 2)
    ok, Wt, claim, state = gkr.verify(proof.gkr_proof, layout.circuit, state)
    out = proof.gkr_proof.output
    oi = layout.out_idx
    Rr, Wr, Ir, Fr = out[oi[0]], out[oi[1]], out[oi[2]], out[oi[3]]
    Rc, Wc, Ic, Fc = out[oi[4]], out[oi[5]], out[oi[6]], out[oi[7]]
    ok = jnp.logical_and(ok, F.feq(F.fmul(Rr, Fr), F.fmul(Wr, Ir)))
    ok = jnp.logical_and(ok, F.feq(F.fmul(Rc, Fc), F.fmul(Wc, Ic)))
    return ok, out[oi[8]], Wt, claim, state


__all__ = ["MatrixEvalLayout", "MatrixEvalProof", "build_circuit",
           "make_inputs", "prove", "verify"]
