"""Random bipartite expander graphs for the Spielman/Brakedown linear code.

Reference: ``src/expanders.h`` (degrees cn=9 / dn=12, rate params
alpha=0.211, r=1.72, recursion floor distance_threshold=13,
``src/parameter.h:4-9``).  The reference stores per-node neighbor/weight
lists built from libc ``rand()``; here each level is a static edge list
(src, dst, weight) *pre-sorted by destination* so that on-device encoding is
a gather + one segmented modular reduction — the TPU-native form of a sparse
matrix-vector product.  Graphs are derived from a seeded PRNG, making the
commitment key deterministic and reproducible.
"""

from __future__ import annotations

from typing import List, NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from ..config import CodeParams
from . import field as F


class ExpanderEdges(NamedTuple):
    """One bipartite expander as a dst-sorted edge list."""
    src: jnp.ndarray      # [E] int32
    dst: jnp.ndarray      # [E] int32 (sorted ascending)
    weight: jnp.ndarray   # [E, 2] field
    n_in: int
    n_out: int


class CodeLevel(NamedTuple):
    C: ExpanderEdges      # n -> floor(alpha*n)
    D: ExpanderEdges      # L -> floor(n*(r-1)) - L
    n: int                # message length at this level
    mid: int              # C output length
    rec_len: int          # length of recursive codeword of mid
    out_len: int          # n + rec_len + D.n_out


class SpielmanCode(NamedTuple):
    levels: tuple         # of CodeLevel, outermost first
    n: int
    codeword_len: int     # total length (~ r*n), before zero-pad to 2n


def _make_expander(rng, L: int, R: int, d: int) -> ExpanderEdges:
    src = np.repeat(np.arange(L, dtype=np.int64), d)
    dst = rng.integers(0, R, size=L * d, dtype=np.int64)
    wre = rng.integers(0, F.P, size=L * d, dtype=np.uint64)
    wim = rng.integers(0, F.P, size=L * d, dtype=np.uint64)
    order = np.argsort(dst, kind="stable")
    return ExpanderEdges(
        src=jnp.asarray(src[order], dtype=jnp.int32),
        dst=jnp.asarray(dst[order], dtype=jnp.int32),
        weight=jnp.asarray(np.stack([wre[order], wim[order]], axis=-1)),
        n_in=L,
        n_out=R,
    )


def transpose_edges(edges: ExpanderEdges) -> ExpanderEdges:
    """Reverse adjacency (the reference's r_neighbor/r_weight lists,
    expanders.h:20-47): swap src/dst and re-sort by the new destination."""
    src = np.asarray(edges.dst)
    dst = np.asarray(edges.src)
    w = np.asarray(edges.weight)
    order = np.argsort(dst, kind="stable")
    return ExpanderEdges(
        src=jnp.asarray(src[order], dtype=jnp.int32),
        dst=jnp.asarray(dst[order], dtype=jnp.int32),
        weight=jnp.asarray(w[order]),
        n_in=edges.n_out,
        n_out=edges.n_in,
    )


import collections

_TRANSPOSE_CACHE: "collections.OrderedDict" = collections.OrderedDict()
_TRANSPOSE_CACHE_MAX = 64


def _transposed(edges: ExpanderEdges) -> ExpanderEdges:
    # keyed by id() — the cache also stores the edges object itself so the
    # id can never be recycled for a different graph (stale-transpose bug);
    # bounded LRU so stale graphs can be freed (NamedTuples of jax arrays
    # support neither weakrefs nor hashing, so id+pin+LRU it is)
    key = id(edges)
    hit = _TRANSPOSE_CACHE.get(key)
    if hit is None or hit[0] is not edges:
        hit = (edges, transpose_edges(edges))
        _TRANSPOSE_CACHE[key] = hit
        if len(_TRANSPOSE_CACHE) > _TRANSPOSE_CACHE_MAX:
            _TRANSPOSE_CACHE.popitem(last=False)
    else:
        _TRANSPOSE_CACHE.move_to_end(key)
    return hit[1]


def encode_transpose(code: SpielmanCode, y):
    """Generator-matrix transpose action: y [..., codeword_len, 2] ->
    P^T y [..., n, 2].

    Back-propagates codeword weights through the recursive structure
    (systematic part + D^T into the inner codeword + C^T into the message);
    used to evaluate the implicit parity matrix at a point (the recursive
    descent of ``evaluate_parity_matrix``, sumcheck.cpp:2888-2928):
    MLE(codeword)(rho) = <encode_transpose(code, eq(rho)), message>.
    """
    def rec(yv, li: int):
        lvl = code.levels[li]
        n, L = lvl.n, lvl.rec_len
        y_sys = yv[..., :n, :]
        y_z = yv[..., n:n + L, :]
        y_w = yv[..., n + L:, :]
        z_w = F.fadd(y_z, spmv(_transposed(lvl.D), y_w))
        if li + 1 < len(code.levels):
            mid_w = rec(z_w, li + 1)
        else:
            mid_w = z_w
        return F.fadd(y_sys, spmv(_transposed(lvl.C), mid_w))

    if not code.levels:
        return y
    return rec(y, 0)


def build_code(n: int, params: CodeParams = CodeParams(), seed: int = 666) -> SpielmanCode:
    """Build the recursive expander structure for messages of length n.

    Mirrors ``expander_init_store`` (expanders.h:78-92): sizes use the same
    C double-arithmetic truncations so level shapes match the reference.
    """
    rng = np.random.default_rng(seed)
    levels: List[CodeLevel] = []

    def rec(m: int) -> int:
        if m <= params.distance_threshold:
            return m
        R = int(params.alpha * m)
        C = _make_expander(rng, m, R, params.cn)
        L = rec(R)
        dR = int(m * (params.r - 1) - L)
        D = _make_expander(rng, L, dR, params.dn)
        levels.append(CodeLevel(C=C, D=D, n=m, mid=R, rec_len=L,
                                out_len=m + L + dR))
        return m + L + dR

    # rec appends innermost-first; store outermost-first.
    total = rec(n)
    levels.reverse()
    return SpielmanCode(levels=tuple(levels), n=n, codeword_len=total)


def spmv(edges: ExpanderEdges, x):
    """Sparse expander multiply: y[t] = sum_{(s,t,w)} w * x[..., s, :].

    x: [..., n_in, 2] -> [..., n_out, 2].  The modular segmented sum splits
    each 61-bit product into 32-bit limbs so uint64 accumulation over up to
    2^31 edges cannot overflow, then recombines mod p.
    """
    vals = F.fmul(x[..., edges.src, :], edges.weight)       # [..., E, 2]
    lo = vals & np.uint64(0xFFFFFFFF)
    hi = vals >> np.uint64(32)

    def seg(v):
        return jax.ops.segment_sum(
            v, edges.dst, num_segments=edges.n_out,
            indices_are_sorted=True)

    if vals.ndim == 2:
        lo_s, hi_s = seg(lo), seg(hi)
    else:
        lead = vals.shape[:-2]
        flat_lo = lo.reshape((-1,) + lo.shape[-2:])
        flat_hi = hi.reshape((-1,) + hi.shape[-2:])
        lo_s = jax.vmap(seg)(flat_lo).reshape(lead + (edges.n_out, 2))
        hi_s = jax.vmap(seg)(flat_hi).reshape(lead + (edges.n_out, 2))

    lo_m = F._canon((lo_s >> np.uint64(61)) + (lo_s & np.uint64(F.P)))
    hi_m = F._canon((hi_s >> np.uint64(61)) + (hi_s & np.uint64(F.P)))
    return F.addmod(F.mulmod(hi_m, np.uint64(1 << 32)), lo_m)


def modular_scatter(dst_sorted, vals, n_out: int):
    """Field scatter-add: out[d] = sum of vals at positions with dst == d.

    dst_sorted must be ascending (pre-sorted statically); vals [..., E, 2].
    Same limb-split segmented reduction as spmv (overflow-safe)."""
    lo = vals & np.uint64(0xFFFFFFFF)
    hi = vals >> np.uint64(32)

    def seg(v):
        return jax.ops.segment_sum(v, dst_sorted, num_segments=n_out,
                                   indices_are_sorted=True)

    if vals.ndim == 2:
        lo_s, hi_s = seg(lo), seg(hi)
    else:
        lead = vals.shape[:-2]
        lo_s = jax.vmap(seg)(lo.reshape((-1,) + lo.shape[-2:]))
        hi_s = jax.vmap(seg)(hi.reshape((-1,) + hi.shape[-2:]))
        lo_s = lo_s.reshape(lead + (n_out, 2))
        hi_s = hi_s.reshape(lead + (n_out, 2))
    lo_m = F._canon((lo_s >> np.uint64(61)) + (lo_s & np.uint64(F.P)))
    hi_m = F._canon((hi_s >> np.uint64(61)) + (hi_s & np.uint64(F.P)))
    return F.addmod(F.mulmod(hi_m, np.uint64(1 << 32)), lo_m)


def encode(code: SpielmanCode, x):
    """Spielman encode: x [..., n, 2] -> [..., codeword_len, 2].

    codeword = [x ‖ encode(C x) ‖ D encode(C x)] recursively
    (``encode_monolithic``, linear_code_encode.h:62-119).
    """
    def rec(v, li: int):
        lvl = code.levels[li]
        assert v.shape[-2] == lvl.n
        mid = spmv(lvl.C, v)
        if li + 1 < len(code.levels):
            z = rec(mid, li + 1)     # levels[li+1].n == lvl.mid
        else:
            z = mid                  # mid <= distance_threshold: identity
        w = spmv(lvl.D, z)
        return jnp.concatenate([v, z, w], axis=-2)

    if not code.levels:
        return x
    return rec(x, 0)


__all__ = ["ExpanderEdges", "CodeLevel", "SpielmanCode", "build_code",
           "spmv", "encode"]
