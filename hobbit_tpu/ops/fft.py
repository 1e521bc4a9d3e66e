"""Radix-2 FFT / IFFT over GF(p^2).

Same domain and twiddle convention as the reference (``src/utils.cpp:467-527``):
bit-reversal permutation, stages of u +/- w^k * v butterflies with
w = root_of_unity(log n) (inverted for the IFFT), and 1/n scaling on the
inverse.  Each stage is one fully-vectorized tensor op; the stage loop is a
static python loop under jit (log n stages), so XLA sees static shapes and
fuses the twiddle multiply into the butterfly.
"""

from __future__ import annotations

import functools

import numpy as np

import jax.numpy as jnp

from . import field as F
from . import poly
from ..utils.jitting import maybe_jit


def _bitrev(logn: int):
    """Bit-reversal permutation [n], computed ON DEVICE from iota.

    Computing (rather than tabulating) keeps the permutation out of the
    lowered program: a host table would be embedded as an n-length
    constant in every FFT-bearing program, which the remote-attach
    compile path serializes at ~1 s/MB (see utils/closure.py)."""
    i = jnp.arange(1 << logn, dtype=jnp.int32)
    rev = jnp.zeros_like(i)
    for b in range(logn):
        rev = rev | (((i >> b) & 1) << (logn - 1 - b))
    return rev


@functools.lru_cache(maxsize=None)
def _w1(logn: int, inverse: bool):
    w = F.root_of_unity(logn)
    if inverse:
        w = F.py_finv(w)
    return np.array(w, dtype=np.uint64)


@functools.lru_cache(maxsize=None)
def _ninv(logn: int):
    return np.array(F.py_finv((1 << logn, 0)), dtype=np.uint64)


def _fft_stages(v, logn: int, w):
    """All log(n) butterfly stages as ONE ``lax.scan`` over the stage
    index: per-position partner/twiddle indices are computed from iota
    with traced shifts, so every stage is the same fixed-shape graph.
    Bit-identical to the unrolled block loop (same twiddle convention),
    but one XLA While instead of log(n) inlined stages — the remote TPU
    compile service charges seconds per inlined stage."""
    import jax

    b, n = v.shape[0], v.shape[1]
    i = jnp.arange(n, dtype=jnp.int32)

    def stage(v, s):
        half = jnp.left_shift(jnp.int32(1), s - 1)
        partner = i ^ half
        pv = v[:, partner]
        is_hi = ((i & half) > 0)[None, :, None]
        k = (i & (half - 1)).astype(jnp.int32)
        tw = w[k * (n >> s).astype(jnp.int32)]      # w^(k * n/size)
        u = jnp.where(is_hi, pv, v)                 # low element of the pair
        h = jnp.where(is_hi, v, pv)                 # high element
        tv = F.fmul(tw[None], h)
        return jnp.where(is_hi, F.fsub(u, tv), F.fadd(u, tv)), None

    v, _ = jax.lax.scan(stage, v, jnp.arange(1, logn + 1, dtype=jnp.int32))
    return v


@maybe_jit(static_argnums=(1,))
def fft(v, inverse: bool = False):
    """In-order FFT of v [n, 2] (n a power of two); returns [n, 2]."""
    n = v.shape[0]
    logn = int(np.log2(n))
    assert (1 << logn) == n
    if n == 1:
        return v

    v = v[_bitrev(logn)]
    w = poly.powers(jnp.asarray(_w1(logn, inverse)), n)
    v = _fft_stages(v[None], logn, w)[0]

    if inverse:
        v = F.fmul(v, jnp.asarray(_ninv(logn))[None, :])
    return v


def ifft(v):
    return fft(v, inverse=True)


def rs_extend(rows, rate: int = 2):
    """Reed-Solomon x``rate`` row extension: evaluations of the degree-<n
    polynomial interpolating each row on the 2n-point domain.

    rows: [..., n, 2] -> [..., rate*n, 2].  Coefficients via IFFT on the
    n-domain, zero-pad, FFT on the (rate*n)-domain; batch dims vectorized.
    (Reference: `_compute_tensorcode` row loop, PC_utils.cpp:20-31.)
    """
    shape = rows.shape
    n = shape[-2]
    flat = rows.reshape(-1, n, 2)
    out = _rs_extend_batch(flat, rate)
    return out.reshape(shape[:-2] + (rate * n, 2))


def _rs_extend_batch(rows, rate: int):
    b, n = rows.shape[0], rows.shape[1]
    coeffs = _batch_fft(rows, inverse=True)
    padded = jnp.concatenate(
        [coeffs, jnp.zeros((b, (rate - 1) * n, 2), dtype=rows.dtype)], axis=1
    )
    return _batch_fft(padded, inverse=False)


def _batch_fft(v, inverse: bool):
    """FFT over axis 1 of [b, n, 2] (scanned stages, batched)."""
    b, n = v.shape[0], v.shape[1]
    logn = int(np.log2(n))
    assert (1 << logn) == n
    if n == 1:
        return v
    v = v[:, _bitrev(logn)]
    w = poly.powers(jnp.asarray(_w1(logn, inverse)), n)
    v = _fft_stages(v, logn, w)
    if inverse:
        v = F.fmul(v, jnp.asarray(_ninv(logn))[None, None, :])
    return v


# ---------------------------------------------------------------------------
# Four-step (Bailey) FFT: the multi-chip decomposition.
#
# A length-N FFT splits as N = A x B: length-A column FFTs (batched over
# the B columns), a twiddle multiply, then length-B row FFTs (batched
# over the A rows).  On a device mesh the two batch axes carry sharding
# constraints (parallel.mesh.shard_leading), so the column->row re-
# sharding boundary is exactly the all-to-all exchange the reference's
# OpenMP row loops become across chips (SURVEY section 2.5; reference row
# FFTs: PC_utils.cpp:23-47).  Identity:
#
#   n = n1*B + n2, k = k1 + A*k2:
#   X[k1 + A*k2] = FFT_B over n2 [ w_N^(n2*k1) * FFT_A over n1 [x] ]
# ---------------------------------------------------------------------------


def _four_step_twiddle(logn: int, logA: int, inverse: bool):
    """w_N^(n2*k1) table [B, A, 2], computed ON DEVICE.

    tw[n2, k1] = (w^n2)^k1, i.e. per-row power tables of the length-B
    power vector — two log-depth doubling passes instead of an N-entry
    host table embedded as a program constant (16 MB at N=2^20)."""
    N, A = 1 << logn, 1 << logA
    B = N >> logA
    w = F.root_of_unity(logn)
    if inverse:
        w = F.py_finv(w)
    wB = poly.powers(jnp.asarray(np.array(w, dtype=np.uint64)), B)
    return poly.powers_batch(wB, A)                 # [B, A, 2]


@maybe_jit(static_argnums=(1, 2))
def fft_four_step(v, inverse: bool = False, logA: int | None = None):
    """In-order FFT of v [n, 2] via the four-step decomposition; equals
    ``fft(v, inverse)`` bit-exactly.  Both batched stages carry mesh
    sharding constraints on their batch axes."""
    from ..parallel import mesh as meshmod

    n = v.shape[0]
    logn = int(np.log2(n))
    assert (1 << logn) == n
    if logA is None:
        logA = logn // 2
    A = 1 << logA
    B = n >> logA
    if A == 1 or B == 1:
        return fft(v, inverse)

    mat = v.reshape(A, B, 2)                        # x[n1*B + n2]
    cols = _batch_fft(meshmod.shard_leading(
        jnp.moveaxis(mat, 0, 1)), inverse)          # [B, A, 2] over n1
    tw = _four_step_twiddle(logn, logA, inverse)
    T = F.fmul(cols, tw)                            # twiddle w_N^(n2*k1)
    rows = _batch_fft(meshmod.shard_leading(
        jnp.moveaxis(T, 0, 1)), inverse)            # [A, B, 2] over n2
    out = jnp.moveaxis(rows, 0, 1).reshape(n, 2)    # X[k1 + A*k2]
    if inverse:
        # _batch_fft scaled each stage by 1/A and 1/B -> total 1/n already
        pass
    return out


__all__ = ["fft", "ifft", "rs_extend", "fft_four_step"]
