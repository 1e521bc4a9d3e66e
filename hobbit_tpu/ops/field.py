"""GF(p^2) arithmetic, p = 2^61 - 1 (Mersenne), i^2 = -1.

TPU-native re-design of the reference field (``src/fieldElement.{hpp,cpp}``:
same prime, same extension, same canonical root of unity, so all protocol
values are interoperable).  The reference uses x86 ``mulx/shld`` inline asm
and AVX2 4-lane packing; here every op is a batched array op: a field array
of shape ``[..., 2]`` (last axis = (real, imag)) holds uint64 residues in
``[0, p)``, and multiplication decomposes 61x61-bit products into 32-bit
limb partials that XLA lowers onto the TPU's 32-bit vector multiplier.

All functions are pure, jit-safe, and vectorize over arbitrary leading axes.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

_jit = jax.jit                      # primitive-level jit: eager-mode per-op
_jits = lambda *names: (lambda f: jax.jit(f, static_argnames=names))
# dispatch on this host is ~1.7ms/op; a jitted primitive is ~10us.

P = (1 << 61) - 1  # 2305843009213693951
_P64 = np.uint64(P)
_MASK32 = np.uint64((1 << 32) - 1)
_MASK29 = np.uint64((1 << 29) - 1)

# Canonical generator of the 2^62-order multiplicative subgroup, identical to
# the reference (fieldElement.cpp:237-249) so FFT domains match bit-exactly.
ROU_ORDER_BITS = 62
ROU = (2147483648, 1033321771269002680)  # (real, imag)

u64 = jnp.uint64


# ---------------------------------------------------------------------------
# Base field GF(p): uint64 residues in [0, p)
# ---------------------------------------------------------------------------

def _canon(x):
    """Reduce a value in [0, 2p) (or [0, p]) to canonical [0, p)."""
    return jnp.where(x >= _P64, x - _P64, x)


@_jit
def addmod(a, b):
    return _canon(a + b)


@_jit
def submod(a, b):
    return _canon(a + (_P64 - b))


@_jit
def mulmod(x, y):
    """(x*y) mod p for x, y < 2^62.  Exact via 32-bit limb decomposition.

    z = hi*2^64 + mid*2^32 + lo with 2^61 = 1 (mod p), so
    z = (lo mod) + (mid split at bit 29) + 8*hi, all fitting in uint64.
    """
    x0 = x & _MASK32
    x1 = x >> np.uint64(32)
    y0 = y & _MASK32
    y1 = y >> np.uint64(32)
    lo = x0 * y0                 # < 2^64, exact
    mid = x1 * y0 + x0 * y1      # < 2^63, exact
    hi = x1 * y1                 # < 2^60, exact
    s = (
        (lo & _P64)
        + (lo >> np.uint64(61))
        + ((mid & _MASK29) << np.uint64(32))
        + (mid >> np.uint64(29))
        + (hi << np.uint64(3))
    )
    return _canon((s >> np.uint64(61)) + (s & _P64))


def _powmod_base(x, e: int):
    """x^e mod p for a static python-int exponent (square & multiply)."""
    acc = jnp.ones_like(x)
    base = x
    while e:
        if e & 1:
            acc = mulmod(acc, base)
        base = mulmod(base, base)
        e >>= 1
    return acc


@_jit
def invmod(x):
    """x^(p-2) mod p (Fermat); maps 0 to 0."""
    return _powmod_base(x, P - 2)


# ---------------------------------------------------------------------------
# Extension field GF(p^2): arrays [..., 2]
# ---------------------------------------------------------------------------

def make(re, im=0):
    """Build a field array from integer-like real/imag parts (broadcast)."""
    re = jnp.asarray(re, dtype=u64) % _P64
    im = jnp.asarray(im, dtype=u64) % _P64
    re, im = jnp.broadcast_arrays(re, im)
    return jnp.stack([re, im], axis=-1)


def scalar(re: int, im: int = 0):
    return make(np.uint64(re % P), np.uint64(im % P))


def zeros(shape=()):
    return jnp.zeros(tuple(shape) + (2,) if isinstance(shape, (tuple, list)) else (shape, 2), dtype=u64)


def ones(shape=()):
    z = zeros(shape)
    return z.at[..., 0].set(np.uint64(1))


@_jit
def fadd(a, b):
    return _canon(a + b)


@_jit
def fsub(a, b):
    return _canon(a + (_P64 - b))


@_jit
def fneg(a):
    return _canon(_P64 - a)


@_jit
def fmul(a, b):
    """Karatsuba 3-mult complex multiplication (same algebra as reference)."""
    ar, ai = a[..., 0], a[..., 1]
    br, bi = b[..., 0], b[..., 1]
    t = mulmod(ar + ai, br + bi)       # operands < 2^62: exact
    ac = mulmod(ar, br)
    bd = mulmod(ai, bi)
    re = submod(ac, bd)
    im = submod(submod(t, ac), bd)
    return jnp.stack([re, im], axis=-1)


@_jit
def fsqr(a):
    return fmul(a, a)


@_jit
def fmul_i(a):
    """Multiply by i: (re, im) -> (-im, re)."""
    return jnp.stack([_canon(_P64 - a[..., 1]), a[..., 0]], axis=-1)


@_jit
def fconj(a):
    return jnp.stack([a[..., 0], _canon(_P64 - a[..., 1])], axis=-1)


@_jit
def finv(a):
    """Inverse via the norm map: (a+bi)^-1 = (a-bi) / (a^2+b^2).

    Unique field inverse, hence equal to the reference's Fermat
    x^(p^2-2) (fieldElement.cpp:206-209); maps 0 to 0.
    """
    ar, ai = a[..., 0], a[..., 1]
    n = addmod(mulmod(ar, ar), mulmod(ai, ai))
    ninv = invmod(n)
    return jnp.stack(
        [mulmod(ar, ninv), mulmod(_canon(_P64 - ai), ninv)], axis=-1
    )


@_jits('e')
def fpow(a, e: int):
    """a^e for a static python-int exponent."""
    acc = ones(a.shape[:-1]) if a.ndim > 1 else scalar(1)
    acc = jnp.broadcast_to(acc, a.shape)
    base = a
    while e:
        if e & 1:
            acc = fmul(acc, base)
        base = fmul(base, base)
        e >>= 1
    return acc


@_jit
def feq(a, b):
    return jnp.all(a == b, axis=-1)


@_jits('axis')
def fsum(x, axis: int = 0):
    """Sum of field elements along ``axis`` (tree reduction, mod p).

    Adds 8 canonical residues per level (fits uint64), lazily reduces, and
    canonicalizes so every level's inputs stay < p.
    """
    x = jnp.moveaxis(x, axis, 0)
    n = x.shape[0]
    while n > 1:
        pad = (-n) % 8
        if pad:
            x = jnp.concatenate(
                [x, jnp.zeros((pad,) + x.shape[1:], dtype=x.dtype)], axis=0
            )
            n += pad
        x = x.reshape((n // 8, 8) + x.shape[1:])
        s = jnp.sum(x, axis=1)          # <= 8*(p-1) < 2^64
        x = _canon((s >> np.uint64(61)) + (s & _P64))
        n = n // 8
    return x[0]


@_jits('axis')
def fdot(a, b, axis: int = 0):
    """Inner product sum_i a_i * b_i along ``axis``."""
    return fsum(fmul(a, b), axis=axis)


@_jits('axis')
def fprod(x, axis: int = 0):
    """Product of field elements along ``axis`` (log-depth tree)."""
    x = jnp.moveaxis(x, axis, 0)
    n = x.shape[0]
    while n > 1:
        if n % 2:
            x = jnp.concatenate([x, ones((1,) + x.shape[1:-1])], axis=0)
            n += 1
        x = fmul(x[0::2], x[1::2])
        n = (n + 1) // 2
    return x[0]


# ---------------------------------------------------------------------------
# Roots of unity / randomness
# ---------------------------------------------------------------------------

def _py_mulmod(x: int, y: int) -> int:
    z = x * y
    z = (z >> 61) + (z & P)
    z = (z >> 61) + (z & P)
    return z - P if z >= P else z


def py_fmul(a, b):
    """Pure-python GF(p^2) multiply on (re, im) int tuples (host precompute)."""
    t = _py_mulmod((a[0] + a[1]) % P, (b[0] + b[1]) % P)
    ac = _py_mulmod(a[0], b[0])
    bd = _py_mulmod(a[1], b[1])
    re = (ac - bd) % P
    im = (t - ac - bd) % P
    return (re, im)


def py_fpow(a, e: int):
    acc = (1, 0)
    base = a
    while e:
        if e & 1:
            acc = py_fmul(acc, base)
        base = py_fmul(base, base)
        e >>= 1
    return acc


def py_finv(a):
    n = (a[0] * a[0] + a[1] * a[1]) % P
    ninv = pow(n, P - 2, P)
    return ((a[0] * ninv) % P, ((P - a[1]) * ninv) % P)


def root_of_unity(log_order: int):
    """Root of unity of order 2^log_order (matches reference getRootOfUnity)."""
    assert log_order <= 61
    rou = ROU
    for _ in range(ROU_ORDER_BITS - log_order):
        rou = py_fmul(rou, rou)
    return rou


def frandom(key, shape=()):
    """Uniform field elements from a jax PRNG key.

    Replaces the reference's libc ``random()`` digits loop with a
    deterministic, reproducible PRNG (rejection-free: 61-bit masking of
    64-bit words has bias < 2^-61 only at the single value p, negligible
    and sidestepped by a modular fold).
    """
    shape = tuple(shape) if isinstance(shape, (tuple, list)) else (shape,)
    bits = jax.random.bits(key, shape + (2,), dtype=jnp.uint64)
    return _canon((bits >> np.uint64(61)) + (bits & _P64))


def to_py(x) -> np.ndarray:
    """Device field array -> numpy object array of (re, im) python ints."""
    arr = np.asarray(x)
    return arr


__all__ = [
    "P", "ROU", "u64",
    "addmod", "submod", "mulmod", "invmod",
    "make", "scalar", "zeros", "ones",
    "fadd", "fsub", "fneg", "fmul", "fsqr", "finv", "fpow", "feq",
    "fmul_i", "fconj", "fsum", "fdot", "fprod",
    "py_fmul", "py_fpow", "py_finv", "root_of_unity", "frandom", "to_py",
]
