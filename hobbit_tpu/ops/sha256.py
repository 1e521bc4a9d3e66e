"""SHA-256 (64-byte message path) as batched uint32 vector ops.

The reference's alternative ``my_hhash`` backend (``src/flo-shani.c``,
selected by #undef USESHA3, my_hhash.h:10) hashes exactly 64 bytes to 32:
one message block plus the fixed padding block (0x80, zeros, bit-length
512).  Both compressions are unrolled here as pure jnp.uint32 tensor ops —
the same shape of kernel as ops.blake3, so SHA-based Merkle paths (the
Pigeon/Breakdown PC family, poly_commit.cpp) run on the VPU too.

Convention: input is [..., 16] uint32 words in LITTLE-endian memory order
(the same packing as blake3.fields_to_words); SHA-256's big-endian word
view is applied internally.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

u32 = jnp.uint32

_H0 = np.array([0x6A09E667, 0xBB67AE85, 0x3C6EF372, 0xA54FF53A,
                0x510E527F, 0x9B05688C, 0x1F83D9AB, 0x5BE0CD19],
               dtype=np.uint32)

_K = np.array([
    0x428A2F98, 0x71374491, 0xB5C0FBCF, 0xE9B5DBA5, 0x3956C25B, 0x59F111F1,
    0x923F82A4, 0xAB1C5ED5, 0xD807AA98, 0x12835B01, 0x243185BE, 0x550C7DC3,
    0x72BE5D74, 0x80DEB1FE, 0x9BDC06A7, 0xC19BF174, 0xE49B69C1, 0xEFBE4786,
    0x0FC19DC6, 0x240CA1CC, 0x2DE92C6F, 0x4A7484AA, 0x5CB0A9DC, 0x76F988DA,
    0x983E5152, 0xA831C66D, 0xB00327C8, 0xBF597FC7, 0xC6E00BF3, 0xD5A79147,
    0x06CA6351, 0x14292967, 0x27B70A85, 0x2E1B2138, 0x4D2C6DFC, 0x53380D13,
    0x650A7354, 0x766A0ABB, 0x81C2C92E, 0x92722C85, 0xA2BFE8A1, 0xA81A664B,
    0xC24B8B70, 0xC76C51A3, 0xD192E819, 0xD6990624, 0xF40E3585, 0x106AA070,
    0x19A4C116, 0x1E376C08, 0x2748774C, 0x34B0BCB5, 0x391C0CB3, 0x4ED8AA4A,
    0x5B9CCA4F, 0x682E6FF3, 0x748F82EE, 0x78A5636F, 0x84C87814, 0x8CC70208,
    0x90BEFFFA, 0xA4506CEB, 0xBEF9A3F7, 0xC67178F2], dtype=np.uint32)


def _ror(x, k: int):
    return (x >> np.uint32(k)) | (x << np.uint32(32 - k))


def _bswap32(x):
    return ((x << np.uint32(24))
            | ((x & np.uint32(0xFF00)) << np.uint32(8))
            | ((x >> np.uint32(8)) & np.uint32(0xFF00))
            | (x >> np.uint32(24)))


def _compress(state, w16):
    """One SHA-256 compression; state [..., 8], w16 [..., 16] (BE words)."""
    w = [w16[..., i] for i in range(16)]
    for t in range(16, 64):
        s0 = _ror(w[t - 15], 7) ^ _ror(w[t - 15], 18) ^ (w[t - 15] >> np.uint32(3))
        s1 = _ror(w[t - 2], 17) ^ _ror(w[t - 2], 19) ^ (w[t - 2] >> np.uint32(10))
        w.append(w[t - 16] + s0 + w[t - 7] + s1)
    a, b, c, d, e, f, g, h = [state[..., i] for i in range(8)]
    for t in range(64):
        S1 = _ror(e, 6) ^ _ror(e, 11) ^ _ror(e, 25)
        ch = (e & f) ^ (~e & g)
        t1 = h + S1 + ch + np.uint32(_K[t]) + w[t]
        S0 = _ror(a, 2) ^ _ror(a, 13) ^ _ror(a, 22)
        maj = (a & b) ^ (a & c) ^ (b & c)
        t2 = S0 + maj
        h, g, f, e, d, c, b, a = g, f, e, d + t1, c, b, a, t1 + t2
    out = jnp.stack([a, b, c, d, e, f, g, h], axis=-1)
    return out + state


from ..utils.jitting import maybe_jit


@maybe_jit
def hash64(m_le):
    """m_le: [..., 16] uint32 little-endian words of a 64B message ->
    [..., 8] uint32 digest words (little-endian memory order, matching the
    32-byte `__hhash_digest` layout)."""
    m_le = m_le.astype(u32)
    batch = m_le.shape[:-1]
    w1 = _bswap32(m_le)
    h = jnp.broadcast_to(jnp.asarray(_H0), batch + (8,))
    h = _compress(h, w1)
    # padding block: 0x80 then zeros, length = 512 bits
    pad = np.zeros(16, dtype=np.uint32)
    pad[0] = 0x80000000
    pad[15] = 512
    w2 = jnp.broadcast_to(jnp.asarray(pad), batch + (16,))
    h = _compress(h, w2)
    return _bswap32(h)


def py_hash64(block: bytes) -> bytes:
    """Reference single-shot (stdlib) for test vectors."""
    import hashlib
    return hashlib.sha256(block).digest()


__all__ = ["hash64", "py_hash64"]
