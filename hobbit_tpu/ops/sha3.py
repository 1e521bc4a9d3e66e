"""SHA3-256 (64-byte message path) as batched uint64 lane ops.

The reference's DEFAULT ``my_hhash`` backend (#define USESHA3,
my_hhash.h:10-38) is XKCP SHA3-256 hashing exactly 64 bytes to 32.  One
Keccak-f[1600] permutation suffices: rate = 136 bytes > 64, so the padded
message is a single block.  The 25 uint64 lanes are batched over a leading
axis — 24 unrolled rounds of theta/rho-pi/chi/iota, the same kernel shape
as the other hash ops.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

u64 = jnp.uint64

_RC = np.array([
    0x0000000000000001, 0x0000000000008082, 0x800000000000808A,
    0x8000000080008000, 0x000000000000808B, 0x0000000080000001,
    0x8000000080008081, 0x8000000000008009, 0x000000000000008A,
    0x0000000000000088, 0x0000000080008009, 0x000000008000000A,
    0x000000008000808B, 0x800000000000008B, 0x8000000000008089,
    0x8000000000008003, 0x8000000000008002, 0x8000000000000080,
    0x000000000000800A, 0x800000008000000A, 0x8000000080008081,
    0x8000000000008080, 0x0000000080000001, 0x8000000080008008,
], dtype=np.uint64)

# rotation offsets r[x][y] and the pi permutation
_ROT = [[0, 36, 3, 41, 18], [1, 44, 10, 45, 2], [62, 6, 43, 15, 61],
        [28, 55, 25, 21, 56], [27, 20, 39, 8, 14]]


def _rol(v, k: int):
    k %= 64
    if k == 0:
        return v
    return (v << np.uint64(k)) | (v >> np.uint64(64 - k))


def _keccak_f(lanes):
    """lanes: [..., 25] uint64 (index = x + 5y).  One permutation."""
    A = [[lanes[..., x + 5 * y] for y in range(5)] for x in range(5)]
    for rnd in range(24):
        # theta
        C = [A[x][0] ^ A[x][1] ^ A[x][2] ^ A[x][3] ^ A[x][4]
             for x in range(5)]
        D = [C[(x - 1) % 5] ^ _rol(C[(x + 1) % 5], 1) for x in range(5)]
        A = [[A[x][y] ^ D[x] for y in range(5)] for x in range(5)]
        # rho + pi
        B = [[None] * 5 for _ in range(5)]
        for x in range(5):
            for y in range(5):
                B[y][(2 * x + 3 * y) % 5] = _rol(A[x][y], _ROT[x][y])
        # chi
        A = [[B[x][y] ^ ((~B[(x + 1) % 5][y]) & B[(x + 2) % 5][y])
              for y in range(5)] for x in range(5)]
        # iota
        A[0][0] = A[0][0] ^ np.uint64(_RC[rnd])
    return jnp.stack([A[i % 5][i // 5] for i in range(25)], axis=-1)


from ..utils.jitting import maybe_jit


@maybe_jit
def hash64(m_words: jnp.ndarray) -> jnp.ndarray:
    """m_words: [..., 16] uint32 little-endian words of a 64B message ->
    [..., 8] uint32 digest words (the 32-byte __hhash_digest layout)."""
    m_words = m_words.astype(jnp.uint32)
    batch = m_words.shape[:-1]
    lo = m_words[..., 0::2].astype(u64)
    hi = m_words[..., 1::2].astype(u64)
    msg_lanes = lo | (hi << np.uint64(32))            # [..., 8] u64
    lanes = jnp.zeros(batch + (25,), dtype=u64)
    lanes = lanes.at[..., :8].set(msg_lanes)
    # SHA3 pad: 0x06 after the message (byte 64 = lane 8 LSB), 0x80 at the
    # end of the 136-byte rate block (byte 135 = lane 16, top byte)
    lanes = lanes.at[..., 8].set(jnp.full(batch, np.uint64(0x06), u64))
    lanes = lanes.at[..., 16].add(np.uint64(0x80) << np.uint64(56))
    out = _keccak_f(lanes)
    d = out[..., :4]                                  # 32 bytes
    lo32 = (d & np.uint64(0xFFFFFFFF)).astype(jnp.uint32)
    hi32 = (d >> np.uint64(32)).astype(jnp.uint32)
    return jnp.stack([lo32, hi32], axis=-1).reshape(batch + (8,))


def py_hash64(block: bytes) -> bytes:
    import hashlib
    return hashlib.sha3_256(block).digest()


__all__ = ["hash64", "py_hash64"]
