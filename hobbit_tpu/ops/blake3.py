"""BLAKE3 (single-block path) as batched uint32 vector ops.

The protocol only ever hashes 64-byte messages (4 field elements, or two
32-byte digests) into 32-byte digests — the reference links the official C
implementation with AVX-512 kernels but calls it exclusively through
``blake3_hash(64B) -> 32B`` (``src/Blake3_hash.cpp:5-10``).  A 64-byte input
is a single chunk consisting of a single block, so the full tree mode
degenerates to ONE compression with flags CHUNK_START|CHUNK_END|ROOT.

This module implements that compression from the BLAKE3 spec as pure
``jnp.uint32`` ops, vectorized over a leading batch axis: hashing n Merkle
leaves is a [n, 16]-word tensor program on the VPU (no data-dependent
control flow; 7 unrolled rounds).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

u32 = jnp.uint32

IV = np.array(
    [0x6A09E667, 0xBB67AE85, 0x3C6EF372, 0xA54FF53A,
     0x510E527F, 0x9B05688C, 0x1F83D9AB, 0x5BE0CD19],
    dtype=np.uint32,
)

_PERM = np.array([2, 6, 3, 10, 7, 0, 4, 13, 1, 11, 12, 5, 9, 14, 15, 8],
                 dtype=np.int32)

CHUNK_START = 1
CHUNK_END = 2
ROOT = 8
FLAGS_64B = CHUNK_START | CHUNK_END | ROOT  # 11


def _ror(x, k: int):
    return (x >> np.uint32(k)) | (x << np.uint32(32 - k))


# SCHED[r] = _PERM applied r times: per-round message word order
_SCHED = np.zeros((7, 16), dtype=np.int32)
_SCHED[0] = np.arange(16)
for _r in range(1, 7):
    _SCHED[_r] = _SCHED[_r - 1][_PERM]


def _g_vec(r0, r1, r2, r3, mx, my):
    """One vectorized G over 4 lanes (the last axis): the column and
    diagonal steps are each FOUR independent G applications, so the state
    lives as 4 rows of 4 lanes and every G mixes whole rows."""
    r0 = r0 + r1 + mx
    r3 = _ror(r3 ^ r0, 16)
    r2 = r2 + r3
    r1 = _ror(r1 ^ r2, 12)
    r0 = r0 + r1 + my
    r3 = _ror(r3 ^ r0, 8)
    r2 = r2 + r3
    r1 = _ror(r1 ^ r2, 7)
    return r0, r1, r2, r3


@jax.jit
def compress64(m):
    """One BLAKE3 compression of a 64-byte single-chunk message.

    m: [..., 16] uint32 message words (little-endian packing of 64 bytes).
    Returns [..., 8] uint32 digest words.

    Row-vectorized (state = 4 rows x 4 lanes; column/diagonal steps are
    one G over the lane axis each) and scanned over the 7 rounds with a
    precomputed message schedule — the graph is ~30 ops instead of the
    unrolled ~700, so XLA:CPU compiles in seconds (the unrolled form took
    minutes) and the executable is shared by every caller shape."""
    m = m.astype(u32)
    batch = m.shape[:-1]
    iv = jnp.asarray(IV)

    r0 = jnp.broadcast_to(iv[0:4], batch + (4,))
    r1 = jnp.broadcast_to(iv[4:8], batch + (4,))
    r2 = jnp.broadcast_to(iv[0:4], batch + (4,))
    r3 = jnp.broadcast_to(
        jnp.asarray([0, 0, 64, FLAGS_64B], dtype=u32), batch + (4,))

    # [7, ..., 16] per-round message words, schedule applied up front
    msched = jnp.moveaxis(m[..., jnp.asarray(_SCHED)], -2, 0)

    def round_fn(carry, mr):
        r0, r1, r2, r3 = carry
        # column step: G on (row0, row1, row2, row3) lanes
        r0, r1, r2, r3 = _g_vec(r0, r1, r2, r3,
                                mr[..., 0:8:2], mr[..., 1:8:2])
        # diagonalize, diagonal step, un-diagonalize
        r1 = jnp.roll(r1, -1, axis=-1)
        r2 = jnp.roll(r2, -2, axis=-1)
        r3 = jnp.roll(r3, -3, axis=-1)
        r0, r1, r2, r3 = _g_vec(r0, r1, r2, r3,
                                mr[..., 8:16:2], mr[..., 9:16:2])
        r1 = jnp.roll(r1, 1, axis=-1)
        r2 = jnp.roll(r2, 2, axis=-1)
        r3 = jnp.roll(r3, 3, axis=-1)
        return (r0, r1, r2, r3), None

    (r0, r1, r2, r3), _ = jax.lax.scan(round_fn, (r0, r1, r2, r3), msched)
    return jnp.concatenate([r0 ^ r2, r1 ^ r3], axis=-1)


def fields_to_words(f):
    """[..., 4, 2] uint64 field elements -> [..., 16] uint32 message words.

    Little-endian memcpy layout as in the reference's 64-byte leaf packing
    (merkle_tree.cpp:62-76): per element real_lo, real_hi, img_lo, img_hi.
    """
    lo = (f & np.uint64(0xFFFFFFFF)).astype(u32)
    hi = (f >> np.uint64(32)).astype(u32)
    words = jnp.stack([lo, hi], axis=-1)       # [..., 4, 2(re/im), 2(lo/hi)]
    return words.reshape(f.shape[:-2] + (16,))


def digests_to_words(a, b):
    """Two [..., 8] digests -> [..., 16] message words (a ‖ b)."""
    return jnp.concatenate([a, b], axis=-1)


def hash_field_leaves(f):
    """[..., 4, 2] field elements -> [..., 8] digests."""
    return compress64(fields_to_words(f))


def hash_pairs(a, b):
    """Hash concatenation of two digests (Merkle parent)."""
    return compress64(digests_to_words(a, b))


def hash_chained_leaf(f, prev):
    """Merkle-Damgard chunk chaining: blake3(blake3(4 elems) ‖ prev).

    Streaming-PC leaf accumulation rule (merkle_tree.cpp:62-87).
    """
    return hash_pairs(hash_field_leaves(f), prev)


# ---------------------------------------------------------------------------
# Pure-python mirror (tests / host-side single hashes)
# ---------------------------------------------------------------------------

def py_compress64(block: bytes) -> bytes:
    assert len(block) == 64
    m = list(np.frombuffer(block, dtype="<u4"))
    v = list(IV.astype(np.int64)) + list(IV[:4].astype(np.int64)) + [0, 0, 64, FLAGS_64B]
    v = [int(x) & 0xFFFFFFFF for x in v]

    def ror(x, k):
        return ((x >> k) | (x << (32 - k))) & 0xFFFFFFFF

    def g(a, b, c, d, x, y):
        v[a] = (v[a] + v[b] + x) & 0xFFFFFFFF
        v[d] = ror(v[d] ^ v[a], 16)
        v[c] = (v[c] + v[d]) & 0xFFFFFFFF
        v[b] = ror(v[b] ^ v[c], 12)
        v[a] = (v[a] + v[b] + y) & 0xFFFFFFFF
        v[d] = ror(v[d] ^ v[a], 8)
        v[c] = (v[c] + v[d]) & 0xFFFFFFFF
        v[b] = ror(v[b] ^ v[c], 7)

    msg = [int(x) for x in m]
    for rnd in range(7):
        g(0, 4, 8, 12, msg[0], msg[1])
        g(1, 5, 9, 13, msg[2], msg[3])
        g(2, 6, 10, 14, msg[4], msg[5])
        g(3, 7, 11, 15, msg[6], msg[7])
        g(0, 5, 10, 15, msg[8], msg[9])
        g(1, 6, 11, 12, msg[10], msg[11])
        g(2, 7, 8, 13, msg[12], msg[13])
        g(3, 4, 9, 14, msg[14], msg[15])
        if rnd != 6:
            msg = [msg[_PERM[i]] for i in range(16)]

    out = np.array([v[i] ^ v[i + 8] for i in range(8)], dtype=np.uint32)
    return out.astype("<u4").tobytes()


__all__ = [
    "IV", "FLAGS_64B", "compress64", "fields_to_words", "digests_to_words",
    "hash_field_leaves", "hash_pairs", "hash_chained_leaf", "py_compress64",
]
