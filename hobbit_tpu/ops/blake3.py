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


def _g(v, a, b, c, d, mx, my):
    va = v[a] + v[b] + mx
    vd = _ror(v[d] ^ va, 16)
    vc = v[c] + vd
    vb = _ror(v[b] ^ vc, 12)
    va = va + vb + my
    vd = _ror(vd ^ va, 8)
    vc = vc + vd
    vb = _ror(vb ^ vc, 7)
    v[a], v[b], v[c], v[d] = va, vb, vc, vd


from ..utils.jitting import maybe_jit


@maybe_jit
def compress64(m):
    """One BLAKE3 compression of a 64-byte single-chunk message.

    m: [..., 16] uint32 message words (little-endian packing of 64 bytes).
    Returns [..., 8] uint32 digest words.

    Jitted under HOBBIT_JIT (production/TPU): one dispatch per call, one
    compile per batch shape shared by every caller.  Eager otherwise —
    XLA:CPU takes MINUTES to compile the unrolled 7-round graph (the same
    pathology that ruled out whole-tree Merkle jits), while eager
    primitive dispatch is fast."""
    m = m.astype(u32)
    batch = m.shape[:-1]
    iv = jnp.asarray(IV)

    def bc(x):
        return jnp.broadcast_to(jnp.asarray(np.uint32(x)), batch)

    v = [jnp.broadcast_to(iv[i], batch) for i in range(8)]
    v += [jnp.broadcast_to(iv[i], batch) for i in range(4)]
    v += [bc(0), bc(0), bc(64), bc(FLAGS_64B)]

    msg = [m[..., i] for i in range(16)]
    for rnd in range(7):
        _g(v, 0, 4, 8, 12, msg[0], msg[1])
        _g(v, 1, 5, 9, 13, msg[2], msg[3])
        _g(v, 2, 6, 10, 14, msg[4], msg[5])
        _g(v, 3, 7, 11, 15, msg[6], msg[7])
        _g(v, 0, 5, 10, 15, msg[8], msg[9])
        _g(v, 1, 6, 11, 12, msg[10], msg[11])
        _g(v, 2, 7, 8, 13, msg[12], msg[13])
        _g(v, 3, 4, 9, 14, msg[14], msg[15])
        if rnd != 6:
            msg = [msg[_PERM[i]] for i in range(16)]

    return jnp.stack([v[i] ^ v[i + 8] for i in range(8)], axis=-1)


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
