"""Merkle-tree commitments over BLAKE3 (batched, level-parallel).

TPU-native equivalent of the reference's ``merkle_tree.{h,cpp}``: leaves are
4 field elements hashed to one 32-byte digest (``MT_commit_Blake``,
merkle_tree.cpp:193-221), the streaming variant chains groups of 4 elements
into one running leaf via Merkle-Damgard (``
hash_double_field_element_merkle_damgard_blake``, :62-87), and the verifier
de-duplicates shared path nodes when accounting proof size
(``verify_claim_opt_blake``, :326-360).

Every level is one batched ``hash_pairs`` call — n/2 compressions as a
single tensor op.  Note: the reference's ``create_tree_blake`` hashes
(left ‖ left) due to an indexing slip (merkle_tree.cpp:275-280); we hash
(left ‖ right) as intended.
"""

from __future__ import annotations

from typing import List, NamedTuple, Sequence

import numpy as np

import jax.numpy as jnp

from . import blake3


def _sha_pairs(a, b):
    from . import sha256
    return sha256.hash64(jnp.concatenate([a, b], axis=-1))


def _sha_field_leaves(f):
    from . import sha256
    return sha256.hash64(blake3.fields_to_words(f))


def _sha3_pairs(a, b):
    from . import sha3
    return sha3.hash64(jnp.concatenate([a, b], axis=-1))


def _sha3_field_leaves(f):
    from . import sha3
    return sha3.hash64(blake3.fields_to_words(f))


_BACKENDS = {
    "blake3": (blake3.hash_field_leaves, blake3.hash_pairs),
    # the reference's __hhash_digest paths (my_hhash.h:10-38): SHA3-256
    # (XKCP, the default) and SHA-256 (flo-shani alternative) — used by the
    # Pigeon/Breakdown PC family (poly_commit.cpp) and vendored Virgo
    "sha3": (_sha3_field_leaves, _sha3_pairs),
    "sha256": (_sha_field_leaves, _sha_pairs),
}


class MerkleTree(NamedTuple):
    levels: tuple       # levels[0] = [n, 8] leaf digests, ..., [-1] = [1, 8]
    backend: str = "blake3"
    # padded level stack [D, n, 8] (level j valid in prefix n >> j); lets
    # path opens lower to ONE scanned gather instead of one per level
    stack: object = None

    @property
    def root(self):
        return self.levels[-1][0]

    @property
    def num_leaves(self) -> int:
        return self.levels[0].shape[0]


import functools

from ..utils.jitting import maybe_jit


class _LazyStack:
    """Deferred padded level stack: built on the FIRST ``open_leaves``
    call and memoized.  Building it eagerly in ``build_from_digests``
    cost ~log2(n) x leaf-level memory (~70 MB for a 2^17-leaf tree) for
    EVERY tree, including the many commit_fields/aggr trees that are
    opened once or never."""

    __slots__ = ("value",)

    def __init__(self):
        self.value = None

    def get(self, levels):
        if self.value is None:
            import jax

            n = levels[0].shape[0]
            stack = jnp.stack([jnp.concatenate(
                [lvl, jnp.zeros((n - lvl.shape[0], 8), dtype=lvl.dtype)])
                for lvl in levels[:-1]])
            if isinstance(stack, jax.core.Tracer):
                return stack         # inside a trace: never memoize tracers
            self.value = stack
        return self.value


def build_from_digests(leaves, backend: str = "blake3") -> MerkleTree:
    """Build a tree over [n, 8] uint32 leaf digests (n a power of two).

    One jitted ``hash_pairs`` dispatch per level: the per-shape compress
    kernels are shared by EVERY tree whose level widths match (a monolithic
    whole-tree jit compiled a fresh ~log(n)-times-unrolled BLAKE3 graph per
    (backend, n) — minutes of XLA:CPU compile each, with zero reuse)."""
    n = leaves.shape[0]
    assert n & (n - 1) == 0, "leaf count must be a power of two"
    _, pairs = _BACKENDS[backend]
    levels = [leaves]
    cur = leaves
    while cur.shape[0] > 1:
        cur = pairs(cur[0::2], cur[1::2])
        levels.append(cur)
    # no padded stack: eager path opens use the single-compile per-level
    # gather kernel; a stack (~log2(n) x leaf-level memory, e.g. 318 MB at
    # 2^19 leaves) only pays off INSIDE large jitted programs, where the
    # caller (shockwave) builds its own
    return MerkleTree(levels=tuple(levels), backend=backend, stack=None)


def commit_fields(values, backend: str = "blake3") -> MerkleTree:
    """Commit to [n, 2] field elements, 4 per leaf (n divisible by 4)."""
    n = values.shape[0]
    assert n % 4 == 0
    leaf_fn, _ = _BACKENDS[backend]
    leaves = leaf_fn(values.reshape(n // 4, 4, 2))
    m = leaves.shape[0]
    if m & (m - 1):
        pad = (1 << int(np.ceil(np.log2(m)))) - m
        leaves = jnp.concatenate(
            [leaves, jnp.zeros((pad, 8), dtype=leaves.dtype)], axis=0)
    return build_from_digests(leaves, backend)


def commit_fields_chained(chunks) -> MerkleTree:
    """Streaming-PC leaf rule: chunks [c, n, 2] with each column of c chunks
    chained into one leaf: leaf = H(H(chunk_c) ‖ ... ) Merkle-Damgard style.

    chunks[k] contributes groups of 4 elements; successive chunks extend the
    same leaf (Elastic_PC commit accumulation, Elastic_PC.cpp:228-243).
    """
    c, n = chunks.shape[0], chunks.shape[1]
    assert n % 4 == 0
    prev = jnp.zeros((n // 4, 8), dtype=jnp.uint32)
    for k in range(c):
        prev = blake3.hash_chained_leaf(chunks[k].reshape(n // 4, 4, 2), prev)
    m = prev.shape[0]
    if m & (m - 1):
        pad = (1 << int(np.ceil(np.log2(m)))) - m
        prev = jnp.concatenate(
            [prev, jnp.zeros((pad, 8), dtype=prev.dtype)], axis=0)
    return build_from_digests(prev)


def open_leaf(tree: MerkleTree, index: int):
    """Authentication path for one leaf: [depth, 8] sibling digests."""
    return open_leaves(tree, [int(index)])[0]


@maybe_jit
def _open_leaves_kernel(levels, idx):
    rows = []
    pos = idx
    for level in levels:
        rows.append(level[pos ^ 1])
        pos = pos // 2
    return jnp.stack(rows, axis=1)


def _open_stack(stack, idx):
    """Scanned sibling gather over the padded stack [D, n, 8]."""
    import jax

    def body(pos, level):
        return pos // 2, level[pos ^ 1]

    _, sibs = jax.lax.scan(body, idx, stack)    # [D, q, 8]
    return jnp.moveaxis(sibs, 0, 1)             # [q, D, 8]


def open_leaves(tree: MerkleTree, indices):
    """Batch open: [q, depth, 8].  ALL levels gathered on device in one
    compiled call — only the [q, depth, 8] result ever crosses the link
    (pulling whole tree levels to the host costs O(tree) transfer, fatal
    on remote-attached chips).  `indices` may be a host sequence or a
    device int array (stays on device)."""
    if isinstance(indices, (list, tuple)):
        idx = jnp.asarray([int(i) for i in indices], dtype=jnp.int64)
    else:
        idx = jnp.asarray(indices, dtype=jnp.int64)
    if not tree.levels[:-1]:
        return jnp.zeros((idx.shape[0], 0, 8), dtype=jnp.uint32)
    stack = tree.stack
    if isinstance(stack, _LazyStack):
        stack = stack.get(tree.levels)
    if stack is not None:
        return _open_stack(stack, idx)
    return _open_leaves_kernel(tuple(tree.levels[:-1]), idx)


def verify_leaf(root, leaf_digest, index: int, path,
                backend: str = "blake3") -> bool:
    _, pairs = _BACKENDS[backend]
    cur = leaf_digest
    pos = int(index)
    for d in range(path.shape[0]):
        sib = path[d]
        left = jnp.where(pos & 1, sib, cur)
        right = jnp.where(pos & 1, cur, sib)
        cur = pairs(left[None, :], right[None, :])[0]
        pos //= 2
    return bool(jnp.all(cur == root))


def verify_leaves_device(root, leaf_digests, indices, paths,
                         backend: str = "blake3"):
    """Batched membership check returning a DEVICE boolean: digests
    [q, 8], indices a device/host int array, paths [q, depth, 8].
    Jit-composable (no host sync)."""
    import jax

    _, pairs = _BACKENDS[backend]

    def body(carry, sib):
        cur, pos = carry
        odd = (pos & 1).astype(bool)[:, None]
        left = jnp.where(odd, sib, cur)
        right = jnp.where(odd, cur, sib)
        return (pairs(left, right), pos // 2), None

    (cur, _), _ = jax.lax.scan(
        body, (leaf_digests, jnp.asarray(indices, dtype=jnp.int64)),
        jnp.moveaxis(paths, 1, 0))
    return jnp.all(cur == root[None, :])


def verify_leaves_batch(root, leaf_digests, indices, paths,
                        backend: str = "blake3") -> bool:
    """Batched membership check: digests [q, 8], paths [q, depth, 8].

    One vectorized hash per level for the whole batch (the per-leaf
    version costs q*depth tiny dispatches)."""
    if isinstance(indices, (list, tuple)):
        indices = jnp.asarray([int(i) for i in indices], dtype=jnp.int64)
    return bool(verify_leaves_device(root, leaf_digests, indices, paths,
                                     backend=backend))


# ---------------------------------------------------------------------------
# Instance-batched trees: I independent same-shape trees built/opened/
# verified with ONE vectorized hash per level for the whole batch (the
# recursion layer proves dozens of same-size WHIR instances per opening;
# per-instance trees cost I x depth dispatches).
# ---------------------------------------------------------------------------

class BatchMerkleTree(NamedTuple):
    levels: tuple       # levels[0] = [I, n, 8], ..., [-1] = [I, 1, 8]
    # padded level stack [D, I, n, 8] (level j valid in prefix n >> j);
    # lets path opens run as ONE scanned gather instead of one gather op
    # per level (compile cost on the TPU AOT service is per-op)
    stack: object = None

    @property
    def roots(self):
        return self.levels[-1][:, 0]        # [I, 8]


def batch_build_from_digests(leaves, backend: str = "blake3"):
    """leaves [I, n, 8] -> BatchMerkleTree (n a power of two).

    All levels are built by ONE ``lax.scan`` over a fixed-width digest
    buffer whose valid prefix halves per step (positions past the prefix
    hash garbage and are sliced away).  An unrolled level loop lowers to
    one hash-kernel While per level, and the remote TPU compile service
    charges seconds per While — inside the jitted opening programs this
    tree build was a dominant compile cost.  Hash work grows from O(n)
    to O(n log n / 2), which is noise at protocol sizes."""
    import jax

    I, n = leaves.shape[0], leaves.shape[1]
    assert n & (n - 1) == 0
    if n == 1:
        return BatchMerkleTree(levels=(leaves,))
    _, pairs = _BACKENDS[backend]
    D = int(np.log2(n))

    def body(cur, _):
        a = cur[:, 0::2].reshape(-1, 8)
        b = cur[:, 1::2].reshape(-1, 8)
        nxt = pairs(a, b).reshape(I, n // 2, 8)
        cur2 = jnp.concatenate(
            [nxt, jnp.zeros((I, n - n // 2, 8), dtype=nxt.dtype)], axis=1)
        return cur2, cur2

    _, ys = jax.lax.scan(body, leaves, None, length=D)
    levels = [leaves] + [ys[j][:, : n >> (j + 1)] for j in range(D)]
    stack = jnp.concatenate([leaves[None], ys[:-1]], axis=0) if D > 1 \
        else leaves[None]
    return BatchMerkleTree(levels=tuple(levels), stack=stack)


def batch_commit_fields(values, backend: str = "blake3"):
    """values [I, n, 2], 4 per leaf -> BatchMerkleTree."""
    I, n = values.shape[0], values.shape[1]
    assert n % 4 == 0
    leaf_fn, _ = _BACKENDS[backend]
    leaves = leaf_fn(values.reshape(I * (n // 4), 4, 2)).reshape(I, n // 4, 8)
    return batch_build_from_digests(leaves, backend)


@maybe_jit
def _batch_open_kernel(levels, idx):
    rows = []
    pos = idx                                   # [I, q]
    for level in levels:                        # [I, w, 8]
        sib = jnp.take_along_axis(level, (pos ^ 1)[:, :, None], axis=1)
        rows.append(sib)
        pos = pos // 2
    return jnp.stack(rows, axis=2)              # [I, q, depth, 8]


def _batch_open_stack(stack, idx):
    """Scanned sibling gather over the padded level stack: one gather op
    in the lowered program instead of one per level."""
    import jax

    def body(pos, level):
        sib = jnp.take_along_axis(level, (pos ^ 1)[:, :, None], axis=1)
        return pos // 2, sib

    _, sibs = jax.lax.scan(body, idx, stack)    # [D, I, q, 8]
    return jnp.moveaxis(sibs, 0, 2)             # [I, q, D, 8]


def batch_open_leaves(tree: BatchMerkleTree, idx):
    """idx [I, q] int array -> [I, q, depth, 8] sibling paths."""
    idx = jnp.asarray(idx, dtype=jnp.int64)
    if not tree.levels[:-1]:
        I, q = idx.shape
        return jnp.zeros((I, q, 0, 8), dtype=jnp.uint32)
    if tree.stack is not None:
        return _batch_open_stack(tree.stack, idx)
    return _batch_open_kernel(tuple(tree.levels[:-1]), idx)


def batch_verify_leaves(roots, leaf_digests, idx, paths,
                        backend: str = "blake3"):
    """roots [I, 8]; digests [I, q, 8]; idx [I, q]; paths [I, q, d, 8]."""
    import jax

    _, pairs = _BACKENDS[backend]
    I, q = leaf_digests.shape[0], leaf_digests.shape[1]

    def body(carry, sib):
        cur, pos = carry
        odd = (pos & 1).astype(bool)[:, None]
        left = jnp.where(odd, sib, cur)
        right = jnp.where(odd, cur, sib)
        return (pairs(left, right), pos // 2), None

    (cur, _), _ = jax.lax.scan(
        body,
        (leaf_digests.reshape(I * q, 8),
         jnp.asarray(idx, dtype=jnp.int64).reshape(I * q)),
        jnp.moveaxis(paths.reshape(I * q, -1, 8), 1, 0))
    want = jnp.broadcast_to(roots[:, None, :], (I, q, 8)).reshape(I * q, 8)
    return jnp.all(cur == want)


def dedup_path_size(indices: Sequence[int], num_leaves: int) -> int:
    """Number of 32-byte digests actually transmitted for a batch of
    openings, counting shared path nodes once (verify_claim_opt_blake's
    ``visited[]`` rule, merkle_tree.cpp:326-360)."""
    visited = set()
    count = 0
    depth = int(np.log2(num_leaves))
    for idx in indices:
        pos_element = num_leaves + int(idx)
        for _ in range(depth):
            if (pos_element ^ 1) in visited:
                break
            visited.add(pos_element ^ 1)
            count += 1
            pos_element //= 2
            visited.add(pos_element)
    return count


__all__ = [
    "MerkleTree", "build_from_digests", "commit_fields",
    "commit_fields_chained", "open_leaf", "open_leaves", "verify_leaf",
    "verify_leaves_batch", "dedup_path_size",
    "BatchMerkleTree", "batch_build_from_digests", "batch_commit_fields",
    "batch_open_leaves", "batch_verify_leaves",
]
