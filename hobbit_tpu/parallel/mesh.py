"""Device-mesh helpers for the sharded prover.

The reference is single-process (OpenMP + 2 pthreads); the TPU build scales
over a ``jax.sharding.Mesh`` with two axes (SURVEY.md section 2.5):

* ``dp`` — data-parallel over stream CHUNKS: per-chunk error terms, partial
  evaluations and witness generation are independent; psum combines the
  segmented reductions (the fold-phase K-terms are exactly a segmented
  reduction over the chunk axis).
* ``tp`` — "tensor"-parallel over CODEWORD ROWS / Merkle leaves: row FFTs
  and column encodes shard by row; XLA inserts all-gathers for the
  column-encode resharding boundary (ICI-resident when dp*tp fits a slice).
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    devs = devs[:n]
    if n % 2 == 0 and n > 2:
        arr = np.array(devs).reshape(n // 2, 2)
        return Mesh(arr, axis_names=("dp", "tp"))
    arr = np.array(devs).reshape(n, 1)
    return Mesh(arr, axis_names=("dp", "tp"))


def chunk_sharding(mesh: Mesh) -> NamedSharding:
    """[K, B, 2] chunk tensors: shard the chunk axis over dp."""
    return NamedSharding(mesh, P("dp", None, None))


def row_sharding(mesh: Mesh) -> NamedSharding:
    """[rows, cols, 2] codeword tensors: shard rows over tp."""
    return NamedSharding(mesh, P("tp", None, None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# ---------------------------------------------------------------------------
# Active-mesh context: the real prover's kernels call ``shard_leading`` on
# their big per-chunk arrays; with a mesh active the leading axis is
# sharded over every device (XLA inserts the psum/all-gather collectives at
# the reduction/reshape boundaries), without one they are no-ops — the SAME
# driver code runs single-chip or on a slice.
# ---------------------------------------------------------------------------

import contextlib

_ACTIVE: Mesh | None = None
_KEY = None          # hashable descriptor of _ACTIVE (jit cache key part)


def active() -> Mesh | None:
    return _ACTIVE


def mesh_key():
    """Hashable descriptor of the active mesh (None when unmeshed) —
    part of every maybe_jit cache key so meshed and unmeshed traces
    never reuse each other's executables."""
    return _KEY


def _descr(mesh: Mesh):
    return (tuple(mesh.axis_names), tuple(mesh.devices.shape),
            tuple(int(d.id) for d in mesh.devices.flat))


@contextlib.contextmanager
def use_mesh(mesh: Mesh):
    """Activate a mesh for the enclosed prover calls.

    NOTE: jitted kernels trace the constraint in, so a process should
    either run meshed or unmeshed (toggling re-traces via the epoch salt
    in the jit cache keys of the fold kernels)."""
    global _ACTIVE, _KEY
    prev, prev_key = _ACTIVE, _KEY
    _ACTIVE = mesh
    _KEY = _descr(mesh)
    # deliberately NOT entering `with mesh:` — an ambient mesh makes EVERY
    # jit partition for all devices (minutes-long compiles for kernels
    # that gain nothing); the explicit NamedSharding constraints in
    # shard_leading carry the mesh themselves, so only the annotated
    # kernels are laid out across devices.
    try:
        yield mesh
    finally:
        _ACTIVE = prev
        _KEY = prev_key


def shard_leading(x):
    """Shard axis 0 over all mesh devices (identity without a mesh or when
    the axis does not divide)."""
    m = _ACTIVE
    if m is None:
        return x
    total = int(np.prod([m.shape[a] for a in m.axis_names]))
    if x.ndim == 0 or x.shape[0] % total:
        return x
    spec = P(tuple(m.axis_names),) + (None,) * (x.ndim - 1)
    return jax.lax.with_sharding_constraint(x, NamedSharding(m, spec))


__all__ = ["make_mesh", "chunk_sharding", "row_sharding", "replicated",
           "P", "use_mesh", "active", "shard_leading"]
