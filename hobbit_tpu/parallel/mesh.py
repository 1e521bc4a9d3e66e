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


__all__ = ["make_mesh", "chunk_sharding", "row_sharding", "replicated", "P"]
