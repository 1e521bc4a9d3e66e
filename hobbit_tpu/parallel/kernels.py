"""Sharded protocol kernels: the multi-chip compute path.

Maps the SURVEY section-2.5 scaling axes onto the mesh:

* fold-phase chunk terms — the B-sized dot products against the shared
  beta table shard over every device (dp x tp flattened); XLA inserts one
  psum per term (ICI-resident).  The 2-scalar MiMC absorb between chunks
  stays sequential by design (reference sumcheck.cpp:843-857) — chunks are
  large, so the chain is negligible.
* batched tensor encodes — chunk batch shards over dp, codeword rows over
  tp (row FFTs are independent; the column encode reshards via all-gather).
* Merkle leaf hashing — leaves shard over all devices.

Every kernel is a jit-compiled function closed over a Mesh; inputs are
annotated with NamedSharding so running the SAME code single-chip or on a
pod slice only changes the mesh.
"""

from __future__ import annotations

import functools
from typing import Callable

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import blake3
from ..ops import encode as enc
from ..ops import field as F
from ..ops import poly
from . import mesh as meshmod


def _flat(mesh: Mesh) -> tuple:
    return ("dp", "tp")


def sharded_chunk_terms(mesh: Mesh) -> Callable:
    """Fold-phase gate-consistency chunk terms with the B axis sharded
    over every device.  Returns fn(beta, folds, cur) -> [7, 2]."""
    from ..core import gate_consistency as gc

    vec = NamedSharding(mesh, P(("dp", "tp"), None))
    stk = NamedSharding(mesh, P(None, ("dp", "tp"), None))

    @functools.partial(jax.jit,
                       in_shardings=(vec, stk, stk),
                       out_shardings=NamedSharding(mesh, P()))
    def terms(beta, folds_flat, cur_flat):
        folds = {a: folds_flat[i] for i, a in
                 enumerate(("L", "R", "O", "sa", "sm", "M"))}
        cur = {a: cur_flat[i] for i, a in
               enumerate(("L", "R", "O", "sa", "sm", "M"))}
        return gc._chunk_terms(beta, folds, cur)

    def fn(beta, folds: dict, cur: dict):
        ff = jnp.stack([folds[a] for a in ("L", "R", "O", "sa", "sm", "M")])
        cf = jnp.stack([cur[a] for a in ("L", "R", "O", "sa", "sm", "M")])
        return terms(beta, ff, cf)

    return fn


def sharded_tensor_encode(mesh: Mesh, spec: enc.TensorCodeSpec) -> Callable:
    """Batched chunk tensor-encode: [K, B, 2] chunks sharded over dp,
    output codeword rows sharded over tp."""
    in_s = NamedSharding(mesh, P("dp", None, None))
    out_s = NamedSharding(mesh, P("dp", "tp", None, None))

    @functools.partial(jax.jit, in_shardings=(in_s,), out_shardings=out_s)
    def encode(chunks):
        return enc.tensor_encode(spec, chunks)

    return encode


def sharded_leaf_hash(mesh: Mesh) -> Callable:
    """[n, 4, 2] field leaf groups -> [n, 8] digests, n sharded over all
    devices.  Uses shard_map: the BLAKE3 graph is a large unrolled
    elementwise program and per-shard tracing avoids the global SPMD
    propagation pass (which chokes on it)."""
    from jax.experimental.shard_map import shard_map

    fn = shard_map(blake3.hash_field_leaves, mesh=mesh,
                   in_specs=P(("dp", "tp"), None, None),
                   out_specs=P(("dp", "tp"), None))
    return jax.jit(fn)


def sharded_beta_dot(mesh: Mesh) -> Callable:
    """<beta, v> with both vectors sharded over every device (the inner
    reduction of aggregation passes); XLA lowers the sum to one psum."""
    vec = NamedSharding(mesh, P(("dp", "tp"), None))

    @functools.partial(jax.jit, in_shardings=(vec, vec),
                       out_shardings=NamedSharding(mesh, P()))
    def dot(beta, v):
        return F.fdot(beta, v)

    return dot


def sharded_fold_absorb(mesh: Mesh) -> Callable:
    """One fold update folds += w * cur for a dict of streams, sharded on
    the B axis (pure elementwise — no collectives)."""
    vec = NamedSharding(mesh, P(None, ("dp", "tp"), None))

    @functools.partial(jax.jit, in_shardings=(vec, vec, None),
                       out_shardings=vec)
    def absorb(folds, cur, w):
        return F.fadd(folds, F.fmul(w[None, None, :], cur))

    return absorb


__all__ = ["sharded_chunk_terms", "sharded_tensor_encode",
           "sharded_leaf_hash", "sharded_beta_dot", "sharded_fold_absorb"]
