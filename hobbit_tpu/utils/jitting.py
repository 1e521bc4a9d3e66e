"""Default-on jit wrapper, keyed by the active device mesh.

Protocol provers/verifiers are pure functions of statically-shaped arrays
and are jitted end-to-end by default.  Since the round chains, Merkle
levels, FFT stages, and transcript hashes all run as ``lax.scan``s, the
lowered graphs are small and compile in seconds on XLA:CPU — AND the
scans make *eager* execution pathological (an eager ``lax.scan`` re-traces
its fresh-closure body on every call), so jit is now the fast path for
unit tests too.  Set HOBBIT_JIT=0 to run eagerly for op-level debugging.

Kernels annotate sharding via ``parallel.mesh.shard_leading``, which reads
the ambient mesh at TRACE time; the wrapper therefore passes the active
mesh's descriptor as a leading static argument so that meshed and
unmeshed traces (or different meshes) get distinct cache entries instead
of silently reusing each other's executables.
"""

import functools
import os

import jax

JIT_ENABLED = os.environ.get("HOBBIT_JIT", "1") != "0"


def _mesh_key():
    from ..parallel import mesh as meshmod
    return meshmod.mesh_key()


def _fresh_clone(fn):
    """A distinct function object delegating to ``fn`` (same signature via
    functools.wraps, which jax's argument resolution follows).  JAX's
    trace cache is keyed by function identity — without a fresh clone per
    mesh key, the first trace (say, unmeshed) would be silently reused
    for every later mesh context."""

    @functools.wraps(fn)
    def clone(*args, **kws):
        return fn(*args, **kws)

    return clone


def maybe_jit(fn=None, **kwargs):
    if fn is None:
        return functools.partial(maybe_jit, **kwargs)
    if not JIT_ENABLED:
        return fn
    jits = {}

    @functools.wraps(fn)
    def wrapper(*args, **kws):
        key = _mesh_key()
        jitted = jits.get(key)
        if jitted is None:
            jitted = jits[key] = jax.jit(_fresh_clone(fn), **kwargs)
        return jitted(*args, **kws)

    return wrapper
