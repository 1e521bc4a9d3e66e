"""Opt-in jit wrapper.

Protocol provers/verifiers are pure functions of statically-shaped arrays,
so they can be jitted end-to-end; but the unrolled round chains are large
graphs and XLA:CPU compile time dominates small unit tests.  ``maybe_jit``
applies ``jax.jit`` only when HOBBIT_JIT=1 (set by bench.py and production
entry points); tests run eagerly, where each primitive op is still compiled
and cached by shape.
"""

import functools
import os

import jax

JIT_ENABLED = os.environ.get("HOBBIT_JIT", "0") == "1"


def maybe_jit(fn=None, **kwargs):
    if fn is None:
        return functools.partial(maybe_jit, **kwargs)
    if JIT_ENABLED:
        return jax.jit(fn, **kwargs)
    return fn
