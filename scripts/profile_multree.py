"""Drill-down: why is the in-memory mul_tree / elastic open slow on TPU?"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("HOBBIT_JIT", "1")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)
_CACHE = os.environ.get(
    "HOBBIT_XLA_CACHE",
    os.path.join(os.path.expanduser("~"), ".cache", "hobbit_tpu_xla"))
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from hobbit_tpu.core import mul_tree, sumcheck as sc
from hobbit_tpu.ops import field as F, mimc

rng = np.random.default_rng(0)


def rf(*shape):
    re = rng.integers(0, F.P, size=shape, dtype=np.uint64)
    im = rng.integers(0, F.P, size=shape, dtype=np.uint64)
    return jnp.stack([jnp.asarray(re), jnp.asarray(im)], axis=-1)


def t(label, fn, *a):
    t0 = time.perf_counter()
    out = fn(*a)
    jax.block_until_ready(out)
    dt0 = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = fn(*a)
    jax.block_until_ready(out)
    dt1 = time.perf_counter() - t0
    print(f"  {label:44s} cold {dt0:7.2f}s  warm {dt1:7.2f}s", flush=True)
    return out


state = mimc.fresh_state()

# single 3-product sumchecks at growing sizes
for lb in (14, 16, 18):
    n = 1 << lb
    a, b, c = rf(n), rf(n), rf(n)
    t(f"prove_3product 2^{lb}", lambda: sc.prove_3product(a, b, c, state))

# MiMC squeeze chain alone
def sq(k):
    s = state
    outs = []
    for _ in range(k):
        s, r = mimc.squeeze1(s)
        outs.append(r)
    return jnp.stack(outs)

t("mimc.squeeze1 x 20 (eager chain)", lambda: sq(20))

# full in-memory mul_tree over 4 x 2^18 (the wiring top config)
rows = [rf(1 << 18) for _ in range(4)]
t("mul_tree.prove 4 x 2^18", lambda: mul_tree.prove(rows, state))

# elastic open breakdown
from hobbit_tpu.pc import standard as pc, elastic
N4 = 1 << 22
wpoly = rf(N4)
params = pc.make_params(N4, 8, 256, linear_time=False, queries=64)
com = t("elastic.commit_stream 2^22", lambda: elastic.commit_stream(
    lambda i: wpoly[i * params.B:(i + 1) * params.B], params))
pt = rf(22)
t("elastic.open_stream 2^22", lambda: elastic.open_stream(
    lambda i: wpoly[i * params.B:(i + 1) * params.B], com, pt, state))
print("done")
