"""Sharded REAL-prover kernels on the 8-device virtual CPU mesh.

Two pins per kernel: (a) outputs bit-identical to the single-device run,
(b) the compiled HLO contains exactly the collectives the design calls
for (SURVEY section 2.5; SCALING.md is generated from the same probes by
`scripts/scaling_report.py`) — reductions cross chips, elementwise state
does not.
"""

import numpy as np
import jax
import jax.numpy as jnp

from hobbit_tpu.core import gate_consistency as gc
from hobbit_tpu.ops import encode as enc
from hobbit_tpu.ops import field as F
from hobbit_tpu.ops import mimc
from hobbit_tpu.parallel import mesh as meshmod


def _rf(rng, *shape):
    re = rng.integers(0, F.P, size=shape, dtype=np.uint64)
    im = rng.integers(0, F.P, size=shape, dtype=np.uint64)
    return jnp.stack([jnp.asarray(re), jnp.asarray(im)], axis=-1)


def _collectives(fn, *args):
    import re as _re
    text = jax.jit(fn).lower(*args).compile().as_text()
    out = {}
    for c in ("all-reduce", "all-gather", "reduce-scatter", "all-to-all",
              "collective-permute"):
        n = len(_re.findall(rf"\b{c}(?:-start|-done)?\(", text))
        out[c] = n - len(_re.findall(rf"\b{c}-start\(", text))
    return out


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8
    m = meshmod.make_mesh(8)
    assert m.shape == {"dp": 4, "tp": 2}


def test_meshed_chunk_step_matches_and_reduces_once():
    """The fold-phase chunk step (the kernel `core/prover.py` dispatches
    per streamed chunk) under the mesh: bit-identical terms/state, and the
    7 B-sized dot products fuse into ONE all-reduce."""
    rng = np.random.default_rng(0)
    m = meshmod.make_mesh(8)
    B = 64
    beta = _rf(rng, B)
    names = ("L", "R", "O", "sa", "sm", "M")
    folds = {a: _rf(rng, B) for a in names}
    cur = {a: _rf(rng, B) for a in names}
    C = jnp.zeros((3, 2), jnp.uint64)
    state = mimc.fresh_state()

    want = gc._chunk_step(beta, folds, cur, C, state)
    with meshmod.use_mesh(m):
        got = gc._chunk_step(beta, folds, cur, C, state)
        cols = _collectives(
            lambda b, f, c, C, s: gc._chunk_step(b, f, c, C, s),
            beta, folds, cur, C, state)
    for w, g in zip(jax.tree_util.tree_leaves(want),
                    jax.tree_util.tree_leaves(got)):
        assert bool(jnp.all(w == g))
    assert cols["all-reduce"] >= 1
    assert cols["all-gather"] == 0
    assert cols["collective-permute"] == 0


def test_meshed_tensor_encode_matches():
    """The elastic-commit encode path with the chunk sharded on its
    leading axis (pc/elastic.py:122)."""
    rng = np.random.default_rng(1)
    m = meshmod.make_mesh(8)
    spec = enc.make_tensor_spec(64, 8, linear_time=False)
    chunk = _rf(rng, 64)
    want = enc.tensor_encode(spec, chunk)
    with meshmod.use_mesh(m):
        got = jax.jit(
            lambda ch: enc.tensor_encode(spec, meshmod.shard_leading(ch))
        )(chunk)
    assert bool(jnp.all(got == want))


def test_meshed_fold_update_no_collectives():
    """Negative control: the elementwise fold update must compile with
    ZERO collectives under the mesh — sharding constraints alone add no
    communication."""
    rng = np.random.default_rng(3)
    m = meshmod.make_mesh(8)
    f, c = _rf(rng, 128), _rf(rng, 128)
    w = _rf(rng)

    def upd(f, c, w):
        return F.fadd(meshmod.shard_leading(f),
                      F.fmul(w[None, :], meshmod.shard_leading(c)))

    with meshmod.use_mesh(m):
        cols = _collectives(upd, f, c, w)
        got = upd(f, c, w)
    assert sum(cols.values()) == 0
    assert bool(jnp.all(got == F.fadd(f, F.fmul(w[None, :], c))))


def test_four_step_fft_sharded_matches():
    """Four-step (Bailey) FFT under the virtual mesh: the column->row
    resharding boundary is the cross-chip all-to-all (SURVEY section 2.5);
    results are bit-identical to the single-device radix-2 FFT."""
    from hobbit_tpu.ops import fft as fftm

    rng = np.random.default_rng(12)
    v = _rf(rng, 1 << 10)
    want = np.asarray(fftm.fft(v))
    mesh = meshmod.make_mesh(len(jax.devices()))
    with meshmod.use_mesh(mesh):
        got = np.asarray(fftm.fft_four_step(v))
        got_inv = np.asarray(fftm.fft_four_step(v, True))
    assert np.array_equal(want, got)
    assert np.array_equal(np.asarray(fftm.ifft(v)), got_inv)
