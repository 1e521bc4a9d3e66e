"""Reed-Solomon and tensor-code encoders.

The PC treats messages as polynomial *coefficients*: the RS codeword of a
length-m row is FFT_{2m}(row ‖ 0) — evaluations of the degree-<m polynomial
on the size-2m subgroup (reference ``_compute_tensorcode`` calls ``_fft``
on the zero-padded buffer directly, PC_utils.cpp:22-39; no IFFT first).

Tensor code: message N = rows x cols laid out row-major; rows RS-extended
x2 via FFT, then every extended column encoded x2 — with RS again
(rs mode) or the Spielman expander code zero-padded from ~1.72*rows to
2*rows (linear_time mode).  Output [2*rows, 2*cols].

Both stages are batched FFTs / batched expander spmv — large uniform tensor
ops for the TPU.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np

import jax.numpy as jnp

from . import expanders
from . import fft as fftm
from . import field as F


def rs_encode(rows):
    """[..., m, 2] coefficient rows -> [..., 2m, 2] codeword rows."""
    m = rows.shape[-2]
    pad = jnp.zeros(rows.shape[:-2] + (m, 2), dtype=rows.dtype)
    padded = jnp.concatenate([rows, pad], axis=-2)
    flat = padded.reshape((-1,) + padded.shape[-2:])
    out = fftm._batch_fft(flat, inverse=False)
    return out.reshape(rows.shape[:-2] + (2 * m, 2))


def spielman_encode_padded(code: expanders.SpielmanCode, cols):
    """Encode columns [..., n, 2] -> [..., 2n, 2] (zero-padded past r*n)."""
    cw = expanders.encode(code, cols)
    pad = 2 * code.n - cw.shape[-2]
    assert pad >= 0, "codeword longer than 2n; rate parameters inconsistent"
    if pad:
        z = jnp.zeros(cw.shape[:-2] + (pad, 2), dtype=cw.dtype)
        cw = jnp.concatenate([cw, z], axis=-2)
    return cw


class TensorCodeSpec(NamedTuple):
    rows: int                 # tensor_row_size
    cols: int                 # N / rows
    linear_time: bool
    col_code: Optional[expanders.SpielmanCode]   # set when linear_time


def make_tensor_spec(N: int, rows: int, linear_time: bool,
                     seed: int = 666) -> TensorCodeSpec:
    assert N % rows == 0
    col_code = expanders.build_code(rows, seed=seed) if linear_time else None
    return TensorCodeSpec(rows=rows, cols=N // rows,
                          linear_time=linear_time, col_code=col_code)


def tensor_encode(spec: TensorCodeSpec, message):
    """message [..., N, 2] -> tensor codeword [..., 2*rows, 2*cols, 2]."""
    lead = message.shape[:-2]
    mat = message.reshape(lead + (spec.rows, spec.cols, 2))
    ext_rows = rs_encode(mat)                       # [..., rows, 2c, 2]
    cols_first = jnp.moveaxis(ext_rows, -3, -2)     # [..., 2c, rows, 2]
    if spec.linear_time:
        ext_cols = spielman_encode_padded(spec.col_code, cols_first)
    else:
        ext_cols = rs_encode(cols_first)            # [..., 2c, 2r, 2]
    return jnp.moveaxis(ext_cols, -2, -3)           # [..., 2r, 2c, 2]


__all__ = ["rs_encode", "spielman_encode_padded", "TensorCodeSpec",
           "make_tensor_spec", "tensor_encode"]
