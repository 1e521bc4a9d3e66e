"""HOBBIT-TPU: a TPU-native space-efficient zkSNARK prover framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
C++ prover ``pigeon`` (HOBBIT: Space-Efficient zkSNARK with Optimal Prover
Time).  The compute path is pure JAX (jit/scan/pjit + Pallas kernels); the
streaming witness substrate is a chunked re-execution oracle instead of a
producer pthread; OpenMP/AVX2 hot loops become vectorized array ops on the
TPU VPU/MXU; cross-chip scaling uses ``jax.sharding`` collectives.

Layer map (mirrors SURVEY.md section 1):
  ops/      L1-L3: field, FFT, MiMC, BLAKE3, Merkle, beta tables, codes
  streams/  L4: streaming witness substrate (trace oracle + named views)
  core/     L5: sumcheck engine (in-memory + streaming fold-phase)
  pc/       L6: polynomial commitments (tensor-code, Brakedown, shockwave,
            WHIR, FRI, Elastic streaming PC)
  gkr/      L5/L7: layered-circuit GKR paths + circuit DSL
  models/   L7: workload circuits (fun 1-9: arbitrary, lookups, SHA, AES,
            SQL range query, MLP inference)
  parallel/ device-mesh sharding of chunk folds / codeword rows / Merkle
  runtime/  native C++ trace producer (ring-buffer witness oracle)

The 61-bit Mersenne quadratic-extension field needs 64-bit integer ops, so
importing this package enables jax x64 mode.
"""

import jax as _jax

_jax.config.update("jax_enable_x64", True)

__version__ = "0.1.0"
