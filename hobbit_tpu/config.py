"""Global protocol parameters.

Mirrors the reference's compile-time constants (``parameter.h``,
``constants.h``) and mutable globals (``main.cpp:28-74``), but as an explicit
config object threaded through the API instead of process globals.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class CodeParams:
    """Linear-code parameters (reference ``src/parameter.h``)."""

    target_distance: float = 0.07
    rs_rate: int = 2
    alpha: float = 0.211
    beta: float = 0.1205
    r: float = 1.72
    cn: int = 9          # column (C-matrix) expander degree
    dn: int = 12         # D-matrix expander degree
    column_size: int = 128
    distance_threshold: int = 13  # int(1/0.07) - 1

    # Query counts for the tensor-code PCs (reference Elastic_PC.cpp:626-629,
    # Our_PC.cpp:609-612).
    queries_rs: int = 700
    queries_rs_standard: int = 790
    queries_spielman: int = 5900


@dataclasses.dataclass(frozen=True)
class HobbitConfig:
    """Top-level prover configuration.

    buffer_bits: log2 of BUFFER_SPACE, the number of field elements resident
      during streaming proving (reference ``main.cpp`` argv[2]).
    """

    buffer_bits: int = 16
    code: CodeParams = dataclasses.field(default_factory=CodeParams)
    linear_time: bool = False  # Spielman columns (True) vs RS columns (False)
    recursion: bool = True
    mimc_rounds: int = 161
    shockwave_queries: int = 240
    whir_interleave_bits: int = 4   # 2^k = 16 interleaving
    # PC query schedule: None = the reference schedule (700 streaming-RS /
    # 5900 Spielman, Elastic_PC.cpp:626-629); tests override with small
    # values for speed.
    pc_queries: int = None
    # Distance-batched mul-tree descent (reference distance=5,
    # main.cpp -> sumcheck.cpp:1014-1621): 0 = plain per-level descent,
    # >0 = batch the bottom levels `mt_distance` at a time with Elastic
    # commitments binding the batch boundaries.  Default matches the
    # reference's 5; the driver automatically falls back to the plain
    # descent when log2(N/(2B)) < 2*distance (flagship 2^17 stays plain,
    # 2^24+ traces batch), and degrades to the largest divisor of the
    # level count when 5 does not divide it.
    mt_distance: int = 5
    # Commit + open the circuit-description polynomial (cpoly) as part of
    # the proof.  True mirrors the reference's prove_arbitrary_circuit
    # (main.cpp:812-852: fun 1/7/8 commit the 16N circuit stream); False
    # mirrors prove_circuit (main.cpp:862-983: the verifier KNOWS the
    # circuit and evaluates its description polynomials itself — the
    # headline fun-6 benchmark path), dropping the largest multi-open from
    # the proof entirely.
    committed_circuit: bool = True

    def resolved_pc_queries(self) -> int:
        if self.pc_queries is not None:
            return self.pc_queries
        return (self.code.queries_spielman if self.linear_time
                else self.code.queries_rs)

    @property
    def buffer_space(self) -> int:
        return 1 << self.buffer_bits

    @property
    def tensor_row_size(self) -> int:
        # reference Elastic_PC.cpp:728-734: BUFFER_SPACE / 2^11
        return max(self.buffer_space >> 11, 2)


DEFAULT = HobbitConfig()
