"""SHA-256 as a lookup-table circuit (the reference's fun 4).

The reference arithmetizes SHA-256 with byte-granular lookup tables
(``SHA256/compute_hash``, Seval.cpp:689-955).  Here every 32-bit word is
four byte wires; the circuit uses 2^16-keyed tables:

  XOR / AND / ANDN      bitwise byte pairs
  LOW / HIGH            byte + carry split of small sums (add mod 2^32)
  ROTs (s=1..7)         cross-byte rotate parts: (a >> s) | (b << (8-s))

Rotations by multiples of 8 are free wire permutations.  All message
blocks are processed in lock-step (one level spans every block), so the
trace levels are wide and vectorize on the VPU.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

from ..ops import field as F
from ..streams import trace as trc
from . import circuits as C

_K = [
    0x428A2F98, 0x71374491, 0xB5C0FBCF, 0xE9B5DBA5, 0x3956C25B, 0x59F111F1,
    0x923F82A4, 0xAB1C5ED5, 0xD807AA98, 0x12835B01, 0x243185BE, 0x550C7DC3,
    0x72BE5D74, 0x80DEB1FE, 0x9BDC06A7, 0xC19BF174, 0xE49B69C1, 0xEFBE4786,
    0x0FC19DC6, 0x240CA1CC, 0x2DE92C6F, 0x4A7484AA, 0x5CB0A9DC, 0x76F988DA,
    0x983E5152, 0xA831C66D, 0xB00327C8, 0xBF597FC7, 0xC6E00BF3, 0xD5A79147,
    0x06CA6351, 0x14292967, 0x27B70A85, 0x2E1B2138, 0x4D2C6DFC, 0x53380D13,
    0x650A7354, 0x766A0ABB, 0x81C2C92E, 0x92722C85, 0xA2BFE8A1, 0xA81A664B,
    0xC24B8B70, 0xC76C51A3, 0xD192E819, 0xD6990624, 0xF40E3585, 0x106AA070,
    0x19A4C116, 0x1E376C08, 0x2748774C, 0x34B0BCB5, 0x391C0CB3, 0x4ED8AA4A,
    0x5B9CCA4F, 0x682E6FF3, 0x748F82EE, 0x78A5636F, 0x84C87814, 0x8CC70208,
    0x90BEFFFA, 0xA4506CEB, 0xBEF9A3F7, 0xC67178F2,
]
_IV = [0x6A09E667, 0xBB67AE85, 0x3C6EF372, 0xA54FF53A,
       0x510E527F, 0x9B05688C, 0x1F83D9AB, 0x5BE0CD19]


def _tables():
    """Table list + name -> id mapping."""
    n = 256
    a = np.arange(n)
    tabs: Dict[str, np.ndarray] = {}
    tabs["xor"] = (a[:, None] ^ a[None, :]).T.reshape(-1).astype(np.uint64)
    tabs["and"] = (a[:, None] & a[None, :]).T.reshape(-1).astype(np.uint64)
    # key = e + 256*g -> (~e) & g: flat[g*256 + e] = g & ~e
    tabs["andn"] = (a[:, None] & (~a[None, :]) & 0xFF).reshape(-1).astype(np.uint64)
    # key = lo + 256*hi: value tables for sums up to 1023 (lo in [0,255],
    # hi in [0,3] encodes the sum's high bits)
    k = np.arange(1 << 16)
    tabs["low"] = (k & 0xFF).astype(np.uint64)
    tabs["high"] = ((k >> 8) & 0xFF).astype(np.uint64)
    for s in range(1, 8):
        # key = a + 256*b -> (a >> s) | ((b << (8-s)) & 0xFF)
        av = (k & 0xFF) >> s
        bv = ((k >> 8) << (8 - s)) & 0xFF
        tabs[f"rot{s}"] = (av | bv).astype(np.uint64)
    names = list(tabs.keys())
    return [tabs[nm] for nm in names], {nm: i for i, nm in enumerate(names)}


class Sha256Builder:
    """Byte-sliced word helpers on top of the levelized Builder.

    Words are little-endian lists of 4 byte-wire arrays, each array shaped
    [blocks] (one wire per parallel message block).
    """

    def __init__(self, blocks: int):
        tables, self.tid = _tables()
        # inputs: 16 words x 4 bytes per block + one constant-zero wire +
        # constant wires for K and IV bytes
        self.blocks = blocks
        n_msg = blocks * 64
        n_const = 1 + len(_K) * 4 + len(_IV) * 4
        self.b = C.Builder(num_inputs=n_msg + n_const, tables=tables)
        self.zero = np.full(blocks, n_msg, dtype=np.int64)
        kbase = n_msg + 1
        self.k_bytes = [[np.full(blocks, kbase + 4 * i + j, dtype=np.int64)
                         for j in range(4)] for i in range(len(_K))]
        ivbase = kbase + len(_K) * 4
        self.iv_bytes = [[np.full(blocks, ivbase + 4 * i + j, dtype=np.int64)
                          for j in range(4)] for i in range(len(_IV))]
        self.msg_words = [
            [np.arange(blocks, dtype=np.int64) * 64 + 4 * w + j
             for j in range(4)]
            for w in range(16)
        ]

    def inputs(self, block_words: np.ndarray):
        """block_words: [blocks, 16] uint32 -> input field array."""
        vals = np.zeros(self.b.num_inputs, dtype=np.uint64)
        for blk in range(self.blocks):
            for w in range(16):
                word = int(block_words[blk, w])
                for j in range(4):
                    vals[blk * 64 + 4 * w + j] = (word >> (8 * j)) & 0xFF
        base = self.blocks * 64 + 1
        for i, kv in enumerate(_K):
            for j in range(4):
                vals[base + 4 * i + j] = (kv >> (8 * j)) & 0xFF
        base += len(_K) * 4
        for i, hv in enumerate(_IV):
            for j in range(4):
                vals[base + 4 * i + j] = (hv >> (8 * j)) & 0xFF
        return F.make(vals, np.zeros_like(vals))

    # --- byte/word ops ----------------------------------------------------
    def lut(self, name, a, b):
        return self.b.lookup(self.tid[name], a, b)

    def xor_w(self, x, y):
        return [self.lut("xor", x[j], y[j]) for j in range(4)]

    def and_w(self, x, y):
        return [self.lut("and", x[j], y[j]) for j in range(4)]

    def andn_w(self, x, y):
        return [self.lut("andn", x[j], y[j]) for j in range(4)]

    def add_w(self, x, y):
        """32-bit modular add via byte adds + carry lookups."""
        out = []
        carry = None
        for j in range(4):
            s = self.b.add(x[j], y[j])
            if carry is not None:
                s = self.b.add(s, carry)
            low = self.lut("low", s, self.zero)
            carry = self.lut("high", s, self.zero)
            out.append(low)
        return out

    def rotr_w(self, x, r):
        """Rotate right by r bits."""
        q, s = (r // 8) % 4, r % 8
        rot = [x[(j + q) % 4] for j in range(4)]      # byte rotation
        if s == 0:
            return rot
        return [self.lut(f"rot{s}", rot[j], rot[(j + 1) % 4])
                for j in range(4)]

    def shr_w(self, x, r):
        """Logical shift right by r bits (high bytes fill with zero)."""
        q, s = r // 8, r % 8
        shifted = [x[j + q] if j + q < 4 else self.zero for j in range(4)]
        if s == 0:
            return shifted
        out = []
        for j in range(4):
            nxt = shifted[j + 1] if j + 1 < 4 else self.zero
            out.append(self.lut(f"rot{s}", shifted[j], nxt))
        return out


def build(blocks_log2: int = 0, rounds: int = 64):
    """SHA-256 compression over 2^blocks_log2 blocks in parallel.

    Returns (program, digest_labels) where digest_labels[i][j] is the
    [blocks]-shaped wire-label array of output word i's byte j."""
    blocks = 1 << blocks_log2
    sb = Sha256Builder(blocks)
    w = list(sb.msg_words)
    for t in range(16, rounds):
        s0 = sb.xor_w(sb.xor_w(sb.rotr_w(w[t - 15], 7),
                               sb.rotr_w(w[t - 15], 18)),
                      sb.shr_w(w[t - 15], 3))
        s1 = sb.xor_w(sb.xor_w(sb.rotr_w(w[t - 2], 17),
                               sb.rotr_w(w[t - 2], 19)),
                      sb.shr_w(w[t - 2], 10))
        w.append(sb.add_w(sb.add_w(w[t - 16], s0),
                          sb.add_w(w[t - 7], s1)))

    a, b_, c, d, e, f, g, h = [sb.iv_bytes[i] for i in range(8)]
    for t in range(rounds):
        S1 = sb.xor_w(sb.xor_w(sb.rotr_w(e, 6), sb.rotr_w(e, 11)),
                      sb.rotr_w(e, 25))
        ch = sb.xor_w(sb.and_w(e, f), sb.andn_w(e, g))
        t1 = sb.add_w(sb.add_w(sb.add_w(h, S1), sb.add_w(ch, sb.k_bytes[t])),
                      w[t])
        S0 = sb.xor_w(sb.xor_w(sb.rotr_w(a, 2), sb.rotr_w(a, 13)),
                      sb.rotr_w(a, 22))
        maj = sb.xor_w(sb.xor_w(sb.and_w(a, b_), sb.and_w(a, c)),
                       sb.and_w(b_, c))
        t2 = sb.add_w(S0, maj)
        h, g, f = g, f, e
        e = sb.add_w(d, t1)
        d, c, b_ = c, b_, a
        a = sb.add_w(t1, t2)

    digest = [sb.add_w(v, sb.iv_bytes[i])
              for i, v in enumerate((a, b_, c, d, e, f, g, h))]
    return sb.b.build(), digest


def reference_digest(block_words: np.ndarray) -> List[int]:
    """Pure-python SHA-256 compression of one 16-word block (no padding)."""
    import hashlib
    import struct
    # single full compression of the raw 64-byte block with the standard IV
    # == hashlib on the raw block only if we stop before padding; emulate
    # compression directly instead:
    w = [int(x) for x in block_words]
    for t in range(16, 64):
        x = w[t - 15]
        s0 = (_ror(x, 7) ^ _ror(x, 18) ^ (x >> 3))
        x = w[t - 2]
        s1 = (_ror(x, 17) ^ _ror(x, 19) ^ (x >> 10))
        w.append((w[t - 16] + s0 + w[t - 7] + s1) & 0xFFFFFFFF)
    a, b, c, d, e, f, g, h = _IV
    for t in range(64):
        S1 = _ror(e, 6) ^ _ror(e, 11) ^ _ror(e, 25)
        ch = (e & f) ^ (~e & g)
        t1 = (h + S1 + ch + _K[t] + w[t]) & 0xFFFFFFFF
        S0 = _ror(a, 2) ^ _ror(a, 13) ^ _ror(a, 22)
        maj = (a & b) ^ (a & c) ^ (b & c)
        t2 = (S0 + maj) & 0xFFFFFFFF
        h, g, f, e = g, f, e, (d + t1) & 0xFFFFFFFF
        d, c, b, a = c, b, a, (t1 + t2) & 0xFFFFFFFF
    return [(x + y) & 0xFFFFFFFF for x, y in zip((a, b, c, d, e, f, g, h),
                                                 _IV)]


def _ror(x, r):
    return ((x >> r) | (x << (32 - r))) & 0xFFFFFFFF


__all__ = ["Sha256Builder", "build", "reference_digest"]


# ---------------------------------------------------------------------------
# GKR input-vector witness generator (the reference's mod==2 input mode)
# ---------------------------------------------------------------------------

_H0 = np.array([0x6a09e667, 0xbb67ae85, 0x3c6ef372, 0xa54ff53a,
                0x510e527f, 0x9b05688c, 0x1f83d9ab, 0x5be0cd19],
               dtype=np.uint64)
_K256 = np.array([
    0x428a2f98, 0x71374491, 0xb5c0fbcf, 0xe9b5dba5, 0x3956c25b, 0x59f111f1,
    0x923f82a4, 0xab1c5ed5, 0xd807aa98, 0x12835b01, 0x243185be, 0x550c7dc3,
    0x72be5d74, 0x80deb1fe, 0x9bdc06a7, 0xc19bf174, 0xe49b69c1, 0xefbe4786,
    0x0fc19dc6, 0x240ca1cc, 0x2de92c6f, 0x4a7484aa, 0x5cb0a9dc, 0x76f988da,
    0x983e5152, 0xa831c66d, 0xb00327c8, 0xbf597fc7, 0xc6e00bf3, 0xd5a79147,
    0x06ca6351, 0x14292967, 0x27b70a85, 0x2e1b2138, 0x4d2c6dfc, 0x53380d13,
    0x650a7354, 0x766a0abb, 0x81c2c92e, 0x92722c85, 0xa2bfe8a1, 0xa81a664b,
    0xc24b8b70, 0xc76c51a3, 0xd192e819, 0xd6990624, 0xf40e3585, 0x106aa070,
    0x19a4c116, 0x1e376c08, 0x2748774c, 0x34b0bcb5, 0x391c0cb3, 0x4ed8aa4a,
    0x5b9cca4f, 0x682e6ff3, 0x748f82ee, 0x78a5636f, 0x84c87814, 0x8cc70208,
    0x90befffa, 0xa4506ceb, 0xbef9a3f7, 0xc67178f2], dtype=np.uint64)


def _ror32(x, r):
    x = np.uint64(x) & np.uint64(0xFFFFFFFF)
    return np.uint64(((int(x) >> r) | (int(x) << (32 - r))) & 0xFFFFFFFF)


def _bits32(x):
    return np.array([(int(x) >> j) & 1 for j in range(32)], dtype=np.uint64)


def get_sha_witness(words) -> np.ndarray:
    """Build the 2^14 GKR input vector for one SHA-256 block.

    TPU-native analog of ``witness_stream.cpp:58-224`` (the mod==2 GKR
    input mode): message-schedule words + carry quotients, the 65-step
    a..h working-variable evolution, the per-round a/e carry quotients,
    and all the bit decompositions the arithmetized round function reads,
    padded to 2^14.  Layout (reference order):

      words[64] | quotients[64] | (a,b,c,d,e,f,g,h)[65 steps interleaved]
      | (a_q,e_q)[64 interleaved] | words_bits[64*32] | a_bits | b_bits
      | c_bits | e_bits | f_bits | g_bits (each 64*32) | 1 | 0-pad

    Deviation (documented): the reference's ``ch`` accumulation indexes
    ``g_bits[i][i]`` (witness_stream.cpp:165) — a transposed subscript
    that its own circuit mirrors; we implement the standard
    ch = (e AND f) XOR (NOT e AND g), verified against hashlib.

    Returns [2^14, 2] uint64 (imaginary parts zero)."""
    words = [np.uint64(int(w) & 0xFFFFFFFF) for w in words]
    assert len(words) == 16
    quotients = [np.uint64(0)] * 16
    for i in range(16, 64):
        w15, w2 = words[i - 15], words[i - 2]
        s0 = int(_ror32(w15, 7)) ^ int(_ror32(w15, 18)) ^ (int(w15) >> 3)
        s1 = int(_ror32(w2, 17)) ^ int(_ror32(w2, 19)) ^ (int(w2) >> 10)
        temp = s0 + s1 + int(words[i - 16]) + int(words[i - 7])
        quotients.append(np.uint64(temp >> 32))
        words.append(np.uint64(temp & 0xFFFFFFFF))

    a = np.zeros(65, dtype=np.uint64)
    b = np.zeros(65, dtype=np.uint64)
    c = np.zeros(65, dtype=np.uint64)
    d = np.zeros(65, dtype=np.uint64)
    e = np.zeros(65, dtype=np.uint64)
    f = np.zeros(65, dtype=np.uint64)
    g = np.zeros(65, dtype=np.uint64)
    h = np.zeros(65, dtype=np.uint64)
    a[0], b[0], c[0], d[0] = _H0[0], _H0[1], _H0[2], _H0[3]
    e[0], f[0], g[0], h[0] = _H0[4], _H0[5], _H0[6], _H0[7]
    a_q = np.zeros(64, dtype=np.uint64)
    e_q = np.zeros(64, dtype=np.uint64)
    for i in range(64):
        S1 = int(_ror32(e[i], 6)) ^ int(_ror32(e[i], 11)) \
            ^ int(_ror32(e[i], 25))
        ch = ((int(e[i]) & int(f[i])) ^ (~int(e[i]) & int(g[i]))) \
            & 0xFFFFFFFF
        t1 = int(h[i]) + S1 + ch + int(words[i]) + int(_K256[i])
        S0 = int(_ror32(a[i], 2)) ^ int(_ror32(a[i], 13)) \
            ^ int(_ror32(a[i], 22))
        maj = (int(a[i]) & int(b[i])) ^ (int(a[i]) & int(c[i])) \
            ^ (int(b[i]) & int(c[i]))
        t2 = S0 + maj
        a_q[i] = np.uint64((t1 + t2) >> 32)
        a[i + 1] = np.uint64((t1 + t2) & 0xFFFFFFFF)
        e_q[i] = np.uint64((t1 + int(d[i])) >> 32)
        e[i + 1] = np.uint64((t1 + int(d[i])) & 0xFFFFFFFF)
        h[i + 1] = g[i]
        g[i + 1] = f[i]
        f[i + 1] = e[i]
        d[i + 1] = c[i]
        c[i + 1] = b[i]
        b[i + 1] = a[i]

    out: list = []
    out.extend(int(w) for w in words)
    out.extend(int(q) for q in quotients)
    for i in range(65):
        out.extend([int(a[i]), int(b[i]), int(c[i]), int(d[i]),
                    int(e[i]), int(f[i]), int(g[i]), int(h[i])])
    for i in range(64):
        out.extend([int(a_q[i]), int(e_q[i])])
    for i in range(64):
        out.extend(int(v) for v in _bits32(words[i]))
    for arr in (a, b, c, e, f, g):
        for i in range(64):
            out.extend(int(v) for v in _bits32(arr[i]))
    out.append(1)
    vec = np.zeros((1 << 14, 2), dtype=np.uint64)
    vec[: len(out), 0] = np.array(out, dtype=np.uint64)
    return vec


def sha_witness_digest(vec: np.ndarray) -> bytes:
    """Final SHA-256 state from a ``get_sha_witness`` vector (H + last
    working variables), for checking against hashlib."""
    off = 128
    final = []
    last = vec[off + 64 * 8: off + 65 * 8, 0]
    for j in range(8):
        final.append((int(_H0[j]) + int(last[j])) & 0xFFFFFFFF)
    return b"".join(int(v).to_bytes(4, "big") for v in final)
