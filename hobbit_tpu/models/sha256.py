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
