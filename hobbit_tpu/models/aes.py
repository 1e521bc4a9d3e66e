"""AES-128 encryption as a lookup-table circuit (the reference's fun 5).

The reference arithmetizes AES with S-box and MixColumns lookup tables
(``AES/encrypt``, Seval.cpp:991-1083).  Tables here:

  sbox    key = b            -> SubBytes(b)
  xtime   key = b            -> 2*b in GF(2^8)  (MixColumns doubling)
  xor     key = a + 256*b    -> a ^ b

ShiftRows is a free wire permutation; AddRoundKey is bytewise XOR against
round-key constant wires (key schedule computed host-side); MixColumns is
xtime + XOR chains.  All 16 state bytes x all parallel blocks advance in
lock-step levels.
"""

from __future__ import annotations

from typing import List

import numpy as np

from ..ops import field as F
from ..streams import trace as trc
from . import circuits as C

_SBOX = None


def _make_sbox() -> np.ndarray:
    global _SBOX
    if _SBOX is not None:
        return _SBOX
    # standard AES S-box via GF(2^8) inverse + affine map
    def gmul(a, b):
        p = 0
        for _ in range(8):
            if b & 1:
                p ^= a
            hi = a & 0x80
            a = (a << 1) & 0xFF
            if hi:
                a ^= 0x1B
            b >>= 1
        return p

    inv = [0] * 256
    for i in range(1, 256):
        for j in range(1, 256):
            if gmul(i, j) == 1:
                inv[i] = j
                break
    sbox = np.zeros(256, dtype=np.uint64)
    for i in range(256):
        x = inv[i]
        s = x
        for _ in range(4):
            x = ((x << 1) | (x >> 7)) & 0xFF
            s ^= x
        sbox[i] = s ^ 0x63
    _SBOX = sbox
    return sbox


def _xtime_table() -> np.ndarray:
    b = np.arange(256)
    out = (b << 1) & 0xFF
    out = np.where(b & 0x80, out ^ 0x1B, out)
    return out.astype(np.uint64)


def key_schedule(key_bytes: List[int]) -> List[List[int]]:
    """AES-128 round keys (11 x 16 bytes), host-side."""
    sbox = _make_sbox()
    rcon = [0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80, 0x1B, 0x36]
    w = [list(key_bytes[4 * i: 4 * i + 4]) for i in range(4)]
    for i in range(4, 44):
        t = list(w[i - 1])
        if i % 4 == 0:
            t = t[1:] + t[:1]
            t = [int(sbox[b]) for b in t]
            t[0] ^= rcon[i // 4 - 1]
        w.append([a ^ b for a, b in zip(w[i - 4], t)])
    return [[w[4 * r + c][j] for c in range(4) for j in range(4)]
            for r in range(11)]


class AesBuilder:
    def __init__(self, blocks: int, round_keys: List[List[int]]):
        tables = [_make_sbox(), _xtime_table(), C.xor_table(8)]
        self.blocks = blocks
        n_state = blocks * 16
        n_const = 1 + 11 * 16
        self.b = C.Builder(num_inputs=n_state + n_const, tables=tables)
        self.zero = np.full(blocks, n_state, dtype=np.int64)
        kbase = n_state + 1
        self.rk = [[np.full(blocks, kbase + 16 * r + j, dtype=np.int64)
                    for j in range(16)] for r in range(11)]
        self.round_keys = round_keys
        self.state_wires = [np.arange(blocks, dtype=np.int64) * 16 + j
                            for j in range(16)]

    def inputs(self, plaintext: np.ndarray):
        """plaintext: [blocks, 16] bytes -> input field array."""
        vals = np.zeros(self.b.num_inputs, dtype=np.uint64)
        for blk in range(self.blocks):
            vals[blk * 16: blk * 16 + 16] = plaintext[blk]
        base = self.blocks * 16 + 1
        for r in range(11):
            for j in range(16):
                vals[base + 16 * r + j] = self.round_keys[r][j]
        return F.make(vals, np.zeros_like(vals))

    def sbox(self, x):
        return self.b.lookup(0, x, self.zero)

    def xtime(self, x):
        return self.b.lookup(1, x, self.zero)

    def xor(self, x, y):
        return self.b.lookup(2, x, y)


def build(blocks_log2: int = 0, key: List[int] = None):
    """AES-128 encryption circuit; returns (program, ct_labels [16])."""
    key = key or list(range(16))
    blocks = 1 << blocks_log2
    rks = key_schedule(key)
    ab = AesBuilder(blocks, rks)
    s = list(ab.state_wires)

    # initial AddRoundKey
    s = [ab.xor(s[j], ab.rk[0][j]) for j in range(16)]
    for rnd in range(1, 11):
        s = [ab.sbox(s[j]) for j in range(16)]                   # SubBytes
        # ShiftRows (column-major state layout: byte (r, c) at 4c + r)
        s = [s[(4 * ((c + r) % 4)) + r] for c in range(4) for r in range(4)]
        if rnd < 10:                                             # MixColumns
            ns = []
            for c in range(4):
                col = s[4 * c: 4 * c + 4]
                dbl = [ab.xtime(b) for b in col]
                out = []
                for r in range(4):
                    t = ab.xor(dbl[r], ab.xor(dbl[(r + 1) % 4],
                                              col[(r + 1) % 4]))
                    t = ab.xor(t, ab.xor(col[(r + 2) % 4], col[(r + 3) % 4]))
                    out.append(t)
                ns.extend(out)
            s = ns
        s = [ab.xor(s[j], ab.rk[rnd][j]) for j in range(16)]     # ARK
    return ab.b.build(), s


def reference_encrypt(plaintext: List[int], key: List[int]) -> List[int]:
    """Pure-python AES-128 single-block encryption (column-major layout)."""
    sbox = _make_sbox()
    rks = key_schedule(key)
    s = [p ^ k for p, k in zip(plaintext, rks[0])]

    def xt(b):
        return ((b << 1) & 0xFF) ^ (0x1B if b & 0x80 else 0)

    for rnd in range(1, 11):
        s = [int(sbox[b]) for b in s]
        s = [s[(4 * ((c + r) % 4)) + r] for c in range(4) for r in range(4)]
        if rnd < 10:
            ns = []
            for c in range(4):
                col = s[4 * c: 4 * c + 4]
                for r in range(4):
                    ns.append(xt(col[r]) ^ xt(col[(r + 1) % 4])
                              ^ col[(r + 1) % 4] ^ col[(r + 2) % 4]
                              ^ col[(r + 3) % 4])
            s = ns
        s = [b ^ k for b, k in zip(s, rks[rnd])]
    return s


__all__ = ["AesBuilder", "build", "key_schedule", "reference_encrypt"]
