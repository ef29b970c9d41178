"""Bloom filter (Bloom 1970; sizing per the standard analysis).

Mergeable: OR of bitmaps over identical (m, k). No false negatives ever;
false-positive rate ≈ (1 - e^(-kn/m))^k.

Hash parity with the Spark layer mirrors the count-min design: bit
position i = first 60 bits of ``md5(f"{i}:{v}")`` mod m, JVM-expressible.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np

__all__ = ["BloomFilter"]


def _position(row: int, value: str, m_bits: int) -> int:
    # five 24-bit windows per md5 (see kernel/cms.py); m_bits must stay
    # <= 2^24 for this scheme — plenty for per-group runtime filters
    h = hashlib.md5(f"{row // 5}:{value}".encode()).hexdigest()
    w = row % 5
    return int(h[6 * w : 6 * w + 6], 16) % m_bits


class BloomFilter:
    __slots__ = ("m_bits", "k", "bits", "n")

    def __init__(self, m_bits: int = 1 << 16, k: int = 7, bits=None, n: int = 0):
        if m_bits > 1 << 24:
            raise ValueError(
                "m_bits must be <= 2^24 (24-bit md5-window positions); "
                "shard the filter by key instead of growing one bitmap"
            )
        self.m_bits = m_bits
        self.k = k
        nbytes = (m_bits + 7) // 8
        if bits is None:
            bits = np.zeros(nbytes, dtype=np.uint8)
        self.bits = np.asarray(bits, dtype=np.uint8)
        if self.bits.shape != (nbytes,):
            raise ValueError(f"expected {nbytes} bitmap bytes")
        self.n = n

    @classmethod
    def from_expected(cls, n_items: int, fpr: float = 0.01) -> "BloomFilter":
        m = max(8, math.ceil(-n_items * math.log(fpr) / (math.log(2) ** 2)))
        m = min(m, 1 << 24)  # position-scheme cap; FPR degrades beyond ~1.7M items
        k = max(1, round(m / max(1, n_items) * math.log(2)))
        return cls(m_bits=m, k=k)

    def positions(self, value) -> list[int]:
        v = str(value)
        return [_position(i, v, self.m_bits) for i in range(self.k)]

    def add(self, value) -> "BloomFilter":
        for pos in self.positions(value):
            self.bits[pos >> 3] |= 1 << (pos & 7)
        self.n += 1
        return self

    def add_many(self, values) -> "BloomFilter":
        for v in values:
            self.add(v)
        return self

    def might_contain(self, value) -> bool:
        return all(self.bits[p >> 3] & (1 << (p & 7)) for p in self.positions(value))

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        if (self.m_bits, self.k) != (other.m_bits, other.k):
            raise ValueError("bloom dimensions must match to merge")
        return BloomFilter(
            self.m_bits, self.k, np.bitwise_or(self.bits, other.bits), self.n + other.n
        )

    def fill_ratio(self) -> float:
        return float(np.unpackbits(self.bits).sum()) / self.m_bits

    def to_bytes(self) -> bytes:
        return self.bits.tobytes()

    @classmethod
    def from_bytes(cls, m_bits: int, k: int, data: bytes, n: int = 0) -> "BloomFilter":
        return cls(m_bits, k, np.frombuffer(data, dtype=np.uint8).copy(), n)

    def __eq__(self, other) -> bool:
        return (
            isinstance(other, BloomFilter)
            and self.m_bits == other.m_bits
            and self.k == other.k
            and bool(np.array_equal(self.bits, other.bits))
        )
