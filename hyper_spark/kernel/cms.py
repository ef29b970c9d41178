"""Count-Min sketch (Cormode & Muthukrishnan 2005, "An improved data
stream summary: the count-min sketch and its applications").

No reference implementation exists in GameAnalytics/hyper (SURVEY.md §2.4)
— semantics come from the paper:

* d×w counter matrix; row i increments ``counters[i, h_i(v)]``
* point estimate = min over rows (always an overcount)
* guarantee: est ≤ true + eps·N with prob ≥ 1-delta for
  w = ceil(e/eps), d = ceil(ln(1/delta))
* merge = element-wise add (mergeable partial aggregate)

Hash parity with the Spark layer: one md5 yields five 24-bit windows
(6 hex chars each), so bucket_i(v) = window_{i%5} of
``md5(f"{i//5}:{v}")`` mod w — five hash rows per md5 invocation,
expressible JVM-natively via ``conv(substring(md5(...)), 16, 10) % w``
so the per-row hot path never enters Python (mirrors the HLL design).
Widths ≤ 2^24 that divide 2^24 (powers of two) have zero modulo bias;
other widths carry ≤ w/2^24 bias — negligible for the count-min
guarantee, which only needs pairwise-independent-ish rows.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np

__all__ = ["CountMinSketch"]


def _bucket(row: int, value: str, width: int) -> int:
    h = hashlib.md5(f"{row // 5}:{value}".encode()).hexdigest()
    w = row % 5
    return int(h[6 * w : 6 * w + 6], 16) % width


class CountMinSketch:
    __slots__ = ("depth", "width", "counters", "n")

    def __init__(self, depth: int = 5, width: int = 2048, counters=None, n: int = 0):
        self.depth = depth
        self.width = width
        if counters is None:
            counters = np.zeros((depth, width), dtype=np.int64)
        self.counters = np.asarray(counters, dtype=np.int64).reshape(depth, width)
        self.n = n

    @classmethod
    def from_error(cls, eps: float, delta: float) -> "CountMinSketch":
        return cls(
            depth=max(1, math.ceil(math.log(1.0 / delta))),
            width=max(2, math.ceil(math.e / eps)),
        )

    @property
    def eps(self) -> float:
        return math.e / self.width

    def add(self, value, count: int = 1) -> "CountMinSketch":
        v = str(value)
        for i in range(self.depth):
            self.counters[i, _bucket(i, v, self.width)] += count
        self.n += count
        return self

    def add_many(self, values) -> "CountMinSketch":
        for v in values:
            self.add(v)
        return self

    def estimate(self, value) -> int:
        v = str(value)
        return int(
            min(
                self.counters[i, _bucket(i, v, self.width)]
                for i in range(self.depth)
            )
        )

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        if (self.depth, self.width) != (other.depth, other.width):
            raise ValueError("count-min dimensions must match to merge")
        return CountMinSketch(
            self.depth, self.width, self.counters + other.counters, self.n + other.n
        )

    def inner_product(self, other: "CountMinSketch") -> int:
        """Estimate of a⊙b = Σ_v f_a(v)·f_b(v) (CM05 §4.2): min over
        rows of the counter dot product. Always an overcount; est ≤
        a⊙b + eps·n_a·n_b with prob ≥ 1-delta. a⊙b on a shared join
        key IS the equijoin output size, so this estimates |A ⋈ B|
        from two sketches without touching either table."""
        if (self.depth, self.width) != (other.depth, other.width):
            raise ValueError("count-min dimensions must match to inner-product")
        # arbitrary-precision dot: Σ_i a_i·b_i can exceed int64 at
        # petabyte-scale counts (n_a·n_b up to ~10^24); d×w ≈ 10k terms
        # per pair keeps the Python-int path cheap
        return min(
            sum(int(x) * int(y) for x, y in zip(ra, rb) if x and y)
            for ra, rb in zip(self.counters.tolist(), other.counters.tolist())
        )

    # -- serialization (row-major int64 little-endian) -----------------
    def to_bytes(self) -> bytes:
        return self.counters.astype("<i8").tobytes()

    @classmethod
    def from_bytes(cls, depth: int, width: int, data: bytes, n: int = 0):
        arr = np.frombuffer(data, dtype="<i8").reshape(depth, width).copy()
        return cls(depth, width, arr, n)

    def __eq__(self, other) -> bool:
        return (
            isinstance(other, CountMinSketch)
            and self.depth == other.depth
            and self.width == other.width
            and bool(np.array_equal(self.counters, other.counters))
        )
