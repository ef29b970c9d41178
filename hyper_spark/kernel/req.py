"""REQ quantile sketch — RELATIVE rank error, accurate at the tail.

Cormode, Karnin, Liberty, Thaler & Veselý, "Relative Error Streaming
Quantiles" (PODS 2021); the schedule constants follow the paper's
reference design as also realized in Apache DataSketches' ReqSketch
(public). Re-implemented from the published algorithm — no code taken.

Why it exists next to KLL: KLL's guarantee is UNIFORM rank error
± eps·n, so at p99.99 of 10^12 turn latencies the error band (eps·n)
dwarfs the 10^8 items actually above the quantile — the estimate is
noise exactly where an SLO query looks. REQ makes the rank error
PROPORTIONAL to the distance from the accurate end: in HRA
(high-ranks-accurate, the default here) the error at rank R is
± eps·(n − R), so p50 is as good as KLL and p99.999 is nearly exact.

Mechanism (per level h, items of weight 2^h, like KLL):

* each compactor keeps ``num_sections`` sections of ``section_size``
  items PROTECTED at the accurate end (the TOP of the sorted buffer
  for HRA) — protected items are never compacted at that fill level;
* a full buffer (2 × num_sections × section_size) compacts only a
  prefix of the unprotected low end: ``trailing_ones(state) + 1``
  sections, so deeper cuts toward the protected boundary are
  exponentially rarer — the paper's variance-balancing schedule;
* every 2^(num_sections − 1) compactions the compactor re-grades:
  section_size /= sqrt(2), num_sections ×= 2 (same capacity, finer
  protection granularity), stopping at section_size 4.

Merge = levelwise concatenation + re-compaction (associative /
commutative in distribution; estimates from any merge order satisfy
the same bound — the differential Spark tests assert the bound, and
byte-determinism is provided by seeding the coin from (n, level) as
kll.py does).
"""

from __future__ import annotations

import numpy as np

__all__ = ["ReqSketch"]

_MIN_SECTION = 4
_INIT_SECTIONS = 3
_SQRT2 = float(np.sqrt(2.0))


def _even(x: float) -> int:
    e = int(round(x / 2.0)) * 2
    return max(e, _MIN_SECTION)


def _trailing_ones(x: int) -> int:
    t = 0
    while x & 1:
        t += 1
        x >>= 1
    return t


class _Compactor:
    __slots__ = ("section_size", "num_sections", "state", "buf")

    def __init__(self, section_size: int, num_sections: int = _INIT_SECTIONS):
        self.section_size = section_size
        self.num_sections = num_sections
        self.state = 0  # compaction counter; trailing ones pick the cut depth
        self.buf: list[float] = []

    def capacity(self) -> int:
        return 2 * self.num_sections * self.section_size

    def compact(self, seed: int) -> list[float]:
        """Compact the unprotected low prefix; return promoted items."""
        self.buf.sort()
        secs = min(_trailing_ones(self.state) + 1, self.num_sections)
        cut = min(secs * self.section_size, len(self.buf) - self.num_sections * self.section_size)
        cut -= cut % 2  # pairs only, so weight is conserved exactly
        self.state += 1
        if self.state >= (1 << (self.num_sections - 1)) and self.section_size > _MIN_SECTION:
            self.section_size = _even(self.section_size / _SQRT2)
            self.num_sections <<= 1
        if cut < 2:
            return []
        region, self.buf = self.buf[:cut], self.buf[cut:]
        offset = int(np.random.default_rng(seed & 0x7FFFFFFF).integers(0, 2))
        return region[offset::2]


class ReqSketch:
    """High-ranks-accurate (HRA) relative-error quantile sketch."""

    __slots__ = ("k", "compactors", "n", "_min", "_max")

    def __init__(self, k: int = 32):
        if k < _MIN_SECTION:
            raise ValueError(f"k must be >= {_MIN_SECTION}")
        self.k = _even(float(k))
        self.compactors: list[_Compactor] = [_Compactor(self.k)]
        self.n = 0
        self._min = np.inf
        self._max = -np.inf

    # -- updates ------------------------------------------------------
    def update(self, value: float) -> "ReqSketch":
        v = float(value)
        self.compactors[0].buf.append(v)
        self.n += 1
        self._min = min(self._min, v)
        self._max = max(self._max, v)
        if len(self.compactors[0].buf) >= self.compactors[0].capacity():
            self._compress()
        return self

    def update_batch(self, arr) -> "ReqSketch":
        """Vectorized bulk insert: extend level 0 in capacity-sized
        chunks and compress between chunks (only buffer state at
        compaction time matters, as in kll.py::update_batch)."""
        arr = np.asarray(arr, dtype=np.float64)
        arr = arr[~np.isnan(arr)]
        if arr.size == 0:
            return self
        self._min = min(self._min, float(arr.min()))
        self._max = max(self._max, float(arr.max()))
        cap = self.compactors[0].capacity()
        n_chunks = max(1, arr.size // cap)
        for chunk in np.array_split(arr, n_chunks):
            self.compactors[0].buf.extend(chunk.tolist())
            self.n += chunk.size
            self._compress()
        return self

    def _compress(self) -> None:
        h = 0
        while h < len(self.compactors):
            c = self.compactors[h]
            # drain the level below capacity — one compaction removes
            # only the scheduled cut (secs × section_size), so a buffer
            # filled by a bulk extend or a merge needs several
            while len(c.buf) >= c.capacity():
                if h + 1 == len(self.compactors):
                    self.compactors.append(_Compactor(self.k))
                before = len(c.buf)
                promoted = c.compact(self.n * 31 + h)
                self.compactors[h + 1].buf.extend(promoted)
                if len(c.buf) == before:  # cut < 2: nothing compactable
                    break
            h += 1

    # -- merge --------------------------------------------------------
    def merge(self, other: "ReqSketch") -> "ReqSketch":
        if self.k != other.k:
            raise ValueError("k must match to merge REQ sketches")
        out = ReqSketch(self.k)
        out.n = self.n + other.n
        out._min = min(self._min, other._min)
        out._max = max(self._max, other._max)
        height = max(len(self.compactors), len(other.compactors))
        out.compactors = []
        for h in range(height):
            ca = self.compactors[h] if h < len(self.compactors) else None
            cb = other.compactors[h] if h < len(other.compactors) else None
            # conservative param fold: finest protection wins so the
            # merged compactor's guarantee is at least each input's
            c = _Compactor(
                min(x.section_size for x in (ca, cb) if x is not None),
                max(x.num_sections for x in (ca, cb) if x is not None),
            )
            c.state = max(x.state for x in (ca, cb) if x is not None)
            c.buf = (list(ca.buf) if ca else []) + (list(cb.buf) if cb else [])
            out.compactors.append(c)
        out._compress()
        return out

    # -- queries ------------------------------------------------------
    def _weighted_items(self) -> tuple[np.ndarray, np.ndarray]:
        items, weights = [], []
        for h, c in enumerate(self.compactors):
            items.extend(c.buf)
            weights.extend([1 << h] * len(c.buf))
        if not items:
            return np.array([]), np.array([])
        items = np.asarray(items)
        weights = np.asarray(weights, dtype=np.int64)
        order = np.argsort(items, kind="stable")
        return items[order], weights[order]

    def quantile(self, q: float) -> float:
        if self.n == 0:
            raise ValueError("empty sketch")
        if q <= 0:
            return float(self._min)
        if q >= 1:
            return float(self._max)
        items, weights = self._weighted_items()
        cum = np.cumsum(weights)
        target = q * cum[-1]
        idx = int(np.searchsorted(cum, target, side="left"))
        return float(items[min(idx, len(items) - 1)])

    def rank(self, value: float) -> float:
        """Normalized rank: estimated fraction of items ≤ value, with
        error ± eps·(1 − rank) — tight where ranks are high (HRA)."""
        if self.n == 0:
            raise ValueError("empty sketch")
        items, weights = self._weighted_items()
        mask = items <= value
        return float(weights[mask].sum()) / float(weights.sum())

    def quantiles(self, qs) -> list[float]:
        return [self.quantile(q) for q in qs]

    # -- serialization ------------------------------------------------
    def to_dict(self) -> dict:
        return {
            "k": self.k,
            "n": self.n,
            "min": float(self._min) if self.n else None,
            "max": float(self._max) if self.n else None,
            "compactors": [
                {
                    "ss": c.section_size,
                    "ns": c.num_sections,
                    "st": c.state,
                    "buf": list(map(float, c.buf)),
                }
                for c in self.compactors
            ],
        }

    @classmethod
    def from_dict(cls, d: dict) -> "ReqSketch":
        sk = cls(d["k"])
        sk.n = d["n"]
        sk._min = d["min"] if d["min"] is not None else np.inf
        sk._max = d["max"] if d["max"] is not None else -np.inf
        sk.compactors = []
        for c in d["compactors"]:
            comp = _Compactor(c["ss"], c["ns"])
            comp.state = c["st"]
            comp.buf = list(c["buf"])
            sk.compactors.append(comp)
        return sk
