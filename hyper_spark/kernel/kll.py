"""KLL quantile sketch (Karnin, Lang & Liberty 2016, "Optimal quantile
approximation in streams").

Standard multi-level compactor design:

* level h holds items of weight 2^h
* level capacities shrink geometrically from the top:
  cap(h) = max(2, ceil(k · c^(numLevels-1-h))), c = 2/3
* when total size exceeds the capacity budget, the lowest over-full
  level is compacted: sort, keep every other item (random even/odd
  offset), promote survivors to level h+1
* merge = levelwise concatenation followed by compaction
* normalized rank error ≈ O(1/k); we assert a conservative
  eps = 2.0/k bound in tests (empirically ~3× slack at k=200)

Randomness is drawn from a Generator seeded deterministically from the
sketch state (n, level) so builds are reproducible run-to-run, which the
differential Spark tests rely on.
"""

from __future__ import annotations

import numpy as np

__all__ = ["KllSketch"]

_C = 2.0 / 3.0


class KllSketch:
    __slots__ = ("k", "levels", "n", "_min", "_max")

    def __init__(self, k: int = 200):
        if k < 8:
            raise ValueError("k must be >= 8")
        self.k = k
        self.levels: list[list[float]] = [[]]
        self.n = 0
        self._min = np.inf
        self._max = -np.inf

    # -- capacity -----------------------------------------------------
    def _cap(self, h: int) -> int:
        depth = len(self.levels) - 1 - h
        return max(2, int(np.ceil(self.k * (_C**depth))))

    def _budget(self) -> int:
        return sum(self._cap(h) for h in range(len(self.levels)))

    def _size(self) -> int:
        return sum(len(lv) for lv in self.levels)

    # -- updates ------------------------------------------------------
    def update(self, value: float) -> "KllSketch":
        v = float(value)
        self.levels[0].append(v)
        self.n += 1
        self._min = min(self._min, v)
        self._max = max(self._max, v)
        if self._size() > self._budget():
            self._compress()
        return self

    def update_many(self, values) -> "KllSketch":
        for v in values:
            self.update(v)
        return self

    def update_batch(self, arr) -> "KllSketch":
        """Vectorized bulk insert: extend level 0 in k-sized chunks and
        compress between chunks (compaction invariants hold regardless of
        when compression runs; only capacities at compaction time matter)."""
        arr = np.asarray(arr, dtype=np.float64)
        arr = arr[~np.isnan(arr)]
        if arr.size == 0:
            return self
        self._min = min(self._min, float(arr.min()))
        self._max = max(self._max, float(arr.max()))
        n_chunks = max(1, arr.size // max(self.k, 8))
        for chunk in np.array_split(arr, n_chunks):
            self.levels[0].extend(chunk.tolist())
            self.n += chunk.size
            if self._size() > self._budget():
                self._compress()
        return self

    def _compress(self) -> None:
        while self._size() > self._budget():
            for h in range(len(self.levels)):
                if len(self.levels[h]) > self._cap(h):
                    self._compact_level(h)
                    break
            else:
                break

    def _compact_level(self, h: int) -> None:
        items = sorted(self.levels[h])
        if len(items) < 2:
            return
        if h + 1 == len(self.levels):
            self.levels.append([])
        rng = np.random.default_rng((self.n * 31 + h) & 0x7FFFFFFF)
        offset = int(rng.integers(0, 2))
        if len(items) % 2 == 1:
            # keep one unpaired item at this level so weight is conserved
            keep_odd = items[-1:]
            items = items[:-1]
        else:
            keep_odd = []
        self.levels[h] = keep_odd
        self.levels[h + 1].extend(items[offset::2])

    # -- merge --------------------------------------------------------
    def merge(self, other: "KllSketch") -> "KllSketch":
        if self.k != other.k:
            raise ValueError("k must match to merge KLL sketches")
        out = KllSketch(self.k)
        out.n = self.n + other.n
        out._min = min(self._min, other._min)
        out._max = max(self._max, other._max)
        height = max(len(self.levels), len(other.levels))
        out.levels = [
            list(self.levels[h] if h < len(self.levels) else [])
            + list(other.levels[h] if h < len(other.levels) else [])
            for h in range(height)
        ]
        out._compress()
        return out

    # -- queries ------------------------------------------------------
    def _weighted_items(self) -> tuple[np.ndarray, np.ndarray]:
        items, weights = [], []
        for h, lv in enumerate(self.levels):
            items.extend(lv)
            weights.extend([1 << h] * len(lv))
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
        """Normalized rank: fraction of items ≤ value."""
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
            "levels": [list(map(float, lv)) for lv in self.levels],
        }

    @classmethod
    def from_dict(cls, d: dict) -> "KllSketch":
        sk = cls(d["k"])
        sk.n = d["n"]
        sk._min = d["min"] if d["min"] is not None else np.inf
        sk._max = d["max"] if d["max"] is not None else -np.inf
        sk.levels = [list(lv) for lv in d["levels"]]
        return sk
