"""t-digest (Dunning & Ertl, "Computing extremely accurate quantiles
using t-digests", the *merging* variant).

Centroids (mean, weight) kept sorted; clustering is governed by the k1
scale function k(q) = δ/(2π)·asin(2q-1), which bounds centroid width so
accuracy concentrates at the tails. Merge = concatenate centroid lists +
re-cluster — associative enough for partial aggregation (result depends
on merge order only within the published error envelope).
"""

from __future__ import annotations

import math

import numpy as np

__all__ = ["TDigest"]


class TDigest:
    __slots__ = ("delta", "means", "weights", "n", "_min", "_max", "_buf")

    def __init__(self, delta: float = 200.0):
        self.delta = float(delta)
        self.means = np.array([], dtype=np.float64)
        self.weights = np.array([], dtype=np.float64)
        self.n = 0.0
        self._min = math.inf
        self._max = -math.inf
        self._buf: list[tuple[float, float]] = []

    # -- scale function (k1) ------------------------------------------
    def _k(self, q: float) -> float:
        q = min(1.0, max(0.0, q))
        return self.delta / (2 * math.pi) * math.asin(2 * q - 1)

    # -- updates ------------------------------------------------------
    def update(self, value: float, weight: float = 1.0) -> "TDigest":
        self._buf.append((float(value), float(weight)))
        if len(self._buf) >= 10 * int(self.delta):
            self._flush()
        return self

    def update_many(self, values) -> "TDigest":
        for v in values:
            self._buf.append((float(v), 1.0))
        self._flush()
        return self

    def update_batch(self, arr) -> "TDigest":
        """Vectorized bulk insert: one recluster per batch."""
        arr = np.asarray(arr, dtype=np.float64)
        arr = arr[~np.isnan(arr)]
        if arr.size == 0:
            return self
        self._flush()
        means = np.concatenate([self.means, arr])
        weights = np.concatenate([self.weights, np.ones(arr.size)])
        order = np.argsort(means, kind="stable")
        self._recluster(means[order], weights[order])
        return self

    def _flush(self) -> None:
        if not self._buf:
            return
        bm = np.array([m for m, _ in self._buf])
        bw = np.array([w for _, w in self._buf])
        self._buf = []
        means = np.concatenate([self.means, bm])
        weights = np.concatenate([self.weights, bw])
        order = np.argsort(means, kind="stable")
        self._recluster(means[order], weights[order])

    def _recluster(self, means: np.ndarray, weights: np.ndarray) -> None:
        total = float(weights.sum())
        if total == 0:
            return
        out_m: list[float] = []
        out_w: list[float] = []
        cur_m, cur_w = float(means[0]), float(weights[0])
        w_so_far = 0.0
        k_limit = self._k(0.0) + 1.0
        for m, w in zip(means[1:], weights[1:]):
            q_right = (w_so_far + cur_w + w) / total
            if self._k(q_right) <= k_limit:
                cur_m += (m - cur_m) * w / (cur_w + w)
                cur_w += w
            else:
                out_m.append(cur_m)
                out_w.append(cur_w)
                w_so_far += cur_w
                k_limit = self._k(w_so_far / total) + 1.0
                cur_m, cur_w = float(m), float(w)
        out_m.append(cur_m)
        out_w.append(cur_w)
        self.means = np.asarray(out_m)
        self.weights = np.asarray(out_w)
        self.n = total
        if len(means):
            self._min = min(self._min, float(means[0]))
            self._max = max(self._max, float(means[-1]))

    # -- merge --------------------------------------------------------
    def merge(self, other: "TDigest") -> "TDigest":
        if self.delta != other.delta:
            raise ValueError("delta must match to merge t-digests")
        self._flush()
        other._flush()
        out = TDigest(self.delta)
        means = np.concatenate([self.means, other.means])
        weights = np.concatenate([self.weights, other.weights])
        if len(means):
            order = np.argsort(means, kind="stable")
            out._recluster(means[order], weights[order])
        out._min = min(self._min, other._min)
        out._max = max(self._max, other._max)
        return out

    # -- queries ------------------------------------------------------
    def quantile(self, q: float) -> float:
        self._flush()
        if self.n == 0:
            raise ValueError("empty digest")
        if q <= 0:
            return self._min
        if q >= 1:
            return self._max
        target = q * self.n
        cum = np.cumsum(self.weights) - self.weights / 2.0
        idx = int(np.searchsorted(cum, target))
        if idx == 0:
            lo_m, lo_c = self._min, 0.0
            hi_m, hi_c = float(self.means[0]), float(cum[0])
        elif idx >= len(self.means):
            lo_m, lo_c = float(self.means[-1]), float(cum[-1])
            hi_m, hi_c = self._max, self.n
        else:
            lo_m, lo_c = float(self.means[idx - 1]), float(cum[idx - 1])
            hi_m, hi_c = float(self.means[idx]), float(cum[idx])
        if hi_c == lo_c:
            return lo_m
        return lo_m + (hi_m - lo_m) * (target - lo_c) / (hi_c - lo_c)

    def quantiles(self, qs) -> list[float]:
        return [self.quantile(q) for q in qs]

    # -- serialization ------------------------------------------------
    def to_dict(self) -> dict:
        self._flush()
        return {
            "delta": self.delta,
            "n": self.n,
            "min": self._min if self.n else None,
            "max": self._max if self.n else None,
            "means": self.means.tolist(),
            "weights": self.weights.tolist(),
        }

    @classmethod
    def from_dict(cls, d: dict) -> "TDigest":
        td = cls(d["delta"])
        td.means = np.asarray(d["means"], dtype=np.float64)
        td.weights = np.asarray(d["weights"], dtype=np.float64)
        td.n = float(d["n"])
        td._min = d["min"] if d["min"] is not None else math.inf
        td._max = d["max"] if d["max"] is not None else -math.inf
        return td
