"""KMV / Theta sketch kernel: distinct counting with DIRECT set
algebra (intersection / difference estimates), numpy-vectorized.

Companion sketch family (SURVEY §2.4 — semantics from the published
literature, no reference byte-parity obligation): the K-Minimum-Values
estimator (Bar-Yossef et al. 2002) generalized by the Theta sketch
framework (Dasgupta, Lang, Rhodes, Thaler 2016, "A Framework for
Estimating Stream Expression Cardinalities"). Where HLL must derive
|A∩B| by inclusion-exclusion (error grows with |A∪B|, catastrophically
for small intersections of large sets — the documented weakness of
``intersect_card``), a theta sketch carries a uniform *sample* of the
hash space and estimates any set expression directly at the combined
sampling rate.

Representation (one convention, used everywhere):

- ``entries``: sorted distinct uint64 hashes — the k smallest seen.
- ``theta``: 1.0 when unsaturated (fewer than k distinct hashes seen:
  ``entries`` is the COMPLETE hash set and every estimate is exact);
  otherwise ``entries[-1] / 2^64`` — the k-th smallest normalized
  hash. Entries strictly below theta are a uniform sample of the
  stream's distinct hashes at rate theta, so
  ``estimate = (k-1)/theta``; general expressions count qualifying
  entries below min-theta and divide by it.

Mergeability: the k smallest of A∪B is a subset of
(k smallest of A) ∪ (k smallest of B), so union = re-trim of the
entry union — associative, commutative, idempotent, the same partial
aggregate contract as the HLL kernel.

Relative standard error ≈ 1/sqrt(k-2) for the cardinality estimate
(published KMV result); bound helpers expose 3·RSE like the HLL
1.04/sqrt(2^p) gates.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

__all__ = ["ThetaSketch", "theta_rse"]

_TWO64 = float(1 << 64)


def theta_rse(k: int) -> float:
    """Published KMV relative standard error for the cardinality
    estimate: 1/sqrt(k-2)."""
    if k < 3:
        raise ValueError("k must be >= 3")
    return 1.0 / float(np.sqrt(k - 2))


def _to_u64(hashes: np.ndarray) -> np.ndarray:
    """Map signed int64 hashes (Spark xxhash64) to uint64 preserving
    order: flip the sign bit."""
    a = np.asarray(hashes, dtype=np.int64)
    return (a.view(np.uint64)) ^ np.uint64(1 << 63)


@dataclass(frozen=True)
class ThetaSketch:
    k: int
    entries: np.ndarray  # sorted distinct uint64

    def __post_init__(self) -> None:
        if self.k < 3:
            raise ValueError("k must be >= 3")
        e = np.asarray(self.entries, dtype=np.uint64)
        object.__setattr__(self, "entries", e)
        if len(e) > self.k:
            raise ValueError("entries exceed k — not a trimmed sketch")

    # -------------------------------------------------------- build
    @classmethod
    def from_signed_hashes(cls, k: int, hashes) -> "ThetaSketch":
        """Build from signed int64 hash values (e.g. Spark xxhash64
        output). Deduplicates, order-maps to uint64, keeps k smallest."""
        u = np.unique(_to_u64(np.asarray(hashes, dtype=np.int64)))
        return cls(k, u[:k])

    @classmethod
    def empty(cls, k: int) -> "ThetaSketch":
        return cls(k, np.empty(0, dtype=np.uint64))

    # ------------------------------------------------------- algebra
    @property
    def saturated(self) -> bool:
        return len(self.entries) >= self.k

    @property
    def theta_raw(self) -> int:
        """Sampling threshold in the RAW uint64 hash domain (exact
        integer arithmetic — converting to float first would round at
        the 2^64 boundary and could mis-include the k-th entry):
        2^64 when unsaturated, else the k-th smallest hash."""
        if not self.saturated:
            return 1 << 64
        return int(self.entries[-1])

    @property
    def theta(self) -> float:
        """Sampling rate in [0, 1] (float view of ``theta_raw`` —
        fine for the final division, never used for comparisons)."""
        return self.theta_raw / _TWO64

    def _below(self, raw: int) -> np.ndarray:
        if raw >= 1 << 64:
            return self.entries
        return self.entries[self.entries < np.uint64(raw)]

    def estimate(self) -> float:
        if not self.saturated:
            return float(len(self.entries))
        return (self.k - 1) / self.theta

    def union(self, other: "ThetaSketch") -> "ThetaSketch":
        if self.k != other.k:
            raise ValueError("cannot union theta sketches with different k")
        merged = np.union1d(self.entries, other.entries)
        return ThetaSketch(self.k, merged[: self.k])

    def intersect_card(self, other: "ThetaSketch") -> float:
        """Direct |A∩B| estimate at rate min(theta_a, theta_b) —
        EXACT when both sketches are unsaturated."""
        if self.k != other.k:
            raise ValueError("cannot intersect theta sketches with different k")
        raw = min(self.theta_raw, other.theta_raw)
        n = len(np.intersect1d(self._below(raw), other._below(raw)))
        if raw >= 1 << 64:
            return float(n)
        return n / (raw / _TWO64)

    def a_not_b_card(self, other: "ThetaSketch") -> float:
        """Direct |A \\ B| estimate — EXACT when both unsaturated."""
        if self.k != other.k:
            raise ValueError("k mismatch")
        raw = min(self.theta_raw, other.theta_raw)
        n = len(np.setdiff1d(self._below(raw), other._below(raw)))
        if raw >= 1 << 64:
            return float(n)
        return n / (raw / _TWO64)

    # --------------------------------------------------------- serde
    def to_bytes(self) -> bytes:
        """Canonical blob: big-endian uint64 entries (sorted)."""
        return self.entries.astype(">u8").tobytes()

    @classmethod
    def from_bytes(cls, k: int, blob: bytes) -> "ThetaSketch":
        e = np.frombuffer(blob, dtype=">u8").astype(np.uint64)
        return cls(k, e)

    def __eq__(self, other: object) -> bool:
        return (
            isinstance(other, ThetaSketch)
            and self.k == other.k
            and len(self.entries) == len(other.entries)
            and bool(np.all(self.entries == other.entries))
        )
