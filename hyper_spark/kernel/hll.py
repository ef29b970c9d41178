"""HyperLogLog kernel with HLL++ bias correction, estimate-compatible with
the reference (GameAnalytics/hyper).

Semantics replicated from the reference (cited by file:line so parity is
checkable):

* hash → (index, rho): SHA-1 of the value; index = first (most significant)
  P bits of the digest; rho counts leading zeros *of the next P bits only*
  plus one, so rho ∈ [1, P+1] (``/root/reference/src/hyper.erl:47-56,189-198``).
  This P-bit rho window is a reference idiosyncrasy (standard HLL uses the
  remaining hash bits); we copy it for estimate parity.
* registers: dense uint8[2**p]; set is monotone max
  (``src/hyper_register.erl:19-25``).
* union = element-wise max — lossless, associative, commutative, idempotent
  (``src/hyper_binary.erl:226-231``, ``README.md:10-15``).
* estimator: alpha(m)·m²/Σ2^-reg, HLL++ 6-nearest-neighbour bias correction
  for E ≤ 5m, linear counting fallback below threshold(P)
  (``src/hyper.erl:103-130,202-218``).
* serialization: canonical register encoding is one byte per register in
  index order (``src/hyper_register.erl:61-65``); JSON envelope is
  ``{"p": P, "registers": base64(gzip(bytes))}`` (``src/hyper.erl:151-173``)
  with tolerance for one trailing zero pad byte on decode
  (``src/hyper_binary.erl:182-189``).
* reduce_precision: fold register index ``I -> I mod 2**newP`` keeping the
  max (``src/hyper_binary.erl:140-155``).
"""

from __future__ import annotations

import base64
import gzip
import hashlib
import json
import math
import zlib
from functools import lru_cache

import numpy as np

__all__ = [
    "HllSketch",
    "hash_value",
    "hash_values",
    "alpha",
    "estimate_bias",
    "estimate_from_registers",
    "error_bound",
    "is_sketch",
]


def is_sketch(obj) -> bool:
    """Type check, parity with is_hyper/1 (src/hyper.erl:42-44)."""
    return isinstance(obj, HllSketch)

@lru_cache(maxsize=1)
def _constants() -> dict:
    # importlib.resources (not a filesystem path) so the table loads when
    # the package ships as a --py-files zip on executors
    from importlib import resources

    raw = json.loads(
        resources.files("hyper_spark.kernel")
        .joinpath("hll_constants.json")
        .read_text()
    )
    return {
        "threshold": {int(p): v for p, v in raw["threshold"].items()},
        "estimate_data": {
            int(p): np.asarray(v, dtype=np.float64)
            for p, v in raw["estimate_data"].items()
        },
        "bias_data": {
            int(p): np.asarray(v, dtype=np.float64)
            for p, v in raw["bias_data"].items()
        },
    }


MIN_P, MAX_P = 4, 16  # src/hyper.erl:14,39


def _check_p(p: int) -> None:
    if not (MIN_P <= p <= MAX_P):
        raise ValueError(f"precision must be in [{MIN_P}, {MAX_P}], got {p}")


def alpha(m: int) -> float:
    """HLL alpha constant (src/hyper.erl:181-184)."""
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def error_bound(p: int) -> float:
    """Published HLL relative error bound 1.04/sqrt(2**p)."""
    return 1.04 / math.sqrt(1 << p)


def hash_value(value: bytes, p: int) -> tuple[int, int]:
    """SHA-1 → (register index, rho) per src/hyper.erl:47-56.

    index = top P bits of digest; rho = leading zeros of the *next P bits*
    plus one (all-zero window → P+1), per run_of_zeroes (src/hyper.erl:189-198).
    """
    digest = hashlib.sha1(value).digest()
    # 2*P <= 32 bits for P <= 16: the first 4 digest bytes suffice.
    head = int.from_bytes(digest[:4], "big")
    idx = head >> (32 - p)
    window = (head >> (32 - 2 * p)) & ((1 << p) - 1)
    rho = (p + 1) if window == 0 else (p - window.bit_length() + 1)
    return idx, rho


def hash_values(values, p: int) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized-ish hash of an iterable of bytes → (idx[], rho[])."""
    idxs = np.empty(len(values), dtype=np.int64)
    rhos = np.empty(len(values), dtype=np.uint8)
    for i, v in enumerate(values):
        idxs[i], rhos[i] = hash_value(v, p)
    return idxs, rhos


def estimate_bias(e: float, p: int) -> float:
    """Mean bias at the 6 nearest neighbours of E in estimate_data
    (src/hyper.erl:202-218; squared distance, stable tie order)."""
    c = _constants()
    est_vec = c["estimate_data"][p]
    bias_vec = c["bias_data"][p]
    dist = (est_vec - e) ** 2
    nearest = np.argsort(dist, kind="stable")[:6]
    return float(bias_vec[nearest].mean())


def estimate_from_registers(registers: np.ndarray, p: int) -> float:
    """The card/1 estimator (src/hyper.erl:103-130)."""
    m = 1 << p
    regs = registers.astype(np.float64, copy=False)
    register_sum = float(np.exp2(-regs).sum())
    e = alpha(m) * m * m / register_sum
    ep = e - estimate_bias(e, p) if e <= 5 * m else e
    v = int(np.count_nonzero(registers == 0))
    h = m * math.log(m / v) if v > 0 else ep
    return h if h <= _constants()["threshold"][p] else ep


class HllSketch:
    """Dense HLL filter: precision p + uint8[2**p] registers.

    Equivalent to the reference's ``#hyper{p, registers}`` in its canonical
    (1 byte/register) serialized layout (src/hyper_register.erl:61-65).
    The reference's five register backends (sparse buffers, gb-trees,
    bisect pairs, 6-bit dense, C array) are physical variants of this one
    logical value; in our pipeline "sparse" is a stage (rows of (idx, rho))
    rather than a type, mirroring hyper_bisect's promotion policy
    (src/hyper_bisect.erl:25-29).
    """

    __slots__ = ("p", "registers")

    def __init__(self, p: int, registers: np.ndarray | None = None):
        _check_p(p)
        self.p = p
        m = 1 << p
        if registers is None:
            registers = np.zeros(m, dtype=np.uint8)
        else:
            registers = np.asarray(registers, dtype=np.uint8)
            if registers.shape != (m,):
                raise ValueError(
                    f"registers must have shape ({m},), got {registers.shape}"
                )
        self.registers = registers

    # -- construction -------------------------------------------------
    @property
    def m(self) -> int:
        return 1 << self.p

    def insert(self, value: bytes) -> "HllSketch":
        if not isinstance(value, (bytes, bytearray, memoryview)):
            raise TypeError("insertable values are bytes (src/hyper.erl:20,58-59)")
        idx, rho = hash_value(bytes(value), self.p)
        if rho > self.registers[idx]:
            self.registers[idx] = rho
        return self

    def insert_many(self, values) -> "HllSketch":
        idxs, rhos = hash_values(list(values), self.p)
        np.maximum.at(self.registers, idxs, rhos)
        return self

    @classmethod
    def from_sparse(cls, p: int, idxs, rhos) -> "HllSketch":
        """Densify an exploded sparse sketch (rows of (idx, rho))."""
        sk = cls(p)
        idxs = np.asarray(idxs, dtype=np.int64)
        rhos = np.asarray(rhos, dtype=np.uint8)
        np.maximum.at(sk.registers, idxs, rhos)
        return sk

    # -- algebra ------------------------------------------------------
    def merge(self, other: "HllSketch") -> "HllSketch":
        """Lossless union = element-wise max (src/hyper_binary.erl:226-231).

        Mixed precision folds to the smaller P first (src/hyper.erl:82-87).
        """
        if self.p == other.p:
            return HllSketch(self.p, np.maximum(self.registers, other.registers))
        lo, hi = (self, other) if self.p < other.p else (other, self)
        return lo.merge(hi.reduce_precision(lo.p))

    @classmethod
    def merge_all(cls, sketches) -> "HllSketch":
        sketches = list(sketches)
        if not sketches:
            raise ValueError("merge_all of empty list")
        min_p = min(s.p for s in sketches)
        stacked = np.stack([s.reduce_precision(min_p).registers for s in sketches])
        return cls(min_p, np.maximum.reduce(stacked))

    def reduce_precision(self, new_p: int) -> "HllSketch":
        """Project onto 2**new_p registers via index mod 2**new_p, keeping
        the max (src/hyper_binary.erl:140-155)."""
        if new_p == self.p:
            return self
        if new_p > self.p:
            raise ValueError("can only reduce precision")
        _check_p(new_p)
        folded = self.registers.reshape(-1, 1 << new_p).max(axis=0)
        return HllSketch(new_p, folded)

    # -- read ---------------------------------------------------------
    def cardinality(self) -> float:
        return estimate_from_registers(self.registers, self.p)

    def intersect_cardinality(self, other: "HllSketch") -> float:
        """Inclusion–exclusion estimate; no accuracy guarantee
        (src/hyper.erl:97-100)."""
        return max(
            0.0,
            self.cardinality() + other.cardinality() - self.merge(other).cardinality(),
        )

    def zero_count(self) -> int:
        return int(np.count_nonzero(self.registers == 0))

    def bytes_size(self) -> int:
        return self.m

    # -- serialization -------------------------------------------------
    def to_bytes(self) -> bytes:
        """Canonical encoding: one byte per register, index order
        (src/hyper_register.erl:61-65)."""
        return self.registers.tobytes()

    @classmethod
    def from_bytes(cls, p: int, data: bytes) -> "HllSketch":
        m = 1 << p
        if len(data) == m + 1 and data[-1] == 0:
            data = data[:-1]  # pad tolerance (src/hyper_binary.erl:182-189)
        if len(data) != m:
            raise ValueError(f"expected {m} register bytes, got {len(data)}")
        return cls(p, np.frombuffer(data, dtype=np.uint8).copy())

    def to_json(self) -> str:
        """JSON envelope per src/hyper.erl:151-159. Register *bytes* are the
        cross-implementation equality surface; the gzip envelope is only
        guaranteed stable within one runtime (zlib version dependent)."""
        payload = base64.b64encode(gzip.compress(self.to_bytes(), mtime=0)).decode()
        return json.dumps({"p": self.p, "registers": payload})

    @classmethod
    def from_json(cls, text: str) -> "HllSketch":
        obj = json.loads(text)
        raw = zlib.decompress(base64.b64decode(obj["registers"]), wbits=47)
        return cls.from_bytes(int(obj["p"]), raw)

    def compact(self) -> "HllSketch":
        """API parity with compact/1 (src/hyper.erl:138-139): the
        reference flushes backend write buffers; our dense kernel has no
        deferred state, so this is the identity (SURVEY §2.1)."""
        return self

    # -- dunder -------------------------------------------------------
    def __eq__(self, other) -> bool:
        return (
            isinstance(other, HllSketch)
            and self.p == other.p
            and bool(np.array_equal(self.registers, other.registers))
        )

    def __hash__(self):  # pragma: no cover
        return hash((self.p, self.to_bytes()))

    def __repr__(self) -> str:
        return f"HllSketch(p={self.p}, card≈{self.cardinality():.1f})"
