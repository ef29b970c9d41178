"""JVM-native HLL hash expressions.

Reproduces the reference's insert hash path (``/root/reference/src/
hyper.erl:47-56``) as pure Catalyst expressions so the per-row hot path
never leaves whole-stage codegen:

* ``SHA-1(value)``          → ``F.sha1`` (string/binary input, hex out)
* index = top P bits        → ``conv(substring(hex,1,8),16,10) >> (32-P)``
* rho window = next P bits  → shift + mask
* rho = leading zeros + 1   → ``P + 1 - bit_length(window)``, where
  bit_length is computed exactly as ``length(conv(window, 10, 2))``
  (binary string length — exact integer arithmetic, no float log2).

For P ≤ 16 the first 8 hex chars (32 bits) of the digest cover index and
rho window (2·P ≤ 32); ``conv`` output stays < 2^32 so the bigint is
always positive (no signedness trap).

Parity: ``hyper_spark.kernel.hll.hash_value`` computes the same (idx, rho)
from ``hashlib.sha1`` — tested equal row-by-row in
``tests/test_spark_hll.py``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from hyper_spark.kernel.hll import MAX_P, MIN_P

__all__ = ["hll_index_col", "hll_rho_col", "hll_prepare", "as_hash_bytes"]


def _check_p(p: int) -> None:
    # same bounds as the kernel (src/hyper.erl:14,39); above 16 the 32-bit
    # digest head would silently truncate the rho window
    if not (MIN_P <= p <= MAX_P):
        raise ValueError(f"precision must be in [{MIN_P}, {MAX_P}], got {p}")


def as_hash_bytes(col: Column) -> Column:
    """Canonical hash input: UTF-8 bytes of the string form of the value.

    The reference accepts only binaries and leaves encoding to callers
    (src/hyper.erl:20,58-59); our canonical choice is utf8(string(v)), which
    the kernel mirrors with ``str(v).encode()``.
    """
    return F.encode(col.cast("string"), "UTF-8")


HASH_FNS = ("sha1", "xxhash64")


def _head32(col: Column, hash_fn: str = "sha1") -> Column:
    """First 32 bits of hash(value) as a non-negative bigint.

    ``sha1`` (default) is byte-compatible with the reference's insert
    path (src/hyper.erl:47-56) — sketches, serde, and the golden insert
    vector all match the Erlang implementation bit-for-bit. ``xxhash64``
    is the opt-in fast path: measured 3.2× higher hash-stage throughput
    (3.1 → 10.0 M rows/s on a 4.7M-row scan at local[16]) with the same
    published error bounds (any well-mixed 32-bit head works for HLL) —
    but NO byte parity with the reference or the Python kernel, so
    never union sketches built under different hash_fns."""
    if hash_fn == "sha1":
        return F.conv(
            F.substring(F.sha1(as_hash_bytes(col)), 1, 8), 16, 10
        ).cast("long")
    if hash_fn == "xxhash64":
        # xxhash64(NULL) returns the seed (42), not NULL — gate on the value
        # so NULLs yield NULL idx/rho under every hash_fn (the library-wide
        # NULL-skip contract; pre-filtered paths never take the false branch)
        return F.when(
            col.isNotNull(),
            F.shiftrightunsigned(F.xxhash64(as_hash_bytes(col)), 32),
        )
    raise ValueError(f"hash_fn must be one of {HASH_FNS}, got {hash_fn!r}")


def hll_index_col(col: Column, p: int, hash_fn: str = "sha1") -> Column:
    """Register index: most-significant P bits of the digest."""
    _check_p(p)
    return F.shiftright(_head32(col, hash_fn), 32 - p)


def hll_rho_col(col: Column, p: int, hash_fn: str = "sha1") -> Column:
    """rho = run_of_zeroes(next P bits) + 1 ∈ [1, P+1] (hyper.erl:51-53,189-198).

    bit_length(window) is computed as a WHEN-chain over the p possible
    values instead of ``length(conv(w, 10, 2))``: exact integer compare
    branches, zero per-row allocation (the conv form allocated a binary
    string per row — measurable GC pressure at tens of millions of rows).
    """
    _check_p(p)
    window = F.shiftright(_head32(col, hash_fn), 32 - 2 * p).bitwiseAND(
        F.lit((1 << p) - 1)
    )
    # descending thresholds: w >= 2^(p-1) → rho 1, ..., w >= 1 → rho p
    expr = F.lit(p + 1)  # all-zero window
    rho = None
    for bitlen in range(p, 0, -1):  # bit_length(w) == bitlen → rho = p+1-bitlen
        cond = window >= (1 << (bitlen - 1))
        branch = F.lit(p + 1 - bitlen)
        rho = F.when(cond, branch) if rho is None else rho.when(cond, branch)
    return rho.otherwise(expr).cast("int")


def hll_prepare(col: Column, p: int, hash_fn: str = "sha1") -> tuple[Column, Column]:
    """(index, rho) column pair for one value column at precision p."""
    return hll_index_col(col, p, hash_fn), hll_rho_col(col, p, hash_fn)
