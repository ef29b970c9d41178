"""Pure-Python/numpy sketch kernels (no Spark imports).

Every sketch here is a *mergeable* value: ``merge(a, b)`` is associative,
commutative, and idempotent where the algorithm allows, which is what lets
the Spark layer (``hyper_spark.operators``) run them as two-level
partial/final aggregates.
"""

from hyper_spark.kernel.hll import HllSketch, hash_value, hash_values

__all__ = ["HllSketch", "hash_value", "hash_values"]
