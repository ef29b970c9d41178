"""DataFrame-level operators: sketch aggregation, dedup, similarity.

All operators follow one shape: JVM-native narrow transformations feed a
partial aggregate, Arrow-batched pandas stages touch only *reduced* data
(register rows or sketch blobs), and every intermediate is a mergeable
state so the same operator works in batch, tree-merge, and streaming.
"""

from hyper_spark.operators.hll_agg import (
    approx_distinct,
    cardinality_col,
    intersect_card,
    sketch_by,
    sketch_collect,
    union_sketches,
)

__all__ = [
    "approx_distinct",
    "cardinality_col",
    "intersect_card",
    "sketch_by",
    "sketch_collect",
    "union_sketches",
]
