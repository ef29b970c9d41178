"""Streaming exact dedup: emit each document fingerprint's first arrival.

The streaming face of ``operators.dedup.incremental_dedup``: an endless
ingest where every document should be admitted exactly once per
normalized-text fingerprint, across micro-batches and restarts
(state lives in the checkpoint).

Semantics: the fingerprint (md5 of normalized text, same key as the
batch operators — JVM-computed before the stateful stage) keys the
state; the first micro-batch that carries a fingerprint emits ONE row
(the min-id arrival of that batch, so a batch containing duplicates is
deterministic) and sets a tombstone; later arrivals are swallowed.
Output rows are final by construction → append mode.

State honesty: exact dedup state is O(distinct fingerprints) and can
NEVER be expired — an expired tombstone readmits the next duplicate.
That is inherent to exactness, not an implementation limit (a bounded
alternative would swap the tombstone set for a Bloom filter and accept
false-positive *drops*). The per-key state is 1 boolean (~tens of bytes
with key overhead), so 10^10 distinct docs ≈ hundreds of GB spread
across the cluster's state stores — viable with RocksDB state store,
and the documented cost of exactness.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from hyper_spark.functions.text import fingerprint_col

__all__ = ["streaming_dedup"]


def streaming_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    output_mode: str = "append",
) -> DataFrame:
    """One output row per distinct fingerprint: [fingerprint, id_col] of
    its first arrival. See module docstring for semantics and the
    unbounded-state contract."""
    id_field = df.schema[id_col]
    # NULL-text rows keep their NULL fingerprint and form ONE state
    # group (a single admitted winner) — matching the batch operator's
    # self-dedup and the GROUP BY oracle, which both bucket NULLs
    prepared = df.select(
        fingerprint_col(F.col(text_col)).alias("fingerprint"),
        F.col(id_col),
    )

    output_schema = (
        f"fingerprint string, {id_field.name} {id_field.dataType.simpleString()}"
    )

    def update(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            for _ in pdfs:  # drain: all duplicates
                pass
            return
        first = None
        for pdf in pdfs:
            if len(pdf):
                cand = pdf[id_col].min()
                first = cand if first is None else min(first, cand)
        if first is None:
            return
        state.update((True,))
        yield pd.DataFrame({"fingerprint": [key[0]], id_col: [first]})

    return prepared.groupBy("fingerprint").applyInPandasWithState(
        update,
        outputStructType=output_schema,
        stateStructType="seen boolean",
        outputMode=output_mode,
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
