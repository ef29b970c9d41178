"""Deterministic synthetic transcripts table (FIXTURES.md §1; schema per
BASELINE.json ``input_hint``):

    conv_id:string, turn_idx:int32, role:string, text:string,
    tool:string, ts:timestamp

Generation is *distributed and partition-layout-independent*: we
``spark.range`` over conversation ids and expand each conversation inside
``mapInPandas`` with a numpy Generator seeded by ``(seed, conv_k)`` — the
same conv always produces identical rows no matter which task generates
it, so the table is reproducible at any parallelism (this is what makes
the local[8]-vs-local[32] scaling comparison apples-to-apples).

Skew: rows-per-conversation follow a heavy-tailed (Zipf-ish) law plus a
deliberately hot head (first HOT_FRACTION of convs maxed at MAX_TURNS) to
exercise the skew-handling paths; tool names draw from a 20-item vocab
with power-law skew (heavy-hitter ground truth); ``ts`` is strictly
increasing within a conversation with seeded 1–120 s gaps (turn-latency
quantile ground truth).

Scale: SF=1 would be ~6M turns; testing uses SF=0.001/0.01/0.1. At real
scale the same generator shape (range → mapInPandas) produces arbitrarily
large tables with no driver bottleneck.
"""

from __future__ import annotations

import os
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)

TURNS_PER_SF = 6_000_000
MEAN_TURNS = 24.0  # empirical mean of the turns-per-conv law below
MAX_TURNS = 64
HOT_FRACTION = 0.002  # head conversations pinned at MAX_TURNS (skew)
EPOCH0 = np.datetime64("2026-01-01T00:00:00")

TOOL_VOCAB = [f"tool_{i:02d}" for i in range(20)]

_FILLER_WORDS = np.array(
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo "
    "lima mike november oscar papa quebec romeo sierra tango uniform victor "
    "whiskey xray yankee zulu".split()
)


def n_convs_for_sf(sf: float) -> int:
    return max(1, int(round(sf * TURNS_PER_SF / MEAN_TURNS)))


def _gen_conv(k: int, seed: int, n_convs: int) -> dict:
    rng = np.random.default_rng(np.uint64(seed) * np.uint64(1_000_000_007) + np.uint64(k))
    hot = k < max(1, int(HOT_FRACTION * n_convs))
    if hot:
        n = MAX_TURNS
    else:
        # heavy tail: most convs short, a few long
        n = 1 + int((MAX_TURNS - 1) * rng.random() ** 2.5)
    conv_id = f"conv{k:08d}"

    roles = np.empty(n, dtype=object)
    start_system = rng.random() < 0.2
    tool_flags = rng.random(n) < 0.15
    alt = 0
    for i in range(n):
        if i == 0 and start_system:
            roles[i] = "system"
        elif tool_flags[i] and i > 0:
            roles[i] = "tool"
        else:
            roles[i] = "user" if alt % 2 == 0 else "assistant"
            alt += 1

    tools = np.where(
        roles == "tool",
        np.array(TOOL_VOCAB, dtype=object)[
            np.minimum((rng.random(n) ** 3 * len(TOOL_VOCAB)).astype(int), 19)
        ],
        None,
    )

    filler_idx = rng.integers(0, len(_FILLER_WORDS), size=(n, 6))
    fillers = [" ".join(_FILLER_WORDS[row]) for row in filler_idx]
    texts = [
        f"{conv_id}:{i}:{roles[i]}:{fillers[i]}" for i in range(n)
    ]

    gaps = rng.integers(1, 121, size=n)
    gaps[0] = 0
    offsets = np.cumsum(gaps)
    conv_offset = np.int64(k) * 97 % 86_400_000
    ts = EPOCH0 + np.timedelta64(1, "s") * (conv_offset + offsets)

    return {
        "conv_id": np.repeat(conv_id, n),
        "turn_idx": np.arange(n, dtype=np.int32),
        "role": roles,
        "text": texts,
        "tool": tools,
        "ts": ts,
    }


def transcripts_df(
    spark: SparkSession,
    sf: float = 0.01,
    seed: int = 42,
    num_partitions: int | None = None,
) -> DataFrame:
    n_convs = n_convs_for_sf(sf)
    if num_partitions is None:
        num_partitions = min(max(8, n_convs // 2000), 200)

    def expand(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            # assemble one frame per batch (a frame per conversation is
            # ~10× slower at sf >= 1)
            parts = [_gen_conv(int(k), seed, n_convs) for k in pdf["id"]]
            yield pd.DataFrame(
                {
                    key: np.concatenate([p[key] for p in parts])
                    if key != "text"
                    else [t for p in parts for t in p[key]]
                    for key in ("conv_id", "turn_idx", "role", "text", "tool", "ts")
                }
            )

    return (
        spark.range(0, n_convs, numPartitions=num_partitions)
        .mapInPandas(expand, schema=SCHEMA)
    )


def write_transcripts(
    spark: SparkSession,
    path: str,
    sf: float = 0.01,
    seed: int = 42,
) -> str:
    """Materialize to parquet (cached; regenerates only if missing)."""
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        transcripts_df(spark, sf=sf, seed=seed).write.mode("overwrite").parquet(path)
    return path
