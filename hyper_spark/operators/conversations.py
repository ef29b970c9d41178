"""Conversation-level analytics over transcript tables
(conv_id, turn_idx, role, text, tool, ts — the BASELINE input shape).

The reference has no transcript surface; these are the corpus-quality
operators a transcript training pipeline runs before anything else:
which conversations are structurally sound (dense turn indexes, no
role stutter), how tool-heavy they are, and how much text they carry —
the filter/stratification features for conversation-level sampling.

One plan shape: a single window pass keyed by conv_id (lag(role) for
stutter detection) feeding a groupBy on the SAME key — Catalyst reuses
the window's hash partitioning for the aggregate, so the table
shuffles once (plan-asserted in pytest).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["conversation_stats"]


def conversation_stats(
    df: DataFrame,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    tool_col: str = "tool",
    ts_col: str = "ts",
) -> DataFrame:
    """One row per conversation:

    - ``n_turns``, ``n_roles`` (distinct), ``n_tool_calls`` (non-NULL
      tool), ``n_distinct_tools``
    - ``duration_s`` (max ts − min ts), ``mean_gap_s``
      (duration / (n−1), NULL for 1-turn conversations)
    - ``total_text_chars``, ``avg_text_chars`` (NULL text counts 0)
    - ``first_role`` / ``last_role`` (by turn order)
    - ``n_role_repeats`` — consecutive turns with the same role (0 in
      a well-formed alternating dialogue)
    - ``turns_contiguous`` — turn_idx is exactly 0..n−1 with no gaps
      or duplicates (the input-shape integrity invariant: stable turn
      ordering needs a dense index)
    """
    w = Window.partitionBy(conv_col).orderBy(turn_col)
    prev_role = F.lag(role_col).over(w)
    ts = F.col(ts_col)
    if df.schema[ts_col].dataType.simpleString().startswith("timestamp"):
        ts = ts.cast("timestamp")
    ts = ts.cast("double")
    turn = F.col(turn_col).cast("long")
    staged = df.select(
        conv_col,
        turn,
        F.col(role_col).alias("__role"),
        (F.col(role_col) == prev_role).cast("int").alias("__repeat"),
        F.coalesce(F.length(text_col), F.lit(0)).alias("__chars"),
        F.col(tool_col).alias("__tool"),
        ts.alias("__ts"),
    )
    n = F.count(F.lit(1))
    duration = F.max("__ts") - F.min("__ts")
    # distinct counts via size(collect_set(...)), NOT countDistinct:
    # each DISTINCT aggregate adds an Expand + extra exchanges (3
    # shuffles for 3 countDistincts, measured); collect_set partial-
    # merges like any aggregate, and per-conv sets are bounded by the
    # conversation (roles/tools tiny, turn set = conversation length)
    out = staged.groupBy(conv_col).agg(
        n.cast("bigint").alias("n_turns"),
        F.size(F.collect_set("__role")).cast("bigint").alias("n_roles"),
        F.count("__tool").alias("n_tool_calls"),
        F.size(F.collect_set("__tool")).cast("bigint").alias(
            "n_distinct_tools"
        ),
        duration.alias("duration_s"),
        F.when(n > 1, duration / (n - 1)).alias("mean_gap_s"),
        F.sum("__chars").cast("bigint").alias("total_text_chars"),
        (F.sum("__chars") / n).alias("avg_text_chars"),
        F.min_by("__role", F.col(turn_col)).alias("first_role"),
        F.max_by("__role", F.col(turn_col)).alias("last_role"),
        F.coalesce(F.sum("__repeat"), F.lit(0)).cast("bigint").alias(
            "n_role_repeats"
        ),
        (
            (F.min(turn_col) == 0)
            & (F.max(turn_col) == n - 1)
            & (F.size(F.collect_set(turn_col)) == n)
        ).alias("turns_contiguous"),
    )
    return out
