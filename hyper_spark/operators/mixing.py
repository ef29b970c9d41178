"""Deterministic corpus mixing — domain rebalancing for training sets.

The reference (GameAnalytics/hyper) has no mixing surface; this is
training-data-pipeline tier (SURVEY §2.4/§6). Pre-training recipes
specify the corpus as target *shares* per domain ("50% web, 25% code,
25% books"); the pipeline must turn shares into per-domain sampling
fractions against what is actually available, then draw a sample that
is reproducible across re-runs and cluster sizes.

Two steps, separately inspectable:

- ``mixture_plan``: one groupBy over the corpus → per-domain
  availability (rows or exact token sums), then pure arithmetic:
  normalized weight, feasible budget, target, sampling fraction.
  Everything stays double-precision with no rounding, so the SQL
  oracle reproduces the plan bit-for-bit.
- ``apply_mixture``: joins the (broadcast, |domains|-row) plan and
  keeps a row iff its deterministic md5 draw falls under the domain's
  threshold ``floor(fraction × 2^32)`` — the same draw the
  sampling/split family uses, so mixture sampling composes with
  splits (a row's train/val split and its mixture inclusion use
  independent seeds). floor (not round) keeps the threshold exactly
  reproducible in SQL.

Budget semantics: ``budget=None`` picks the LARGEST total the
available data can serve at the requested shares without oversampling
any domain — budget = min over domains of available/weight; a domain
with zero weight (or absent from ``weights``) is excluded. An
explicit budget larger than feasible caps each domain at fraction 1.0
(the plan row shows ``fraction = 1.0`` and a shortfall; this engine
never duplicates rows — upsampling-with-repeats is a trainer-side
epoch decision, not a corpus operation).

Scale shape: plan = one partial-aggregated groupBy (|domains| rows
collected — bounded, like IVF centroids); apply = broadcast hash join
+ codegen filter, map-only over the corpus. Nothing shuffles raw
rows.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hyper_spark.functions.text import token_count_col
from hyper_spark.operators.sampling import split_hash_col

__all__ = ["mixture_plan", "apply_mixture"]

_HASH_SPACE = float(1 << 32)


def mixture_plan(
    df: DataFrame,
    weights: dict[str, float],
    by: str = "source",
    unit: str = "rows",
    text_col: str = "text",
    budget: float | None = None,
) -> DataFrame:
    """Per-domain sampling plan:
    DataFrame[{by}, weight, available, target, fraction] — ``weight``
    normalized to sum 1 over the requested domains, ``available`` the
    domain's row or exact token count, ``target = weight × budget``,
    ``fraction = min(1, target / available)``. ``unit`` is ``'rows'``
    or ``'tokens'`` (whitespace tokens of ``text_col``)."""
    if not weights:
        raise ValueError("weights must be non-empty")
    if any(w < 0 for w in weights.values()) or sum(weights.values()) <= 0:
        raise ValueError("weights must be non-negative with a positive sum")
    if unit == "rows":
        avail_expr = F.count(F.lit(1))
    elif unit == "tokens":
        avail_expr = F.sum(token_count_col(F.col(text_col)))
    else:
        raise ValueError(f"unknown unit {unit!r}")

    wsum = sum(weights.values())
    norm = {k: w / wsum for k, w in weights.items() if w > 0}

    avail = {
        r[by]: r["available"]
        for r in df.filter(F.col(by).isin(list(norm)))
        .groupBy(by)
        .agg(avail_expr.cast("bigint").alias("available"))
        .collect()
    }
    missing = [k for k in norm if avail.get(k, 0) == 0]
    if missing:
        raise ValueError(f"domains with no available data: {sorted(missing)}")
    if budget is None:
        budget = min(avail[k] / w for k, w in norm.items())

    spark = df.sparkSession
    rows = [
        (
            k,
            float(norm[k]),
            int(avail[k]),
            float(norm[k] * budget),
            float(min(1.0, (norm[k] * budget) / avail[k])),
        )
        for k in sorted(norm)
    ]
    return spark.createDataFrame(
        rows, f"{by} string, weight double, available bigint, target double, fraction double"
    )


def apply_mixture(
    df: DataFrame,
    plan: DataFrame,
    by: str = "source",
    on: str = "doc_id",
    seed: str | int = 0,
) -> DataFrame:
    """Draw the mixture sample: keep a row iff
    ``int(md5(id ':' seed)[:8], 16) < floor(fraction × 2^32)`` for its
    domain (all rows kept at fraction >= 1). Domains outside the plan
    are dropped. Pure function of (id, seed, plan) — re-runs, retries
    and different partitionings draw the identical sample. The plan
    side is broadcast; the corpus side is a map-only filter."""
    # thresholds computed driver-side from the (bounded) plan so the
    # comparison stays a fixed-width hex string compare in codegen
    rows = plan.select(by, "fraction").collect()
    thr = [
        (
            r[by],
            "g"  # sorts after every hex digit: always-true threshold
            if r["fraction"] >= 1.0
            else format(int(math.floor(r["fraction"] * _HASH_SPACE)), "08x"),
        )
        for r in rows
    ]
    spark = df.sparkSession
    thr_df = spark.createDataFrame(thr, f"{by} string, __thr string")
    draw = split_hash_col(F.col(on), seed)
    return (
        df.join(F.broadcast(thr_df), [by])
        .filter(draw < F.col("__thr"))
        .drop("__thr")
    )
