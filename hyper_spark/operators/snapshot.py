"""Table maintenance over immutable snapshots: CDC-style upsert/merge
and snapshot diffing — the operations that keep a 100-TB training
corpus current between rebuilds.

``merge_upsert`` is the MERGE INTO shape (Delta/Iceberg upsert
semantics) in plain DataFrame algebra: union the target with the
change set, keep one winner per key (change beats target; among
versioned changes the highest version wins), drop rows flagged
deleted. One shuffle on the key — the same cost as any keyed window —
and pure Catalyst end-to-end, so partition pruning and AQE skew
handling apply unchanged at scale.

``snapshot_diff`` answers "what changed between these two snapshots?"
as a keyed full-outer join comparing a typed struct of the tracked
columns with null-safe equality — added / removed / changed rows come
back as data, feeding audits, incremental downstream refreshes, or
drift monitors (operators/profile.py::vocab_drift is the
content-level sibling).

Reference parity note: the reference (src/hyper.erl) has no table
layer; this is engine surface (SURVEY.md §2.4) with MERGE semantics
from the SQL standard.

Contracts:
- keys identify a row: both operators treat rows with equal keys as
  the same logical entity. Spark groups NULL keys together (SQL
  window/join-on-NULL semantics differ!) — keep keys non-NULL.
- ``merge_upsert`` requires the change set to be key-unique unless a
  ``version_col`` orders duplicates; otherwise the winner among
  same-key changes would be nondeterministic, so it raises.
- snapshots are key-unique by definition; ``snapshot_diff`` on a
  duplicate-key input multiplies join rows (garbage in, garbage out).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["merge_upsert", "snapshot_diff", "diff_summary"]


def merge_upsert(
    target: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    version_col: str | None = None,
    delete_col: str | None = None,
) -> DataFrame:
    """Apply ``changes`` to ``target``: rows whose ``keys`` match an
    existing row replace it, unmatched rows insert, and rows whose
    ``delete_col`` is true delete. Returns the new snapshot with
    ``target``'s columns.

    With ``version_col``, the highest version per key wins among the
    changes AND a change only replaces a target row when its version
    is at least the target's (late-arriving stale updates are no-ops —
    the idempotent CDC replay contract). Without it, ``changes`` must
    be key-unique (checked with one cheap aggregate) and always beats
    the target.
    """
    keys = list(keys)
    cols = target.columns
    missing = [c for c in cols if c not in changes.columns]
    if missing:
        raise ValueError(
            f"changes is missing target columns {missing}; supply full "
            "rows (MERGE semantics replace the whole row)"
        )
    if version_col is None:
        dup = (
            changes.groupBy(*keys)
            .agg(F.count(F.lit(1)).alias("__c"))
            .filter(F.col("__c") > 1)
            .limit(1)
            .count()
        )
        if dup:
            raise ValueError(
                "changes has duplicate keys and no version_col — the "
                "merge winner would be nondeterministic"
            )

    is_del = (
        F.col(delete_col).cast("boolean") if delete_col else F.lit(False)
    )
    ch = changes.select(
        *cols,
        F.coalesce(is_del, F.lit(False)).alias("__del"),
        F.lit(1).alias("__src"),
    )
    tg = target.select(
        *cols, F.lit(False).alias("__del"), F.lit(0).alias("__src")
    )
    u = tg.unionByName(ch)
    order = []
    if version_col:
        order.append(F.col(version_col).desc_nulls_last())
    order.append(F.col("__src").desc())
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        u.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .filter(~F.col("__del"))
        .select(*cols)
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Row-level diff of two key-unique snapshots:
    DataFrame[*keys, change] with change ∈ {'added', 'removed',
    'changed'} (unchanged rows are omitted — on a 100-TB table they
    are the overwhelming majority and nobody wants them back).

    ``compare_cols`` defaults to every shared non-key column; the
    comparison is a typed struct null-safe equality, so NULL→value
    and value→NULL both count as 'changed' and NULL==NULL does not.
    One keyed full-outer join — the minimal shuffle for the question.
    """
    keys = list(keys)
    if compare_cols is None:
        compare_cols = [
            c for c in old.columns if c not in keys and c in new.columns
        ]
    compare_cols = list(compare_cols)
    if not compare_cols:
        raise ValueError("no columns to compare")
    o = old.select(*keys, F.struct(*compare_cols).alias("__o"))
    n = new.select(*keys, F.struct(*compare_cols).alias("__n"))
    j = o.join(n, on=keys, how="full_outer")
    change = (
        F.when(F.col("__o").isNull(), F.lit("added"))
        .when(F.col("__n").isNull(), F.lit("removed"))
        .when(~F.col("__o").eqNullSafe(F.col("__n")), F.lit("changed"))
    )
    return (
        j.withColumn("change", change)
        .filter(F.col("change").isNotNull())
        .select(*keys, "change")
    )


def diff_summary(diff: DataFrame) -> DataFrame:
    """Counts per change kind: DataFrame[change, n_rows]."""
    return diff.groupBy("change").agg(F.count(F.lit(1)).alias("n_rows"))
