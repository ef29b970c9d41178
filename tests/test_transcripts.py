"""Transcripts generator: determinism, schema, invariants (FIXTURES.md §1)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hyper_spark.sources.transcripts import n_convs_for_sf, transcripts_df


def test_schema_and_partition_independence(spark):
    a = transcripts_df(spark, sf=0.001, num_partitions=4).orderBy("conv_id", "turn_idx")
    b = transcripts_df(spark, sf=0.001, num_partitions=13).orderBy("conv_id", "turn_idx")
    assert a.schema == b.schema
    assert a.schema.simpleString() == (
        "struct<conv_id:string,turn_idx:int,role:string,text:string,"
        "tool:string,ts:timestamp>"
    )
    ra, rb = a.collect(), b.collect()
    assert ra == rb  # same rows regardless of parallelism


def test_per_row_invariant_text_equality(spark):
    """BASELINE.json input_hint: per-turn text equality under stable
    (conv_id, turn_idx) ordering — text embeds its own coordinates."""
    tx = transcripts_df(spark, sf=0.001)
    bad = tx.filter(
        ~F.col("text").startswith(
            F.concat_ws(":", "conv_id", F.col("turn_idx").cast("string"), "role")
        )
    )
    assert bad.count() == 0


def test_invariants(spark):
    tx = transcripts_df(spark, sf=0.001).cache()
    # turn_idx contiguous from 0 per conv
    agg = tx.groupBy("conv_id").agg(
        F.min("turn_idx").alias("mn"),
        F.max("turn_idx").alias("mx"),
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("turn_idx").alias("nd"),
    )
    assert agg.filter("mn != 0 or n != mx + 1 or n != nd").count() == 0
    # ts strictly increasing within conv
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    lagged = tx.withColumn("prev", F.lag("ts").over(w))
    assert lagged.filter("prev is not null and ts <= prev").count() == 0
    # tool set only on tool turns
    assert tx.filter("(role = 'tool') != (tool is not null)").count() == 0
    # skew: hot head conversations exist (64 turns)
    assert tx.groupBy("conv_id").count().filter("count = 64").count() >= 1
    tx.unpersist()


def test_scale_knob():
    assert n_convs_for_sf(0.01) == 10 * n_convs_for_sf(0.001)
