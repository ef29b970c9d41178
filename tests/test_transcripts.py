"""Transcripts generator: determinism, schema, invariants (FIXTURES.md §1)."""

from __future__ import annotations

import os

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


def test_spark_submit_py_files_smoke():
    """The north rule's literal deployment: spark-submit --py-files
    <zip> runs a sketch job with hyper_spark imported ONLY from the zip
    (cwd=/tmp so the repo dir can't leak onto the worker path)."""
    import json
    import shutil
    import subprocess

    import pytest

    from hyper_spark.packaging import build_zip

    submit = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"
    if not os.path.exists(submit):
        pytest.skip("spark-submit not on this machine")
    zip_path = build_zip()
    proc = subprocess.run(
        [
            submit,
            "--master", "local[4]",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--py-files", zip_path,
            os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools", "submit_job.py"),
            "/root/testdata/sf0.001",
        ],
        capture_output=True, text=True, timeout=300, cwd="/tmp",
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    out = json.loads(line)
    assert out["within_bound"] is True


def test_normalized_text_fused_regex_identity(spark):
    """The r04 fused one-regex normalized_text must equal the original
    two-pass form (per-char non-alnum→space, then whitespace collapse)
    on adversarial inputs: unicode punctuation, tabs/newlines, mixed
    punct+space runs, leading/trailing junk, digits."""
    import random

    from pyspark.sql import functions as F

    from hyper_spark.functions.text import normalized_text

    crafted = [
        "", "   ", "a", "A  B\t\nC", "héllo wörld", "a--b  c!!d",
        "1,2;3 4 五", "  .leading", "trailing.  ", "a.b,c;d:e",
        "\t\n\r ", "ABC123xyz", "a!@#$%^&*()b", "ümlaut Ärger",
    ]
    rng = random.Random(3)
    alphabet = "ab1 .,;!\t\n-_ä字"
    crafted += [
        "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 40)))
        for _ in range(200)
    ]
    df = spark.createDataFrame([(s,) for s in crafted], ["t"])
    c = F.col("t")
    old = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(c), r"[^a-z0-9\s]", " "), r"\s+", " "
        )
    )
    bad = df.select(old.alias("o"), normalized_text(c).alias("n")).filter(
        ~F.col("o").eqNullSafe(F.col("n"))
    )
    assert bad.count() == 0, bad.collect()[:5]
