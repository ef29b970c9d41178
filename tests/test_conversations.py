"""conversation_stats vs a brute-force python oracle."""

from __future__ import annotations

import datetime as dt


def test_conversation_stats_matches_python(spark):
    from hyper_spark.operators.conversations import conversation_stats

    base = dt.datetime(2026, 1, 1)
    rows = [
        # well-formed alternating conv, dense turns
        ("a", 0, "user", "hi", None, base),
        ("a", 1, "assistant", "hello!", None, base + dt.timedelta(seconds=5)),
        ("a", 2, "user", "run it", "bash", base + dt.timedelta(seconds=65)),
        # role stutter + NULL text + duplicate tool
        ("b", 0, "user", "x", "search", base),
        ("b", 1, "user", None, "search", base + dt.timedelta(seconds=10)),
        ("b", 2, "assistant", "yy", None, base + dt.timedelta(seconds=10)),
        # gap in turn idx (1 missing) -> not contiguous
        ("c", 0, "user", "q", None, base),
        ("c", 2, "assistant", "a", None, base + dt.timedelta(seconds=3)),
        # single turn
        ("d", 0, "system", "s", None, base),
        # duplicate turn idx -> not contiguous
        ("e", 0, "user", "1", None, base),
        ("e", 0, "user", "2", None, base + dt.timedelta(seconds=1)),
        ("e", 1, "assistant", "3", None, base + dt.timedelta(seconds=2)),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    ).repartition(3)
    got = {r["conv_id"]: r for r in conversation_stats(df).collect()}

    a = got["a"]
    assert a["n_turns"] == 3 and a["n_roles"] == 2 and a["n_tool_calls"] == 1
    assert a["n_distinct_tools"] == 1 and a["duration_s"] == 65.0
    assert abs(a["mean_gap_s"] - 32.5) < 1e-12
    assert a["total_text_chars"] == 2 + 6 + 6
    assert a["first_role"] == "user" and a["last_role"] == "user"
    assert a["n_role_repeats"] == 0 and a["turns_contiguous"]

    b = got["b"]
    assert b["n_tool_calls"] == 2 and b["n_distinct_tools"] == 1
    assert b["n_role_repeats"] == 1 and b["turns_contiguous"]
    assert b["total_text_chars"] == 1 + 0 + 2

    c = got["c"]
    assert not c["turns_contiguous"] and c["n_turns"] == 2

    d = got["d"]
    assert d["mean_gap_s"] is None and d["duration_s"] == 0.0
    assert d["turns_contiguous"] and d["first_role"] == d["last_role"] == "system"

    e = got["e"]
    assert not e["turns_contiguous"]  # duplicate idx 0
    assert e["n_turns"] == 3


def test_conversation_stats_single_shuffle(spark):
    from hyper_spark.operators.conversations import conversation_stats
    from hyper_spark.plans.report import assert_plan

    df = spark.createDataFrame(
        [("a", 0, "user", "t", None, dt.datetime(2026, 1, 1))],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    # the window and the aggregate share the conv_id hash partitioning:
    # the table crosses the network once
    assert_plan(conversation_stats(df), max_exchanges=1, no_python=True)
