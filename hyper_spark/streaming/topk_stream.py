"""Streaming windowed heavy hitters with bounded (space-saving) state.

Per (keys, event-time tumbling window), the state is a space-saving
summary of at most ``capacity`` (value, count, err) counters — the
classic bounded-memory top-k structure (Metwally et al., "Efficient
Computation of Frequent and Top-k Elements in Data Streams"): a new
value beyond capacity evicts the current minimum counter and inherits
its count as overestimation error. Guarantees, independent of stream
length:

- every counter satisfies true_count <= est_count <= true_count + err;
- any value with true frequency > n/capacity is IN the summary;
- with ``capacity`` >= the window's distinct-value count, counts are
  EXACT and err == 0 (what the oracle gate exploits).

A window's summary is emitted ONCE — when the event-time watermark
passes the window end (no row can still arrive) — as its final top-k,
then the state drops. State per live window is O(capacity), so an
endless stream holds only watermark-horizon windows × capacity
counters. Rows inside the watermark fold in order-insensitively
(per-batch counts merge into counters); older rows are dropped by
Spark upstream, as with every watermarked operator.
"""

from __future__ import annotations

from typing import Any, Iterator, Sequence, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["streaming_windowed_topk"]


def streaming_windowed_topk(
    df: DataFrame,
    ts_col: str,
    keys: Sequence[str],
    col: str,
    k: int = 10,
    capacity: int | None = None,
    window: str = "1 hour",
    watermark: str = "10 minutes",
    output_mode: str = "append",
) -> DataFrame:
    """One row per (keys, window, rank<=k) AFTER the window closes:
    [*keys, window_start, window_end, value, est_count, err_bound,
    rank]. ``value`` is the tracked column cast to string (uniform
    state type). Default ``capacity`` is ``8*k``. Output rows are final
    by construction → append mode.

    Windows still open when a finite replay ends never close (nothing
    advances the watermark past them) — append a far-future sentinel
    row to flush, as with ``streaming_sessionize``."""
    keys = list(keys)
    capacity = capacity or 8 * k
    if capacity < k:
        raise ValueError("capacity must be >= k")
    session_tz = df.sparkSession.conf.get("spark.sql.session.timeZone")
    win = F.window(F.col(ts_col), window)
    # the watermarked ts column must ride along into the stateful
    # operator's child plan (extracting window.start strips the
    # watermark metadata; same gotcha as streaming_windowed_sketch_by)
    prepared = (
        df.withWatermark(ts_col, watermark)
        .filter(F.col(col).isNotNull())
        .select(
            *keys,
            win["start"].alias("window_start"),
            win["end"].alias("window_end"),
            F.col(col).cast("string").alias("__v"),
            F.col(ts_col),
        )
    )

    out_fields = [
        f"{df.schema[kk].name} {df.schema[kk].dataType.simpleString()}"
        for kk in keys
    ] + [
        "window_start timestamp",
        "window_end timestamp",
        "value string",
        "est_count bigint",
        "err_bound bigint",
        "rank int",
    ]
    output_schema = ", ".join(out_fields)
    state_schema = (
        "vals array<string>, counts array<bigint>, errs array<bigint>"
    )
    group_cols = keys + ["window_start", "window_end"]

    def update(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            vals, counts, errs = state.get
            state.remove()
            top = sorted(
                zip(vals, counts, errs), key=lambda t: (-t[1], t[0])
            )[:k]
            out = {kk: [key[i]] * len(top) for i, kk in enumerate(keys)}
            out["window_start"] = [key[len(keys)]] * len(top)
            out["window_end"] = [key[len(keys) + 1]] * len(top)
            out["value"] = [t[0] for t in top]
            out["est_count"] = [t[1] for t in top]
            out["err_bound"] = [t[2] for t in top]
            out["rank"] = list(range(1, len(top) + 1))
            yield pd.DataFrame(out)
            return

        if state.exists:
            vals, counts, errs = state.get
            summary = {v: (c, e) for v, c, e in zip(vals, counts, errs)}
        else:
            summary = {}
        for pdf in pdfs:
            if not len(pdf):
                continue
            for v, c in pdf["__v"].value_counts().items():
                c = int(c)
                if v in summary:
                    cur, err = summary[v]
                    summary[v] = (cur + c, err)
                elif len(summary) < capacity:
                    summary[v] = (c, 0)
                else:
                    # space-saving eviction: the minimum counter's count
                    # becomes the newcomer's overestimation error
                    evict = min(summary.items(), key=lambda t: (t[1][0], t[0]))
                    m_min = evict[1][0]
                    del summary[evict[0]]
                    summary[v] = (m_min + c, m_min)
        if summary:
            vs = list(summary)
            state.update(
                (vs, [summary[v][0] for v in vs], [summary[v][1] for v in vs])
            )
            window_end = pd.Timestamp(key[len(keys) + 1])
            if window_end.tz is None:
                window_end = window_end.tz_localize(session_tz)
            state.setTimeoutTimestamp(int(window_end.value // 10**6))
        return

    return prepared.groupBy(*group_cols).applyInPandasWithState(
        update,
        outputStructType=output_schema,
        stateStructType=state_schema,
        outputMode=output_mode,
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
