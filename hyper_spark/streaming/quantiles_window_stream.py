"""Event-time windowed streaming quantiles with watermark expiry.

Completes the windowed-stream family (distinct sketches →
``streaming_windowed_sketch_by``, heavy hitters →
``streaming_windowed_topk``): per (keys, tumbling window), a KLL or
t-digest sketch accumulates the window's values; when the event-time
watermark passes the window end, ONE final row of quantile estimates is
emitted and the state drops. Late rows inside the watermark fold in
order-insensitively (sketch updates commute); older rows are dropped by
Spark upstream. State per live window is the kernel sketch's bounded
summary (KLL O(k·log(n/k)) items, t-digest O(delta) centroids),
independent of stream length — so an endless stream holds only
watermark-horizon windows.
"""

from __future__ import annotations

import json
from typing import Any, Iterator, Sequence, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["streaming_windowed_quantiles"]


def streaming_windowed_quantiles(
    df: DataFrame,
    ts_col: str,
    keys: Sequence[str],
    col: str,
    qs: Sequence[float],
    method: str = "kll",
    param: float | None = None,
    window: str = "1 hour",
    watermark: str = "10 minutes",
    output_mode: str = "append",
) -> DataFrame:
    """One FINAL row per (keys, window) after it closes: [*keys,
    window_start, window_end, n, q_XXXX...]. Append mode (rows are
    final by construction). Windows still open when a finite replay
    ends need a far-future sentinel row to flush, as with the other
    watermarked operators."""
    from hyper_spark.kernel.kll import KllSketch
    from hyper_spark.kernel.tdigest import TDigest

    if method not in ("kll", "tdigest"):
        raise ValueError(f"unknown quantile method {method!r}")
    keys = list(keys)
    qs = [float(q) for q in qs]
    if param is None:
        param = 200.0
    session_tz = df.sparkSession.conf.get("spark.sql.session.timeZone")
    win = F.window(F.col(ts_col), window)
    prepared = (
        df.withWatermark(ts_col, watermark)
        .filter(F.col(col).isNotNull())
        .select(
            *keys,
            win["start"].alias("window_start"),
            win["end"].alias("window_end"),
            F.col(col).cast("double").alias("__v"),
            F.col(ts_col),
        )
    )

    out_fields = [
        f"{df.schema[k].name} {df.schema[k].dataType.simpleString()}" for k in keys
    ] + ["window_start timestamp", "window_end timestamp", "n bigint"] + [
        f"q_{int(q * 1000):04d} double" for q in qs
    ]
    output_schema = ", ".join(out_fields)
    state_schema = "state binary"
    group_cols = keys + ["window_start", "window_end"]

    def new_sketch():
        return KllSketch(int(param)) if method == "kll" else TDigest(param)

    def from_state(blob: bytes):
        d = json.loads(bytes(blob).decode())
        return KllSketch.from_dict(d) if method == "kll" else TDigest.from_dict(d)

    def update(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            sk = from_state(state.get[0])
            state.remove()
            out = {k: [key[i]] for i, k in enumerate(keys)}
            out["window_start"] = [key[len(keys)]]
            out["window_end"] = [key[len(keys) + 1]]
            out["n"] = [int(sk.n)]
            for q, est in zip(qs, sk.quantiles(qs)):
                out[f"q_{int(q * 1000):04d}"] = [float(est)]
            yield pd.DataFrame(out)
            return
        sk = from_state(state.get[0]) if state.exists else new_sketch()
        for pdf in pdfs:
            if len(pdf):
                sk.update_batch(pdf["__v"].to_numpy(dtype=np.float64))
        state.update((json.dumps(sk.to_dict()).encode(),))
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
