"""Streaming gap sessionization with watermark-correct merging.

The batch ``operators.temporal.sessionize`` is one window lineage; in
streaming, gap sessions need Spark's session-window MERGE semantics: a
late row (inside the watermark) can bridge two provisional sessions into
one, so no session may be finalized before the watermark passes its end
plus the gap. This operator keeps the full set of OPEN sessions per key
as state (list of (start, last, n) triples), folds each micro-batch's
rows in with an interval merge, and emits a session row exactly once —
when the event-time watermark passes ``last + gap`` and no row can
extend or bridge it anymore. State is then dropped, so per-key state is
bounded by the number of sessions still inside the watermark horizon
(≈ gap/watermark-delay worth of activity), never by stream length.

Batch parity: after a final watermark flush, the emitted sessions are
exactly the batch ``sessionize`` partition of the same rows (same gap
rule; order-insensitive because merging is commutative) — the oracle
gate checks the per-key session histogram against DuckDB's windowed
sessionization.
"""

from __future__ import annotations

from typing import Any, Iterator, Sequence, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["streaming_sessionize"]


def _merge_runs(
    starts: np.ndarray, lasts: np.ndarray, counts: np.ndarray, gap: float
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Merge (start, last, count) runs whose gaps are <= gap. Inputs need
    not be sorted; output sorted by start. Pure numpy, no Python loop
    over rows — only over merged runs."""
    order = np.argsort(starts, kind="stable")
    s, l, c = starts[order], lasts[order], counts[order]
    out_s, out_l, out_c = [], [], []
    cur_s, cur_l, cur_c = s[0], l[0], c[0]
    for i in range(1, len(s)):
        if s[i] - cur_l <= gap:
            cur_l = max(cur_l, l[i])
            cur_c += c[i]
        else:
            out_s.append(cur_s)
            out_l.append(cur_l)
            out_c.append(cur_c)
            cur_s, cur_l, cur_c = s[i], l[i], c[i]
    out_s.append(cur_s)
    out_l.append(cur_l)
    out_c.append(cur_c)
    return (
        np.asarray(out_s, dtype=np.float64),
        np.asarray(out_l, dtype=np.float64),
        np.asarray(out_c, dtype=np.int64),
    )


def streaming_sessionize(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    gap: float,
    watermark: str = "10 minutes",
    output_mode: str = "append",
) -> DataFrame:
    """One output row per CLOSED session: [*keys, session_start,
    session_end, n_events]. A session closes (and its state drops) when
    the watermark passes its last event + ``gap`` — before that, any
    in-watermark late row may still extend it or bridge it with a
    neighbor, exactly like Spark's native session_window merging.

    Sessions still open when the stream ends are never emitted (standard
    Structured Streaming: nothing advances the watermark past them); for
    a terminating replay, append a sentinel row far in the future to
    flush. Default output_mode is 'append' because every emitted row is
    final by construction."""
    keys = list(keys)
    if not keys:
        raise ValueError("streaming sessionization needs at least one key")
    session_tz = df.sparkSession.conf.get("spark.sql.session.timeZone")
    prepared = df.withWatermark(ts_col, watermark).select(*keys, F.col(ts_col))

    out_fields = [
        f"{df.schema[k].name} {df.schema[k].dataType.simpleString()}" for k in keys
    ] + [
        "session_start timestamp",
        "session_end timestamp",
        "n_events bigint",
    ]
    output_schema = ", ".join(out_fields)
    state_schema = "starts array<double>, lasts array<double>, counts array<bigint>"

    def _epoch(series: pd.Series) -> np.ndarray:
        s = pd.to_datetime(series)
        try:
            s = s.dt.tz_localize(session_tz)
        except TypeError:  # already tz-aware
            pass
        return (s.astype("int64") / 1e9).to_numpy()

    def update(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            st, lt, ct = state.get
            starts = np.asarray(st, dtype=np.float64)
            lasts = np.asarray(lt, dtype=np.float64)
            counts = np.asarray(ct, dtype=np.int64)
        else:
            starts = np.empty(0)
            lasts = np.empty(0)
            counts = np.empty(0, dtype=np.int64)

        new_ts = []
        if not state.hasTimedOut:
            for pdf in pdfs:
                if len(pdf):
                    new_ts.append(_epoch(pdf[ts_col]))
        if new_ts:
            ts = np.concatenate(new_ts)
            starts = np.concatenate([starts, ts])
            lasts = np.concatenate([lasts, ts])
            counts = np.concatenate([counts, np.ones(len(ts), dtype=np.int64)])
        if len(starts) == 0:
            if state.exists:
                state.remove()
            return
        starts, lasts, counts = _merge_runs(starts, lasts, counts, gap)

        # close every session the watermark has passed (last + gap <= wm:
        # no in-watermark row can extend or bridge it anymore)
        wm = state.getCurrentWatermarkMs() / 1000.0
        closed = lasts + gap <= wm
        if closed.any():
            out = {k: [key[i]] * int(closed.sum()) for i, k in enumerate(keys)}
            tz_start = pd.to_datetime((starts[closed] * 1e9).astype("int64")).tz_localize("UTC")
            tz_end = pd.to_datetime((lasts[closed] * 1e9).astype("int64")).tz_localize("UTC")
            out["session_start"] = tz_start.tz_convert(session_tz).tz_localize(None)
            out["session_end"] = tz_end.tz_convert(session_tz).tz_localize(None)
            out["n_events"] = counts[closed]
            yield pd.DataFrame(out)
        keep = ~closed
        if keep.any():
            state.update(
                (
                    [float(x) for x in starts[keep]],
                    [float(x) for x in lasts[keep]],
                    [int(x) for x in counts[keep]],
                )
            )
            # wake up when the earliest remaining session becomes closable
            state.setTimeoutTimestamp(int((lasts[keep].min() + gap) * 1000) + 1)
        else:
            state.remove()

    return prepared.groupBy(*keys).applyInPandasWithState(
        update,
        outputStructType=output_schema,
        stateStructType=state_schema,
        outputMode=output_mode,
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
