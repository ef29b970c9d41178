"""Structured Streaming HLL sketches.

Because the sketch is a mergeable monotone state (element-wise register
max), streaming support is the batch operator re-hosted in
``applyInPandasWithState``: per group key the state is the 2^p-byte
register blob; every micro-batch folds its (idx, rho) rows into the
state with ``np.maximum`` and emits the updated estimate. The hash path
is the same JVM expression tree as batch, so batch and streaming sketches
over the same data are byte-identical — tested by feeding the same rows
through both paths.

Late data needs no special handling for distinct-count sketches (max is
order- and duplicate-insensitive); watermarks only matter when the caller
windows by event time, in which case they compose normally upstream of
this operator.
"""

from __future__ import annotations

from typing import Any, Iterator, Sequence, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from hyper_spark.functions.hashing import hll_prepare
from hyper_spark.kernel.hll import (
    decode_register_blob,
    encode_registers,
    estimate_from_registers,
)

__all__ = [
    "streaming_sketch_by",
    "streaming_cms_by",
    "streaming_theta_by",
    "streaming_quantiles_by",
    "streaming_windowed_sketch_by",
]


def streaming_sketch_by(
    df: DataFrame,
    keys: Sequence[str],
    col: str,
    p: int = 14,
    output_mode: str = "update",
    state_encoding: str = "auto",
    hash_fn: str = "sha1",
) -> DataFrame:
    """Streaming grouped distinct-count sketches.

    Input: a streaming DataFrame. Output: one row per group per
    micro-batch with the current (p, registers, estimate); the emitted
    ``registers`` are always canonical dense bytes (batch parity).
    State per group is at most 2^p bytes independent of stream length;
    with ``state_encoding='auto'`` (default) low-fill groups store the
    sparse ⟨idx:16, rho:8⟩ pair blob instead (src/hyper_bisect.erl:
    18-29) — at high-cardinality streaming keys this shrinks the state
    store by up to ~2^p/3·nnz per group."""
    keys = list(keys)
    if not keys:
        raise ValueError("streaming sketches need at least one group key")
    m = 1 << p
    idx, rho = hll_prepare(F.col(col), p, hash_fn)
    # NULLs are skipped exactly as in batch sketch_by (NULL would hash to
    # NULL idx/rho and poison the densify)
    prepared = df.filter(F.col(col).isNotNull()).select(
        *keys, idx.alias("idx"), rho.alias("rho")
    )

    out_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in [df.schema[k] for k in keys]
    )
    output_schema = f"{out_fields}, p int, registers binary, estimate double"
    state_schema = "registers binary"

    def update(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            (blob,) = state.get
            regs = decode_register_blob(p, blob, state_encoding)
        else:
            regs = np.zeros(m, dtype=np.uint8)
        for pdf in pdfs:
            if len(pdf):
                np.maximum.at(
                    regs,
                    pdf["idx"].to_numpy(dtype=np.int64),
                    pdf["rho"].to_numpy(dtype=np.uint8),
                )
        state.update((encode_registers(regs, state_encoding),))
        est = estimate_from_registers(regs, p)
        out = {k: [key[i]] for i, k in enumerate(keys)}
        out["p"] = [p]
        out["registers"] = [regs.tobytes()]  # canonical dense out
        out["estimate"] = [est]
        yield pd.DataFrame(out)

    return prepared.groupBy(*keys).applyInPandasWithState(
        update,
        outputStructType=output_schema,
        stateStructType=state_schema,
        outputMode=output_mode,
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_windowed_sketch_by(
    df: DataFrame,
    ts_col: str,
    keys: Sequence[str],
    col: str,
    p: int = 14,
    window: str = "1 hour",
    watermark: str = "10 minutes",
    output_mode: str = "update",
    state_encoding: str = "auto",
    hash_fn: str = "sha1",
    slide: str | None = None,
) -> DataFrame:
    """Event-time tumbling-window distinct sketches with BOUNDED state —
    the "watermarks + windowed aggs for late data" shape the north star
    asks for. Without expiry, per-(key, window) state grows forever on
    an endless stream; here a window's state is dropped once the
    watermark passes its end, at which point Spark has already filtered
    every row that could still belong to it, so the drop is lossless.

    Per micro-batch each live (keys, window) emits its current estimate
    with ``final = false``; when the watermark passes a window's end its
    state times out and ONE closing row with ``final = true`` is emitted
    before the state is removed (rows after the last input never close
    windows still below the watermark — standard Structured Streaming).
    Late rows inside the watermark fold in exactly like batch (register
    max is order-insensitive); rows older than the watermark are dropped
    by Spark upstream.

    Output: [*keys, window_start, window_end, p, registers, estimate,
    final]. State per live window ≤ 2^p bytes (sparse-encoded below the
    fill threshold with the default ``state_encoding='auto'``).

    ``slide`` makes the windows SLIDING ("rolling 1-hour distinct,
    updated every 10 minutes"): each event folds into its
    window/slide overlapping windows (Spark's window() generates the
    assignments; register max is order- and duplicate-insensitive, so
    the overlap costs state but never correctness), live state is
    window/slide × the tumbling case, and expiry per window is
    unchanged."""
    keys = list(keys)
    m = 1 << p
    session_tz = df.sparkSession.conf.get("spark.sql.session.timeZone")
    idx, rho = hll_prepare(F.col(col), p, hash_fn)
    win = (
        F.window(F.col(ts_col), window, slide)
        if slide
        else F.window(F.col(ts_col), window)
    )
    # the watermarked event-time column must survive into the stateful
    # operator's child plan (extracting window.start strips the watermark
    # metadata and Spark then rejects EventTimeTimeout), so ts rides
    # along unused
    prepared = (
        df.withWatermark(ts_col, watermark)
        .filter(F.col(col).isNotNull())
        .select(
            *keys,
            win["start"].alias("window_start"),
            win["end"].alias("window_end"),
            idx.alias("idx"),
            rho.alias("rho"),
            F.col(ts_col),
        )
    )

    out_fields = [
        f"{df.schema[k].name} {df.schema[k].dataType.simpleString()}" for k in keys
    ] + [
        "window_start timestamp",
        "window_end timestamp",
        "p int",
        "registers binary",
        "estimate double",
        "final boolean",
    ]
    output_schema = ", ".join(out_fields)
    state_schema = "registers binary"
    group_cols = keys + ["window_start", "window_end"]

    def update(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        def emit(regs: np.ndarray, final: bool) -> pd.DataFrame:
            out = {k: [key[i]] for i, k in enumerate(keys)}
            out["window_start"] = [key[len(keys)]]
            out["window_end"] = [key[len(keys) + 1]]
            out["p"] = [p]
            out["registers"] = [regs.tobytes()]
            out["estimate"] = [estimate_from_registers(regs, p)]
            out["final"] = [final]
            return pd.DataFrame(out)

        if state.hasTimedOut:
            # watermark passed window_end: no row for this window can
            # still arrive — close it and drop the state
            (blob,) = state.get
            regs = decode_register_blob(p, blob, state_encoding)
            state.remove()
            yield emit(regs, True)
            return
        if state.exists:
            (blob,) = state.get
            regs = decode_register_blob(p, blob, state_encoding)
        else:
            regs = np.zeros(m, dtype=np.uint8)
        for pdf in pdfs:
            if len(pdf):
                np.maximum.at(
                    regs,
                    pdf["idx"].to_numpy(dtype=np.int64),
                    pdf["rho"].to_numpy(dtype=np.uint8),
                )
        state.update((encode_registers(regs, state_encoding),))
        # expire when the event-time watermark passes the window end.
        # The key's window_end arrives tz-NAIVE rendered in the session
        # timezone; localize before taking epoch millis or the timeout
        # shifts by the tz offset (early close west of UTC, late east)
        window_end = pd.Timestamp(key[len(keys) + 1])
        if window_end.tz is None:
            window_end = window_end.tz_localize(session_tz)
        state.setTimeoutTimestamp(int(window_end.value // 10**6))
        yield emit(regs, False)

    return prepared.groupBy(*group_cols).applyInPandasWithState(
        update,
        outputStructType=output_schema,
        stateStructType=state_schema,
        outputMode=output_mode,
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def streaming_theta_by(
    df: DataFrame,
    keys: Sequence[str],
    col: str,
    k: int = 4096,
    output_mode: str = "update",
) -> DataFrame:
    """Streaming grouped Theta/KMV sketches: state per group is the
    k-smallest-hashes entry blob (≤ 8k bytes, independent of stream
    length). Union is order- and duplicate-insensitive, so late data
    folds in exactly like batch and batch/stream sketches over the
    same rows are byte-identical (tested). Output per micro-batch:
    [keys..., k, n_entries, entries, estimate] — rows persist as the
    same sketch-table schema ``operators/theta_agg.py`` reads, so a
    stream's final state joins the batch set algebra directly
    (theta_union / theta_intersect_card)."""
    from hyper_spark.kernel.theta import ThetaSketch

    keys = list(keys)
    if not keys:
        raise ValueError("streaming sketches need at least one group key")
    prepared = df.filter(F.col(col).isNotNull()).select(
        *keys, F.xxhash64(F.col(col)).alias("__h")
    )

    out_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in [df.schema[kk] for kk in keys]
    )
    output_schema = (
        f"{out_fields}, k int, n_entries int, entries binary,"
        " hash_fn string, estimate double"
    )
    state_schema = "entries binary"

    def update(key, pdfs, state: GroupState):
        if state.exists:
            (blob,) = state.get
            sk = ThetaSketch.from_bytes(k, bytes(blob))
        else:
            sk = ThetaSketch.empty(k)
        for pdf in pdfs:
            if len(pdf):
                sk = sk.union(
                    ThetaSketch.from_signed_hashes(
                        k, pdf["__h"].to_numpy(dtype=np.int64)
                    )
                )
        state.update((sk.to_bytes(),))
        out = {kk: [key[i]] for i, kk in enumerate(keys)}
        out["k"] = [k]
        out["n_entries"] = [len(sk.entries)]
        out["entries"] = [sk.to_bytes()]
        out["hash_fn"] = ["xxhash64"]
        out["estimate"] = [sk.estimate()]
        yield pd.DataFrame(out)

    return prepared.groupBy(*keys).applyInPandasWithState(
        update,
        outputStructType=output_schema,
        stateStructType=state_schema,
        outputMode=output_mode,
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_cms_by(
    df: DataFrame,
    keys: Sequence[str],
    col: str,
    depth: int = 5,
    width: int = 2048,
    output_mode: str = "update",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Streaming grouped count-min sketches: state is the d×w int64
    counter blob per group (addition is the merge, so late/out-of-order
    data folds in exactly like batch). Same bucket exprs as the batch
    operator (xxhash64 default, md5 the opt-in kernel-parity mode —
    same hash_fn contract: never merge across hash_fns) ⇒ batch/stream
    counters are
    identical for the same rows."""
    from hyper_spark.operators.cms_agg import cms_bucket_col

    keys = list(keys)
    if not keys:
        raise ValueError("streaming sketches need at least one group key")
    buckets = F.posexplode(
        F.array(*[cms_bucket_col(F.col(col), i, width, hash_fn) for i in range(depth)])
    )
    prepared = df.filter(F.col(col).isNotNull()).select(
        *keys, buckets.alias("row", "bucket")
    )

    out_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in [df.schema[k] for k in keys]
    )
    output_schema = (
        f"{out_fields}, depth int, width int, n bigint, counters binary,"
        " hash_fn string"
    )
    state_schema = "n bigint, counters binary"

    def update(key, pdfs, state: GroupState):
        if state.exists:
            n, blob = state.get
            counters = np.frombuffer(blob, dtype="<i8").reshape(depth, width).copy()
        else:
            n, counters = 0, np.zeros((depth, width), dtype=np.int64)
        for pdf in pdfs:
            if len(pdf):
                rows = pdf["row"].to_numpy(dtype=np.int64)
                np.add.at(
                    counters,
                    (rows, pdf["bucket"].to_numpy(dtype=np.int64)),
                    1,
                )
                # count input rows as row==0 cells: exact even when a
                # group's exploded rows split across Arrow batches at a
                # non-multiple of depth (len//depth would floor-undercount
                # and understate the eps*n bound derived from n)
                n += int((rows == 0).sum())
        blob = counters.astype("<i8").tobytes()
        state.update((n, blob))
        out = {k: [key[i]] for i, k in enumerate(keys)}
        out.update(
            depth=[depth], width=[width], n=[n], counters=[blob],
            hash_fn=[hash_fn],
        )
        yield pd.DataFrame(out)

    return prepared.groupBy(*keys).applyInPandasWithState(
        update,
        outputStructType=output_schema,
        stateStructType=state_schema,
        outputMode=output_mode,
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_quantiles_by(
    df: DataFrame,
    keys: Sequence[str],
    col: str,
    qs: Sequence[float],
    method: str = "tdigest",
    param: float | None = None,
    output_mode: str = "update",
) -> DataFrame:
    """Streaming grouped quantiles (KLL or t-digest state per group) —
    the turn-latency-quantile workload in streaming form. Emits an
    UPDATED row per key every micro-batch, so the default output mode is
    'update' like the other stateful operators (ADVICE r02: with an
    append sink each per-batch row would look final). State is the
    kernel sketch's JSON dict (bounded: KLL O(k·log(n/k)) items,
    t-digest O(delta) centroids — independent of stream length); every
    micro-batch folds its values with ``update_batch`` and emits the
    current quantile estimates, column-named like the batch operator
    (``q_0500`` for q=0.5). NULL values are skipped as in batch."""
    import json

    from hyper_spark.kernel.kll import KllSketch
    from hyper_spark.kernel.tdigest import TDigest

    keys = list(keys)
    if not keys:
        raise ValueError("streaming sketches need at least one group key")
    qs = [float(q) for q in qs]
    if param is None:
        param = 200.0
    prepared = df.filter(F.col(col).isNotNull()).select(
        *keys, F.col(col).cast("double").alias("__v")
    )

    out_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in [df.schema[k] for k in keys]
    )
    q_fields = ", ".join(f"q_{int(q * 1000):04d} double" for q in qs)
    output_schema = f"{out_fields}, n bigint, {q_fields}"
    state_schema = "state binary"

    def new_sketch():
        return KllSketch(int(param)) if method == "kll" else TDigest(param)

    def from_state(blob: bytes):
        d = json.loads(bytes(blob).decode())
        return KllSketch.from_dict(d) if method == "kll" else TDigest.from_dict(d)

    def update(key, pdfs, state: GroupState):
        sk = from_state(state.get[0]) if state.exists else new_sketch()
        for pdf in pdfs:
            if len(pdf):
                sk.update_batch(pdf["__v"].to_numpy(dtype=np.float64))
        state.update((json.dumps(sk.to_dict()).encode(),))
        out = {k: [key[i]] for i, k in enumerate(keys)}
        out["n"] = [int(sk.n)]
        ests = sk.quantiles(qs)
        for q, est in zip(qs, ests):
            out[f"q_{int(q * 1000):04d}"] = [float(est)]
        yield pd.DataFrame(out)

    return prepared.groupBy(*keys).applyInPandasWithState(
        update,
        outputStructType=output_schema,
        stateStructType=state_schema,
        outputMode=output_mode,
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
