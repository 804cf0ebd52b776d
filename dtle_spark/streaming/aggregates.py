"""Streaming analytics over change/event streams — the windowed
aggregation surface the reference lacks entirely (SURVEY §2.6:
"watermarks, tumbling windows, late data do not exist" in dtle).

These are thin, tested compositions of Structured Streaming built-ins;
they exist so replication pipelines can fan out analytics from the
same wire stream (one source -> N queries)."""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling-window counts with late-data bound (watermark)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window), key_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("window.start").alias("w_start"),
            F.col("window.end").alias("w_end"),
            key_col,
            "n",
        )
    )


def session_windows(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Gap-based session windows (streaming twin of the batch
    sessionize query)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap), key_col)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("session_window.start").alias("s_start"),
            F.col("session_window.end").alias("s_end"),
            key_col,
            "n_events",
        )
    )


def streaming_dedup(
    events: DataFrame,
    id_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exact dedup: each key emits once; re-deliveries inside
    the watermark horizon are dropped, and state for keys older than
    the watermark is reclaimed (unbounded-state-safe — the streaming
    twin of the batch dedup_exact, and the at-least-once -> exactly-
    once adapter for bridge-fed CDC streams)."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        id_cols
    )


def stateful_sessionize(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap_secs: int = 1800,
    watermark: str = "10 seconds",
) -> DataFrame:
    """Custom stateful sessionizer (applyInPandasWithState +
    EventTimeTimeout): unlike the built-in session_window aggregation,
    this EMITS A ROW ONLY WHEN A SESSION CLOSES — i.e. when the
    event-time watermark passes last_event + gap — which is the shape a
    downstream consumer (session store, training-feature writer) wants:
    each session exactly once, no restatement.

    State per key: (start_us, last_us, n). New data extends the open
    session or, on a gap, flushes it immediately and starts a new one;
    the timeout flushes the final session when the stream moves on.
    Scale: state is 3 longs per ACTIVE key; the timeout bound means idle
    keys are reclaimed as the watermark advances."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = f"{key_col} long, s_start timestamp, s_end timestamp, n_events long"
    state_schema = "start long, last long, n long"
    gap_us = gap_secs * 1_000_000

    def _row(key: int, start: int, last: int, n: int) -> pd.DataFrame:
        return pd.DataFrame(
            {
                key_col: [key],
                "s_start": [pd.Timestamp(start, unit="us")],
                "s_end": [pd.Timestamp(last, unit="us")],
                "n_events": [n],
            }
        )

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield _row(key[0], start, last, n)
            return
        ts: list[int] = []
        for pdf in pdfs:
            ts.extend(int(t.value) // 1000 for t in pd.to_datetime(pdf[ts_col]))
        ts.sort()
        if state.exists:
            start, last, n = state.get
        else:
            start, last, n = ts[0], ts[0], 0
        for t in ts:
            if t - last > gap_us:
                yield _row(key[0], start, last, n)
                start, last, n = t, t, 1
            else:
                last, n = max(last, t), n + 1
        state.update((start, last, n))
        # flush when the watermark passes the gap after the last event
        state.setTimeoutTimestamp((last + gap_us) // 1000)

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            fn, out_schema, state_schema, "append", GroupStateTimeout.EventTimeTimeout
        )
    )


def running_totals(events: DataFrame, key_col: str = "user_id") -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: running
    per-key event count + value sum across micro-batches — the pattern
    for operators Structured Streaming lacks natively."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = f"{key_col} long, n_total long, value_total double"
    state_schema = "n long, v double"

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        n, v = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            v += float(pdf["value"].sum())
        state.update((n, v))
        yield pd.DataFrame({key_col: [key[0]], "n_total": [n], "value_total": [v]})

    return events.groupBy(key_col).applyInPandasWithState(
        fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    within: str = "15 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream inner join: right-side events landing within
    [left_ts, left_ts + within] per key — the click-attribution shape
    (streaming twin of the batch asof_click_attribution query). Both
    sides carry watermarks and the join condition bounds event time in
    BOTH directions, so Spark can bound join state: buffered rows are
    evicted once the watermark passes their match horizon, making the
    join unbounded-stream-safe. Output columns are prefixed l_/r_.
    """
    l = left.select(
        [F.col(c).alias(f"l_{c}") for c in left.columns]
    ).withWatermark(f"l_{ts_col}", watermark)
    r = right.select(
        [F.col(c).alias(f"r_{c}") for c in right.columns]
    ).withWatermark(f"r_{ts_col}", watermark)
    cond = (
        (F.col(f"l_{key_col}") == F.col(f"r_{key_col}"))
        & (F.col(f"r_{ts_col}") >= F.col(f"l_{ts_col}"))
        & (F.col(f"r_{ts_col}") <= F.col(f"l_{ts_col}") + F.expr(f"INTERVAL {within}"))
    )
    return l.join(r, cond, "inner")
