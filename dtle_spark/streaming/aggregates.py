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
