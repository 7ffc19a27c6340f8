"""Event-time windowed aggregation with late-data handling.

The crawl-state side of the reference accumulates per-host counts over
an event stream (Manager.java:209-229 restores them on startup); the
general Spark-native form is an event-time tumbling-window aggregation
that runs IDENTICALLY in batch (the oracle gate) and in Structured
Streaming (``withWatermark`` bounds state for late events). One
function builds both plans so batch == streaming semantics is by
construction, and the pytest drives a real readStream -> memory-sink
run against the batch result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(events: DataFrame, window: str = "1 day",
                    ts_col: str = "ts", key_col: str = "event_type",
                    value_col: str = "value",
                    watermark: str | None = None) -> DataFrame:
    """(window_start, window_end, <key>, n_events, total_value).

    ``watermark`` (e.g. ``"2 hours"``) is only legal on a streaming
    DataFrame: events later than the watermark past the window end are
    dropped and the window's state is finalized — the standard
    late-data contract. Batch callers leave it None and get the exact
    same grouping (session timeZone is pinned to UTC, so window
    boundaries align with the oracle's naive midnights).
    """
    e = events
    if watermark is not None:
        e = e.withWatermark(ts_col, watermark)
    w = F.window(F.col(ts_col), window)
    return (
        e.groupBy(w.alias("w"), F.col(key_col))
        .agg(F.count("*").alias("n_events"),
             F.round(F.sum(value_col), 6).alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            key_col, "n_events", "total_value",
        )
    )
