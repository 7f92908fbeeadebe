"""Watermarked event-time window operators — the Structured Streaming
"windowed aggs + late data" surface, dual-mode (T8 style: one code path,
`read` or `readStream`).

The reference's only event-time notion is the replication sequence (survey
§2.10: no tumbling/sliding/session windows) — these are the Spark-idiomatic
generalization for the extension pipelines (event analytics, training-data
telemetry). Semantics under streaming:

* `withWatermark(ts, delay)` bounds state: a window finalizes (append-mode
  emit) once the watermark — max observed event time minus `delay` — passes
  its end, and rows later than the watermark are DROPPED, which is the
  contract that keeps state finite on an unbounded stream.
* `session_window(ts, gap)` merges events separated by < `gap` into one
  state entry per (key, session); state is O(open sessions).

Scale notes: both are single-shuffle stateful aggs keyed (window, type) /
(user, session); partial aggregation applies map-side; the watermark horizon
bounds total state independent of stream length. Bounded mode runs the same
plan as an ordinary groupBy (watermark is a no-op on batch DataFrames).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _with_watermark(df: DataFrame, ts_col: str, watermark: str) -> DataFrame:
    return df.withWatermark(ts_col, watermark) if df.isStreaming else df


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Tumbling event-time counts per (window, type); append-mode safe."""
    src = _with_watermark(events, ts_col, watermark)
    return (
        src.groupBy(F.window(ts_col, window).alias("w"), type_col)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"), type_col, "n_events"
        )
    )


def session_event_counts(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Gap-based sessions per key; one state entry per open session."""
    src = _with_watermark(events, ts_col, watermark)
    return (
        src.groupBy(key_col, F.session_window(ts_col, gap).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            key_col, F.col("w.start").alias("session_start"), "n_events"
        )
    )
