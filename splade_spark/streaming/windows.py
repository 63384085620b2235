"""Event-time windowed aggregation with watermarking (task brief §streams:
"watermarks + windowed aggs for late data").

The index build itself needs no event-time windows (append-only corpus —
SURVEY.md §2.9), but a crawl/telemetry pipeline around it does: count and
sum events per (tumbling window, event_type), tolerate late arrivals up to a
bound, drop older ones. This is exactly Structured Streaming's built-in
stateful windowed aggregation — declared, not hand-built: Catalyst owns the
window state (hash-partitioned on the group keys), and the watermark both
bounds that state and defines the lateness contract:

* an event ≤ ``watermark_delay`` late still lands in its (open) window;
* an event older than the current watermark is DROPPED — its window may
  already be finalized and emitted (append mode emits a window exactly once,
  when the watermark passes its end).

``window_start`` ships as epoch seconds (BIGINT) so batch replays compare
exactly (timestamp rendering differs across engines; integers do not).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def windowed_event_counts(
    events: DataFrame,
    window_duration: str = "1 hour",
    watermark_delay: str = "1 hour",
    time_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """stream/batch events(ts, event_type, value) →
    (window_start long, event_type, n long, value_sum double).

    Works on a streaming OR batch DataFrame: the aggregation is the same
    declarative plan; on a stream the watermark activates state eviction and
    append-mode finalization, on a batch frame Catalyst ignores it — which
    is what makes the batch SQL oracle an exact replay.
    """
    src = events
    if src.isStreaming:
        src = src.withWatermark(time_col, watermark_delay)
    return (
        src.groupBy(
            F.window(F.col(time_col), window_duration).alias("w"),
            F.col(type_col).alias("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col(value_col)).alias("value_sum"),
        )
        .select(
            # tz-free epoch seconds: TIMESTAMP_NTZ casts to long are
            # disallowed and unix_timestamp() is session-timezone-dependent;
            # timestampdiff from the NTZ epoch is pure arithmetic, matching
            # DuckDB's epoch() over naive timestamps exactly
            F.expr(
                "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', w.start)"
            ).cast("long").alias("window_start"),
            "event_type",
            "n",
            "value_sum",
        )
    )
