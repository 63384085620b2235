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


def sessionize_events(
    events: DataFrame,
    gap: str = "5 minutes",
    time_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
    watermark_delay: str = "1 hour",
) -> DataFrame:
    """events(ts, user_id, value) → one row per user session:
    (user_id, session_start long, session_end long, n long, value_sum).

    SESSION windows — the variable-length case tumbling windows can't
    express: consecutive events of a user belong to one session while their
    gaps stay below ``gap``; the window's extent is data-dependent.
    ``F.session_window`` is Spark's native stateful implementation (state
    merges adjacent windows as events arrive; on streams the watermark
    finalizes a session once no mergeable event can still come). Batch mode
    runs the same plan — replayed exactly by the classic gaps-and-islands
    SQL (lag → new-session flag → running count → group), which is the
    oracle. ``session_end`` is last_event + gap (Spark's convention: the
    window closes when the gap expires, not at the last event).
    """
    src = events
    if src.isStreaming:
        src = src.withWatermark(time_col, watermark_delay)
    epoch = "TIMESTAMP_NTZ '1970-01-01 00:00:00'"
    return (
        src.groupBy(
            F.session_window(F.col(time_col), gap).alias("w"),
            F.col(key_col).alias("user_id"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col(value_col)).alias("value_sum"),
        )
        .select(
            "user_id",
            F.expr(f"timestampdiff(SECOND, {epoch}, w.start)")
            .cast("long")
            .alias("session_start"),
            F.expr(f"timestampdiff(SECOND, {epoch}, w.end)")
            .cast("long")
            .alias("session_end"),
            "n",
            "value_sum",
        )
    )


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
