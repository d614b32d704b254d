"""Event-stream analytics in batch form (tumbling windows, sessions).

These are the batch twins of the streaming module's queries — same
semantics, oracle-checkable. Timestamps: the events table stores
TIMESTAMP(NANOS) which Spark 4 reads as nanosecond longs (see
session.py); epoch seconds = ``ts div 1e9`` ≡ DuckDB
``epoch_ns(ts)//1e9`` (floor, verified bit-equal).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

WINDOW_SEC = 300  # 5-minute tumbling windows
SESSION_GAP_SEC = 1800  # 30-minute session gap


def with_epoch_seconds(events: DataFrame) -> DataFrame:
    return events.withColumn("ts_sec", F.expr("ts div 1000000000"))


def window_agg(events: DataFrame, digits: int = 2) -> DataFrame:
    """Tumbling-window aggregation per event_type: count + value sum.

    window_start is epoch seconds (bigint) so both engines agree
    exactly; partial aggregation map-side, one shuffle keyed by
    (window, type) — uniform keys, scales linearly."""
    e = with_epoch_seconds(events)
    return (
        e.groupBy(
            (F.expr(f"ts_sec div {WINDOW_SEC}") * WINDOW_SEC).alias("window_start"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), digits).alias("value_sum"),
        )
    )


def sessionize(events: DataFrame, digits: int = 2) -> DataFrame:
    """Gap-based sessionization per user (batch form of a streaming
    session window): a new session starts when the gap from the
    previous event exceeds SESSION_GAP_SEC.

    Windowed lag + running sum — the shuffle is keyed by user_id.
    Output: one row per session with bounds and stats."""
    e = with_epoch_seconds(events)
    w = Window.partitionBy("user_id").orderBy("ts_sec", "event_id")
    flagged = e.withColumn(
        "new_session",
        F.when(
            F.col("ts_sec") - F.lag("ts_sec").over(w) > SESSION_GAP_SEC, 1
        ).otherwise(0),
    ).withColumn(
        "session_idx",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return flagged.groupBy("user_id", "session_idx").agg(
        F.min("ts_sec").alias("session_start"),
        F.max("ts_sec").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), digits).alias("value_sum"),
    )
