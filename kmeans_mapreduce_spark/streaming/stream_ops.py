"""Structured Streaming operators (north-star; SURVEY §2.2 notes the
reference is strictly batch — this is the engine's streaming face).

Design: the same narrow assignment expression the batch engine uses
works unchanged on a streaming DataFrame (stateless map); windowed
aggregations use event-time + watermark so late data is bounded-state.
At scale: file/kafka source partitions → narrow score → windowed agg
whose state store is keyed by (window, type) — bounded by watermark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kmeans_mapreduce_spark.functions.distance import nearest_centroid_2d
from kmeans_mapreduce_spark.operators.events import WINDOW_SEC


def events_stream(spark: SparkSession, events_dir: str, schema: str) -> DataFrame:
    """File-source stream over parquet event files (one-file-per-batch
    keeps tests deterministic; swap for Kafka in production)."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(events_dir)
    )


def score_stream(
    stream: DataFrame, centers: list[tuple[int, float, float]]
) -> DataFrame:
    """Streaming nearest-centroid scoring — stateless narrow map, the
    streaming twin of operators.kmeans.assign (same codegen'd argmin
    expression; nothing about it is batch-specific)."""
    best = nearest_centroid_2d(F.col("x"), F.col("y"), centers)
    return stream.select(
        "*", best["cid"].alias("cid"), best["d2"].alias("min_d2")
    )


def stream_window_counts(stream: DataFrame, watermark_sec: int = 600) -> DataFrame:
    """Tumbling event-time window counts with watermark (bounded state;
    late rows beyond the watermark are dropped, the streaming analog of
    operators.events.window_agg)."""
    with_ts = stream.withColumn(
        "event_time", F.timestamp_seconds(F.expr("ts div 1000000000"))
    ).withWatermark("event_time", f"{watermark_sec} seconds")
    return with_ts.groupBy(
        F.window("event_time", f"{WINDOW_SEC} seconds").alias("w"),
        "event_type",
    ).agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("value_sum"))


def run_stream_to_memory(
    df: DataFrame, name: str, mode: str = "append"
) -> None:
    """Drain a stream into an in-memory table (test/debug sink) using
    availableNow (process everything, then stop)."""
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
