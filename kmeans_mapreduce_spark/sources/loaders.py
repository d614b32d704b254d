"""Sources & sinks (SURVEY §2.1 O1, O4, O5).

The reference reads "x,y" text lines (three independent hand-rolled
parsers: ``/root/reference/mapper.py:86-95``, ``master.py:283-297``,
``master.py:317-323``) and writes per-partition "k:x,y" text files
(``mapper.py:53-74``) plus a delete-then-rewrite centroid CSV
(``master.py:90-95``). Here every read is a schema'd DataFrame source —
Catalyst gets column pruning + predicate pushdown for free — and every
write is a standard DataFrame sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kmeans_mapreduce_spark.schema import POINTS_2D_CSV


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver-generated parquet table (TESTDATA.md).

    ``events.parquet`` carries TIMESTAMP(NANOS), which vanilla Spark
    rejects with [PARQUET_TYPE_ILLEGAL]. The nanos-as-long conf is
    runtime-settable, so set it here rather than only in our own session
    factory — callers may hand us a SparkSession we didn't build. It is
    scoped to the one table that needs it (events) instead of mutating
    the caller's session conf on every load.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def read_points_csv(spark: SparkSession, path: str) -> DataFrame:
    """O1 — reference-format point source: one ``x,y`` line per point
    (``/root/reference/master.py:286-288``).

    Adds the synthetic ``point_id`` the reference lacks (its identity is
    line order) via ``monotonically_increasing_id`` — partition-stable,
    no shuffle, no driver collect. Input splitting (reference O3,
    ``master.py:50-77`` static M-way file split) is left to Spark's
    file-source split planning.
    """
    return (
        spark.read.schema(POINTS_2D_CSV)
        .option("mode", "FAILFAST")
        .csv(path)
        .select(
            F.monotonically_increasing_id().alias("point_id"),
            "x",
            "y",
        )
    )


def write_centroids(centroids: DataFrame, path: str, fmt: str = "parquet") -> None:
    """O5 — centroid sink. The reference deletes and rewrites
    ``centroids.txt`` every iteration so only the latest generation
    survives (``/root/reference/master.py:90-95``); ``mode("overwrite")``
    is the transactional version of delete-then-write.
    """
    writer = centroids.coalesce(1).write.mode("overwrite")
    if fmt == "csv":
        writer.csv(path)
    else:
        writer.parquet(path)


def write_partitioned(df: DataFrame, path: str, key: str = "cid") -> None:
    """O4 — partitioned sink: the reference's mod-R partition files
    (``/root/reference/mapper.py:53-74``, mod at :65). ``partitionBy``
    gives hash-partitioned directories; the shuffle write inside is
    Spark's sort-based shuffle, replacing the R×M gRPC pull mesh
    (``reducer.py:59-139``).
    """
    df.write.mode("overwrite").partitionBy(key).parquet(path)
