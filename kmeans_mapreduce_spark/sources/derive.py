"""Point-set derivations from the driver's parquet tables (FIXTURES.md F1/F6).

The reference's only input is ``points.txt`` of unknown provenance
(``/root/reference/readme.txt:15``); the rebuild derives deterministic
point sets from the shared TPC-H-ish testdata so the DuckDB oracle can
reproduce them exactly. Each Spark derivation has a string-for-string
SQL twin used inside ``oracle_sql()`` — keep them in lockstep.

Scale note: x is ``l_extendedprice/1000`` to keep squared distances
~1e3-scale so float sums across partitions agree with the oracle after
rounding (FIXTURES.md "float discipline").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kmeans_mapreduce_spark.sources.loaders import load_table

# SQL twin of points_2d() — interpolated into every oracle query.
# point_id packs (orderkey, linenumber, partkey, suppkey). CAVEAT: even
# this packed id is NOT guaranteed unique in the synthetic data (one
# collision observed at sf0.001 in a past vintage) — oracles and
# aggregates must work per input ROW, never assume distinct point_id
# (see .claude/skills/verify/SKILL.md).
POINTS_2D_SQL = (
    "SELECT ((l_orderkey * 10 + l_linenumber) * 100000 + l_partkey) * 100000"
    " + l_suppkey AS point_id, "
    "l_extendedprice / 1000.0 AS x, l_quantity AS y FROM lineitem"
)


def points_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Primary 2-D point set: one point per lineitem row.

    ``point_id`` is best-effort identity, NOT guaranteed unique (the
    synthetic data has produced packed-id collisions; see the caveat on
    POINTS_2D_SQL) — treat it as a label, aggregate per row. Exactly
    mirrors POINTS_2D_SQL so doubles are bit-identical between Spark
    and the DuckDB oracle (same IEEE ops, same inputs).
    """
    li = load_table(spark, sf_dir, "lineitem")
    pid = (
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")) * 100000
        + F.col("l_partkey")
    ) * 100000 + F.col("l_suppkey")
    return li.select(
        pid.alias("point_id"),
        (F.col("l_extendedprice") / F.lit(1000.0)).alias("x"),
        F.col("l_quantity").alias("y"),
    )


def points_2d_sql() -> str:
    return POINTS_2D_SQL


def points_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Secondary distribution: events(value, user_id) as 2-D points."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        F.col("event_id").alias("point_id"),
        F.col("value").alias("x"),
        F.col("user_id").cast("double").alias("y"),
    )


def points_nd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-D point set from the embeddings table (FIXTURES.md F6).

    Elements are cast float→double *before* any arithmetic so Spark and
    DuckDB (which promotes the same way) compute identical distances.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        F.col("vec_id").alias("point_id"),
        F.transform(F.col("embedding"), lambda v: v.cast("double")).alias("vec"),
        F.col("label"),
    )
