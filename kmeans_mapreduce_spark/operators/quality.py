"""Declarative data-quality constraints (Deequ-style) — validation a
training-data pipeline runs on every ingest before the data is allowed
near a model (none of this exists in the reference; its only input
check is float() crashing on a bad line, ``master.py:286``).

Scale design: all row-local checks (not-null, range, accepted-values,
regex) compile into ONE conditional-aggregate pass over the table —
violations are ``sum(case when ...)`` columns, so the scan happens once
and the shuffle is a single 1-row partial-aggregate merge however many
checks run. Set-level checks need their own shapes: uniqueness is one
groupBy(key) counting keys seen more than once (map-side combined);
referential integrity is a broadcast left-outer join against the
(small) dimension's key set with orphans counted in the same
aggregate as the row count (one pass, fact never scanned twice). The report unions these tiny 1-row
results — the heavy table is scanned once per SHAPE, not once per
check.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from kmeans_mapreduce_spark.barrier import narrow_barrier


def not_null(col: str) -> tuple[str, Column]:
    return f"not_null({col})", F.col(col).isNull()


def in_range(col: str, lo: float, hi: float) -> tuple[str, Column]:
    return (
        f"in_range({col},{lo!r},{hi!r})",
        ~F.col(col).between(F.lit(lo), F.lit(hi)) | F.col(col).isNull(),
    )


def accepted_values(col: str, values: Sequence[str]) -> tuple[str, Column]:
    vals = list(values)
    return (
        f"accepted_values({col})",
        ~F.col(col).isin(vals) | F.col(col).isNull(),
    )


def matches(col: str, pattern: str) -> tuple[str, Column]:
    """Java∩RE2-safe regex full-match check.

    ``rlike`` is a substring search, so the pattern is anchored
    internally (``^(?:p)$``) — an unanchored ``p`` would otherwise
    silently pass rows that merely contain a matching substring.
    Already-anchored patterns are unaffected (``^``/``$`` inside the
    group still match at string bounds)."""
    return (
        f"matches({col})",
        ~F.col(col).rlike(f"^(?:{pattern})$") | F.col(col).isNull(),
    )


def row_checks(df: DataFrame, checks: Sequence[tuple[str, Column]]) -> DataFrame:
    """All row-local constraints in ONE scan: (check, n_rows,
    violations, passed)."""
    if not checks:
        raise ValueError("row_checks: empty constraint list")
    # coalesce: SUM over an EMPTY table is NULL, which would make
    # passed=NULL — a verdict that silently vanishes from boolean
    # filters exactly when an ingest produced zero rows
    aggs = [F.count(F.lit(1)).alias("n_rows")] + [
        F.coalesce(F.sum(viol.cast("long")), F.lit(0)).alias(f"v{i}")
        for i, (_, viol) in enumerate(checks)
    ]
    # materialize the 1-row aggregate ONCE: each union branch below
    # re-projects it; left as lineage they would each rescan the table
    row = df.agg(*aggs).transform(narrow_barrier)
    out = None
    for i, (name, _) in enumerate(checks):
        one = row.select(
            F.lit(name).alias("check"),
            F.col("n_rows"),
            F.col(f"v{i}").alias("violations"),
            (F.col(f"v{i}") == 0).alias("passed"),
        )
        out = one if out is None else out.unionByName(one)
    return out


def unique_check(df: DataFrame, key: str) -> DataFrame:
    """(check, n_rows, violations, passed): violations = rows carrying
    a key that occurs more than once (groupBy, map-side combined)."""
    dup = (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(
            F.coalesce(F.sum(F.when(F.col("c") > 1, F.col("c"))), F.lit(0)).alias(
                "violations"
            ),
            F.coalesce(F.sum("c"), F.lit(0)).alias("n_rows"),
        )
    )
    return dup.select(
        F.lit(f"unique({key})").alias("check"),
        "n_rows",
        F.col("violations").cast("long").alias("violations"),
        (F.col("violations") == 0).alias("passed"),
    )


def foreign_key_check(
    df: DataFrame, col: str, dim: DataFrame, dim_key: str
) -> DataFrame:
    """(check, n_rows, violations, passed): fact rows whose key has no
    match in the dimension — ONE lazy pass: broadcast LEFT OUTER join
    against the dim key set, orphans counted in the same aggregate as
    the row count (the fact never shuffles and is never scanned
    twice), evaluated at action time like every other check."""
    joined = df.select(F.col(col).alias("k")).join(
        F.broadcast(
            dim.select(F.col(dim_key).alias("k"))
            .distinct()
            .withColumn("_hit", F.lit(1))
        ),
        "k",
        "left",
    )
    agg = joined.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.coalesce(
            F.sum(F.col("_hit").isNull().cast("long")), F.lit(0)
        ).alias("violations"),
    )
    return agg.select(
        F.lit(f"foreign_key({col})").alias("check"),
        "n_rows",
        "violations",
        (F.col("violations") == 0).alias("passed"),
    )
