"""Corpus/warehouse analytics extensions, round 3 second wave.

Same contract as ``extensions.py`` (every Spark query has a DuckDB
oracle twin, column names aligned on both sides); registered into the
driver's ``queries()`` via ``queries.extension_queries``. Families:

- sketches: portable HyperLogLog distinct counts (operators/sketches)
- relational surface the reference lacks (SURVEY §2.2): PIVOT,
  analytic window functions (running totals / lag deltas)
- text hygiene for training pipelines: repetition signals, PII
  redaction, benchmark decontamination (operators/textops, decontam)
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kmeans_mapreduce_spark.operators import sketches as sk
from kmeans_mapreduce_spark.operators import textops as tx
from kmeans_mapreduce_spark.sources.loaders import load_table

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


# ---------------------------------------------------------------------------
# Queries
# ---------------------------------------------------------------------------

def q_events_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable HLL sketch vs exact distinct, per event type.

    Two cardinality regimes on purpose: distinct users (~150, lands in
    the linear-counting small-range branch) and distinct event ids
    (~2000, raw HLL estimate branch). The sketch side shuffles at most
    types x 256 register rows however large the input; the exact side
    is the COUNT(DISTINCT) baseline it replaces at scale.
    """
    e = load_table(spark, sf_dir, "events")
    users = sk.hll_distinct(e, "user_id", ["event_type"], "users_hll")
    evs = sk.hll_distinct(e, "event_id", ["event_type"], "events_hll")
    exact = e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("users_exact"),
        F.countDistinct("event_id").alias("events_exact"),
    )
    return (
        exact.join(users, "event_type").join(evs, "event_type")
        .select("event_type", "users_exact", "users_hll",
                "events_exact", "events_hll")
    )


def q_events_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT (§2.2 gap): hour-of-day x event-type matrix of counts and
    value sums. Explicit pivot values keep the output schema static
    (Catalyst turns this into one pass of conditional aggregates — no
    per-value scans), so the plan is a single map-side-combinable
    groupBy on 24 keys."""
    e = load_table(spark, sf_dir, "events")
    hod = F.expr("(ts div 1000000000 div 3600) % 24").alias("hod")
    return (
        e.select(hod, "event_type", "value")
        .groupBy("hod")
        .pivot("event_type", EVENT_TYPES)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("val"),
        )
    )


def q_orders_running_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window suite (§2.2 gap): per-customer order sequence,
    running revenue, and days since the previous order (row_number +
    running SUM + lag over ONE shared window — single shuffle keyed by
    customer). Unique (date, orderkey) ordering makes the running fold
    order identical in both engines."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") % 50 == 0)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wrows = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w).cast("long").alias("order_seq"),
        F.round(F.sum("o_totalprice").over(wrows), 2).alias("running_total"),
        F.coalesce(
            F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w)),
            F.lit(-1),
        ).cast("long").alias("days_since_prev"),
    )


# ---------------------------------------------------------------------------
# Oracle twins
# ---------------------------------------------------------------------------

def _hll_oracle() -> str:
    u = sk.hll_sql("user_id::VARCHAR", "event_type", "events", "users_hll")
    v = sk.hll_sql("event_id::VARCHAR", "event_type", "events", "events_hll")
    return f"""
WITH {u},
{v},
exact AS (
  SELECT event_type,
         COUNT(DISTINCT user_id) AS users_exact,
         COUNT(DISTINCT event_id) AS events_exact
  FROM events GROUP BY event_type
)
SELECT x.event_type, x.users_exact, a.users_hll, x.events_exact, b.events_hll
FROM exact x
JOIN est_users_hll a ON a.g = x.event_type
JOIN est_events_hll b ON b.g = x.event_type
"""


def _pivot_oracle() -> str:
    cols = ", ".join(
        f"COUNT(*) FILTER (WHERE event_type = '{t}') AS {t}_n, "
        f"ROUND(SUM(value) FILTER (WHERE event_type = '{t}'), 2) AS {t}_val"
        for t in EVENT_TYPES
    )
    return f"""
SELECT (epoch_ns(ts) // 1000000000 // 3600) % 24 AS hod, {cols}
FROM events GROUP BY hod
"""


_RUNNING_WINDOW_ORACLE = """
SELECT o_custkey, o_orderkey,
       row_number() OVER win AS order_seq,
       ROUND(SUM(o_totalprice) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total,
       COALESCE(date_diff('day', lag(o_orderdate) OVER win, o_orderdate),
                -1)::BIGINT AS days_since_prev
FROM orders
WHERE o_custkey % 50 = 0
WINDOW win AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


def analytics_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "events_hll_distinct": q_events_hll_distinct,
        "events_pivot": q_events_pivot,
        "orders_running_window": q_orders_running_window,
    }


def analytics_oracle_sql() -> dict[str, str]:
    return {
        "events_hll_distinct": _hll_oracle(),
        "events_pivot": _pivot_oracle(),
        "orders_running_window": _RUNNING_WINDOW_ORACLE,
    }
