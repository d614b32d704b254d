"""Relational analytics over the warehouse tables (north-star breadth).

The reference has NO join operator (SURVEY §2.2) — its only join-shaped
computation is the point×centroid argmin. A production data pipeline
built around this engine needs the classic shapes; these implement them
with explicit scale strategy:

- **fact ⋈ dims**: dimensions (nation, customer) broadcast — the fact
  table (lineitem) never shuffles for the join, only for the final
  grouped aggregate, which is partial+final combined.
- **top-k per group**: window row_number after a grouped pre-aggregate,
  so the window input is |groups|, not |fact rows|.

Both are DuckDB-oracle-checked (extensions.py) and plan-asserted
(tests/test_plans.py: broadcast, no cartesian).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from kmeans_mapreduce_spark.barrier import narrow_barrier

def _revenue():
    """Discounted revenue column, built lazily — constructing a Column
    requires an active SparkContext, and this module must stay
    importable sessionless (the oracle-SQL generators read its plain
    constants before any session exists)."""
    return (
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    ).alias("rev")


def revenue_by_nation(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    digits: int = 2,
) -> DataFrame:
    """Σ extendedprice·(1−discount) per customer nation.

    Join order: fact → orders (fact-fact equi-join on orderkey) →
    broadcast customer → broadcast nation. The grouped sum is
    partial-aggregated map-side; the only wide shuffle is orderkey."""
    li = lineitem.select("l_orderkey", _revenue())
    o = orders.select("o_orderkey", "o_custkey")
    c = customer.select("c_custkey", "c_nationkey")
    n = nation.select("n_nationkey", "n_name")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.round(F.sum("rev"), digits).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def top_customers_per_nation(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    k: int = 3,
    digits: int = 2,
) -> DataFrame:
    """Top-k customers by revenue within each nation.

    Pre-aggregate revenue per customer FIRST (shrinks the window input
    from |lineitem| to |customers|), then rank within nation. Revenue
    is rounded before ranking so order is reproducible across engines;
    ties break by c_custkey."""
    li = lineitem.select("l_orderkey", _revenue())
    o = orders.select("o_orderkey", "o_custkey")
    c = customer.select("c_custkey", "c_nationkey")
    n = nation.select("n_nationkey", "n_name")
    per_cust = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("o_custkey")
        .agg(F.round(F.sum("rev"), digits).alias("revenue"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    w = Window.partitionBy("n_name").orderBy(
        F.desc("revenue"), F.asc("c_custkey")
    )
    return (
        per_cust.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "n_name",
            F.col("c_custkey").alias("custkey"),
            F.col("rank").cast("int").alias("rank"),
            "revenue",
        )
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Large×large equi-join with MANUAL key salting for pathological
    skew — the fallback when neither side broadcasts and AQE's skew
    split can't help (it only splits oversized *partitions*; a single
    hot KEY still lands every matching row pair on one task).

    Left rows get a salt in [0, salt) derived from a per-row id; right
    rows are replicated once per salt value. The join key becomes
    (key, salt), spreading one hot key over ``salt`` tasks. WHICH salt
    a left row gets is irrelevant to the result (the right side exists
    under every salt), so retry non-determinism of the row id cannot
    change the output — identical to the unsalted join, test-asserted.
    Cost: right side ×salt replication — use when the right side is
    the smaller (but still unbroadcastable) side and a known hot key
    exists; prefer AQE for garden-variety partition skew.

    Only left-preserving join types are supported: replicating the
    right side makes right/full-outer WRONG (an unmatched right key
    would emit one null-padded row PER SALT, and even matched keys
    emit spurious rows for salt buckets no left row landed in).
    """
    if how not in ("inner", "left", "left_outer", "leftouter",
                   "left_semi", "leftsemi", "left_anti", "leftanti",
                   "semi", "anti", "cross"):
        raise ValueError(
            f"salted_join: join type {how!r} is not left-preserving — "
            "right-side salt replication would emit duplicate "
            "null-padded rows; salt the other side instead"
        )
    salt_col = F.pmod(
        F.crc32(F.monotonically_increasing_id().cast("string")), F.lit(salt)
    ).cast("int")
    l_salted = left.withColumn("__salt", salt_col)
    r_salted = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return l_salted.join(r_salted, [key, "__salt"], how).drop("__salt")


def parts_never_ordered(
    part: DataFrame, lineitem: DataFrame, min_qty: float = 45.0
) -> DataFrame:
    """Anti-join: parts with no high-quantity (> min_qty) lineitem.

    The quantity predicate filters the build side BEFORE the anti-join
    (pushed to the lineitem scan), so the join probes a shrunken key
    set; no NOT-IN NULL traps, no cartesian. (Unfiltered, the synthetic
    data references every part — the filter keeps the check
    non-vacuous.)"""
    return part.select("p_partkey").join(
        lineitem.filter(F.col("l_quantity") > min_qty).select("l_partkey"),
        F.col("p_partkey") == F.col("l_partkey"),
        "left_anti",
    )


def suppliers_per_region(
    supplier: DataFrame, nation: DataFrame, region: DataFrame
) -> DataFrame:
    """Region rollup: supplier count per region name (two broadcast
    dimension hops: supplier → nation → region)."""
    s = supplier.select("s_suppkey", "s_nationkey")
    n = nation.select("n_nationkey", "n_regionkey")
    r = region.select("r_regionkey", "r_name")
    return (
        s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name")
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )


def pricing_summary(
    lineitem: DataFrame,
    cutoff: str = "2000-09-02",
    sum_digits: int = 2,
    avg_digits: int = 6,
) -> DataFrame:
    """TPC-H Q1 shape — the canonical scan-heavy aggregation: one pass
    over lineitem (≤ cutoff shipdate), grouped by the 6-ish
    (returnflag, linestatus) combinations, producing sums, averages,
    and counts of the pricing columns.

    Scale shape: this is the benchmark's pure map-side-combine
    showcase. The predicate pushes down to the parquet scan; the
    projection prunes to 7 columns; the groupBy key has single-digit
    cardinality so the partial aggregate reduces each of the thousands
    of input partitions to a handful of rows BEFORE the exchange — the
    shuffle carries O(partitions × groups) rows no matter how many
    billions of lineitems are scanned. The whole expression tree
    (1−discount, 1+tax products) stays inside whole-stage codegen;
    averages are computed as Spark's native sum/count pairs, never a
    second scan.
    """
    ts = F.lit(cutoff).cast("timestamp")
    one = F.lit(1.0)
    disc_price = F.col("l_extendedprice") * (one - F.col("l_discount"))
    return (
        lineitem.filter(F.col("l_shipdate") <= ts)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), sum_digits).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), sum_digits).alias(
                "sum_base_price"
            ),
            F.round(F.sum(disc_price), sum_digits).alias("sum_disc_price"),
            F.round(
                F.sum(disc_price * (one + F.col("l_tax"))), sum_digits
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), avg_digits).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), avg_digits).alias("avg_price"),
            F.round(F.avg("l_discount"), avg_digits).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def shipping_priority(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    segment: str = "BUILDING",
    cutoff: str = "1998-06-01",
    k: int = 10,
    digits: int = 2,
) -> DataFrame:
    """TPC-H Q3 shape — top unshipped orders by revenue for one market
    segment: customer∩segment ⨝ orders(before cutoff) ⨝ lineitem
    (shipped after cutoff), revenue = Σ extendedprice·(1−discount)
    per order, global top-k.

    Scale shape: all three predicates are plain column comparisons, so
    they PUSH DOWN to the parquet scans (the fact tables shrink before
    any join); the orders⨝lineitem join shuffles on orderkey — the
    natural co-partitioning key (bucketed tables would make it
    exchange-free, see sources.write_bucketed); the segment-filtered
    customer side is dimension-sized here and AQE picks a broadcast
    hash join on its own at this SF (at 100 TB a 1/5-of-customers
    build side is GBs — AQE's runtime sizing, not a hint, is the
    right call, which is why no explicit broadcast() appears). The
    global top-k with LIMIT folds into TakeOrderedAndProject — no full
    sort, no single-partition shuffle of the whole aggregate.
    """
    ts = F.lit(cutoff).cast("timestamp")
    c = customer.filter(F.col("c_mktsegment") == segment).select("c_custkey")
    o = orders.filter(F.col("o_orderdate") < ts).select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    l = lineitem.filter(F.col("l_shipdate") > ts).select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    return (
        o.join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(l, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_date"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
                digits,
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(k)
    )


def order_priority_check(
    orders: DataFrame,
    lineitem: DataFrame,
    start: str = "1998-01-01",
    end: str = "1998-04-01",
) -> DataFrame:
    """TPC-H Q4 shape — order-priority checking: orders placed in one
    quarter that have AT LEAST ONE late-shipping lineitem (shipdate
    after the order date — the synthetic schema's stand-in for Q4's
    commitdate < receiptdate), counted per priority class.

    Scale shape: the quarter predicate pushes down to the orders scan
    (3 months of years shrinks the left side before any join — on a
    date-partitioned production table this is partition pruning); the
    EXISTS becomes a LEFT SEMI hash join on orderkey whose cross-table
    inequality rides as the join residual — never a per-order subquery
    rescan (the row-at-a-time trap a correlated EXISTS invites), never
    a cartesian. Semi-join semantics dedupe multiple qualifying
    lineitems for free: no DISTINCT, no post-join collapse. The final
    aggregate is 5 groups — pure map-side combine.
    """
    ts0 = F.lit(start).cast("timestamp")
    ts1 = F.lit(end).cast("timestamp")
    o = orders.filter(
        (F.col("o_orderdate") >= ts0) & (F.col("o_orderdate") < ts1)
    ).select("o_orderkey", "o_orderdate", "o_orderpriority")
    l = lineitem.select("l_orderkey", "l_shipdate")
    return (
        o.join(
            l,
            (F.col("o_orderkey") == F.col("l_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


def promo_revenue_share(
    lineitem: DataFrame,
    part: DataFrame,
    start: str = "1998-06-01",
    end: str = "1998-07-01",
    promo_type: str = "PROMO",
    sum_digits: int = 2,
) -> DataFrame:
    """TPC-H Q14 shape — promotion effect: the share of one month's
    revenue from promo-class parts, via conditional aggregation over a
    broadcast dimension join.

    Scale shape: the month predicate pushes to the lineitem scan; part
    is the broadcast side (the fact table never shuffles — with no
    grouping key there is no exchange at all beyond the final 1-row
    partial-aggregate collapse). Float discipline: both revenue sums
    round to cents FIRST, then the share is one identical IEEE
    multiply/divide over those pinned doubles on both engines, with the
    floor-pinned 6-digit display round (F.round vs ROUND flip within
    one ulp of .5 otherwise).
    """
    from kmeans_mapreduce_spark.functions.text import ieee_round_pos

    ts0 = F.lit(start).cast("timestamp")
    ts1 = F.lit(end).cast("timestamp")
    l = lineitem.filter(
        (F.col("l_shipdate") >= ts0) & (F.col("l_shipdate") < ts1)
    ).select("l_partkey", _revenue())
    p = part.select("p_partkey", "p_type")
    agg = (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("p_type") == promo_type, F.col("rev")).otherwise(
                        F.lit(0.0)
                    )
                ),
                sum_digits,
            ).alias("promo_revenue"),
            F.round(F.sum("rev"), sum_digits).alias("total_revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )
    return agg.withColumn(
        "promo_share",
        ieee_round_pos(
            F.lit(100.0) * F.col("promo_revenue") / F.col("total_revenue")
        ),
    )


def small_quantity_revenue(
    lineitem: DataFrame, part: DataFrame, digits: int = 2
) -> DataFrame:
    """TPC-H Q17 shape — the correlated-scalar-subquery pattern
    ("line items ordered below one fifth of their part's average
    quantity"), DECORRELATED: the per-part average becomes one
    map-side-combined per-part aggregate joined back to the fact on
    the SAME l_partkey key (the aggregate's shuffle partitioning is
    reused by the join — never a per-row rescan of lineitem, which is
    what a naive correlated execution does N times).

    Exactness: quantities are integral, so the below-one-fifth test is
    evaluated as 5·qty·n < Σqty in exact int64 — a float average's
    last-ulp wobble can never flip a row across engines. The brand
    dimension broadcasts.

    Output: (p_brand, n_small, revenue).
    """
    # floor(x + ½) instead of a bare cast: Spark cast(double AS bigint)
    # truncates while DuckDB CAST rounds — a latent engine split if
    # l_quantity ever became non-integral (ADVICE r14). The explicit
    # IEEE op sequence is shared verbatim with the oracle twin, so the
    # two engines stay bit-identical by construction, not by the
    # integrality accident.
    q = F.expr("cast(floor(l_quantity + 0.5) as bigint)")
    stats = lineitem.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("n_q"),
        F.sum(q).alias("s_q"),
    )
    fact = lineitem.select("l_partkey", q.alias("qty"), "l_extendedprice")
    small = fact.join(stats, "l_partkey").filter(
        F.lit(5) * F.col("qty") * F.col("n_q") < F.col("s_q")
    )
    dim = part.select("p_partkey", "p_brand")
    return (
        small.join(
            F.broadcast(dim), small["l_partkey"] == dim["p_partkey"]
        )
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_small"),
            F.round(F.sum("l_extendedprice"), digits).alias("revenue"),
        )
    )


def idle_customer_balance(
    customer: DataFrame, orders: DataFrame, digits: int = 2
) -> DataFrame:
    """TPC-H Q22 shape — "high-balance customers with no URGENT
    order", per nation: an anti-join against the (filtered) orders
    fact plus a global scalar-aggregate threshold (balance above the
    average POSITIVE balance). The urgent-only fact side keeps the
    predicate selective on this synthetic data (every customer has
    SOME order, so the textbook never-ordered form is vacuous —
    0/0/1 rows across the three SFs, a gate that can't fail).

    Exactness: balances are cents-precision, so the above-average test
    runs as cents·n > Σcents in exact int64 (the Q17 trick — a float
    average's last ulp can never flip a membership decision across
    engines). Scale shape: the threshold is a 1-row broadcast; the
    anti-join shuffles on custkey (or broadcasts the distinct custkey
    set when small — AQE's call); output is O(|nations|).

    Output: (c_nationkey, n_custs, total_bal).
    """
    cents = F.expr("cast(floor(c_acctbal * 100 + 0.5) as bigint)")
    c = customer.select(
        "c_custkey", "c_nationkey", cents.alias("bal_cents")
    )
    pos = c.filter(F.col("bal_cents") > 0).agg(
        F.count(F.lit(1)).alias("n_pos"),
        F.sum("bal_cents").alias("s_pos"),
    )
    rich = c.crossJoin(F.broadcast(pos)).filter(
        F.col("bal_cents") * F.col("n_pos") > F.col("s_pos")
    )
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT")
    idle = rich.join(
        urgent.select(F.col("o_custkey").alias("c_custkey")),
        "c_custkey",
        "left_anti",
    )
    return idle.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_custs"),
        (F.sum("bal_cents") / F.lit(100.0)).alias("total_bal"),
    )


RADIUS_DEFAULT = 5.0


def radius_join_counts(
    points: DataFrame,
    probes: list[tuple[int, float, float]],
    radius: float = RADIUS_DEFAULT,
    digits: int = 6,
) -> DataFrame:
    """Spatial RADIUS JOIN (the PostGIS ``ST_DWithin`` shape): for each
    probe point, the population and nearest distance among all points
    within ``radius`` — grid-blocked so it never goes all-pairs: cells
    of side = radius mean a probe's matches lie in its 3×3 cell
    neighborhood, so the probe side expands to 9 (cell, probe) rows
    driver-side (tiny, broadcast) and the corpus joins by CELL EQUALITY
    with the exact d² ≤ r² verify as a join residual. The corpus gets
    its cell key in a narrow projection — no shuffle, no BNLJ
    (plan-asserted); this is the same blocking the dedup family uses,
    pointed at geometry.

    Exactness: d² is the same IEEE op sequence both engines (the
    kmeans assign discipline), so the boundary compare d² ≤ r² can
    never disagree; the reported min_d2 is pinned-rounded.

    Output: (probe_id, n_within, min_d2).
    """
    import math

    r = float(radius)
    rows = []
    for pid, px, py in probes:
        # math.floor(px / r), NOT px // r: the corpus side (and the
        # SQL twin) compute floor() of the IEEE-rounded quotient, while
        # Python's // floors the exact quotient — they disagree by one
        # cell when px/r rounds across an integer, silently shifting
        # the 3×3 neighborhood. Same divide-then-floor op sequence on
        # every engine (round-8 advice fix).
        gx, gy = math.floor(px / r), math.floor(py / r)
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                rows.append(
                    (int(pid), float(px), float(py), gx + dx, gy + dy)
                )
    spark = points.sparkSession
    pr = spark.createDataFrame(
        rows, "probe_id INT, px DOUBLE, py DOUBLE, gx LONG, gy LONG"
    )
    cells = points.select(
        "x",
        "y",
        F.floor(F.col("x") / F.lit(r)).alias("gx"),
        F.floor(F.col("y") / F.lit(r)).alias("gy"),
    )
    dxe = F.col("x") - F.col("px")
    dye = F.col("y") - F.col("py")
    d2 = dxe * dxe + dye * dye
    hits = (
        cells.join(F.broadcast(pr), ["gx", "gy"])
        .withColumn("d2", d2)
        .filter(F.col("d2") <= F.lit(r * r))
    )
    from kmeans_mapreduce_spark.functions.text import ieee_round_pos

    return hits.groupBy("probe_id").agg(
        F.count(F.lit(1)).alias("n_within"),
        ieee_round_pos(F.min("d2"), digits).alias("min_d2"),
    )


def min_cost_supplier(
    lineitem: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    region_name: str,
    top_n: int,
) -> DataFrame:
    """TPC-H Q2 shape — "the minimum-cost supplier for each part within
    a region" — with the correlated MIN-subquery DECORRELATED into an
    aggregate chain (the testdata has no partsupp table, so supply
    cost derives from the lineitem facts: a (part, supplier)'s cost is
    its cheapest observed unit price).

    Scale shape: the ONLY corpus-scale exchange is the
    (l_partkey, l_suppkey) aggregate (HashAggregate, map-side
    combined, integer-only payload — the supplier name strings never
    ride the fact exchange); the per-part argmin is one window
    ``row_number() OVER (PARTITION BY l_partkey ORDER BY cost_cents,
    s_suppkey)`` over the aggregate rows — exactly the oracle twin's
    formulation — never a correlated rescan, never a self-join. The
    r14 struct-MIN form forced ``SortAggregate`` (immutable struct
    buffer: Sort + Exchange + Sort, the one sort-based aggregate in
    the suite — r14 verdict item 3); the window form keeps both
    aggregates hash-based and sorts only the already-aggregated pair
    rows once. Supplier/nation/region/part are broadcast dimensions;
    the region predicate prunes suppliers BEFORE the fact join so
    non-region supply rows die at the join; the winner's
    (s_name, n_name) re-attach from the same broadcast dimension
    AFTER the argmin. Final answer is top-``top_n`` by
    (cost, partkey) via TakeOrderedAndProject — no global sort.

    Exactness: unit price is pinned to cents with the IEEE
    floor(x·100 + ½) expression (identical op sequence both engines);
    the tie-break (cost_cents, then s_suppkey) is total because
    s_suppkey is the supplier primary key, so the argmin row — and
    hence the re-attached name columns — can never disagree
    cross-engine.

    Output: (p_partkey, p_brand, cost_cents, s_suppkey, s_name, n_name).
    """
    unit_cents = F.expr(
        "cast(floor(l_extendedprice / l_quantity * 100 + 0.5) as bigint)"
    )
    sup_dim = (
        supplier.join(
            F.broadcast(nation),
            supplier["s_nationkey"] == nation["n_nationkey"],
        )
        .join(
            F.broadcast(region),
            (nation["n_regionkey"] == region["r_regionkey"])
            & (region["r_name"] == region_name),
        )
        .select("s_suppkey", "s_name", "n_name")
    )
    supply = (
        lineitem.select(
            "l_partkey", "l_suppkey", unit_cents.alias("unit_cents")
        )
        .join(
            F.broadcast(sup_dim.select("s_suppkey")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy("l_partkey", "s_suppkey")
        .agg(F.min("unit_cents").alias("cost_cents"))
    )
    w = Window.partitionBy("l_partkey").orderBy("cost_cents", "s_suppkey")
    best = (
        supply.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("l_partkey", "cost_cents", "s_suppkey")
    )
    dim = part.select("p_partkey", "p_brand")
    return (
        best.join(F.broadcast(sup_dim), "s_suppkey")
        .join(F.broadcast(dim), best["l_partkey"] == dim["p_partkey"])
        .select(
            "p_partkey", "p_brand", "cost_cents",
            "s_suppkey", "s_name", "n_name",
        )
        .orderBy("cost_cents", "p_partkey")
        .limit(top_n)
    )


LATE_SHIP_DAYS = 90  # "late" = shipped > 90 days after the order date
# (the synthetic schema's stand-in for Q21's receiptdate > commitdate)


def waiting_suppliers(
    supplier: DataFrame,
    nation: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    late_days: int = LATE_SHIP_DAYS,
    status: str = "F",
) -> DataFrame:
    """TPC-H Q21 shape — suppliers who kept orders waiting: for each
    finished-status order, the late lineitems of suppliers who were
    the ONLY late supplier in a multi-supplier order. The double
    correlated subquery (EXISTS another supplier in the order, NOT
    EXISTS another LATE supplier in the order) runs as one LEFT SEMI
    and one LEFT ANTI hash join on ``l_orderkey`` with the
    supplier-inequality as the join residual — never a per-row
    correlated rescan, never a cartesian.

    Scale shape: the status predicate prunes orders before the fact
    join; the lateness flag is computed once on the joined fact,
    which is localCheckpointed so its three uses (l1/l2/l3) never
    re-execute the join — only the 3-column (orderkey, suppkey, late)
    projection feeds the semi/anti sides. Supplier and nation broadcast. Output:
    (s_suppkey, s_name, n_name, numwait) — one row per supplier with
    numwait = count of qualifying late lineitems (Q21's COUNT(*),
    no LIMIT so the gate compares the full set).
    """
    o = orders.filter(F.col("o_orderstatus") == status).select(
        "o_orderkey", "o_orderdate"
    )
    ll = (
        lineitem.select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            "l_orderkey",
            "l_suppkey",
            (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr(f"INTERVAL {late_days} DAYS")
            ).alias("late"),
        )
        # materialize ONCE: ll feeds l1/l2/l3 — without this the
        # orders⋈lineitem join re-executes for every side and the
        # fact is scanned three times (r14 review finding; the same
        # r6 self-join discipline as hamming_banded_pairs)
        .transform(narrow_barrier)
    )
    l1 = ll.filter(F.col("late")).select("l_orderkey", "l_suppkey")
    l2 = ll.select(
        F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2")
    )
    l3 = ll.filter(F.col("late")).select(
        F.col("l_orderkey").alias("k3"), F.col("l_suppkey").alias("s3")
    )
    waiting = l1.join(
        l2,
        (F.col("l_orderkey") == F.col("k2"))
        & (F.col("l_suppkey") != F.col("s2")),
        "left_semi",
    ).join(
        l3,
        (F.col("l_orderkey") == F.col("k3"))
        & (F.col("l_suppkey") != F.col("s3")),
        "left_anti",
    )
    s = supplier.select("s_suppkey", "s_name", "s_nationkey")
    n = nation.select("n_nationkey", "n_name")
    return (
        waiting.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "n_name", "numwait")
    )


EXCESS_PART_PREFIX = "large"  # Q20's p_name LIKE 'forest%' analog
EXCESS_YEAR = 1998


def excess_stock_suppliers(
    supplier: DataFrame,
    lineitem: DataFrame,
    part: DataFrame,
    name_prefix: str = EXCESS_PART_PREFIX,
    year: int = EXCESS_YEAR,
) -> DataFrame:
    """TPC-H Q20 shape — suppliers with excess share of a part class:
    suppliers who shipped MORE THAN HALF of some matching part's total
    quantity in one year. The nested IN-with-correlated-aggregate
    (supplier IN (... HAVING qty > 0.5 * (correlated per-part SUM)))
    decorrelates into: one (partkey, suppkey) aggregate over the
    prefix-filtered year of lineitem, the per-part total as a window
    sum OVER the already-aggregated pair table (O(distinct pairs)
    rows, never a second fact scan), the exact-integer dominance test
    ``2·Σqty_sp > Σqty_p`` (quantities are integral — no float-half
    ulp can flip a row), and finally one broadcast hash join into
    supplier — the IN membership, resolved as a key join against the
    deduplicated qualifying set (per_supp is one row per suppkey, so
    this is semi-join semantics that also carries n_parts out) —
    never a correlated rescan.

    Output: (s_suppkey, s_name, n_parts) with n_parts = how many
    matching parts that supplier dominates.
    """
    ts0 = F.lit(f"{year}-01-01").cast("timestamp")
    ts1 = F.lit(f"{year + 1}-01-01").cast("timestamp")
    p = part.filter(F.col("p_name").startswith(name_prefix)).select(
        "p_partkey"
    )
    l = lineitem.filter(
        (F.col("l_shipdate") >= ts0) & (F.col("l_shipdate") < ts1)
    ).select(
        "l_partkey",
        "l_suppkey",
        # shared floor(x+½) pin, not a truncating cast — see
        # small_quantity_revenue (ADVICE r14)
        F.expr("cast(floor(l_quantity + 0.5) as bigint)").alias("qty"),
    )
    pairs = (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("qty").alias("s_sp"))
    )
    w = Window.partitionBy("l_partkey")
    dominant = pairs.withColumn("s_p", F.sum("s_sp").over(w)).filter(
        F.lit(2) * F.col("s_sp") > F.col("s_p")
    )
    per_supp = dominant.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).alias("n_parts")
    )
    s = supplier.select("s_suppkey", "s_name")
    return per_supp.join(
        F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey")
    ).select("s_suppkey", "s_name", "n_parts")


CUSTDIST_EXCLUDED_PRIORITY = "1-URGENT"  # Q13's NOT LIKE '%special%' analog


def customer_order_histogram(
    customer: DataFrame,
    orders: DataFrame,
    excluded_priority: str = CUSTDIST_EXCLUDED_PRIORITY,
) -> DataFrame:
    """TPC-H Q13 shape — customer order-count distribution: how many
    customers placed 0, 1, 2, ... qualifying orders. The classic trap
    this shape exists to pin: the order-class predicate lives INSIDE
    the LEFT OUTER join condition, not in a WHERE — filtering after
    the join would silently drop the zero-order customers the
    histogram's 0-bucket exists to count (a customer whose every
    order is excluded must still appear with c_count = 0).

    Scale shape: one outer hash join on custkey (orders pre-projected
    to 2 columns), the per-customer COUNT partial-aggregates map-side
    on the join's own key partitioning, and the final histogram is an
    O(distinct counts) aggregate. No window, no driver state.
    Output: (c_count, custdist) — counts are exact integers.
    """
    c = customer.select("c_custkey")
    o = orders.filter(F.col("o_orderpriority") != excluded_priority).select(
        "o_custkey", "o_orderkey"
    )
    per_cust = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


TOP_REVENUE_START = "1998-01-01"  # Q15's quarter
TOP_REVENUE_END = "1998-04-01"


def top_revenue_suppliers(
    supplier: DataFrame,
    lineitem: DataFrame,
    start: str = TOP_REVENUE_START,
    end: str = TOP_REVENUE_END,
    digits: int = 2,
) -> DataFrame:
    """TPC-H Q15 shape — top supplier(s) by one quarter's revenue: the
    revenue "view" (per-supplier Σ price·(1−discount)), then the
    suppliers whose revenue EQUALS the global maximum — the
    argmax-with-ties shape Q15's correlated MAX subquery expresses.

    Decorrelated: the revenue aggregate materializes once; the global
    MAX is a 1-row aggregate of it, broadcast back as a cross join
    (never a correlated rescan, never a window over the fact).
    Float discipline: revenue rounds to cents BEFORE the max/equality
    — both engines compare identical pinned doubles, so a last-ulp
    summation-order wobble can never flip the argmax.

    Output: (s_suppkey, s_name, total_revenue), one row per tied
    maximum.
    """
    ts0 = F.lit(start).cast("timestamp")
    ts1 = F.lit(end).cast("timestamp")
    revenue = (
        lineitem.filter(
            (F.col("l_shipdate") >= ts0) & (F.col("l_shipdate") < ts1)
        )
        .select("l_suppkey", _revenue())
        .groupBy("l_suppkey")
        .agg(F.round(F.sum("rev"), digits).alias("total_revenue"))
    )
    revenue = revenue.transform(narrow_barrier)  # materialize once
    mx = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    s = supplier.select("s_suppkey", "s_name")
    return (
        revenue.join(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


SUPPLIER_CNT_EXCL_BRAND = "Brand#13"
SUPPLIER_CNT_EXCL_TYPE = "MEDIUM"
SUPPLIER_CNT_SIZES = (1, 4, 7, 10, 13, 16, 19, 22)
COMPLAINT_ACCTBAL_MAX = 2500.0  # the "customer complaints" analog


def supplier_count_by_part_class(
    part: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
    excl_brand: str = SUPPLIER_CNT_EXCL_BRAND,
    excl_type: str = SUPPLIER_CNT_EXCL_TYPE,
    sizes: tuple[int, ...] = SUPPLIER_CNT_SIZES,
    complaint_max: float = COMPLAINT_ACCTBAL_MAX,
) -> DataFrame:
    """TPC-H Q16 shape — parts/supplier relationship: how many DISTINCT
    suppliers can supply each qualifying (brand, type, size) part
    class, excluding blacklisted suppliers. The reference schema has
    no partsupp, so lineitem is the part↔supplier relation and the
    "customer complaints" blacklist is the low-acctbal supplier set.

    Scale shape: the three part predicates (≠ brand, NOT LIKE type
    prefix, size IN list) prune the part dim BEFORE its broadcast; the
    NOT IN becomes a LEFT ANTI join against the broadcast blacklist
    (suppkey is non-null, so NOT-IN NULL traps don't apply — the anti
    join is exactly NOT IN here); COUNT(DISTINCT) runs as Spark's
    two-phase distinct aggregate on the (brand, type, size) grouping —
    partial distinct map-side, never a row-level distinct shuffle of
    the whole fact.

    Output: (p_brand, p_type, p_size, supplier_cnt).
    """
    p = part.filter(
        (F.col("p_brand") != excl_brand)
        & ~F.col("p_type").startswith(excl_type)
        & F.col("p_size").isin(*sizes)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad = supplier.filter(F.col("s_acctbal") < complaint_max).select(
        F.col("s_suppkey").alias("bad_suppkey")
    )
    l = lineitem.select("l_partkey", "l_suppkey").join(
        F.broadcast(bad),
        F.col("l_suppkey") == F.col("bad_suppkey"),
        "left_anti",
    )
    return (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )
