"""Golden micro-fixtures (FIXTURES.md F4/F5) + operator unit tests.

Hand-computed expectations: values chosen to be exact in binary floating
point, so comparisons are exact (no tolerance needed).
"""

from __future__ import annotations

import pytest

from kmeans_mapreduce_spark.operators import kmeans as km
from kmeans_mapreduce_spark.schema import POINTS_2D

F4_POINTS = [
    (0, 0.0, 0.0),
    (1, 0.0, 2.0),
    (2, 2.0, 0.0),
    (3, 2.0, 2.0),
    (4, 10.0, 10.0),
    (5, 10.0, 12.0),
    (6, 12.0, 10.0),
    (7, 12.0, 12.0),
]
F4_CENTERS = [(0, 1.0, 1.0), (1, 11.0, 11.0)]


@pytest.fixture(scope="module")
def f4(spark):
    return spark.createDataFrame(F4_POINTS, POINTS_2D)


def test_assign_golden(f4):
    rows = {r["point_id"]: r for r in km.assign(f4, F4_CENTERS).collect()}
    for pid in range(4):
        assert rows[pid]["cid"] == 0
    for pid in range(4, 8):
        assert rows[pid]["cid"] == 1
    assert all(r["min_d2"] == 2.0 for r in rows.values())


def test_assign_tiebreak_lowest_cid(spark, f4):
    # (6,6) is exactly equidistant (50.0) from both centroids →
    # must go to cid 0 (strict `<` first-wins, reference mapper.py:43).
    extra = spark.createDataFrame([(99, 6.0, 6.0)], POINTS_2D)
    row = km.assign(extra, F4_CENTERS).collect()[0]
    assert row["cid"] == 0
    assert row["min_d2"] == 50.0


def test_lloyd_step_sql_matches_expr_and_arrow(spark, f4):
    """The three step implementations are one contract: identical
    means, sizes, and WSSSE on the golden fixture — INCLUDING the
    first-wins tie-break (the (6,6) point is exactly equidistant from
    both centroids and must count toward cid 0 in every impl)."""
    extra = spark.createDataFrame([(99, 6.0, 6.0)], POINTS_2D)
    pts = f4.unionByName(extra)
    expr = km.lloyd_step(pts, F4_CENTERS)
    sql = km.lloyd_step_sql(pts.select("x", "y"), F4_CENTERS)
    arrow = km.lloyd_step_arrow(pts.select("x", "y"), F4_CENTERS, n_parts=2)
    assert expr == sql == arrow
    means, sizes, _ = sql
    assert sizes[0] == 5  # the tie went to cid 0 everywhere


def test_assign_df_matches_assign(spark, f4):
    cents = spark.createDataFrame(
        [(c, x, y) for c, x, y in F4_CENTERS], "cid INT, cx DOUBLE, cy DOUBLE"
    )
    a = {(r["point_id"], r["cid"], r["min_d2"]) for r in km.assign(f4, F4_CENTERS).collect()}
    b = {(r["point_id"], r["cid"], r["min_d2"]) for r in km.assign_df(f4, cents).collect()}
    assert a == b


def test_recompute_golden(f4):
    assigned = km.assign(f4, F4_CENTERS)
    stats = {r["cid"]: r for r in km.recompute(assigned).collect()}
    assert stats[0]["cx"] == 1.0 and stats[0]["cy"] == 1.0 and stats[0]["n"] == 4
    assert stats[1]["cx"] == 11.0 and stats[1]["cy"] == 11.0 and stats[1]["n"] == 4


def test_wssse_golden(f4):
    assigned = km.assign(f4, F4_CENTERS)
    assert km.wssse(assigned).collect()[0]["wssse"] == 16.0


def test_bbox_golden(f4):
    b = km.bbox(f4).collect()[0]
    assert (b["min_x"], b["max_x"], b["min_y"], b["max_y"]) == (0.0, 12.0, 0.0, 12.0)


def test_empty_cluster_repair_policies(spark, f4):
    # F5: K=3 with an unreachable centroid → exactly K centroids out.
    centers3 = F4_CENTERS + [(2, 1000.0, 1000.0)]
    means, sizes, _ = km.lloyd_step(f4, centers3)
    assert 2 not in means
    import random

    reseeded = km.repair_empty(centers3, means, (0, 12, 0, 12), random.Random(0), "reseed")
    kept = km.repair_empty(centers3, means, (0, 12, 0, 12), random.Random(0), "keep")
    assert [c[0] for c in reseeded] == [0, 1, 2]
    assert kept[2] == (2, 1000.0, 1000.0)
    r2 = reseeded[2]
    assert 0 <= r2[1] <= 12 and 0 <= r2[2] <= 12


def test_empty_clusters_df(spark, f4):
    from pyspark.sql import functions as F

    expected = spark.range(3).select(F.col("id").cast("int").alias("cid"))
    stats = km.recompute(km.assign(f4, F4_CENTERS + [(2, 1000.0, 1000.0)]))
    empties = km.empty_clusters(expected, stats).collect()
    assert [r["cid"] for r in empties] == [2]


def test_fit_converges_and_is_fixpoint(f4):
    res = km.fit(f4, k=2, max_iter=10, tol=1e-9, init_centers=F4_CENTERS)
    # F4 init is already the fixpoint: converges immediately, WSSSE 16.
    assert res.converged
    assert res.wssse_history[0] == 16.0
    assert sorted(res.centers) == [(0, 1.0, 1.0), (1, 11.0, 11.0)]


def test_fit_wssse_nonincreasing(spark, sf_dir):
    from kmeans_mapreduce_spark.sources.derive import points_2d

    pts = points_2d(spark, sf_dir)
    res = km.fit(pts, k=4, max_iter=6, tol=0.0, seed=42)
    hist = res.wssse_history
    assert len(hist) >= 2
    for prev, cur in zip(hist, hist[1:]):
        assert cur <= prev * (1 + 1e-9)


def test_kmeans_parallel_init_beats_random_first_iteration(spark, sf_dir):
    from kmeans_mapreduce_spark.sources.derive import points_2d

    pts = points_2d(spark, sf_dir)
    rnd = km.fit(pts, k=4, max_iter=2, tol=0.0, seed=42)
    kmpp = km.fit(pts, k=4, max_iter=2, tol=0.0, seed=42, init="k-means||")
    assert sorted(c[0] for c in kmpp.centers) == [0, 1, 2, 3]
    # D²-sampled seeds start far closer to the optimum than uniform-box
    assert kmpp.wssse_history[0] < rnd.wssse_history[0]


def test_fit_always_k_centers(spark, sf_dir):
    from kmeans_mapreduce_spark.sources.derive import points_2d

    pts = points_2d(spark, sf_dir)
    res = km.fit(pts, k=8, max_iter=3, tol=0.5, seed=7)
    assert sorted(c[0] for c in res.centers) == list(range(8))


def test_round_half_up_matches_both_engines(spark):
    """Driver-side mean rounding must agree with Spark F.round and
    DuckDB ROUND everywhere — including exactly-representable decimal
    half-ties (dyadic values like 1.0078125), where Python's built-in
    round() (half-to-even) diverges."""
    import random as rnd

    import duckdb
    from pyspark.sql import functions as F

    from kmeans_mapreduce_spark.operators.kmeans import round_half_up

    vals = [
        1.0078125, -1.0078125, 33.0078125,  # dyadic 7-digit half-ties
        2.5e-6, -2.5e-6, 0.9999995, -0.9999995, 0.0, 123.456789499,
    ]
    r = rnd.Random(0)
    vals += [r.uniform(-1000, 1000) for _ in range(200)]
    # built-in round() must actually diverge on the planted ties
    assert round(1.0078125, 6) != round_half_up(1.0078125, 6)

    py = [round_half_up(v, 6) for v in vals]
    con = duckdb.connect()
    duck = [
        con.execute("SELECT ROUND(CAST(? AS DOUBLE), 6)", [v]).fetchone()[0]
        for v in vals
    ]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "i INT, v DOUBLE"
    ).select("i", F.round("v", 6).alias("r"))
    sp = [row["r"] for row in df.orderBy("i").collect()]
    assert py == duck
    assert py == sp


def test_elbow_sweep_wssse_monotone_in_k(spark):
    """The elbow table's point: more clusters → lower cost. With the
    fixed in-box inits, WSSSE must strictly decrease across the
    candidate ks, and every row must cover the full point set."""
    from kmeans_mapreduce_spark.queries import q_kmeans_elbow_sweep

    rows = sorted(
        q_kmeans_elbow_sweep(spark, "/root/testdata/sf0.001").collect(),
        key=lambda r: r["k"],
    )
    assert [r["k"] for r in rows] == [2, 4, 8]
    assert len({r["n_points"] for r in rows}) == 1
    ws = [r["wssse"] for r in rows]
    assert ws[0] > ws[1] > ws[2]


def test_lloyd_step_sql_nonfinite_center_falls_back(spark):
    """ADVICE r8: repr() of nan/inf makes unparseable/always-false SQL
    text, so lloyd_step_sql must route non-finite centers through the
    Arrow step instead of crashing — and still produce the numeric
    answer for the finite centers."""
    from kmeans_mapreduce_spark.operators import kmeans as km

    pts = spark.createDataFrame(
        [(0.0, 0.0), (1.0, 1.0), (10.0, 10.0)], "x DOUBLE, y DOUBLE"
    )
    bad = [(0, float("nan"), 0.0), (1, 10.0, 10.0)]
    means, sizes, sse = km.lloyd_step_sql(pts, bad)
    # every point lands on the one finite center (nan distances never
    # win an argmin against a finite one in the Arrow step)
    assert sizes == {1: 3}
    inf_c = [(0, float("inf"), 0.0), (1, 0.0, 0.0)]
    means2, sizes2, _ = km.lloyd_step_sql(pts, inf_c)
    assert sizes2 == {1: 3}


def test_assign_nd_arrow_matches_expr_bitwise(spark):
    """assign_nd's two physical paths (K*d-literal expression vs Arrow
    matmul) must agree bit-for-bit — unrounded d2 included — and break
    ties to the lowest cid; auto dispatch picks by plan size."""
    from kmeans_mapreduce_spark.operators import kmeans_nd as knd

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    from pyspark.sql import functions as F

    pts = emb.select(
        F.col("vec_id").alias("point_id"),
        F.transform(F.col("embedding"), lambda v: v.cast("double")).alias(
            "vec"
        ),
    )
    first = pts.orderBy("point_id").limit(5).collect()
    centers = [(i, list(r["vec"])) for i, r in enumerate(first)]
    # plant an exact duplicate center under a higher cid: ties -> 0
    centers.append((9, centers[0][1]))
    a = {
        r["point_id"]: (r["cid"], r["min_d2"])
        for r in knd.assign_nd(pts, centers, impl="expr").collect()
    }
    b = {
        r["point_id"]: (r["cid"], r["min_d2"])
        for r in knd.assign_nd(pts, centers, impl="arrow").collect()
    }
    assert len(a) == 500 and a == b
    assert a[first[0]["point_id"]][0] == 0  # duplicate-center tie -> lowest
    # r9 ADVICE: the Arrow path must preserve the INPUT's point_id type
    # (it hardcoded LONG, so impl='auto' silently widened INT ids when
    # K*d crossed CELL_LITERAL_MAX_KD)
    pts_int = pts.withColumn("point_id", F.col("point_id").cast("int"))
    for impl in ("expr", "arrow"):
        got = dict(knd.assign_nd(pts_int, centers, impl=impl).dtypes)
        assert got["point_id"] == "int", (impl, got)
