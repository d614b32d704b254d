"""2-D Lloyd's k-means as pure DataFrame operators (SURVEY §2.1 O6–O13).

Reference architecture being replaced (``/root/reference``): master
splits the input into M files (master.py:50-77), RPCs centroids to M
mapper processes (master.py:179-189) which write mod-R partition files
(mapper.py:53-74), R reducers pull them over an R×M gRPC mesh
(reducer.py:59-139) and emit per-cluster means (reducer.py:29-44); the
master loops until |ΔWSSSE| < 0.5 (master.py:352-366), re-scanning the
raw input twice per iteration for the objective (master.py:315-332).

The Spark-native shape: per iteration, ONE job —
a narrow arg-min map (no shuffle, no crossJoin: centers are K literals
inside whole-stage codegen) feeding one partial+final hash aggregation
whose shuffle carries O(partitions × K) rows, not O(N) like the
reference (no map-side combine there — BASELINE.md §2). WSSSE falls out
of the same aggregation: zero extra scans. Centroids live on the driver
between iterations (K rows), exactly like MLlib's own KMeans; plans are
rebuilt from literals each iteration so lineage stays O(1).

Semantics are textbook Lloyd's, fixing the reference's accidents
(SURVEY §2.3): cluster identity survives aggregation (cid, not
partition index), init/repair sample uniformly within the true bounding
box, ties break to the lowest cid (strict ``<`` first-wins,
mapper.py:43), convergence on |ΔWSSSE| < tol with an iteration cap.
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kmeans_mapreduce_spark.functions.distance import nearest_centroid_2d, sq_dist_2d

Center = tuple[int, float, float]  # (cid, cx, cy)


# ---------------------------------------------------------------------------
# O6 — nearest-centroid assignment (the "map", mapper.py:35-51)
# ---------------------------------------------------------------------------

def assign(points: DataFrame, centers: list[Center]) -> DataFrame:
    """Assign each point to its nearest centroid (squared Euclidean).

    Narrow (shuffle-free) path for driver-held centers — the common case
    in the Lloyd loop. Output keeps x,y so recompute/wssse reuse it.
    """
    best = nearest_centroid_2d(F.col("x"), F.col("y"), centers)
    return points.select(
        "point_id",
        "x",
        "y",
        best["cid"].alias("cid"),
        best["d2"].alias("min_d2"),
    )


def assign_df(points: DataFrame, centroids: DataFrame) -> DataFrame:
    """General assignment when centroids are a DataFrame (unknown K).

    Broadcast nested-loop join + per-point struct-min aggregation — the
    declarative form of the reference's RPC centroid fan-out
    (master.py:184-188) + Python argmin loop (mapper.py:38-49). The
    explicit ``broadcast`` hint guarantees no N×K shuffle at any scale;
    the groupBy shuffles N rows once. Prefer :func:`assign` inside
    loops; use this when centroids come from data (e.g. another query).
    """
    d2 = sq_dist_2d(F.col("x"), F.col("y"), F.col("cx"), F.col("cy"))
    scored = points.crossJoin(F.broadcast(centroids)).select(
        "point_id",
        "x",
        "y",
        F.struct(d2.alias("d2"), F.col("cid").cast("int").alias("cid")).alias("cand"),
    )
    best = (
        scored.groupBy("point_id", "x", "y")
        .agg(F.min("cand").alias("best"))
        .select(
            "point_id",
            "x",
            "y",
            F.col("best.cid").alias("cid"),
            F.col("best.d2").alias("min_d2"),
        )
    )
    return best


# ---------------------------------------------------------------------------
# O8 — per-cluster mean (the "reduce", reducer.py:29-44)
# ---------------------------------------------------------------------------

def recompute(assigned: DataFrame) -> DataFrame:
    """New centroid = mean of assigned points, plus member count.

    Catalyst plans partial+final HashAggregate automatically — the
    map-side combine the reference lacks (its shuffle carries every
    point: mapper.py:53-74). Clusters with no members are absent here;
    see :func:`repair_empty`.
    """
    return assigned.groupBy("cid").agg(
        F.avg("x").alias("cx"),
        F.avg("y").alias("cy"),
        F.count(F.lit(1)).alias("n"),
    )


# ---------------------------------------------------------------------------
# O9 — bounding box (master.py:274-303)
# ---------------------------------------------------------------------------

def bbox(points: DataFrame) -> DataFrame:
    """Global min/max of both coordinates in one partial+final agg."""
    return points.agg(
        F.min("x").alias("min_x"),
        F.max("x").alias("max_x"),
        F.min("y").alias("min_y"),
        F.max("y").alias("max_y"),
    )


# ---------------------------------------------------------------------------
# O10 — WSSSE objective (master.py:315-332)
# ---------------------------------------------------------------------------

def wssse(assigned: DataFrame) -> DataFrame:
    """Σ min-squared-distance. Reuses O6's output: the reference instead
    re-scans the raw input twice per iteration (called twice at
    master.py:365) — two full O(N·K) passes this plan never does."""
    return assigned.agg(F.sum("min_d2").alias("wssse"))


# ---------------------------------------------------------------------------
# O11 — seeded init (master.py:81-88, textbook bounds per SURVEY §2.3.3)
# ---------------------------------------------------------------------------

def init_random(
    k: int, bounds: tuple[float, float, float, float], seed: int = 42
) -> list[Center]:
    """K uniform samples within the data bounding box.

    All randomness stays on the driver (like the reference's
    master-side init) so runs are reproducible regardless of
    partitioning. The reference scrambles axes/signs when passing
    bounds (master.py:346-347); intent per getInputRange
    (master.py:274-303) is the true box — implemented here.
    """
    min_x, max_x, min_y, max_y = bounds
    rng = random.Random(seed)
    return [
        (cid, rng.uniform(min_x, max_x), rng.uniform(min_y, max_y))
        for cid in range(k)
    ]


# ---------------------------------------------------------------------------
# O12 — empty-cluster repair (master.py:265-271 / sequential-kmeans.py:46-48)
# ---------------------------------------------------------------------------

def repair_empty(
    centers: list[Center],
    new_stats: dict[int, tuple[float, float]],
    bounds: tuple[float, float, float, float],
    rng: random.Random,
    policy: str = "reseed",
) -> list[Center]:
    """Guarantee exactly K centroids every generation.

    ``reseed``: empty clusters get a fresh uniform sample in the data
    bounding box (distributed reference semantics, master.py:265-271,
    with the sign-scramble fixed — SURVEY §2.3.3).
    ``keep``: retain the previous centroid (sequential reference
    semantics, sequential-kmeans.py:46-48).
    """
    min_x, max_x, min_y, max_y = bounds
    out: list[Center] = []
    for cid, old_x, old_y in centers:
        if cid in new_stats:
            nx, ny = new_stats[cid]
            out.append((cid, nx, ny))
        elif policy == "keep":
            out.append((cid, old_x, old_y))
        else:
            out.append((cid, rng.uniform(min_x, max_x), rng.uniform(min_y, max_y)))
    return out


def empty_clusters(expected: DataFrame, stats: DataFrame) -> DataFrame:
    """Declarative empty-cluster *detection*: expected cids anti-joined
    with observed cluster stats (the oracle-checkable face of O12)."""
    return expected.join(stats, "cid", "left_anti").select("cid")


# ---------------------------------------------------------------------------
# O13 — the iteration loop (master.py:352-366)
# ---------------------------------------------------------------------------

@dataclass
class KMeansResult:
    centers: list[Center]
    wssse_history: list[float] = field(default_factory=list)
    iterations: int = 0
    converged: bool = False
    cluster_sizes: dict[int, int] = field(default_factory=dict)


def lloyd_step(
    points: DataFrame, centers: list[Center]
) -> tuple[dict[int, tuple[float, float]], dict[int, int], float]:
    """One Lloyd iteration as ONE Spark job.

    Single aggregation returns per-cluster (mean, count) AND the WSSSE
    of the *current* centers: sums shuffle as O(partitions×K) partial
    rows. Returns (means, sizes, wssse). Compare: the reference runs a
    full map phase, an R×M shuffle of every point, plus two extra whole-
    input scans for the objective — per iteration.
    """
    rows = (
        assign(points, centers)
        .groupBy("cid")
        .agg(
            F.avg("x").alias("cx"),
            F.avg("y").alias("cy"),
            F.count(F.lit(1)).alias("n"),
            F.sum("min_d2").alias("sse"),
        )
        .collect()
    )
    means = {r["cid"]: (r["cx"], r["cy"]) for r in rows}
    sizes = {r["cid"]: r["n"] for r in rows}
    f_cur = float(sum(r["sse"] for r in rows))
    return means, sizes, f_cur


def fit(
    points: DataFrame,
    k: int,
    max_iter: int = 20,
    tol: float = 0.5,
    seed: int = 42,
    init_centers: list[Center] | None = None,
    empty_policy: str = "reseed",
) -> KMeansResult:
    """Full Lloyd's loop: init → (assign → recompute → repair) → converge.

    Convergence: |f(prev) − f(cur)| < tol, matching the reference's δ=0.5
    absolute-WSSSE test (master.py:22,365) but with tol configurable.
    ``points`` is cached once (the reference re-reads points.txt 3+
    times per iteration); plans are rebuilt from literal centers each
    iteration so lineage does not grow across iterations.
    """
    points = points.select("point_id", "x", "y").cache()
    try:
        if init_centers is None:
            b = bbox(points).collect()[0]
            bounds = (b["min_x"], b["max_x"], b["min_y"], b["max_y"])
            centers = init_random(k, bounds, seed)
        else:
            b = bbox(points).collect()[0]
            bounds = (b["min_x"], b["max_x"], b["min_y"], b["max_y"])
            centers = [(int(c), float(x), float(y)) for c, x, y in init_centers]

        rng = random.Random(seed + 1)
        result = KMeansResult(centers=centers)
        f_prev: float | None = None
        for it in range(max_iter):
            means, sizes, f_cur = lloyd_step(points, centers)
            result.wssse_history.append(f_cur)
            result.cluster_sizes = sizes
            centers = repair_empty(centers, means, bounds, rng, empty_policy)
            result.centers = centers
            result.iterations = it + 1
            if f_prev is not None and abs(f_prev - f_cur) < tol:
                result.converged = True
                break
            f_prev = f_cur
        return result
    finally:
        points.unpersist()
