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

Investigated and rejected (round 8): running the WHOLE loop as ONE
barrier-mode job with ``BarrierTaskContext.allGather`` syncing the
K-row partials per iteration. The idea is sound (job-submission
overhead paid once) but Spark 4.1.2's ``runBarrier`` polls its RPC
future with a hardcoded ``Thread.sleep(1000)`` (BarrierTaskContext,
bytecode-verified), so every global sync costs ≥1 s wall — measured
1.002 s/allGather flat, i.e. 10 s of pure sleep for a 10-iteration
fit that the per-job loop finishes in <3 s. Barrier scheduling also
requires every partition concurrently resident (caps input at cluster
slots). If the poll interval ever becomes tunable, the one-job design
is worth revisiting for many-iteration fits.
"""

from __future__ import annotations

import math
import random
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kmeans_mapreduce_spark.functions.distance import nearest_centroid_2d, sq_dist_2d

Center = tuple[int, float, float]  # (cid, cx, cy)


def round_half_up(x: float, digits: int) -> float:
    """HALF_UP decimal rounding of a double — the same semantics as
    Spark's ``F.round`` (BigDecimal HALF_UP over the shortest decimal
    repr) and DuckDB's ``ROUND`` (half away from zero). Python's
    built-in ``round`` is half-to-even, which diverges on exact
    representable half-ties (dyadic values like x.0078125); driver-side
    means that re-enter the oracle-gated loop must round identically
    to both engines."""
    import decimal

    return float(
        decimal.Decimal(repr(x)).quantize(
            decimal.Decimal(1).scaleb(-digits), rounding=decimal.ROUND_HALF_UP
        )
    )


def normalize_partitions(df: DataFrame) -> DataFrame:
    """Bound the per-iteration fixed cost of an Arrow loop input: cap
    over-partitioned inputs at 2× parallelism (many small files multiply
    the per-task launch + Arrow round-trip by every iteration; measured
    1.5× above linear at 304 partitions) and raise under-partitioned
    ones to parallelism/4 (a 3-row-group parquet caches as 3 partitions
    and caps the loop at 3-way compute — but full-width fan-out of a
    K-row partial agg loses to per-task Python/Arrow overhead: 64-way
    measured 2.4× slower than 8-way; a quarter of the cores is the
    measured sweet spot). ONE shuffle, amortized over all iterations.
    Shared by the 2-D and n-D fits — retune here, not per-copy."""
    spark_ctx = df.sparkSession.sparkContext
    target = spark_ctx.defaultParallelism * 2
    floor = max(2, spark_ctx.defaultParallelism // 4)
    n0 = df.rdd.getNumPartitions()
    if n0 > 4 * target:
        return df.repartition(target)
    if n0 < floor:
        return df.repartition(floor)
    return df


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


def assign_broadcast(points: DataFrame, centers: list[Center]) -> DataFrame:
    """Same semantics as :func:`assign`, but centers travel as a
    broadcast ONE-ROW table (cx0,cy0,…) instead of plan literals.

    Inside the Lloyd loop the literal form generates *different* code
    every iteration (new constants → Janino recompiles, ~0.3 s/iter —
    half the per-iteration wall at sf0.1). Here the generated code is
    identical across iterations — centroid values arrive as runtime
    join data via a 1-row BroadcastNestedLoopJoin — so codegen compiles
    once and every later iteration is pure execution. Still narrow: no
    shuffle, K×4 flops/row in whole-stage codegen.
    """
    spark = points.sparkSession
    ordered = sorted((int(c), float(x), float(y)) for c, x, y in centers)
    row = tuple(v for _, x, y in ordered for v in (x, y))
    schema = ", ".join(f"cx{i} DOUBLE, cy{i} DOUBLE" for i in range(len(ordered)))
    cdf = spark.createDataFrame([row], schema)
    cands = [
        F.struct(
            sq_dist_2d(
                F.col("x"), F.col("y"), F.col(f"cx{i}"), F.col(f"cy{i}")
            ).alias("d2"),
            F.lit(cid).cast("int").alias("cid"),
        )
        for i, (cid, _, _) in enumerate(ordered)
    ]
    best = F.array_min(F.array(*cands))
    return points.crossJoin(F.broadcast(cdf)).select(
        "point_id",
        "x",
        "y",
        best["cid"].alias("cid"),
        best["d2"].alias("min_d2"),
    )


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


def kmpp_scores(points: DataFrame, cands: list[tuple[float, float]]) -> DataFrame:
    """One k-means|| round's D²-scoring: distance of every point to its
    nearest current candidate — the quantity Bahmani's sampling weights
    by. A narrow literal-argmin map (no shuffle); shared by the
    :func:`init_kmeans_parallel` loop and the oracle-gated
    ``kmeans_kmpp_round1`` query so the gated math IS the init's math."""
    lit_centers = [(i, cx, cy) for i, (cx, cy) in enumerate(cands)]
    best = nearest_centroid_2d(F.col("x"), F.col("y"), lit_centers)
    return points.select("*", best["d2"].alias("d2"))


def kmpp_round_probs(
    points: DataFrame,
    cands: list[tuple[float, float]],
    l: int,
    phi_digits: int = 2,
    prob_digits: int = 6,
) -> DataFrame:
    """The deterministic half of one k-means|| sampling round: per-point
    d² and the sampling probability min(1, l·d²/φ), as ONE plan — φ is
    a cross-joined broadcast 1-row sum, rounded to ``phi_digits`` so
    both engines divide by a bit-identical scalar. Everything up to the
    seeded coin-flip is SQL-expressible; this is what the oracle gates
    (the flip itself stays rows-only by declared contract)."""
    scored = kmpp_scores(points, cands)
    phi = scored.agg(F.round(F.sum("d2"), phi_digits).alias("__phi"))
    # phi can ROUND to 0.0 near convergence: the division would yield
    # NULL (non-ANSI div-by-zero), which F.least silently skips,
    # turning every prob into 1.0 — guard to the degenerate-cover
    # answer (nothing left worth sampling) on both engines
    prob = F.when(
        F.col("__phi") > 0,
        F.least(F.lit(1.0), F.lit(float(l)) * F.col("d2") / F.col("__phi")),
    ).otherwise(F.lit(0.0))
    return (
        scored.crossJoin(F.broadcast(phi))
        .select(
            "*",
            F.round(prob, prob_digits).alias("prob"),
        )
        .drop("__phi")
    )


def init_kmeans_parallel(
    points: DataFrame,
    k: int,
    seed: int = 42,
    rounds: int = 5,
    oversample: int | None = None,
) -> list[Center]:
    """k-means|| init (Bahmani et al., VLDB 2012) — the scale-correct
    seeding the reference lacks (its uniform-box init needs many Lloyd
    iterations to recover from bad seeds; D²-sampling starts near the
    final solution).

    Each round: score every point against the current candidate set
    (narrow literal-argmin map — no shuffle), Σd² via one aggregate,
    then sample points with probability min(1, l·d²/φ) using a seeded
    per-round ``rand``. Candidates (≈ rounds·l total, driver-tiny) are
    weighted by their nearest-point counts and reduced to k with a
    deterministic weighted Lloyd on the driver. O(rounds) passes over
    the data, exactly like MLlib's implementation of the same paper.
    """
    import numpy as np

    l = oversample or 2 * k
    pts = points.select("x", "y")
    rng = random.Random(seed)
    frac = min(1.0, 100.0 / max(pts.count(), 1))
    first = pts.sample(False, frac, seed).limit(1).collect()
    if not first:
        first = pts.limit(1).collect()
    cands: list[tuple[float, float]] = [(first[0]["x"], first[0]["y"])]

    for r in range(rounds):
        scored = kmpp_scores(pts, cands)
        phi = scored.agg(F.sum("d2").alias("phi")).collect()[0]["phi"]
        if not phi or phi <= 0:
            break  # every point coincides with a candidate
        new = (
            scored.filter(
                F.rand(seed + 1000 + r) < (F.lit(float(l)) * F.col("d2") / F.lit(float(phi)))
            )
            .select("x", "y")
            .collect()
        )
        cands.extend((row["x"], row["y"]) for row in new)

    # weights: how many points each candidate wins
    lit_centers = [(i, cx, cy) for i, (cx, cy) in enumerate(cands)]
    best = nearest_centroid_2d(F.col("x"), F.col("y"), lit_centers)
    wrows = pts.select(best["cid"].alias("cid")).groupBy("cid").count().collect()
    weights = np.zeros(len(cands))
    for row in wrows:
        weights[row["cid"]] = row["count"]

    # driver-side weighted Lloyd to reduce candidates → k (deterministic)
    arr = np.array(cands)
    if len(cands) <= k:
        out = [(i, float(x), float(y)) for i, (x, y) in enumerate(cands)]
        while len(out) < k:  # degenerate corpus: pad with jittered copies
            i = len(out)
            x, y = cands[i % len(cands)]
            out.append((i, x + rng.uniform(-1e-6, 1e-6), y + rng.uniform(-1e-6, 1e-6)))
        return out
    # seed with the k heaviest candidates, then a few weighted-Lloyd steps
    top = np.argsort(-weights, kind="stable")[:k]
    centers = arr[top].copy()
    for _ in range(20):
        d2 = ((arr[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2)
        a = d2.argmin(axis=1)
        moved = 0.0
        for j in range(k):
            m = a == j
            w = weights[m]
            if w.sum() > 0:
                nc = (arr[m] * w[:, None]).sum(axis=0) / w.sum()
                moved += float(((nc - centers[j]) ** 2).sum())
                centers[j] = nc
        if moved < 1e-12:
            break
    return [(i, float(cx), float(cy)) for i, (cx, cy) in enumerate(centers)]


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


def lloyd_step_arrow(
    points_xy: DataFrame,
    centers: list[Center],
    n_parts: int | None = None,
) -> tuple[dict[int, tuple[float, float]], dict[int, int], float]:
    """One Lloyd iteration via Arrow-vectorized partial aggregation.

    Same contract as :func:`lloyd_step`, different physical strategy:
    ``mapInPandas`` emits K partial-sum rows per partition (numpy
    argmin over a (batch × K) distance matrix), then a K-row groupBy
    merges them. Why this exists alongside the pure-Catalyst step: the
    expression form bakes centroid literals into the plan, so every
    iteration re-analyzes and re-compiles codegen (~0.2 s/iter — the
    dominant per-iteration cost at bench scale, and pure driver-side
    latency at any scale). Here centers ride in the Python closure:
    the plan is structurally identical every iteration, nothing
    recompiles, and the shuffle still carries only K rows per
    partition. Distances use the same (x−cx)²+(y−cy)² float64 op
    order; argmin ties break to the lowest index = lowest cid
    (reference mapper.py:43 first-wins).
    """
    import numpy as np
    import pandas as pd

    ordered = sorted((int(c), float(x), float(y)) for c, x, y in centers)
    cids = [c for c, _, _ in ordered]
    cx = np.array([x for _, x, _ in ordered])
    cy = np.array([y for _, _, y in ordered])
    k = len(ordered)
    # nan-guard is only needed when a center is non-finite (the
    # lloyd_step_sql fallback path); keep the hot loop one pass
    guard_nan = not (np.isfinite(cx).all() and np.isfinite(cy).all())

    def partials(batches):
        sx = np.zeros(k)
        sy = np.zeros(k)
        n = np.zeros(k, dtype=np.int64)
        sse = np.zeros(k)  # per-cluster, so the groupBy merge is exact
        for pdf in batches:
            x = pdf["x"].to_numpy()
            y = pdf["y"].to_numpy()
            dx = x[:, None] - cx[None, :]
            dy = y[:, None] - cy[None, :]
            d2 = dx * dx + dy * dy
            if guard_nan:
                # a nan center (or inf−inf) yields nan distances;
                # np.argmin would return the nan column AND the nan
                # partial would cross the Arrow boundary as NULL
                # (pandas nan_as_null), crashing the driver merge. A
                # non-finite center simply never wins: nan → +inf
                # before the argmin.
                d2 = np.where(np.isnan(d2), np.inf, d2)
            a = d2.argmin(axis=1)
            n += np.bincount(a, minlength=k)
            sx += np.bincount(a, weights=x, minlength=k)
            sy += np.bincount(a, weights=y, minlength=k)
            sse += np.bincount(a, weights=d2[np.arange(len(x)), a], minlength=k)
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        yield pd.DataFrame(
            {
                "pid": np.full(k, pid, dtype=np.int32),
                "cid": np.arange(k, dtype=np.int32),
                "sx": sx,
                "sy": sy,
                "n": n,
                "sse": sse,
            }
        )

    part_df = points_xy.mapInPandas(
        partials, "pid INT, cid INT, sx DOUBLE, sy DOUBLE, n LONG, sse DOUBLE"
    )
    if n_parts is None:
        # .rdd forces a plan→RDD conversion; callers looping (fit)
        # should compute this once and pass it in
        n_parts = points_xy.rdd.getNumPartitions()
    if n_parts <= 1024:
        # Single-stage job: P×K partial rows come straight to the
        # driver (MLlib's treeAggregate endgame) — no shuffle at all.
        # Merge in pid order so float sums are deterministic per layout.
        rows = sorted(part_df.collect(), key=lambda r: (r["pid"], r["cid"]))
    else:
        # Cluster-scale fallback: merge partials through a K-row
        # groupBy so the driver sees K rows, not P×K.
        rows = (
            part_df.groupBy("cid")
            .agg(
                F.sum("sx").alias("sx"),
                F.sum("sy").alias("sy"),
                F.sum("n").alias("n"),
                F.sum("sse").alias("sse"),
            )
            .collect()
        )
    import collections

    acc = collections.defaultdict(lambda: [0.0, 0.0, 0, 0.0])
    for r in rows:
        a = acc[r["cid"]]
        a[0] += r["sx"]
        a[1] += r["sy"]
        a[2] += r["n"]
        a[3] += r["sse"]
    means = {
        cids[c]: (a[0] / a[2], a[1] / a[2]) for c, a in acc.items() if a[2] > 0
    }
    sizes = {cids[c]: int(a[2]) for c, a in acc.items() if a[2] > 0}
    f_cur = float(sum(a[3] for a in acc.values()))
    return means, sizes, f_cur


# Below this many cached rows, one iteration's interpreted-eval cost is
# smaller than Janino's ~0.2 s whole-stage-codegen compile of the fresh
# literal plan, so the loop runs faster with codegen off. Above it, the
# compile amortizes over the scan and codegen wins (and at 100 TB it is
# not even a rounding error). Measured crossover at sf0.1 (600 K rows):
# interpreted step ≈ 0.31 s vs codegen step ≈ 0.5 s (compile-dominated).
CODEGEN_MIN_ROWS = 5_000_000


def lloyd_step_sql(
    points_xy: DataFrame, centers: list[Center]
) -> tuple[dict[int, tuple[float, float]], dict[int, int], float]:
    """One Lloyd iteration as a single string-built Catalyst plan.

    Same contract and semantics as :func:`lloyd_step` — squared
    Euclidean ``(x−cx)²+(y−cy)²`` in the identical IEEE op order, ties
    break first-wins to the lowest cid (reference ``mapper.py:43``) —
    but the expression tree arrives as ONE ``selectExpr`` string batch
    instead of thousands of Py4J ``Column`` calls. Why: profiling the
    sf0.1 loop showed ~0.3 s/iteration spent *driver-side in Python*
    building ``struct``/``array_min`` trees one Py4J round-trip at a
    time; the JVM parses the same expressions from text in ~5 ms.

    The plan itself is the right one at every scale: a narrow literal
    arg-min map (no join, no shuffle of points) into a partial+final
    hash aggregate whose exchange carries K rows per partition. The
    caller decides whether whole-stage codegen pays for itself (see
    ``CODEGEN_MIN_ROWS`` — fresh literals mean a fresh compile every
    iteration, which dominates at bench scale and vanishes at 100 TB).
    """
    ordered = sorted((int(c), float(x), float(y)) for c, x, y in centers)
    # repr() of a finite double round-trips exactly through the SQL
    # parser (shortest-repr → decimal literal → double); nan/inf would
    # produce unparseable or always-false SQL text, so route those
    # centers through the numerically-safe Arrow step instead (same
    # contract, centers ride in the closure, not in SQL text).
    if not all(
        math.isfinite(x) and math.isfinite(y) for _, x, y in ordered
    ):
        return lloyd_step_arrow(points_xy, centers)
    k = len(ordered)
    d_exprs = [
        f"((x - ({x!r}))*(x - ({x!r})) + (y - ({y!r}))*(y - ({y!r}))) AS d{i}"
        for i, (_, x, y) in enumerate(ordered)
    ]
    min_expr = (
        "least(" + ",".join(f"d{i}" for i in range(k)) + ")" if k > 1 else "d0"
    )
    case_expr = (
        "CASE "
        + " ".join(
            f"WHEN d{i} = min_d2 THEN {int(cid)}" for i, (cid, _, _) in enumerate(ordered)
        )
        + " END AS cid"
    )
    rows = (
        points_xy.selectExpr("x", "y", *d_exprs)
        .selectExpr("x", "y", f"{min_expr} AS min_d2", *[f"d{i}" for i in range(k)])
        .selectExpr("x", "y", "min_d2", case_expr)
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
    impl: str = "auto",
    init: str = "random",
    round_digits: int | None = None,
) -> KMeansResult:
    """Full Lloyd's loop: init → (assign → recompute → repair) → converge.

    Convergence: |f(prev) − f(cur)| < tol, matching the reference's δ=0.5
    absolute-WSSSE test (master.py:22,365) but with tol configurable.
    ``points`` is cached once (the reference re-reads points.txt 3+
    times per iteration); plans are rebuilt from driver-held centers
    each iteration so lineage does not grow across iterations.

    ``impl``: ``"auto"`` (default) resolves to ``"sql"`` —
    :func:`lloyd_step_sql`, a pure-Catalyst string-built step with
    whole-stage codegen toggled off for small inputs (the per-iteration
    Janino compile of fresh centroid literals costs more than
    interpreted eval below ``CODEGEN_MIN_ROWS``; above it codegen stays
    on and amortizes). ``"arrow"`` iterates with
    :func:`lloyd_step_arrow` (constant plan, Arrow partial agg);
    ``"expr"`` uses the Py4J-built :func:`lloyd_step`. Same textbook
    semantics in every mode.

    ``round_digits``: round each iteration's means to this many decimals
    before they become the next generation's centers. With a fixed init
    and ``tol=0.0`` this makes the WHOLE loop deterministic across
    engines (rounding absorbs float summation-order noise), which is how
    the ``kmeans_fit_fixed`` query puts ``fit`` itself — repair path
    included — under the DuckDB hash gate.

    .. warning:: session-global conf toggle. For the duration of the
       loop, ``fit`` sets ``spark.sql.adaptive.enabled=false`` and (for
       small inputs on the sql path) ``spark.sql.codegen.wholeStage=
       false`` on the shared ``SparkSession``, restoring both in a
       ``finally``. Any query run CONCURRENTLY on the same session
       executes with those settings (interpreted, non-adaptive) —
       harmless for a single-threaded driver, a footgun for
       multi-threaded library use. Spark has no per-query scope for
       these confs; callers who need isolation should run ``fit`` on
       its own session (``spark.newSession()``).
    """
    if impl == "auto":
        impl = "sql"
    cols = ["x", "y"] if impl in ("arrow", "sql") else ["point_id", "x", "y"]
    points = points.select(*cols)
    points = normalize_partitions(points).cache()
    if impl == "arrow":
        cached_parts = points.rdd.getNumPartitions()

        def step(pts, cs):
            return lloyd_step_arrow(pts, cs, n_parts=cached_parts)

    elif impl == "sql":
        step = lloyd_step_sql
    else:
        step = lloyd_step
    spark = points.sparkSession
    # The loop's only shuffle is a K-row aggregate: AQE's adaptive
    # re-planning buys nothing there but costs ~0.1 s scheduling per
    # iteration (20% of iteration wall at sf0.1). Disable for the loop,
    # restore after — large one-shot queries elsewhere keep AQE.
    aqe_before = spark.conf.get("spark.sql.adaptive.enabled", "true")
    cg_before = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        # ONE pre-loop job: bounding box (init/repair sampling range)
        # plus the row count that decides the codegen strategy — the
        # count rides the same partial+final agg for free.
        b = (
            points.agg(
                F.min("x").alias("min_x"),
                F.max("x").alias("max_x"),
                F.min("y").alias("min_y"),
                F.max("y").alias("max_y"),
                F.count(F.lit(1)).alias("n_rows"),
            ).collect()
        )[0]
        bounds = (b["min_x"], b["max_x"], b["min_y"], b["max_y"])
        if impl == "sql" and b["n_rows"] < CODEGEN_MIN_ROWS:
            spark.conf.set("spark.sql.codegen.wholeStage", "false")
        if init_centers is None:
            if init == "k-means||":
                centers = init_kmeans_parallel(points, k, seed)
            else:
                centers = init_random(k, bounds, seed)
        else:
            centers = [(int(c), float(x), float(y)) for c, x, y in init_centers]

        rng = random.Random(seed + 1)
        result = KMeansResult(centers=centers)
        f_prev: float | None = None
        for it in range(max_iter):
            means, sizes, f_cur = step(points, centers)
            if round_digits is not None:
                means = {
                    c: (
                        round_half_up(mx, round_digits),
                        round_half_up(my, round_digits),
                    )
                    for c, (mx, my) in means.items()
                }
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
        spark.conf.set("spark.sql.adaptive.enabled", aqe_before)
        spark.conf.set("spark.sql.codegen.wholeStage", cg_before)
        points.unpersist()
