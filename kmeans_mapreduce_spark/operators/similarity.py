"""Similarity search over embeddings (north-star): brute-force cosine
top-k baseline + random-hyperplane LSH bucketed ANN as the scale path.

Scale design: brute force is correct at any N but O(N·Q); the LSH
variant buckets vectors by sign-pattern so each query probes ~N/2^P
candidates. Both are expressed as DataFrame plans: the query set is
broadcast (tiny), the corpus side stays partitioned — the join is a
broadcast hash join, no corpus shuffle. The window top-k uses
``row_number`` partitioned by query id, which AQE executes after a
shuffle keyed by query — Q keys, bounded by the (small) query count;
for large Q swap in a groupBy + ``slice(sort_array(collect_list))``
per-key top-k.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kmeans_mapreduce_spark.functions.distance import cosine_sim, dot_nd

NUM_PLANES = 8
DIM = 64


def plane_signs(num_planes: int = NUM_PLANES, dim: int = DIM) -> list[list[int]]:
    """Deterministic ±1 hyperplane components, derived from md5 so the
    oracle SQL regenerates the identical planes (no RNG state shared
    between engines — the constants ARE the contract)."""
    planes = []
    for p in range(num_planes):
        row = []
        for d in range(dim):
            digest = hashlib.md5(f"plane:{p}:{d}".encode()).digest()
            row.append(1 if digest[0] % 2 == 0 else -1)
        planes.append(row)
    return planes


def _as_double_vec(col):
    return F.transform(col, lambda v: v.cast("double"))


def cosine_topk(
    emb: DataFrame, query_ids: list[int], k: int = 5, digits: int = 6
) -> DataFrame:
    """Brute-force cosine top-k: every query vs the full corpus.

    Output: (query_id, neighbor_id, rank, cosine). Ranking happens on
    the *rounded* similarity with neighbor_id as tiebreak, so the order
    is reproducible across engines despite float-sum noise."""
    e = emb.select("vec_id", _as_double_vec(F.col("embedding")).alias("v"))
    q = e.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    scored = e.join(F.broadcast(q), F.col("vec_id") != F.col("query_id")).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(cosine_sim(F.col("qv"), F.col("v")), digits).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def lsh_bucket(vec_col, planes: list[list[int]]):
    """Sign-pattern bucket id: bit p = 1 iff dot(vec, plane_p) > 0."""
    bucket = F.lit(0).cast("long")
    for p, signs in enumerate(planes):
        proj = dot_nd(vec_col, F.array(*[F.lit(float(s)) for s in signs]))
        bucket = bucket + F.when(proj > 0, F.lit(2 ** p).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return bucket


def lsh_ann_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 3,
    num_planes: int = NUM_PLANES,
    digits: int = 6,
) -> DataFrame:
    """ANN: candidates = same LSH bucket as the query, then exact
    cosine top-k within candidates. Bucketing is a narrow expression;
    the candidate join is an equi-join on bucket (hash partitioned,
    ~N/2^P per bucket). Recall < 1 by design — that's the ANN trade."""
    planes = plane_signs(num_planes)
    e = emb.select(
        "vec_id",
        _as_double_vec(F.col("embedding")).alias("v"),
    ).withColumn("bucket", lsh_bucket(F.col("v"), planes))
    q = e.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("bucket").alias("qbucket"),
    )
    cands = e.join(
        F.broadcast(q),
        (F.col("bucket") == F.col("qbucket")) & (F.col("vec_id") != F.col("query_id")),
    )
    scored = cands.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(cosine_sim(F.col("qv"), F.col("v")), digits).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )
