"""Benchmark decontamination — flag training docs that overlap an
evaluation set's n-grams.

Training pipelines must drop documents that leak benchmark/eval
content (e.g. GPT-3 paper §4, PaLM §7: 8-13-gram overlap filters).
Semantics here: a document is contaminated when the share of its
distinct word-3-gram shingles that also occur in the benchmark set
meets a threshold.

Scale shape (the interesting part at 100 TB): the benchmark side is
always tiny — thousands of eval documents vs billions of training docs
— so its distinct shingle-fingerprint set is **broadcast** and the
corpus side never shuffles: explode shingles (narrow, one documents
scan), hash to 60-bit longs (broadcast carries longs, not strings),
broadcast LEFT SEMI join, then one map-side-combinable groupBy(doc_id)
count. No corpus-keyed exchange anywhere except that final count,
whose key (doc_id) is unique and uniform.

In this repo both sides come from the one synthetic ``documents``
table, split by ``doc_id % 97`` (≈1% "benchmark"); in production the
benchmark would be its own table and the same plan applies verbatim.

Reference: no counterpart (`/root/reference` has no string ops at
all, SURVEY §2.2) — this is north-star pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kmeans_mapreduce_spark.functions.hashing import h64
from kmeans_mapreduce_spark.operators.dedup import shingle_sets
from kmeans_mapreduce_spark.barrier import narrow_barrier

BENCH_MOD = 97  # doc_id % BENCH_MOD == 0 -> benchmark split
CONTAM_THRESHOLD = 0.05  # flagged when >= 5% of shingles are eval shingles


def shingle_fingerprints(docs: DataFrame) -> DataFrame:
    """(doc_id, n_shingles, fp) — one row per distinct shingle per doc,
    fingerprinted to a 60-bit long.

    Uses the Arrow-batched set builder (2-5x the interpreted-HOF form;
    Python ``split(" ")`` ≡ ``F.split``, parity-tested in dedup), then
    materializes ONCE behind a localCheckpoint barrier: the benchmark
    and corpus branches are two consumers of this relation and would
    otherwise each re-run the shingling over the full corpus (the
    multi-consumer lineage re-execution pitfall; on a cluster, persist
    or write the fingerprint table instead)."""
    s = shingle_sets(docs.select("doc_id", "text"))
    fp = s.select(
        "doc_id",
        F.size("s").alias("n_shingles"),
        F.explode("s").alias("tok"),
    ).select("doc_id", "n_shingles", h64(F.col("tok")).alias("fp"))
    return fp.transform(narrow_barrier)


def decontaminate(
    docs: DataFrame,
    bench_mod: int = BENCH_MOD,
    threshold: float = CONTAM_THRESHOLD,
    digits: int = 6,
) -> DataFrame:
    """Contaminated corpus docs: (doc_id, n_shingles, n_overlap,
    overlap_ratio) for every non-benchmark doc whose rounded ratio of
    benchmark-shared shingles is >= ``threshold``."""
    sh = shingle_fingerprints(docs)
    bench_fp = (
        sh.filter(F.col("doc_id") % bench_mod == 0).select("fp").distinct()
    )
    corpus = sh.filter(F.col("doc_id") % bench_mod != 0)
    hits = corpus.join(F.broadcast(bench_fp), "fp", "left_semi")
    return (
        hits.groupBy("doc_id", "n_shingles")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
        .select(
            "doc_id",
            F.col("n_shingles").cast("long").alias("n_shingles"),
            "n_overlap",
            F.round(
                F.col("n_overlap").cast("double")
                / F.col("n_shingles").cast("double"),
                digits,
            ).alias("overlap_ratio"),
        )
        .filter(F.col("overlap_ratio") >= threshold)
    )
