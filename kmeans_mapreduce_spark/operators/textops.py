"""Text-analysis operators over the documents table (north-star).

The reference has zero string processing (SURVEY §2.2: only float
parse/format); these are the training-data-pipeline extensions mandated
by BASELINE.json. All hot-path expressions are Catalyst built-ins
(split/filter/aggregate/transform) inside whole-stage codegen — at
100 TB these run as pure narrow map stages over parquet scans with
column pruning down to (doc_id, text).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kmeans_mapreduce_spark.functions.hashing import h64
from kmeans_mapreduce_spark.functions.text import (
    LANG_MARKERS,
    avg_token_len,
    n_tokens,
    stopword_ratio,
    tokens,
    type_token_ratio,
)


def token_stats(docs: DataFrame) -> DataFrame:
    """Token counting: whitespace tokens + char length per document."""
    return docs.select(
        "doc_id",
        n_tokens(F.col("text")).cast("long").alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars"),
    )


def quality(docs: DataFrame, digits: int = 6) -> DataFrame:
    """Quality scoring: length/stopword/diversity heuristics.

    score = 0.4·min(n_tokens/100, 1) + 0.3·stopword_ratio
          + 0.3·type_token_ratio — a deterministic, oracle-checkable
    stand-in for classifier-based quality filters.
    """
    toks = tokens(F.col("text"))
    nt = F.size(toks).cast("double")
    sw = stopword_ratio(toks)
    ttr = type_token_ratio(toks)
    score = (
        F.lit(0.4) * F.least(nt / F.lit(100.0), F.lit(1.0))
        + F.lit(0.3) * sw
        + F.lit(0.3) * ttr
    )
    return docs.select(
        "doc_id",
        nt.cast("long").alias("n_tokens"),
        F.round(avg_token_len(toks), digits).alias("avg_token_len"),
        F.round(sw, digits).alias("stopword_ratio"),
        F.round(ttr, digits).alias("type_token_ratio"),
        F.round(score, digits).alias("quality_score"),
    )


def _lang_hits(toks: Column, lang: str) -> Column:
    markers = LANG_MARKERS[lang]
    return F.size(F.filter(toks, lambda t: t.isin(markers)))


def langid(docs: DataFrame) -> DataFrame:
    """Language-ID heuristic: argmax of per-language marker-word hits.

    Ties break to the first language in sorted order (deterministic, so
    the DuckDB oracle can replay it with a CASE chain).
    """
    # stage the token array through a projection: 5 language filters
    # share ONE materialized split instead of re-evaluating it (HOFs
    # are interpreted; see functions/text.shingles PERF note)
    toks = F.col("__toks")
    langs = sorted(LANG_MARKERS)
    cands = [
        F.struct(
            _lang_hits(toks, lang).alias("hits"),
            F.lit(-i).alias("neg_rank"),
            F.lit(lang).alias("lang"),
        )
        for i, lang in enumerate(langs)
    ]
    best = F.array_max(F.array(*cands))
    return docs.withColumn("__toks", tokens(F.lower(F.col("text")))).select(
        "doc_id",
        best["lang"].alias("pred_lang"),
        best["hits"].cast("long").alias("marker_hits"),
    )


def fingerprint(docs: DataFrame) -> DataFrame:
    """Document fingerprinting: 60-bit content hash of normalized text
    (md5-based so the oracle reproduces it bit-for-bit)."""
    return docs.select(
        "doc_id",
        h64(F.lower(F.trim(F.col("text")))).alias("fingerprint"),
    )


def tfidf_top_terms(docs: DataFrame, k: int = 3, digits: int = 6) -> DataFrame:
    """TF-IDF: top-k terms per document.

    tf = term count within the doc; idf = ln(N / df) with N = corpus
    size and df = distinct-document frequency. Scale shape: one
    explode, a (doc, term) partial-aggregated count, a term-keyed df
    aggregate joined back (term dictionary ≪ corpus, broadcastable at
    real scale), window top-k over |doc × distinct-term| rows. Rounded
    before ranking; ties break lexicographically by term.

    N rides in the SAME plan as a cross-joined broadcast 1-row count
    aggregate (count(1) over a zero-column scan) — no driver-side
    ``docs.count()`` pre-job, so the whole query is one Spark job and
    at 100 TB there is no extra full pass just to fetch an integer.
    """
    from pyspark.sql import Window

    n_docs = docs.select(
        F.count(F.lit(1)).cast("double").alias("__n_docs")
    )
    tok = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("term")
    )
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tok.groupBy("term").agg(
        F.countDistinct("doc_id").cast("double").alias("df")
    )
    scored = (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            F.round(
                F.col("tf") * F.log(F.col("__n_docs") / F.col("df")), digits
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", "term", F.col("rank").cast("int").alias("rank"), "tfidf")
    )
