"""Training-data selection operators (north-star): rule-based quality
filtering (Gopher/C4-style) and DSIR importance weighting.

Both are single-scan, shuffle-light shapes:

- **rule filter**: every rule is a row-local Catalyst expression over
  ONE materialized token array — a narrow map, zero shuffle, trivially
  100 TB-safe (the reference pattern for C4's heuristics and Gopher's
  "quality signals", Rae et al. 2021 §A1.1).
- **DSIR** (Xie et al., 2023, arXiv:2302.03169): importance weights
  from hashed-unigram bag-of-words models of a target (high-quality)
  vs raw distribution. One token explode feeds both bucket-count
  aggregates (map-side combined, shuffle ≤ #buckets rows); the scored
  bucket table is tiny (≤ n_buckets rows) and broadcasts back onto the
  same explode — the corpus itself is never shuffled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kmeans_mapreduce_spark.functions.hashing import h64
from kmeans_mapreduce_spark.functions.text import STOPWORDS, tokens
from kmeans_mapreduce_spark.barrier import narrow_barrier

# Gopher-style rule bounds (Rae et al. 2021, adapted to this corpus's
# 10-99-token documents; word-count max kept at the paper's scale so
# the rule is real even though no synthetic doc trips it).
RULE_MIN_WORDS = 30
RULE_MAX_WORDS = 100_000
RULE_MWL_LO = 3.0  # mean word length bounds
RULE_MWL_HI = 10.0
RULE_MIN_STOPWORD_HITS = 2
RULE_MAX_SYMBOL_RATIO = 0.1  # tokens containing non-alphanumerics
RULE_MIN_TTR = 0.35  # type-token ratio (repetition guard)

ALNUM_RE = "^[A-Za-z0-9]+$"  # Java∩RE2-safe (anchored, no classes)

# DSIR parameters: hashed feature space size and the quality-score
# cutoff defining the target distribution (≈ top quartile of this
# corpus per the calibration in extensions.py).
DSIR_BUCKETS = 4096
DSIR_QUALITY_TAU = 0.42


def rule_filter_report(docs: DataFrame) -> DataFrame:
    """Per-document Gopher/C4-style rule verdicts: one boolean per rule
    plus the conjunction. All comparisons are exact-integer or
    single-IEEE-division arithmetic, so the DuckDB twin is bit-exact
    (no float rounding needed anywhere).
    """
    toks = F.col("__toks")
    n = F.size(toks).cast("long")
    mwl = (
        F.aggregate(
            F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda a, b: a + b
        ).cast("double")
        / n
    )
    sw_hits = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS))).cast("long")
    sym = F.size(F.filter(toks, lambda t: ~t.rlike(ALNUM_RE))).cast("double") / n
    ttr = F.size(F.array_distinct(toks)).cast("double") / n
    return docs.withColumn("__toks", tokens(F.col("text"))).select(
        "doc_id",
        n.alias("n_words"),
        ((n >= RULE_MIN_WORDS) & (n <= RULE_MAX_WORDS)).alias("pass_words"),
        ((mwl >= RULE_MWL_LO) & (mwl <= RULE_MWL_HI)).alias("pass_word_len"),
        (sw_hits >= RULE_MIN_STOPWORD_HITS).alias("pass_stopwords"),
        (sym <= RULE_MAX_SYMBOL_RATIO).alias("pass_symbols"),
        (ttr >= RULE_MIN_TTR).alias("pass_ttr"),
        (
            (n >= RULE_MIN_WORDS)
            & (n <= RULE_MAX_WORDS)
            & (mwl >= RULE_MWL_LO)
            & (mwl <= RULE_MWL_HI)
            & (sw_hits >= RULE_MIN_STOPWORD_HITS)
            & (sym <= RULE_MAX_SYMBOL_RATIO)
            & (ttr >= RULE_MIN_TTR)
        ).alias("pass_all"),
    )


def dsir_logweights(
    docs: DataFrame,
    quality_tau: float = DSIR_QUALITY_TAU,
    buckets: int = DSIR_BUCKETS,
    digits: int = 4,
) -> DataFrame:
    """DSIR importance log-weights: per document,
    ``Σ_tokens [log2 p_target(b) − log2 p_raw(b)]`` over hashed unigram
    buckets ``b = h64(token) mod buckets``, with add-one smoothing
    (``p(b) = (count_b + 1) / (total + buckets)``). The target
    distribution is the quality-filtered subset (engine's own
    ``quality_score ≥ quality_tau``); raw is the whole corpus.
    Documents resembling the target get positive weights — sampling
    ∝ exp(weight) is the paper's selection step.

    Float discipline mirrors ``lm_surprisal``: probabilities are exact
    IEEE divisions of integer counts, log2 on both engines, only the
    final per-doc sum rounded (to 4 digits; summands are O(10) with
    O(1e-13) cross-engine noise).
    """
    from kmeans_mapreduce_spark.operators.textops import quality

    feat = (
        docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
        .select("doc_id", F.pmod(h64(F.col("term")), F.lit(buckets)).alias("b"))
        .transform(narrow_barrier)
    )
    target_ids = (
        quality(docs)
        .filter(F.col("quality_score") >= quality_tau)
        .select("doc_id")
    )
    raw_counts = feat.groupBy("b").agg(F.count(F.lit(1)).alias("cr"))
    tgt_counts = (
        feat.join(F.broadcast(target_ids), "doc_id")
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("ct"))
    )
    # coalesce: an empty target set must yield 0, not NULL (the twin's
    # COALESCE(SUM(ct), 0) — NULL would poison every weight)
    totals = raw_counts.agg(
        F.coalesce(F.sum("cr"), F.lit(0)).alias("r_total"),
    ).crossJoin(
        tgt_counts.agg(F.coalesce(F.sum("ct"), F.lit(0)).alias("t_total"))
    )
    scores = (
        raw_counts.join(F.broadcast(tgt_counts), "b", "left")
        .na.fill({"ct": 0})
        .crossJoin(F.broadcast(totals))
        .select(
            "b",
            (
                F.log2(
                    (F.col("ct") + 1).cast("double")
                    / (F.col("t_total") + buckets).cast("double")
                )
                - F.log2(
                    (F.col("cr") + 1).cast("double")
                    / (F.col("r_total") + buckets).cast("double")
                )
            ).alias("s"),
        )
    )
    return (
        feat.join(F.broadcast(scores), "b")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.sum("s"), digits).alias("dsir_logw"),
        )
    )
