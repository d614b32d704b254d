"""Text-analysis column expressions (north-star extension).

All JVM-side Catalyst expressions (split/transform/aggregate) — no
Python UDFs on the hot path. Each has an SQL twin in
``kmeans_mapreduce_spark.extensions`` for the DuckDB oracle; keep them
in lockstep.

Tokenization contract: documents in this corpus are single-space
separated (verified: no doubled/leading/trailing whitespace), so
``split(text, ' ')`` is exact and cheap; a regex tokenizer would also
work but costs more and is harder to mirror exactly in two engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Marker stopwords per language for the n-gram/stopword language-ID
# heuristic. The corpus vocabulary is synthetic English-ish tokens; the
# heuristic is the operator under test, not a linguistics claim.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "and", "of"],
    "de": ["der", "die", "das", "und"],
    "es": ["el", "la", "los", "de"],
    "fr": ["le", "la", "les", "et"],
    "zh": ["de", "le", "he", "shi"],
}

STOPWORDS = ["the", "a", "and", "of", "to", "in", "is", "it"]


def tokens(text: Column) -> Column:
    return F.split(text, " ")


def n_tokens(text: Column) -> Column:
    return F.size(tokens(text))


def shingles(toks: Column, n: int = 3) -> Column:
    """Word n-grams as strings: concat of n consecutive tokens.

    Empty array when the doc has < n tokens (slice length 0).

    PERF: ``toks`` should be a materialized column (an attribute from a
    prior projection), not an inline expression — higher-order
    functions are interpreted, and an expression embedded in the lambda
    is re-evaluated on every element access (measured 8× slower with an
    inline ``split``). The slice+transform-with-index shape keeps every
    element access O(1) on the attribute.
    """
    count = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    base = F.slice(toks, 1, count)
    return F.transform(
        base,
        lambda t, i: F.concat_ws(
            " ", t, *[F.element_at(toks, i + j + 1) for j in range(1, n)]
        ),
    )


def stopword_ratio(toks: Column) -> Column:
    hits = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS)))
    return hits / F.size(toks)


def type_token_ratio(toks: Column) -> Column:
    return F.size(F.array_distinct(toks)) / F.size(toks)


def avg_token_len(toks: Column) -> Column:
    total = F.aggregate(
        F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda a, b: a + b
    )
    return total / F.size(toks)


def ieee_round_pos(col: Column, digits: int = 6) -> Column:
    """HALF-UP rounding of a NON-NEGATIVE double as the literal IEEE
    expression floor(x·10^d + 0.5)/10^d — the same float ops DuckDB
    runs, so the two engines agree even within one ulp of a rounding
    boundary. Spark's ``F.round`` converts the double to exact decimal
    first (BigDecimal HALF_UP) while DuckDB's ``ROUND`` uses float
    arithmetic; on a boundary-straddling value like
    0.42943749999999997 they disagree (measured: one sf0.1 doc flipped
    the quality gate). Only valid for x ≥ 0 — floor(x+0.5) is
    round-half-toward-+inf, which differs from HALF_UP for negatives."""
    scale = float(10**digits)
    return F.floor(col * F.lit(scale) + F.lit(0.5)) / F.lit(scale)


def ieee_round_signed(col: Column, digits: int = 6) -> Column:
    """The same pinned floor(x·10^d + 0.5)/10^d expression as
    :func:`ieee_round_pos`, used on SIGNED values (cosine scores, LR
    weights): half-toward-+inf for negatives BY PINNED DEFINITION —
    fine because the DuckDB twin runs the identical expression
    (extensions._ieee_round_signed_sql), so neither engine is trying
    to emulate decimal HALF_UP."""
    scale = float(10**digits)
    return F.floor(col * F.lit(scale) + F.lit(0.5)) / F.lit(scale)


def quality_score_expr(toks: Column) -> Column:
    """The engine's quality-score formula — ONE definition shared by
    ``textops.quality`` and ``logreg.featurized`` (whose labels distill
    this score); the DuckDB twin lives in ``extensions._quality_sql``.
    Changing the formula means changing all three in lockstep."""
    nt = F.size(toks).cast("double")
    return (
        F.lit(0.4) * F.least(nt / F.lit(100.0), F.lit(1.0))
        + F.lit(0.3) * stopword_ratio(toks)
        + F.lit(0.3) * type_token_ratio(toks)
    )
