"""Text-analysis operators over the documents table (north-star).

The reference has zero string processing (SURVEY §2.2: only float
parse/format); these are the training-data-pipeline extensions mandated
by BASELINE.json. All hot-path expressions are Catalyst built-ins
(split/filter/aggregate/transform) inside whole-stage codegen — at
100 TB these run as pure narrow map stages over parquet scans with
column pruning down to (doc_id, text).
"""

from __future__ import annotations

import itertools

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kmeans_mapreduce_spark.functions.hashing import h64
from kmeans_mapreduce_spark.functions.text import (
    LANG_MARKERS,
    avg_token_len,
    ieee_round_pos,
    n_tokens,
    quality_score_expr,
    stopword_ratio,
    tokens,
    type_token_ratio,
)
from kmeans_mapreduce_spark.barrier import narrow_barrier


def token_stats(docs: DataFrame) -> DataFrame:
    """Token counting: whitespace tokens + char length per document."""
    return docs.select(
        "doc_id",
        n_tokens(F.col("text")).cast("long").alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars"),
    )


# GPT-2-style pre-tokenizer split, restricted to the Java∩RE2 regex
# subset (no lookahead, no \p{} classes, and NO \s shorthand — Java's
# \s includes vertical tab \x0B while RE2's does not, so the
# whitespace class is spelled out explicitly to keep both engines
# bit-identical): contraction suffixes, optional-space letter runs,
# optional-space digit runs, optional-space punctuation runs, then
# whitespace runs. Both engines match alternations leftmost-first, so
# branch order is semantic and must stay identical on both sides.
_WS = " \\t\\n\\f\\r"
BPE_SPLIT_RE = (
    r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+"
    rf"| ?[^A-Za-z0-9{_WS}]+|[{_WS}]+"
)


def token_stats_bpe(docs: DataFrame, digits: int = 6) -> DataFrame:
    """BPE-ish token counting: subword pre-token count per document
    via the GPT-2 pre-tokenizer regex (the budget a real BPE tokenizer
    would start from — whitespace counts undercount code/CJK/punct-
    heavy text badly). ``chars_per_token`` is the compression-ratio
    proxy quality filters threshold on. Pure Catalyst ``regexp_count``
    — narrow map, no Python, no shuffle."""
    n = F.regexp_count(F.col("text"), F.lit(BPE_SPLIT_RE)).cast("long")
    return docs.select(
        "doc_id",
        n.alias("n_bpe_tokens"),
        F.round(
            F.length("text").cast("double")
            / F.greatest(n, F.lit(1)).cast("double"),
            digits,
        ).alias("chars_per_token"),
    )


def quality(docs: DataFrame, digits: int = 6) -> DataFrame:
    """Quality scoring: length/stopword/diversity heuristics.

    score = 0.4·min(n_tokens/100, 1) + 0.3·stopword_ratio
          + 0.3·type_token_ratio — a deterministic, oracle-checkable
    stand-in for classifier-based quality filters.
    """
    # stage the token array once: five output expressions consume it,
    # and inlining split(text) into each would re-run it per column
    # under interpreted HOFs (same staging as langid's __toks)
    # ieee_round_pos, not F.round: the ratios are non-negative and the
    # quality gate (>= tau comparisons downstream) must not flip on
    # values within one ulp of a rounding boundary — F.round's exact-
    # decimal HALF_UP and DuckDB's float ROUND disagree there (measured
    # at sf0.1, doc 1432: 0.42943749999999997 → 0.429437 vs 0.429438)
    staged = docs.select("doc_id", tokens(F.col("text")).alias("__toks"))
    toks = F.col("__toks")
    nt = F.size(toks).cast("double")
    sw = stopword_ratio(toks)
    ttr = type_token_ratio(toks)
    score = quality_score_expr(toks)
    return staged.select(
        "doc_id",
        nt.cast("long").alias("n_tokens"),
        ieee_round_pos(avg_token_len(toks), digits).alias("avg_token_len"),
        ieee_round_pos(sw, digits).alias("stopword_ratio"),
        ieee_round_pos(ttr, digits).alias("type_token_ratio"),
        ieee_round_pos(score, digits).alias("quality_score"),
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


def repetition_signals(docs: DataFrame, digits: int = 6) -> DataFrame:
    """Gopher-style repetition quality signals per document (Rae et al.
    2021 §A1.1 use duplicate-n-gram fractions to drop boilerplate):

    - ``distinct_ratio``    distinct unigrams / total unigrams
    - ``top_unigram_frac``  most frequent unigram's share of tokens
    - ``dup_bigram_frac``   share of bigram occurrences that are repeats
                            (1 − distinct bigrams / total bigrams)

    Scale shape: unigrams and bigrams are concatenated into ONE tagged
    array per row (single documents scan, narrow), exploded once, then
    a (doc, g, gram) partial-aggregated count feeds a per-doc rollup —
    the only shuffles carry token-count rows with map-side combine.

    Contract: documents with NULL text produce NO output row (the
    explode of a NULL array eliminates them) — join the result back
    with left semantics if unmeasurable docs must be retained.
    """
    w = F.col("__w")
    bigrams = F.when(
        F.size(w) >= 2,
        F.expr(
            "transform(sequence(1, size(__w) - 1),"
            " i -> concat(element_at(__w, i), ' ', element_at(__w, i + 1)))"
        ),
    ).otherwise(F.array().cast("array<string>"))
    tagged = F.concat(
        F.transform(w, lambda x: F.struct(F.lit(1).alias("g"), x.alias("gram"))),
        F.transform(
            F.col("__bg"),
            lambda x: F.struct(F.lit(2).alias("g"), x.alias("gram")),
        ),
    )
    tok = (
        docs.withColumn("__w", tokens(F.col("text")))
        .withColumn("__bg", bigrams)
        .select("doc_id", F.explode(tagged).alias("p"))
        .select("doc_id", F.col("p.g").alias("g"), F.col("p.gram").alias("gram"))
    )
    c = tok.groupBy("doc_id", "g", "gram").agg(F.count(F.lit(1)).alias("cnt"))
    s = c.groupBy("doc_id", "g").agg(
        F.sum("cnt").alias("total"),
        F.count(F.lit(1)).alias("nd"),
        F.max("cnt").alias("top"),
    )
    uni = lambda col: F.max(F.when(F.col("g") == 1, F.col(col)))  # noqa: E731
    bi = lambda col: F.max(F.when(F.col("g") == 2, F.col(col)))  # noqa: E731
    return s.groupBy("doc_id").agg(
        uni("total").cast("long").alias("n_tokens"),
        F.round(uni("nd").cast("double") / uni("total").cast("double"), digits)
        .alias("distinct_ratio"),
        F.round(uni("top").cast("double") / uni("total").cast("double"), digits)
        .alias("top_unigram_frac"),
        F.round(
            F.coalesce(
                (bi("total") - bi("nd")).cast("double")
                / bi("total").cast("double"),
                F.lit(0.0),
            ),
            digits,
        ).alias("dup_bigram_frac"),
    )


# PII patterns — deliberately inside the Java-regex ∩ RE2 common subset
# (no backreferences or lookaround) so Spark and the DuckDB oracle
# replace the exact same spans.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PII_PHONE = r"\b555-[0-9]{4}\b"


def redact_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """PII scrubbing for training corpora: replace emails, IPv4s, and
    phone-shaped tokens with typed placeholders and count the hits.

    Pure Catalyst ``regexp_replace``/``regexp_count`` — a narrow map
    stage inside the scan's codegen at 100 TB, no shuffle at all.
    Replacement order matters (emails before IPs before phones) and is
    mirrored in the oracle.
    """
    t = F.col(text_col)
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, F.lit(PII_EMAIL), F.lit("<EMAIL>")),
            F.lit(PII_IPV4),
            F.lit("<IP>"),
        ),
        F.lit(PII_PHONE),
        F.lit("<PHONE>"),
    )
    return docs.select(
        "doc_id",
        redacted.alias("redacted"),
        F.regexp_count(t, F.lit(PII_EMAIL)).cast("long").alias("n_emails"),
        F.regexp_count(t, F.lit(PII_IPV4)).cast("long").alias("n_ips"),
        F.regexp_count(t, F.lit(PII_PHONE)).cast("long").alias("n_phones"),
    )


def corpus_profile(docs: DataFrame, digits: int = 6) -> DataFrame:
    """Dataset-card profile: the one-row summary a training-data
    pipeline publishes per snapshot — corpus size, language spread,
    token/char volume, and exact-duplication rate.

    Scale shape: two independent aggregates over one scan each — a
    global agg (partial+final, constant shuffle) and an exact-dup
    count whose shuffle is keyed by text fingerprint (map-side
    combined; carries one long per distinct text) — cross-joined as
    1×1 rows. Nothing is collected beyond the single output row.

    Output: (n_docs, n_langs, total_chars, avg_chars, total_tokens,
    dup_docs, dup_frac).
    """
    from kmeans_mapreduce_spark.functions.text import n_tokens

    base = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("lang").alias("n_langs"),
        F.sum("n_chars").alias("total_chars"),
        F.round(F.avg("n_chars"), 2).alias("avg_chars"),
        F.sum(n_tokens(F.col("text")).cast("long")).alias("total_tokens"),
    )
    dups = (
        docs.groupBy(F.md5("text").alias("fp"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .agg(
            F.sum(
                F.when(F.col("cnt") > 1, F.col("cnt")).otherwise(F.lit(0))
            ).alias("dup_docs")
        )
    )
    return (
        base.crossJoin(dups)
        .withColumn(
            "dup_frac",
            F.round(
                F.col("dup_docs").cast("double")
                / F.col("n_docs").cast("double"),
                digits,
            ),
        )
    )


# ---------------------------------------------------------------------------
# Context-window chunking — the UDTF surface (1 row -> N chunk rows)
# ---------------------------------------------------------------------------

CHUNK_TOKENS = 64


def make_chunk_udtf(chunk_tokens: int = CHUNK_TOKENS):
    """Python UDTF (Spark 4 table function) splitting a document into
    fixed token-budget context windows: one input row fans out to
    ``ceil(n_tokens / chunk_tokens)`` rows of
    ``(chunk_idx, n_tokens, fp)`` where ``fp`` is the md5 of the
    space-rejoined chunk (portable — DuckDB computes the same string).

    This is the missing third extension-API surface (UDF -> pandas_udf,
    UDAF -> grouped-agg pandas_udf, UDTF -> here). A Python UDTF runs
    row-at-a-time, so it is the API demo for logic Catalyst can't
    express (a real BPE tokenizer would go here); for plain
    token-window chunking the vectorized built-in twin below
    (:func:`chunk_docs_vectorized`) is the 100 TB hot path — a
    narrow explode with zero Python. Both produce identical rows
    (tested) and the DuckDB oracle replays the math independently.
    """
    import hashlib
    import re

    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx int, n_tokens long, fp string")
    class ChunkDoc:
        def eval(self, text: str):
            # explicit class: Python ASCII \s and Java \s include
            # \x0B while DuckDB's RE2 \s does not — spell it out so
            # all three engines split identically
            toks = [t for t in re.split(r"[ \t\n\f\r]+", text or "") if t]
            for i in range(0, len(toks), chunk_tokens):
                chunk = toks[i : i + chunk_tokens]
                yield (
                    i // chunk_tokens,
                    len(chunk),
                    hashlib.md5(" ".join(chunk).encode()).hexdigest(),
                )

    return ChunkDoc


_CHUNK_CALL_SEQ = itertools.count()


def chunk_docs_udtf(docs: DataFrame, chunk_tokens: int = CHUNK_TOKENS) -> DataFrame:
    """Apply the chunking UDTF laterally: (doc_id, chunk_idx, n_tokens,
    fp), one row per context window.

    View + function names are derived from a per-call counter: lazy
    evaluation means a caller's action can run AFTER a second call, so
    a fixed view name would silently rebind the first plan's input to
    the second caller's docs. The per-call registrations are
    deliberately NOT cleaned up — a previous call's still-lazy result
    may reference its view at any later action, and the leak is one
    catalog entry per call (bounded by call count, trivial next to the
    session's plan cache)."""
    spark = docs.sparkSession
    seq = next(_CHUNK_CALL_SEQ)
    fn, view = f"chunk_doc_{seq}", f"_chunk_docs_in_{seq}"
    spark.udtf.register(fn, make_chunk_udtf(chunk_tokens))
    docs.select("doc_id", "text").createOrReplaceTempView(view)
    return spark.sql(
        f"SELECT d.doc_id, c.chunk_idx, c.n_tokens, c.fp "
        f"FROM {view} d, LATERAL {fn}(d.text) c"
    )


def chunk_docs_vectorized(
    docs: DataFrame, chunk_tokens: int = CHUNK_TOKENS
) -> DataFrame:
    """Catalyst twin of the chunking UDTF: split -> one explode over
    the chunk indices -> slice + array_join + md5, all JVM-side inside
    whole-stage codegen. Scale shape: narrow map with a 1->ceil(n/C)
    fan-out, no shuffle, column pruning to (doc_id, text)."""
    # explicit class, not \s: Java's \s includes \x0B, RE2's (the
    # DuckDB oracle) does not — same discipline as BPE_SPLIT_RE
    toks = F.filter(F.split(F.col("text"), rf"[{_WS}]+"), lambda x: x != "")
    C = chunk_tokens
    return (
        docs.select("doc_id", toks.alias("toks"))
        .select(
            "doc_id",
            "toks",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(
                        F.ceil(F.size("toks") / F.lit(C)).cast("int") - 1, F.lit(0)
                    ),
                )
            ).alias("chunk_idx"),
        )
        .select(
            "doc_id",
            "chunk_idx",
            F.slice(F.col("toks"), F.col("chunk_idx") * C + 1, C).alias("chunk"),
        )
        .filter(F.size("chunk") > 0)
        .select(
            "doc_id",
            "chunk_idx",
            F.size("chunk").cast("long").alias("n_tokens"),
            F.md5(F.array_join("chunk", " ")).alias("fp"),
        )
    )


def lm_surprisal(docs: DataFrame, digits: int = 4) -> DataFrame:
    """CCNet-style unigram-LM quality score: average surprisal
    −log2 p(token) in bits/token per document, where p is the corpus
    unigram MLE (every scored token has corpus count ≥ 1, so no
    smoothing is needed when scoring the training corpus itself).
    Gibberish and boilerplate score high; plain prose scores near the
    corpus entropy — the classic language-model filtering signal
    (Wenzek et al., CCNet, LREC 2020) with the simplest possible LM.

    Scale shape: ONE token explode materialized once (localCheckpoint)
    feeds both the vocabulary count and the scoring join; the vocab
    aggregate is map-side combined (shuffle ≤ |vocab| rows); the corpus
    total rides a broadcast 1-row cross join (no driver pre-job, same
    trick as tfidf); the per-token probability join broadcasts the
    (small) vocab — at web scale with a huge vocab it becomes a
    shuffle join keyed by term, still never quadratic.
    """
    from kmeans_mapreduce_spark.functions.text import tokens

    toks = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("term")
    ).transform(narrow_barrier)
    tf = toks.groupBy("term").agg(F.count(F.lit(1)).alias("c"))
    total = tf.agg(F.sum("c").alias("n"))
    probs = tf.crossJoin(F.broadcast(total)).select(
        "term", (F.col("c").cast("double") / F.col("n")).alias("p")
    )
    return (
        toks.join(F.broadcast(probs), "term")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.avg(-F.log2("p")), digits).alias("bits_per_token"),
        )
    )


BPE_MERGE_TOPK = 20

def _count_top_pairs(words: DataFrame, word_col: str, k: int) -> DataFrame:
    """Partial per-partition pair counts → tiny merge → deterministic
    top-k — the shared tail of both BPE rounds.

    Round 7 shipped this as explode(substr pairs) → groupBy: the shuffle
    was bounded by |alphabet|² but the plan materialized one row per
    character of the corpus, and each ``substr(i, 2)`` re-seeks the
    string from the start — O(len²) per word on the JVM's UTF-aware
    path. Measured 6.4 s at sf0.1 (the slowest query in the suite, a
    ~30× regression vs the round-6 form). Now one Arrow pass per
    partition counts pairs vectorized (numpy over UTF-32 code units:
    join words with NUL, fold adjacent code-point pairs into uint64
    keys, ``np.unique``) and emits ≤ |alphabet|² partial rows; the
    groupBy merge and TakeOrderedAndProject shapes are unchanged —
    the same partial-agg contract as ``lloyd_step_arrow``. Pair
    identity is by code POINT, which is also how the DuckDB twin
    counts; the corpus is BMP-only so the former UTF-16 substr agreed.

    Word boundaries are masked by POSITION (cumulative word lengths),
    not by a sentinel value, so a word that itself contains ``'\\x00'``
    counts its NUL-adjacent pairs exactly like the per-word substr path
    did. The UTF-32 encode uses ``surrogatepass``: input arriving from
    Spark via Arrow is always valid UTF-8 (lone surrogates cannot
    occur), but a driver-built test frame could carry one, and counting
    it beats failing the whole task.
    """

    def pair_counts(batches):
        import numpy as np
        import pandas as pd

        totals: dict[int, int] = {}
        for pdf in batches:
            col = pdf[word_col].dropna()
            col = col[col.str.len() > 0]
            if not len(col):
                continue
            words = col.tolist()
            joined = "".join(words)
            if len(joined) < 2:
                continue
            a = np.frombuffer(
                joined.encode("utf-32-le", errors="surrogatepass"),
                dtype=np.uint32,
            )
            keys = (a[:-1].astype(np.uint64) << np.uint64(32)) | a[1:].astype(
                np.uint64
            )
            # drop pairs that straddle two words: positions just before
            # each word's first code point (offsets are in code POINTS,
            # == len() for str)
            ends = np.cumsum(np.fromiter(map(len, words), dtype=np.int64))
            valid = np.ones(len(a) - 1, dtype=bool)
            valid[ends[:-1] - 1] = False
            keys = keys[valid]
            uniq, counts = np.unique(keys, return_counts=True)
            for key, n in zip(uniq.tolist(), counts.tolist()):
                totals[key] = totals.get(key, 0) + n
        yield pd.DataFrame(
            {
                "pair": [chr(key >> 32) + chr(key & 0xFFFFFFFF) for key in totals],
                "n": list(totals.values()),
            }
        )

    partials = words.mapInPandas(pair_counts, "pair STRING, n BIGINT")
    return (
        partials.groupBy("pair")
        .agg(F.sum("n").alias("n"))
        .orderBy(F.desc("n"), F.asc("pair"))
        .limit(k)
    )


def bpe_merge_candidates(docs: DataFrame, k: int = BPE_MERGE_TOPK) -> DataFrame:
    """First round of BPE tokenizer training: corpus-wide counts of
    adjacent character pairs inside words, top-k by (count DESC, pair
    ASC — fully deterministic). The winning pair is the merge a BPE
    trainer would apply; iterating this op IS the training loop
    (Sennrich et al. 2016), and the first round is the expensive one —
    every later round works on the shrinking merged vocabulary.

    Scale shape: one scan → explode(words) → explode(pairs) →
    map-side-combined groupBy on a key space bounded by |alphabet|²
    (≤ a few thousand), then TakeOrderedAndProject for the top-k —
    the shuffle carries at most the distinct-pair count per partition,
    never the corpus."""
    return _count_top_pairs(
        docs.select(F.explode(tokens(F.col("text"))).alias("w")), "w", k
    )


BPE_MERGE_MARKER = "\x01"  # single-char stand-in for the merged symbol


def bpe_second_round(
    docs: DataFrame, k: int = BPE_MERGE_TOPK, marker: str = BPE_MERGE_MARKER
) -> DataFrame:
    """BPE training round 2: apply round 1's winning merge (literal
    leftmost-nonoverlapping replace — Java and DuckDB agree) as a
    single marker symbol, then recount adjacent pairs. Iterating
    exactly this shape IS the BPE trainer; pairs containing the marker
    are merges that would extend the new symbol. The winning pair is
    driver-collected (1 row — the same K-row-collect contract as the
    k-means centroid loop)."""
    winners = bpe_merge_candidates(docs, 1).collect()
    if not winners:
        raise ValueError(
            "bpe_second_round: no adjacent character pairs in the corpus "
            "(empty corpus or all tokens single-character)"
        )
    top_pair = winners[0]["pair"]
    merged = F.replace(F.col("w"), F.lit(top_pair), F.lit(marker))
    words = docs.select(F.explode(tokens(F.col("text"))).alias("w")).select(
        merged.alias("mw")
    )
    return _count_top_pairs(words, "mw", k)


BPE_SEGMENT_MERGES = 6
BPE_MARKER_BASE = 0xE000  # private-use plane: never in corpus text,
# single BMP code point on both engines (Spark UTF-16 length == code
# points, DuckDB chr()/length() by code point)


def _weighted_top_pair(vocab: DataFrame, word_col: str, weight_col: str):
    """One weighted pair-count round over a (word, n) VOCAB table →
    the single winning (pair, count) row, or None on an empty/
    single-char vocab. The weighting is what makes training scan-once:
    counting pairs over distinct words × their corpus frequency equals
    counting over every word instance, but the input is |V| rows, not
    the corpus. Same vectorized Arrow pass as ``_count_top_pairs``
    (UTF-32 code-unit fold, position-masked word boundaries) with the
    per-pair weight gathered by ``np.repeat`` over word lengths and
    accumulated exact-integer via ``np.add.at`` — partials stay
    ≤ |alphabet|² rows per partition, the groupBy merge and the
    1-row TakeOrderedAndProject are metadata-scale."""

    def pair_counts(batches):
        import numpy as np
        import pandas as pd

        totals: dict[int, int] = {}
        for pdf in batches:
            sub = pdf[[word_col, weight_col]].dropna()
            sub = sub[sub[word_col].str.len() > 0]
            if not len(sub):
                continue
            words = sub[word_col].tolist()
            wts = sub[weight_col].to_numpy(dtype=np.int64)
            joined = "".join(words)
            if len(joined) < 2:
                continue
            a = np.frombuffer(
                joined.encode("utf-32-le", errors="surrogatepass"),
                dtype=np.uint32,
            )
            keys = (a[:-1].astype(np.uint64) << np.uint64(32)) | a[1:].astype(
                np.uint64
            )
            lens = np.fromiter(map(len, words), dtype=np.int64)
            ends = np.cumsum(lens)
            valid = np.ones(len(a) - 1, dtype=bool)
            valid[ends[:-1] - 1] = False
            # pair at position i carries the weight of the word that
            # contains code points (i, i+1)
            pair_w = np.repeat(wts, lens)[:-1][valid]
            keys = keys[valid]
            uniq, inverse = np.unique(keys, return_inverse=True)
            sums = np.zeros(len(uniq), dtype=np.int64)
            np.add.at(sums, inverse, pair_w)
            for key, n in zip(uniq.tolist(), sums.tolist()):
                totals[key] = totals.get(key, 0) + n
        yield pd.DataFrame(
            {
                "pair": [chr(key >> 32) + chr(key & 0xFFFFFFFF) for key in totals],
                "n": list(totals.values()),
            }
        )

    partials = vocab.mapInPandas(pair_counts, "pair STRING, n BIGINT")
    rows = (
        partials.groupBy("pair")
        .agg(F.sum("n").alias("n"))
        .orderBy(F.desc("n"), F.asc("pair"))
        .limit(1)
        .collect()
    )
    return rows[0] if rows else None


BPE_DRIVER_VOCAB_MAX = 100_000  # ≤ this many distinct words → run the
# merge rounds in-process on the collected (word, n) table instead of
# launching a Spark job per round (same threshold-guarded fast-path
# pattern as dedup.connected_components' small-graph union-find); the
# distributed loop remains the 100 TB path and a test pins the two
# paths byte-identical


def _driver_merge_loop(
    vocab_rows: list[tuple[str, int]], n_merges: int
) -> list[tuple[str, str]]:
    """The merge loop on a driver-held vocab — EXACTLY the distributed
    rounds' semantics (instance-weighted pair counts, (count DESC,
    pair ASC) tie-break, leftmost-nonoverlapping str.replace — Python
    and Java replace agree) with zero job-scheduling overhead."""
    from collections import Counter

    vocab = Counter()
    for w, n in vocab_rows:
        vocab[w] += n
    merges: list[tuple[str, str]] = []
    for i in range(n_merges):
        pairs: Counter = Counter()
        for w, n in vocab.items():
            for j in range(len(w) - 1):
                pairs[w[j : j + 2]] += n
        if not pairs:
            break
        pair = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        marker = chr(BPE_MARKER_BASE + i)
        merges.append((pair, marker))
        nv: Counter = Counter()
        for w, n in vocab.items():
            nv[w.replace(pair, marker)] += n
        vocab = nv
    return merges


def bpe_train_merges(
    docs: DataFrame,
    n_merges: int = BPE_SEGMENT_MERGES,
    driver_vocab_max: int = BPE_DRIVER_VOCAB_MAX,
) -> list[tuple[str, str]]:
    """FULL BPE training loop (Sennrich et al. 2016): learn an ordered
    merge list of ``n_merges`` (pair → marker) rules. The corpus is
    scanned ONCE into the distinct-word vocab (word, count) — the
    shuffle is bounded by |V|, never corpus rows — then the merge
    rounds run on the metadata-scale vocab. Small vocabs
    (≤ ``driver_vocab_max``) take the threshold-guarded driver path
    (one |V|-row collect, in-process rounds — job overhead would
    dominate otherwise); larger vocabs run each round distributed:
    weighted pair count → 1-row collect (the K-row-collect contract
    of the k-means loop) → literal leftmost-nonoverlapping replace of
    the winner with the round's private-use marker chr(0xE000+i).
    Later rounds merge marker-adjacent pairs, exactly how real BPE
    grows multi-char symbols; both paths are pinned byte-identical by
    tests. At 100 TB the round cost is |V| rows per round; only the
    vocab build touches the corpus."""
    words = docs.select(F.explode(tokens(F.col("text"))).alias("w"))
    vocab = words.groupBy("w").agg(F.count(F.lit(1)).alias("n")).cache()
    try:
        if vocab.count() <= driver_vocab_max:
            return _driver_merge_loop(
                [(r["w"], r["n"]) for r in vocab.collect()], n_merges
            )
        merges: list[tuple[str, str]] = []
        cur = vocab
        for i in range(n_merges):
            top = _weighted_top_pair(cur, "w", "n")
            if top is None:
                break
            marker = chr(BPE_MARKER_BASE + i)
            merges.append((top["pair"], marker))
            cur = cur.select(
                F.replace(F.col("w"), F.lit(top["pair"]), F.lit(marker)).alias(
                    "w"
                ),
                "n",
            )
        return merges
    finally:
        vocab.unpersist()


def bpe_segment_stats(
    docs: DataFrame, merges: list[tuple[str, str]]
) -> DataFrame:
    """Apply a trained merge list end-to-end — the missing half of the
    tokenizer story next to the trainer. The segmentation is an
    M-deep chain of literal replaces applied IN TRAINING ORDER
    directly to the text (pairs never contain a space, so whole-text
    replace equals per-word replace while skipping the explode), all
    native Catalyst inside one whole-stage-codegen projection: a
    zero-shuffle narrow map over the corpus, embarrassingly parallel
    at any scale. Output per doc (all exact integers, hash-gateable):
    ``n_words``, ``n_units0`` (pre-merge in-word symbols),
    ``n_units`` (post-merge symbols = real token count under the
    learned vocab), ``n_merged`` (symbols eliminated)."""
    seg = F.col("text")
    for pair, marker in merges:
        seg = F.replace(seg, F.lit(pair), F.lit(marker))
    n_words = F.size(tokens(F.col("text"))).cast("long")
    n_units0 = (F.length("text").cast("long") - (n_words - F.lit(1)))
    n_units = (F.length(seg).cast("long") - (n_words - F.lit(1)))
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        n_units0.alias("n_units0"),
        n_units.alias("n_units"),
        (n_units0 - n_units).alias("n_merged"),
    )


def compression_ratio(docs: DataFrame, digits: int = 6) -> DataFrame:
    """zlib compression ratio per document — the classic
    gibberish/boilerplate signal (low ratio = highly repetitive
    boilerplate, ratio near 1 = high-entropy noise; prose sits in
    between). Arrow-batched stdlib zlib per partition: a narrow map,
    no shuffle, trivially corpus-scale.

    Rows-only by declared contract: DuckDB has no zlib, so there is no
    SQL twin — the deterministic-bytes property is pytest-gated
    instead (fixed zlib level ⇒ byte-stable output per container).
    """
    import zlib

    import pandas as pd

    def score(batches):
        for pdf in batches:
            nb, cb = [], []
            for text in pdf["text"]:
                raw = text.encode("utf-8") if text else b""
                nb.append(len(raw))
                # NULL/empty text: 0/0 → ratio 0.0 (sibling Catalyst
                # ops propagate null; a crashed task is the one wrong
                # answer)
                cb.append(len(zlib.compress(raw, 6)) if raw else 0)
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "n_bytes": nb, "compressed_bytes": cb}
            )

    out = docs.select("doc_id", "text").mapInPandas(
        score, "doc_id LONG, n_bytes LONG, compressed_bytes LONG"
    )
    return out.select(
        "doc_id",
        "n_bytes",
        "compressed_bytes",
        F.round(
            F.col("compressed_bytes").cast("double")
            / F.greatest(F.col("n_bytes"), F.lit(1)).cast("double"),
            digits,
        ).alias("compression_ratio"),
    )


def extract_html_text(
    pages: DataFrame, payload_col: str = "payload", id_col: str = "target_uri"
) -> DataFrame:
    """Boilerplate-free text extraction from HTML payloads (the step
    between WARC ingestion and the text pipeline), stdlib-only:
    ``html.parser`` streams each document, dropping script/style/
    noscript subtrees and collapsing whitespace. Arrow-batched narrow
    map — one decode pass per page, no shuffle; at corpus scale this
    is the classic CPU-bound extract stage and parallelizes per file
    split. Output: (doc_key, text, n_chars).
    """
    from html.parser import HTMLParser

    import pandas as pd

    _SKIP = {"script", "style", "noscript", "template"}

    class _Extractor(HTMLParser):
        def __init__(self):
            super().__init__(convert_charrefs=True)
            self.parts: list[str] = []
            self._skip_stack: list[str] = []

        def handle_starttag(self, tag, attrs):
            if tag in _SKIP:
                self._skip_stack.append(tag)

        def handle_endtag(self, tag):
            if tag in self._skip_stack:
                # pop to the matching open (tolerates mis-nesting)
                while self._skip_stack.pop() != tag:
                    pass
            elif self._skip_stack and tag in ("body", "html"):
                # an UNCLOSED noscript/template can't outlive the
                # document body — clear, or all remaining text would be
                # silently dropped (common in malformed crawl HTML)
                self._skip_stack.clear()

        def handle_data(self, data):
            if not self._skip_stack and data.strip():
                self.parts.append(data.strip())

    def extract(batches):
        for pdf in batches:
            keys, texts, lens = [], [], []
            for key, blob in zip(pdf[id_col], pdf[payload_col]):
                try:
                    html = bytes(blob).decode("utf-8", errors="replace")
                except Exception:
                    html = ""
                p = _Extractor()
                try:
                    p.feed(html)
                    p.close()
                except Exception:
                    pass  # malformed markup: keep what was parsed
                text = " ".join(p.parts)
                keys.append(key)
                texts.append(text)
                lens.append(len(text))
            yield pd.DataFrame(
                {"doc_key": keys, "text": texts, "n_chars": lens}
            )

    return pages.select(id_col, payload_col).mapInPandas(
        extract, "doc_key STRING, text STRING, n_chars LONG"
    )


VOCAB_COVERAGE_VS = (1, 10, 100, 1000)  # vocabulary-size checkpoints


def vocab_coverage(
    docs: DataFrame,
    vs: tuple[int, ...] = VOCAB_COVERAGE_VS,
    digits: int = 6,
) -> DataFrame:
    """Vocabulary coverage curve: for each checkpoint V, the fraction
    of all token OCCURRENCES covered by the top-V most frequent token
    types — the first chart drawn when sizing a tokenizer vocabulary
    (how big must V be before OOV/byte-fallback rates are acceptable;
    the Zipf curve every BPE-size decision reads).

    Scale trap avoided: the naive form ranks the ENTIRE vocabulary
    through one unpartitioned window — ~1e8 types at 100 TB through a
    single reducer. Since the curve is only read at fixed checkpoints,
    this takes top-``max(vs)`` by (count DESC, token ASC) via
    TakeOrderedAndProject (per-partition heaps merged on the driver —
    same contract as text_top_quality) and ranks just that constant-
    size table; the corpus contributes one map-side-combined groupBy
    plus a 1-row total that broadcasts back.

    Output: (top_v, covered_tokens, total_tokens, coverage), one row
    per checkpoint.
    """
    from pyspark.sql.window import Window

    toks = docs.select(
        F.explode(tokens(F.coalesce(F.col("text"), F.lit("")))).alias("tok")
    )
    total = toks.agg(F.count(F.lit(1)).alias("total_tokens"))
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    top = counts.orderBy(F.desc("cnt"), F.asc("tok")).limit(max(vs))
    # window over the already-truncated max(vs)-row table only
    ranked = top.withColumn(
        "rank",
        F.row_number().over(Window.orderBy(F.desc("cnt"), F.asc("tok"))),
    )
    vs_df = ranked.sparkSession.createDataFrame(
        [(int(v),) for v in sorted(vs)], "top_v INT"
    )
    return (
        ranked.crossJoin(F.broadcast(vs_df))
        .groupBy("top_v")
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("rank") <= F.col("top_v"), F.col("cnt"))),
                F.lit(0),
            ).cast("long").alias("covered_tokens")
        )
        .crossJoin(F.broadcast(total))
        .withColumn(
            "coverage",
            F.round(
                F.col("covered_tokens").cast("double")
                / F.col("total_tokens").cast("double"),
                digits,
            ),
        )
    )


BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 10


def _eq_term(t: str):
    """One-arg HOF lambda factory — a default-arg lambda would have two
    parameters and Spark would bind the second as the element INDEX."""
    return lambda x: x == F.lit(t)


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = BM25_TOPK,
    k1: float = BM25_K1,
    b: float = BM25_B,
    digits: int = 6,
) -> DataFrame:
    """BM25 retrieval: top-k documents for a bag of query terms — the
    ranked-search half of a curation pipeline (decontamination probes,
    topic pulls, hard-negative text mining all reduce to this).

    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b + b·dl/avgdl))
    with the Robertson/Lucene idf  ln(1 + (N − df + 0.5)/(df + 0.5)).

    Scale shape: ZERO corpus shuffles. The query terms are plan-time
    literals, so per-term tf and dl are a NARROW array-filter
    projection over one (doc_id, text) scan — no token explode, no
    (doc, term) aggregate, no tf⋈dl join. The corpus-wide stats the
    score needs (N, avgdl, per-term df) are one |q|+2-column 1-row
    aggregate of that same projection (materialized once — see the
    localCheckpoint note below), broadcast back via cross-join; the
    only exchanges carry 1 row and ≤ k·partitions rows. (The classic
    inverted-index formulation — explode → postings filter → tf/df
    aggregates → joins — computes the identical numbers; the DuckDB
    twin uses it, which makes the gate an independent-formulation
    check, not a replay.)

    Exactness discipline: the cross-term sum runs in integer
    MICRO-UNITS (each per-term contribution is floor(c·1e6 + 0.5) as a
    BIGINT — the pagerank_loop2 fixed-point trick) so the final score
    is order-independent and bit-identical across engines; the
    per-term double math is written with identical association on both
    sides. Ranking uses (score DESC, doc_id) on the exact integer.

    Output: (doc_id, rank, score) — score rounded to ``digits``.
    """
    from pyspark.sql import Window

    # dedupe, order-preserving: a repeated term would add its
    # contribution twice here while the bag-of-terms contract (and the
    # inverted-index twin's IN-list) counts each distinct term once
    terms = list(dict.fromkeys(str(t) for t in query_terms))
    if not terms:
        raise ValueError("bm25_topk: query_terms must be non-empty")
    base = docs.select(
        "doc_id", tokens(F.coalesce(F.col("text"), F.lit(""))).alias("toks")
    )
    # localCheckpoint: the stats aggregate AND the scoring pass both
    # consume proj — left as lineage each would re-run the tokenize +
    # per-term array filters over the corpus (two full scans). The
    # materialized relation is narrow (doc_id + |q|+1 numbers, no
    # text), so this is the cheap side of the trade at any scale.
    proj = base.select(
        "doc_id",
        F.size("toks").cast("long").alias("dl"),
        *[
            F.size(F.filter(F.col("toks"), _eq_term(t)))
            .cast("double")
            .alias(f"tf{i}")
            for i, t in enumerate(terms)
        ],
    ).transform(narrow_barrier)
    stats = proj.agg(
        F.count(F.lit(1)).cast("double").alias("__n"),
        (F.sum("dl").cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "__avgdl"
        ),
        *[
            F.sum((F.col(f"tf{i}") > 0).cast("long"))
            .cast("double")
            .alias(f"df{i}")
            for i in range(len(terms))
        ],
    )
    def term_micro(i: int):
        tf, df = F.col(f"tf{i}"), F.col(f"df{i}")
        idf = F.log(
            F.lit(1.0) + ((F.col("__n") - df) + F.lit(0.5)) / (df + F.lit(0.5))
        )
        num = tf * F.lit(k1 + 1.0)
        den = tf + F.lit(k1) * (
            (F.lit(1.0) - F.lit(b))
            + F.lit(b) * (F.col("dl").cast("double") / F.col("__avgdl"))
        )
        contrib = (idf * num) / den
        return F.when(
            tf > 0, F.floor(contrib * F.lit(1000000.0) + F.lit(0.5)).cast("long")
        ).otherwise(F.lit(0).cast("long"))

    total = term_micro(0)
    for i in range(1, len(terms)):
        total = total + term_micro(i)
    scored = (
        proj.crossJoin(F.broadcast(stats))
        .select("doc_id", total.alias("score_micro"))
        .filter(F.col("score_micro") > 0)
    )
    # top-k via orderBy+limit → TakeOrderedAndProject: each partition
    # keeps its own k, the driver merges Kparts·k rows — never a global
    # single-reducer sort. The rank window then runs over ≤ k rows.
    topk = scored.orderBy(F.desc("score_micro"), F.asc("doc_id")).limit(k)
    w = Window.orderBy(F.desc("score_micro"), F.asc("doc_id"))
    return (
        topk.withColumn("rank", F.row_number().over(w))
        .select(
            "doc_id",
            F.col("rank").cast("int").alias("rank"),
            F.round(
                F.col("score_micro").cast("double") / F.lit(1000000.0), digits
            ).alias("score"),
        )
    )


def lm_surprisal_bigram(docs: DataFrame, digits: int = 4) -> DataFrame:
    """Bigram-LM quality score: average surprisal −log2 p(w2|w1) in
    bits per bigram, with add-one smoothing over the corpus vocabulary
    — one Markov order above :func:`lm_surprisal`, the same signal
    family as CCNet's KenLM perplexity filter (Wenzek et al. 2020)
    but with an exactly-replayable model:

        p(w2|w1) = (c(w1 w2) + 1) / (c(w1) + V)

    (c12 ≤ c(w1) always, so p ≤ 1 and surprisal ≥ 0). Repetitive
    boilerplate scores LOW (its bigrams are corpus-frequent);
    shuffled/gibberish text scores HIGH even when its unigrams are
    common — exactly the case the unigram model cannot see.

    Scale shape: bigrams are a narrow slice-zip projection (no
    positional window); ONE bigram explode, materialized once,
    feeds both the bigram-count aggregate and the scoring join (both
    map-side combined, shuffles bounded by |distinct bigrams|); the
    unigram table and V ride broadcast here, and at web scale both
    scoring joins degrade to shuffle joins keyed by bigram/prefix —
    still never quadratic. Docs with < 2 tokens have no bigrams and
    are not emitted (declared contract, mirrored by the twin).

    Exactness: per-bigram bits go through the integer micro-unit sum
    (floor(bits·1e6 + 0.5) as BIGINT) so the per-doc mean is
    order-independent and bit-identical across engines.

    Output: (doc_id, n_bigrams, bits_per_bigram).
    """
    from kmeans_mapreduce_spark.functions.text import tokens

    base = docs.select("doc_id", tokens(F.col("text")).alias("toks"))
    pairs = base.select(
        "doc_id",
        F.explode(
            F.zip_with(
                F.slice(F.col("toks"), 1, F.greatest(F.size("toks") - 1, F.lit(0))),
                F.slice(F.col("toks"), 2, F.greatest(F.size("toks") - 1, F.lit(0))),
                lambda a, b_: F.struct(a.alias("w1"), b_.alias("w2")),
            )
        ).alias("bg"),
    ).select("doc_id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    pairs = pairs.transform(narrow_barrier)
    toks = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
    cu = toks.groupBy("term").agg(F.count(F.lit(1)).alias("c1"))
    vocab = cu.agg(F.count(F.lit(1)).alias("v"))
    cb = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    p = (F.col("c12") + F.lit(1)).cast("double") / (
        F.col("c1") + F.col("v")
    ).cast("double")
    micro = F.floor(-F.log2(p) * F.lit(1000000.0) + F.lit(0.5)).cast("long")
    return (
        pairs.join(F.broadcast(cb), ["w1", "w2"])
        .join(F.broadcast(cu.withColumnRenamed("term", "w1")), "w1")
        .crossJoin(F.broadcast(vocab))
        .select("doc_id", micro.alias("m"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(
                (F.sum("m").cast("double") / F.lit(1000000.0))
                / F.count(F.lit(1)).cast("double"),
                digits,
            ).alias("bits_per_bigram"),
        )
    )


def normalize_text(docs: DataFrame) -> DataFrame:
    """Unicode NFC normalization + whitespace canonicalization — the
    hygiene pass every dedup pipeline runs FIRST (NFC 'café' and
    decomposed 'café' hash to different fingerprints but are the same
    text; stray whitespace runs likewise defeat exact dedup).

    out = trim(collapse_ws(NFC(text))): NFC via stdlib unicodedata in
    an Arrow-batched narrow map (no shuffle), whitespace collapsed
    with the EXPLICIT class [ \\t\\n\\f\\r] — Python's \\s and RE2's
    \\s disagree on \\x0b (the BPE_SPLIT_RE lesson), so the class is
    spelled out and shared with the DuckDB twin (nfc_normalize +
    regexp_replace), which replays the identical pipeline.

    Output: (doc_id, norm_text, changed, n_chars) — ``changed`` flags
    docs the pass actually rewrote, ``n_chars`` the normalized length.
    """
    import re
    import unicodedata

    import pandas as pd

    ws = re.compile(r"[ \t\n\f\r]+")

    def norm(batches):
        for pdf in batches:
            out, chg, ln = [], [], []
            for text in pdf["text"]:
                t = text if text is not None else ""
                n = ws.sub(" ", unicodedata.normalize("NFC", t)).strip(" ")
                out.append(n)
                chg.append(n != t)
                ln.append(len(n))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "norm_text": out,
                    "changed": chg,
                    "n_chars": ln,
                }
            )

    return docs.select("doc_id", "text").mapInPandas(
        norm, "doc_id LONG, norm_text STRING, changed BOOLEAN, n_chars LONG"
    )
