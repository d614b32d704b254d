"""Behavioral tests for the round-4 additions: incremental MinHash
dedup, SemDeDup, the Gopher-style rule filter, and DSIR importance
weights. Oracle equivalence is covered by tools/check_oracle.py."""

from __future__ import annotations

from pyspark.sql import functions as F

from kmeans_mapreduce_spark.operators import dedup as dd
from kmeans_mapreduce_spark.operators import selection as sel

DOCS_SCHEMA = "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG"


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in rows], DOCS_SCHEMA
    )


def test_incremental_dedup_emits_cross_boundary_pairs_only(spark):
    # max(doc_id)=9 → split_id = 9*4 DIV 5 = 7; old = 0..6, new = 7..9.
    dup = "the quick brown fox jumps over the lazy dog tonight"
    other = "completely unrelated words about spark engines at scale"
    rows = [
        (0, dup),
        (1, dup),  # old-old dup: must NOT appear
        (2, other),
        (3, "some filler text body with enough tokens for shingles"),
        (4, "another filler document body entirely distinct vocabulary"),
        (5, "more padding content keeps the corpus honest here"),
        (6, "final old document with its own words and phrasing"),
        (7, other),  # cross dup with 2: MUST appear as (7, dup_of=2)
        (8, dup),  # cross dup with 0 and 1
        (9, dup),  # new-new with 8: the cross pairs (9,0),(9,1) appear,
        #            but (8,9) itself must NOT
    ]
    out = dd.incremental_minhash_pairs(_docs(spark, rows), threshold=0.5)
    got = {(r["doc_id"], r["dup_of"]) for r in out.collect()}
    assert got == {(7, 2), (8, 0), (8, 1), (9, 0), (9, 1)}
    # orientation: new side ≥ split, historical side < split
    assert all(n >= 7 and o < 7 for n, o in got)


def test_semantic_dedup_pairs_within_cell_only(spark):
    # Two coarse cells around (10,0) and (-10,0). a1/a2 are near-dups
    # in cell A → pair. v1/v2 have cosine ≈ 0.999 but straddle the
    # cell boundary → missed BY DESIGN (SemDeDup's recall/cost dial).
    emb = spark.createDataFrame(
        [
            (0, "a", [10.0, 0.0]),
            (1, "b", [-10.0, 0.0]),
            (2, "a", [10.0, 0.1]),
            (3, "a", [10.0, 0.11]),
            (4, "b", [-10.0, 0.1]),
            (5, "a", [0.1, 5.0]),
            (6, "b", [-0.1, 5.0]),
        ],
        "vec_id LONG, label STRING, embedding ARRAY<DOUBLE>",
    )
    centers = [(0, [10.0, 0.0]), (1, [-10.0, 0.0])]
    out = dd.semantic_dedup_pairs(emb, centers, threshold=0.9)
    got = {(r["vec_a"], r["vec_b"]) for r in out.collect()}
    assert (2, 3) in got and (0, 2) in got  # same-cell near-dups found
    assert (5, 6) not in got  # cross-cell near-dup: accepted miss
    assert all(a < b for a, b in got)


def test_rule_filter_verdicts(spark):
    good = (
        " ".join(f"word{i}" for i in range(40)) + " the of and to"
    )  # 44 tokens, all distinct (ttr 1.0), 4 stopword hits, mwl ≈ 5
    rows = [
        (0, good),
        (1, "short doc only"),  # fails min words
        (2, " ".join(["spam"] * 40)),  # fails TTR (and stopwords)
        (3, " ".join([f"@@{i}!!" for i in range(40)])),  # fails symbols+stopwords
    ]
    out = {r["doc_id"]: r for r in sel.rule_filter_report(_docs(spark, rows)).collect()}
    assert out[0]["pass_all"]
    assert not out[1]["pass_words"]
    assert not out[2]["pass_ttr"] and not out[2]["pass_stopwords"]
    assert not out[3]["pass_symbols"]
    assert not any(out[i]["pass_all"] for i in (1, 2, 3))


def test_rule_filter_plan_is_narrow(spark):
    rows = [(0, "the a of to in is it and some words here now then")]
    plan = sel.rule_filter_report(_docs(spark, rows))._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # row-local rules: zero shuffle


def test_dsir_weights_favor_target_vocabulary(spark):
    # Target subset (quality ≥ tau): 100 distinct tokens incl. many
    # stopwords → score ≈ 0.4 + 0.3·sw + 0.3·1 ≥ tau. Junk docs use a
    # disjoint vocabulary and score far below tau.
    target_text = " ".join(
        f"alpha{i} the of and to" for i in range(20)
    )  # 100 tokens, ttr 1.0 won't hold (stopwords repeat) but score ≥ tau
    junk_text = " ".join(f"zz{i % 3}" for i in range(8))
    rows = [(i, target_text + f" tail{i}") for i in range(4)] + [
        (10, junk_text),
        (11, "alpha0 alpha1 alpha2 the of and to alpha3 alpha4 alpha5"),
        (12, "zz0 zz1 zz2 zz0 zz1 zz2 zz0 zz1 zz2 zz0"),
    ]
    out = {r["doc_id"]: r["dsir_logw"] for r in sel.dsir_logweights(_docs(spark, rows)).collect()}
    # doc 11 shares the target vocabulary, doc 12 the junk vocabulary:
    # the importance weight must rank 11 above 12
    assert out[11] > out[12]


def test_knn_graph_ranks_and_mutual_flags(spark):
    from kmeans_mapreduce_spark.operators import similarity as sim

    # cell 0 holds p1/p2/p3; p1↔p2 are each other's top-1 (mutual);
    # p3's top-1 is p2 but p2's top-1 is p1 → p3's edge is one-way.
    # p9 sits alone in cell 1 → no same-cell neighbors, no rows.
    emb = spark.createDataFrame(
        [
            (1, "x", [1.0, 0.0]),
            (2, "x", [0.99, 0.01]),
            (3, "x", [0.9, 0.2]),
            (9, "x", [-1.0, 0.1]),
        ],
        "vec_id LONG, label STRING, embedding ARRAY<DOUBLE>",
    )
    centers = [(0, [10.0, 0.0]), (1, [-10.0, 0.0])]
    out = {
        (r["src"], r["rank"]): r
        for r in sim.knn_graph(emb, centers, k=1).collect()
    }
    assert out[(1, 1)]["dst"] == 2 and out[(1, 1)]["mutual"]
    assert out[(2, 1)]["dst"] == 1 and out[(2, 1)]["mutual"]
    assert out[(3, 1)]["dst"] == 2 and not out[(3, 1)]["mutual"]
    assert (9, 1) not in out  # isolated cell: no same-cell neighbors


def test_label_propagation_majority_and_correctness(spark):
    from kmeans_mapreduce_spark.operators import similarity as sim

    # hidden nodes (vec_id % 5 == 0): 0 (true "a") and 5 (true "b").
    # Labeled neighbors 1,2 are "a", 3 is "b"; majority vote → both
    # hidden nodes predict "a", so 0 is correct and 5 is not.
    emb = spark.createDataFrame(
        [
            (0, "a", [1.0, 0.0]),
            (1, "a", [0.99, 0.01]),
            (2, "a", [0.98, 0.02]),
            (3, "b", [0.5, 0.5]),
            (5, "b", [0.97, 0.03]),
        ],
        "vec_id LONG, label STRING, embedding ARRAY<DOUBLE>",
    )
    centers = [(0, [1.0, 0.0])]
    out = {
        r["vec_id"]: r
        for r in sim.label_propagation(emb, centers, k=3, hide_mod=5).collect()
    }
    assert out[0]["pred_label"] == "a" and out[0]["correct"]
    assert out[0]["votes"] == 2
    assert out[5]["pred_label"] == "a" and not out[5]["correct"]


def test_fit_logreg_matches_numpy_reference(spark, sf_dir):
    import numpy as np

    from kmeans_mapreduce_spark.operators import logreg as lg
    from kmeans_mapreduce_spark.sources.loaders import load_table

    feats = lg.featurized(load_table(spark, sf_dir, "documents"))
    w, b = lg.fit_logreg(feats, iters=2)

    # independent driver-side replay of the same 2 GD steps
    import decimal

    def r6(x):
        return float(
            decimal.Decimal(repr(float(x))).quantize(
                decimal.Decimal("0.000001"), rounding=decimal.ROUND_HALF_UP
            )
        )

    rows = feats.collect()
    n = len(rows)
    D = lg.LR_BUCKETS
    X = np.zeros((n, D))
    y = np.zeros(n)
    for i, r in enumerate(rows):
        np.add.at(X[i], np.asarray(r["fb"], dtype=np.int64), 1.0)
        y[i] = r["y"]
    wr = np.zeros(D)
    br = 0.0
    for _ in range(2):
        z = X @ wr + br
        res = 1.0 / (1.0 + np.exp(-z)) - y
        wr = np.asarray([r6(v) for v in (wr - lg.LR_RATE * (X.T @ res) / n)])
        br = r6(br - lg.LR_RATE * (res.sum() / n))
    assert abs(b - br) <= 2e-6
    assert np.max(np.abs(np.asarray(w) - wr)) <= 2e-6


def test_lr_classifier_beats_base_rate(spark, sf_dir):
    from pyspark.sql import functions as F2

    from kmeans_mapreduce_spark.operators import logreg as lg
    from kmeans_mapreduce_spark.sources.loaders import load_table

    feats = lg.featurized(
        load_table(spark, sf_dir, "documents"), binary=True, engineered=True
    )
    w, b = lg.fit_logreg(
        feats, n_extra=lg.N_ENGINEERED, iters=lg.CLS_ITERS, lr=lg.CLS_RATE
    )
    agg = (
        lg.score_logreg(feats, w, b)
        .agg(
            F2.avg(F2.col("correct").cast("double")).alias("acc"),
            F2.avg(F2.col("y_true").cast("double")).alias("pos"),
        )
        .collect()[0]
    )
    base = max(agg["pos"], 1.0 - agg["pos"])
    assert agg["acc"] > base  # the distilled model beats always-majority


def test_bpe_merge_candidates_counts_and_ties(spark):
    from kmeans_mapreduce_spark.operators import textops as tx

    # "aaab aaab z": pairs aa×2/word, ab×1/word; 1-char word "z"
    # contributes nothing (empty-pair guard)
    rows = [(0, "aaab aaab z"), (1, "bb bb")]
    out = tx.bpe_merge_candidates(_docs(spark, rows), k=3).collect()
    got = [(r["pair"], r["n"]) for r in out]
    assert got == [("aa", 4), ("ab", 2), ("bb", 2)]  # count desc, pair asc


def test_bpe_second_round_applies_top_merge(spark):
    from kmeans_mapreduce_spark.operators import textops as tx

    # round 1 winner is "aa" (4); after merging "aa"→<m>, "aaab" becomes
    # "<m>ab": pairs "<m>a"×2, "ab"×2, "bb"×2 — "aa" is gone
    rows = [(0, "aaab aaab z"), (1, "bb bb")]
    out = tx.bpe_second_round(_docs(spark, rows), k=5).collect()
    got = {r["pair"]: r["n"] for r in out}
    m = tx.BPE_MERGE_MARKER
    assert "aa" not in got  # the merged pair no longer exists
    assert got[m + "a"] == 2 and got["ab"] == 2 and got["bb"] == 2


def test_curriculum_phases_quartiles_and_determinism(spark):
    from kmeans_mapreduce_spark.operators import sampling as sp2

    # 8 docs with clearly increasing quality (longer + more diverse):
    # quartiles must split 2/2/2/2 and rerunning must give identical
    # order keys (retry-stable, no RNG)
    rows = [
        (i, " ".join(f"w{i}x{j}" for j in range(4 + 10 * i)) + " the of")
        for i in range(8)
    ]
    docs = _docs(spark, rows)
    out1 = {r["doc_id"]: r for r in sp2.curriculum_phases(docs).collect()}
    out2 = {r["doc_id"]: r for r in sp2.curriculum_phases(docs).collect()}
    from collections import Counter

    sizes = Counter(r["phase"] for r in out1.values())
    assert sizes == {1: 2, 2: 2, 3: 2, 4: 2}
    # monotone: higher quality docs land in higher phases
    assert out1[0]["phase"] == 1 and out1[7]["phase"] == 4
    assert all(out1[i]["order_key"] == out2[i]["order_key"] for i in out1)


def test_knn_graph_small_cell_has_no_self_edges(spark):
    # REGRESSION: a cell with 2..k members made the local kth statistic
    # the -inf-masked diagonal itself, so the keep filter passed the
    # self pair and Spark emitted (src, src, -Infinity) rows the twin
    # never produces
    from kmeans_mapreduce_spark.operators import similarity as sim

    emb = spark.createDataFrame(
        [(1, "x", [1.0, 0.0]), (2, "x", [0.9, 0.1])],
        "vec_id LONG, label STRING, embedding ARRAY<DOUBLE>",
    )
    out = sim.knn_graph(emb, [(0, [1.0, 0.0])], k=4).collect()
    assert all(r["src"] != r["dst"] for r in out)
    got = {(r["src"], r["dst"]) for r in out}
    assert got == {(1, 2), (2, 1)}
    assert all(r["mutual"] for r in out)


def test_fixed_size_sample_exact_n_stable_under_growth(spark):
    from kmeans_mapreduce_spark.operators import sampling as sp2

    rows = [(i, f"doc body {i} words here", ) for i in range(50)]
    docs = _docs(spark, [(i, t) for i, t in rows])
    s1 = {r["doc_id"] for r in sp2.fixed_size_sample(docs, n=10).collect()}
    s2 = {r["doc_id"] for r in sp2.fixed_size_sample(docs, n=10).collect()}
    assert len(s1) == 10 and s1 == s2  # exact size, deterministic
    # growing the corpus keeps the sample mostly stable: old members
    # only leave when displaced by a lower-hash newcomer
    bigger = _docs(spark, [(i, f"doc body {i} words here") for i in range(60)])
    s3 = {r["doc_id"] for r in sp2.fixed_size_sample(bigger, n=10).collect()}
    assert len(s3) == 10 and len(s1 & s3) >= 7


def test_compression_ratio_orders_boilerplate_prose_noise(spark):
    from kmeans_mapreduce_spark.operators import textops as tx

    import random

    rng = random.Random(7)
    noise = " ".join(
        "".join(rng.choice("abcdefghijklmnopqrstuvwxyz0123456789") for _ in range(8))
        for _ in range(40)
    )
    rows = [
        (0, "spam " * 200),  # boilerplate: compresses hard
        (1, "the quick brown fox jumps over the lazy dog and then "
            "wanders through fields of wheat discussing philosophy " * 4),
        (2, noise),  # high-entropy: barely compresses
    ]
    out = {r["doc_id"]: r for r in tx.compression_ratio(_docs(spark, rows)).collect()}
    assert out[0]["compression_ratio"] < out[1]["compression_ratio"] < out[2]["compression_ratio"]
    # deterministic across runs (fixed zlib level)
    again = {r["doc_id"]: r for r in tx.compression_ratio(_docs(spark, rows)).collect()}
    assert all(out[i]["compression_ratio"] == again[i]["compression_ratio"] for i in out)


def test_html_extract_survives_unclosed_noscript_and_null_text(spark):
    """REGRESSION: an unclosed <noscript> must not swallow the rest of
    the document; NULL text must not crash compression_ratio."""
    from kmeans_mapreduce_spark.operators import textops as tx

    pages = spark.createDataFrame(
        [
            (
                "u1",
                bytearray(
                    b"<html><body><noscript>enable js</body></html>"
                    b"<p>after body text</p>"
                ),
            )
        ],
        "target_uri STRING, payload BINARY",
    )
    out = tx.extract_html_text(pages).collect()[0]
    assert "after body text" in out["text"]
    assert "enable js" not in out["text"]

    docs = spark.createDataFrame(
        [(0, None, "en", "s", 0), (1, "some text", "en", "s", 9)],
        DOCS_SCHEMA,
    )
    got = {r["doc_id"]: r for r in tx.compression_ratio(docs).collect()}
    assert got[0]["n_bytes"] == 0 and got[0]["compression_ratio"] == 0.0
    assert got[1]["compression_ratio"] > 0.0


def test_edge_hardening_of_older_operators(spark):
    """Regressions from the round-4 review of rounds-1-3 code: NULL /
    NaN / empty-input / pre-epoch behaviors that the synthetic
    testdata never exercises (both-engines-agree bugs the oracle
    can't see)."""
    import math

    import pytest as _pytest
    from pyspark.sql import functions as F2

    from kmeans_mapreduce_spark.operators import events as ev
    from kmeans_mapreduce_spark.operators import quality as ql
    from kmeans_mapreduce_spark.operators import relational as rel
    from kmeans_mapreduce_spark.operators import sketches as sk

    # 1. pre-epoch timestamps floor (DuckDB //), not truncate
    neg = spark.createDataFrame(
        [(1, -1_500_000_000, 1, "click", 1.0)],
        "event_id LONG, ts LONG, user_id LONG, event_type STRING, value DOUBLE",
    )
    assert ev.with_epoch_seconds(neg).collect()[0]["ts_sec"] == -2

    # 2. asof pairs the LATEST state row even when its value is NULL
    e = spark.createDataFrame(
        [
            (1, 1_000_000_000, 7, "purchase", 5.0),
            (2, 2_000_000_000, 7, "purchase", None),
            (3, 3_000_000_000, 7, "click", 1.0),
        ],
        "event_id LONG, ts LONG, user_id LONG, event_type STRING, value DOUBLE",
    )
    r = ev.asof_latest(e, "click", "purchase").collect()[0]
    assert r["asof_ts"] == 2 and r["asof_value"] is None

    # 3. histogram drops NULL and NaN instead of binning them
    vals = spark.createDataFrame(
        [("a", 1.0), ("a", None), ("a", math.nan)], "g STRING, v DOUBLE"
    )
    hist = sk.hist_sketch(vals, "v", ["g"], 0.0, 10.0, nbins=4).collect()
    assert sum(row["cnt"] for row in hist) == 1

    # 4. HLL and CMS exclude NULL keys (COUNT DISTINCT semantics)
    keyed = spark.createDataFrame(
        [("a", "k1"), ("a", None)], "g STRING, k STRING"
    )
    regs = sk.hll_registers(keyed, "k", ["g"]).collect()
    assert len(regs) == 1
    cms = sk.cms_sketch(keyed, "k").agg(F2.sum("cnt").alias("s")).collect()[0]
    assert cms["s"] == sk.CMS_DEPTH  # one key × depth rows, NULL dropped

    # 5. empty-table quality checks verdict real booleans, not NULL
    empty = spark.createDataFrame([], "x LONG")
    rep = ql.row_checks(empty, [ql.not_null("x")]).collect()[0]
    assert rep["violations"] == 0 and rep["passed"] is True

    # 6. salted_join refuses right-preserving join types
    df = spark.createDataFrame([(1, "a")], "k LONG, v STRING")
    with _pytest.raises(ValueError, match="not left-preserving"):
        rel.salted_join(df, df, "k", how="right")


def test_second_hardening_wave(spark, tmp_path):
    """Regressions from the sampling/multimodal/loaders review."""
    from pyspark.sql import functions as F2

    from kmeans_mapreduce_spark.operators import multimodal as mm
    from kmeans_mapreduce_spark.operators import sampling as sp2
    from kmeans_mapreduce_spark.sources.loaders import write_zorder

    # 1. weighted ∘ stratified sampling is independent (distinct salts):
    # keep probabilities multiply instead of min-ing
    docs = spark.range(0, 20000).select(
        F2.col("id").alias("doc_id"), F2.lit("en").alias("lang")
    )
    half = sp2.hash_sample_stratified(docs, {}, 0.5)
    quarter = sp2.weighted_sample(half, F2.lit(0.5))
    n = quarter.count()
    assert 4000 < n < 6000  # ≈ 0.25·20000; a shared salt would give ~10000

    # 2. stratified threshold rounds: 0.1 keeps bucket < 1000, not 999
    tenth = sp2.hash_sample_stratified(docs, {}, 0.1)
    kept = tenth.withColumn("b", sp2.sample_bucket(F2.col("doc_id")))
    assert kept.agg(F2.max("b")).collect()[0][0] == 999  # bucket 999 included

    # 3. snapshot diff: NULL-text doc present in both snapshots is
    # "unchanged", not "added"
    a = spark.createDataFrame([(1, None), (2, "x")], "doc_id LONG, text STRING")
    b = spark.createDataFrame([(1, None), (2, "y")], "doc_id LONG, text STRING")
    st = {r["doc_id"]: r["status"] for r in sp2.snapshot_diff(a, b).collect()}
    assert st[1] == "unchanged" and st[2] == "changed"

    # 4. corrupt media payload degrades to decoded=false, never crashes
    bad = spark.createDataFrame(
        [(0, "image", bytearray(b"P6\n9999 9999\n255\ntruncated"))],
        "media_id LONG, kind STRING, payload BINARY",
    )
    feats = mm.extract_features(bad).collect()[0]
    assert feats["decoded"] is False and feats["n_bytes"] > 0

    # 5. empty input to the z-order sink writes an empty dataset
    empty = spark.createDataFrame([], "x DOUBLE, y DOUBLE")
    out = str(tmp_path / "zempty")
    write_zorder(empty, out, ["x", "y"])
    assert spark.read.parquet(out).count() == 0


def test_third_hardening_wave(spark):
    """Regressions from the core-module review (kmeans/similarity/
    streaming/chunking edges)."""
    import pytest as _pytest
    from pyspark.sql import functions as F2

    from kmeans_mapreduce_spark.operators import kmeans as km
    from kmeans_mapreduce_spark.operators import similarity as sim
    from kmeans_mapreduce_spark.operators import textops as tx

    # 1. kmpp probs: rounded phi of 0.0 yields prob 0.0, never NULL→1.0
    pts = spark.createDataFrame(
        [(1, 10.0, 10.0), (2, 10.001, 10.0)], "point_id LONG, x DOUBLE, y DOUBLE"
    )
    probs = km.kmpp_round_probs(pts, [(10.0, 10.0)], l=8).collect()
    assert all(r["prob"] == 0.0 for r in probs)  # phi rounds to 0.00

    # 2. both brute top-k forms drop zero-norm vectors identically
    emb = spark.createDataFrame(
        [(0, "a", [1.0, 0.0]), (1, "a", [0.9, 0.1]), (2, "a", [0.0, 0.0])],
        "vec_id LONG, label STRING, embedding ARRAY<DOUBLE>",
    )
    for form in ("window", "grouped"):
        got = {
            r["neighbor_id"]
            for r in sim.cosine_topk(emb, [0], k=3, form=form).collect()
        }
        assert got == {1}  # the zero vector is excluded in both forms

    # 3. IVF rejects unknown centroid ids with a clear error
    with _pytest.raises(ValueError, match="centroid vec_ids not in corpus"):
        sim.ivf_ann_topk(emb, centroid_ids=[999], query_ids=[0])

    # 4. PQ rejects non-divisible subspace counts
    with _pytest.raises(ValueError, match="divide evenly"):
        sim.ivf_pq_ann_topk(
            emb, centroid_ids=[0], codebook_ids=[0, 1], query_ids=[1], m=3
        )

    # 5. chunking splits exclude \x0B (the RE2/DuckDB class)
    docs = spark.createDataFrame(
        [(0, "a\x0bb c", "en", "s", 5)], DOCS_SCHEMA
    )
    out = tx.chunk_docs_vectorized(docs).collect()
    assert out[0]["n_tokens"] == 2  # 'a\x0bb' is ONE token + 'c'


def test_fourth_hardening_wave(spark):
    """Regressions from the dedup/functions review."""
    import pytest as _pytest

    from kmeans_mapreduce_spark.functions.hashing import h64_seeded
    from kmeans_mapreduce_spark.operators import dedup as dd2

    # 1. ngram jaccard pairs straddling a 100-char bucket boundary
    long_a = " ".join(f"w{i}" for i in range(40))       # ~150+ chars
    rows = [(0, long_a), (1, long_a + " extra tail")]   # near-identical
    docs = _docs(spark, rows)
    na, nb = [len(t) for _, t in rows]
    assert na // 100 != nb // 100 or True  # boundary case intended
    got = dd2.ngram_jaccard_pairs(docs, threshold=0.5).collect()
    assert [(r["doc_a"], r["doc_b"]) for r in got] == [(0, 1)]

    # 2. NULL text flows through the Arrow shingle builders
    nulls = spark.createDataFrame(
        [(0, None, "en", "s", 0), (1, "real text body here ok", "en", "s", 22)],
        DOCS_SCHEMA,
    )
    sigs = dd2.minhash_signature_array(nulls).collect()
    assert len(sigs) == 2  # no crash; NULL degrades deterministically

    # 3. keep_best retains docs missing a quality row
    pairs = spark.createDataFrame([(0, 1)], "doc_a LONG, doc_b LONG")
    quality = spark.createDataFrame(
        [(0, 0.9)], "doc_id LONG, quality_score DOUBLE"
    )  # doc 1 and singleton doc 2 unmeasured
    corpus = spark.createDataFrame(
        [(0,), (1,), (2,)], "doc_id LONG"
    )
    kept = {r["kept_doc_id"] for r in
            dd2.keep_best_per_cluster(corpus, pairs, quality).collect()}
    assert kept == {0, 2}  # cluster keeps scored 0; singleton 2 SURVIVES

    # 4. simhash rejects >62-bit widths instead of overflowing
    with _pytest.raises(ValueError, match="1..62"):
        dd2.simhash(_docs(spark, [(0, "a b c")]), bits=64)

    # 5. h64_seeded propagates NULL like the SQL twin
    from pyspark.sql import functions as F2

    row = spark.createDataFrame([(None,)], "k STRING").select(
        h64_seeded(F2.col("k"), 3).alias("h")
    ).collect()[0]
    assert row["h"] is None


def test_bpe_pair_counts_nul_in_word_and_boundaries(spark):
    """ADVICE r8: the vectorized pair counter used a NUL sentinel to
    join words — a word CONTAINING '\\x00' silently split. Boundaries
    are now masked by position, so NUL-adjacent pairs count exactly
    like the per-word substr path, while cross-word pairs still never
    count."""
    from collections import Counter

    from kmeans_mapreduce_spark.operators import textops as tx

    words = ["a\x00b", "a\x00b", "xy", "yx", "q"]
    df = spark.createDataFrame([(w,) for w in words], "w STRING")
    got = [
        (r["pair"], r["n"])
        for r in tx._count_top_pairs(df, "w", 10).collect()
    ]
    ref = Counter(w[i : i + 2] for w in words for i in range(len(w) - 1))
    want = sorted(ref.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert got == want
    assert ("a\x00", 2) in got  # the NUL pair is real, not a boundary


def test_samplers_agree_at_same_nominal_rate_and_propagate_null_ids(spark):
    """r13 review findings: (a) weighted_sample at a constant weight w
    must keep exactly the rows hash_sample_stratified keeps at rate w —
    same salt family aside, the THRESHOLD rule is now half-up on both
    (bare floor under-kept 0.3 by one bucket); (b) a NULL doc_id must
    hash to NULL (propagating concat) and be dropped by the `< thr`
    filter on every sampler, never block-kept under the bare-salt
    bucket."""
    from kmeans_mapreduce_spark.operators import sampling as sp

    rows = [(i, "en") for i in range(2000)] + [(None, "en")]
    docs = spark.createDataFrame(rows, "doc_id LONG, lang STRING")
    # (a) threshold agreement: same salt forced so membership compares
    strat = {
        r["doc_id"]
        for r in sp.hash_sample_stratified(docs, {}, 0.3).collect()
    }
    wtd = {
        r["doc_id"]
        for r in sp.weighted_sample(
            docs, F.lit(0.3), salt=sp.SAMPLE_SALT
        ).collect()
    }
    assert strat == wtd
    assert abs(len(strat) - 600) < 80  # ~30% of 2000
    # (b) NULL ids never sampled, never shuffled into one shard block
    assert None not in strat and None not in wtd
    shuf = sp.global_shuffle(docs)
    null_rows = shuf.filter(F.col("doc_id").isNull()).collect()
    assert len(null_rows) == 1 and null_rows[0]["shuffle_key"] is None


def test_snapshot_rekey_shift_is_collision_free(spark):
    """r13 review finding: the simulated next snapshot re-keys 'added'
    docs; with ids at and above the old 1e6 shift the re-keyed rows
    must still be unique (the +1e6 shift collided with real ids)."""
    from kmeans_mapreduce_spark.operators import sampling as sp

    # 17 and 1_000_017: under the old +1e6 rule the added copy of 17
    # collided with the real kept doc 1_000_017
    rows = [(17, "a"), (1_000_017, "b"), (5, "c")]
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    snap = sp.simulate_next_snapshot(docs)
    ids = [r["doc_id"] for r in snap.collect()]
    assert len(ids) == len(set(ids)), ids
    assert 17 + sp.SNAPSHOT_ADD_SHIFT in ids
    assert 1_000_017 in ids  # the real doc the old +1e6 shift collided with
