"""Tests for the analytics wave: HLL sketch, pivot, window suite."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from kmeans_mapreduce_spark.operators import sketches as sk


@pytest.fixture(scope="module")
def ids_df(spark):
    # 5000 distinct string-able keys across 4 groups of varying size.
    return spark.range(0, 5000).select(
        (F.col("id") % 4).alias("g"), F.col("id").alias("k")
    )


def test_hll_within_expected_error(spark, ids_df):
    """HLL standard error is 1.04/sqrt(m) ~ 6.5% at m=256; assert 4
    sigma so the test is deterministic-stable (the hash is fixed, so
    this is really a regression pin, not a statistical assertion)."""
    out = {
        r["g"]: r["est"]
        for r in sk.hll_distinct(ids_df, "k", ["g"], "est").collect()
    }
    for g in range(4):
        exact = 1250
        assert abs(out[g] - exact) / exact < 4 * 1.04 / math.sqrt(sk.HLL_M)


def test_hll_registers_merge(spark, ids_df):
    """Sketch state is union-able: registers(A) max-merged with
    registers(B) == registers(A ∪ B) — the property that makes HLL
    cheap to maintain across 100 TB partitions/days."""
    a = ids_df.filter(F.col("k") < 2500)
    b = ids_df.filter(F.col("k") >= 2500)
    merged = (
        sk.hll_registers(a, "k", ["g"])
        .unionByName(sk.hll_registers(b, "k", ["g"]))
        .groupBy("g", "bucket")
        .agg(F.max("m_j").alias("m_j"))
    )
    whole = sk.hll_registers(ids_df, "k", ["g"])
    assert merged.exceptAll(whole).count() == 0
    assert whole.exceptAll(merged).count() == 0


def test_hll_small_range_exactish(spark):
    """Tiny cardinalities land in the linear-counting branch and come
    out near-exact (distinct buckets ~ distinct keys when n << m)."""
    df = spark.range(0, 30).select(F.lit(0).alias("g"), F.col("id").alias("k"))
    [row] = sk.hll_distinct(df, "k", ["g"], "est").collect()
    assert abs(row["est"] - 30) <= 2


def test_pivot_schema_static_and_counts(spark):
    from kmeans_mapreduce_spark.analytics import EVENT_TYPES, q_events_pivot
    from tests.conftest import SF_SMOKE

    df = q_events_pivot(spark, SF_SMOKE)
    cols = ["hod"] + [f"{t}_{s}" for t in EVENT_TYPES for s in ("n", "val")]
    assert df.columns == cols
    rows = df.collect()
    assert 0 < len(rows) <= 24
    total = sum(sum(r[f"{t}_n"] or 0 for t in EVENT_TYPES) for r in rows)
    from kmeans_mapreduce_spark.sources.loaders import load_table

    assert total == load_table(spark, SF_SMOKE, "events").count()


def test_repetition_signals_hand_computed(spark):
    from kmeans_mapreduce_spark.operators.textops import repetition_signals

    docs = spark.createDataFrame(
        [(1, "a a a b"), (2, "w x y z"), (3, "solo")],
        "doc_id LONG, text STRING",
    )
    out = {r["doc_id"]: r for r in repetition_signals(docs).collect()}
    # doc 1: unigrams a,a,a,b -> distinct 2/4, top 3/4;
    #        bigrams "a a","a a","a b" -> dup (3-2)/3
    assert out[1]["n_tokens"] == 4
    assert out[1]["distinct_ratio"] == 0.5
    assert out[1]["top_unigram_frac"] == 0.75
    assert out[1]["dup_bigram_frac"] == round(1 / 3, 6)
    # doc 2: no repetition at all
    assert out[2]["distinct_ratio"] == 1.0
    assert out[2]["dup_bigram_frac"] == 0.0
    # doc 3: single token -> no bigrams, coalesced to 0
    assert out[3]["n_tokens"] == 1
    assert out[3]["dup_bigram_frac"] == 0.0


def test_redact_pii_spans_and_counts(spark):
    from kmeans_mapreduce_spark.operators.textops import redact_pii

    docs = spark.createDataFrame(
        [
            (1, "mail bob.smith+x@corp.example.org now"),
            (2, "host 192.168.1.250 dial 555-0199 twice 555-0200"),
            (3, "clean text no pii"),
        ],
        "doc_id LONG, text STRING",
    )
    out = {r["doc_id"]: r for r in redact_pii(docs).collect()}
    assert out[1]["redacted"] == "mail <EMAIL> now"
    assert out[1]["n_emails"] == 1 and out[1]["n_ips"] == 0
    assert out[2]["redacted"] == "host <IP> dial <PHONE> twice <PHONE>"
    assert (out[2]["n_ips"], out[2]["n_phones"]) == (1, 2)
    assert out[3]["redacted"] == "clean text no pii"
    assert out[3]["n_emails"] == out[3]["n_ips"] == out[3]["n_phones"] == 0


def test_series_similarity_shape(spark):
    from kmeans_mapreduce_spark.analytics import (
        SERIES_K,
        SERIES_QUERY_USERS,
        q_pipeline_series_similarity,
    )
    from tests.conftest import SF_SMOKE

    from kmeans_mapreduce_spark.sources.loaders import load_table

    present = {
        r["user_id"]
        for r in load_table(spark, SF_SMOKE, "events")
        .select("user_id")
        .distinct()
        .collect()
    }
    rows = q_pipeline_series_similarity(spark, SF_SMOKE).collect()
    by_q: dict[int, list] = {}
    for r in rows:
        assert -1.0 <= r["cosine"] <= 1.0
        assert r["neighbor_id"] != r["query_id"]
        by_q.setdefault(r["query_id"], []).append(r)
    # sf0.001 holds users 0-14 only; probes outside the data can't rank
    assert set(by_q) == set(SERIES_QUERY_USERS) & present
    for qrows in by_q.values():
        qrows.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in qrows] == list(range(1, SERIES_K + 1))
        cos = [r["cosine"] for r in qrows]
        assert cos == sorted(cos, reverse=True)


def test_weighted_sample_monotone_and_bounds(spark):
    """weight 0 keeps nothing, weight 1 keeps everything, and the kept
    set is monotone in the weight (raising a doc's weight can only add
    it, never drop it) — the property that makes weighted re-sampling
    auditable across mix revisions."""
    from kmeans_mapreduce_spark.operators.sampling import weighted_sample

    docs = spark.range(0, 2000).select(F.col("id").alias("doc_id"))
    assert weighted_sample(docs, F.lit(0.0)).count() == 0
    assert weighted_sample(docs, F.lit(1.0)).count() == 2000
    lo = {r["doc_id"] for r in weighted_sample(docs, F.lit(0.3)).collect()}
    hi = {r["doc_id"] for r in weighted_sample(docs, F.lit(0.7)).collect()}
    assert lo < hi
    assert 0.25 < len(lo) / 2000 < 0.35 and 0.65 < len(hi) / 2000 < 0.75


def test_cms_upper_bound_and_exact_when_sparse(spark):
    """CMS point queries never under-count, and with 600 distinct keys
    in 4x1024 counters most keys see at least one collision-free row,
    so the min over rows is exact for the bulk of them."""
    from kmeans_mapreduce_spark.operators import sketches as sk

    df = spark.range(0, 6000).select(
        (F.col("id") % 600).cast("string").alias("k")
    )  # 600 keys x 10 occurrences
    sketch = sk.cms_sketch(df, "k")
    exact = df.groupBy("k").agg(F.count(F.lit(1)).alias("n"))
    est = sk.cms_estimate(sketch, exact.select("k"), "k")
    rows = exact.join(est, "k").collect()
    assert all(r["cms_est"] >= r["n"] for r in rows)
    exact_hits = sum(r["cms_est"] == r["n"] for r in rows)
    assert exact_hits > len(rows) * 0.9


def test_cms_sketches_merge_by_sum(spark):
    from kmeans_mapreduce_spark.operators import sketches as sk

    df = spark.range(0, 2000).select((F.col("id") % 100).cast("string").alias("k"))
    a = sk.cms_sketch(df.filter(F.col("id") < 1000), "k")
    b = sk.cms_sketch(df.filter(F.col("id") >= 1000), "k")
    merged = (
        a.unionByName(b).groupBy("j", "col").agg(F.sum("cnt").alias("cnt"))
    )
    whole = sk.cms_sketch(df, "k")
    assert merged.exceptAll(whole).count() == 0
    assert whole.exceptAll(merged).count() == 0


def test_hist_quantiles_within_bin_width_of_exact(spark):
    """The histogram estimate can be off by at most one bin width from
    the exact percentile (values uniform in [0, 100), 64 bins over
    [0, 100) -> width 1.5625)."""
    from kmeans_mapreduce_spark.operators import sketches as sk

    df = spark.range(0, 4000).select(
        F.lit("g").alias("g"), ((F.col("id") * 37) % 100).cast("double").alias("v")
    )
    hist = sk.hist_sketch(df, "v", ["g"], 0.0, 100.0)
    got = {
        r["q"]: r["quantile_est"]
        for r in sk.hist_quantiles(hist, ["g"], (0.5, 0.9), 0.0, 100.0).collect()
    }
    exact = df.selectExpr("percentile(v, 0.5) p50", "percentile(v, 0.9) p90").collect()[0]
    width = 100.0 / sk.HIST_NBINS
    assert abs(got[0.5] - exact["p50"]) <= width
    assert abs(got[0.9] - exact["p90"]) <= width


def test_hist_sketch_merges_by_sum(spark):
    from kmeans_mapreduce_spark.operators import sketches as sk

    df = spark.range(0, 3000).select(
        (F.col("id") % 2).alias("g"), (F.col("id") % 97).cast("double").alias("v")
    )
    a = sk.hist_sketch(df.filter(F.col("id") < 1500), "v", ["g"], 0.0, 100.0)
    b = sk.hist_sketch(df.filter(F.col("id") >= 1500), "v", ["g"], 0.0, 100.0)
    merged = a.unionByName(b).groupBy("g", "bin").agg(F.sum("cnt").alias("cnt"))
    whole = sk.hist_sketch(df, "v", ["g"], 0.0, 100.0)
    assert merged.exceptAll(whole).count() == 0
    assert whole.exceptAll(merged).count() == 0


def test_decontaminate_planted_overlap(spark):
    """Doc 97k copies benchmark text -> ratio 1.0; disjoint doc absent."""
    from kmeans_mapreduce_spark.operators.decontam import decontaminate

    bench_text = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        [
            (0, bench_text),  # benchmark split (0 % 97 == 0)
            (1, bench_text),  # exact leak
            (2, "alpha beta gamma delta unrelated words here now"),  # partial
            (3, "one two three four five six seven eight"),  # disjoint
        ],
        "doc_id LONG, text STRING",
    )
    out = {r["doc_id"]: r for r in decontaminate(docs).collect()}
    assert 0 not in out, "benchmark docs must not be scored"
    assert out[1]["overlap_ratio"] == 1.0
    assert 3 not in out
    # doc 2 shares exactly the shingles inside 'alpha beta gamma delta'
    assert 2 in out and 0 < out[2]["overlap_ratio"] < 1.0


def test_decontaminate_plan_broadcasts_benchmark(spark):
    """The benchmark fingerprint side must broadcast: the corpus is
    never exchanged for the semi-join (only the final per-doc count
    shuffles)."""
    from kmeans_mapreduce_spark import plans
    from kmeans_mapreduce_spark.operators.decontam import decontaminate
    from kmeans_mapreduce_spark.sources.loaders import load_table
    from tests.conftest import SF_SMOKE

    plan = plans.explain_str(decontaminate(load_table(spark, SF_SMOKE, "documents")))
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert "SortMergeJoin" not in plan


def test_running_window_properties(spark):
    from kmeans_mapreduce_spark.analytics import q_orders_running_window
    from tests.conftest import SF_SMOKE

    rows = q_orders_running_window(spark, SF_SMOKE).collect()
    assert rows, "expected at least one sampled customer"
    by_cust: dict[int, list] = {}
    for r in rows:
        by_cust.setdefault(r["o_custkey"], []).append(r)
    for seq_rows in by_cust.values():
        seq_rows.sort(key=lambda r: r["order_seq"])
        assert [r["order_seq"] for r in seq_rows] == list(
            range(1, len(seq_rows) + 1)
        )
        totals = [r["running_total"] for r in seq_rows]
        assert all(b >= a - 1e-6 for a, b in zip(totals, totals[1:]))
        assert seq_rows[0]["days_since_prev"] == -1
        assert all(r["days_since_prev"] >= 0 for r in seq_rows[1:])


def test_bloom_filter_membership_and_fp_rate(spark):
    from pyspark.sql import functions as F

    from kmeans_mapreduce_spark.operators import sketches as sk

    members = spark.range(0, 50).select(F.col("id").cast("string").alias("k"))
    words = sk.bloom_filter_words(sk.bloom_registers(members, "k"))
    probes = spark.range(0, 2050).select(F.col("id").cast("string").alias("k"))
    hits = probes.filter(sk.bloom_might_contain(F.col("k"), words))
    got = {int(r["k"]) for r in hits.collect()}
    # no false negatives, ever
    assert set(range(50)) <= got
    # 50 keys in 7936 bits -> FP rate way under 1% for 2000 non-members
    assert len(got - set(range(50))) < 20


def test_bloom_semi_join_matches_exact_semi_join(spark):
    from pyspark.sql import functions as F

    from kmeans_mapreduce_spark.operators import sketches as sk
    from kmeans_mapreduce_spark.sources.loaders import load_table
    from tests.conftest import SF_SMOKE

    li = load_table(spark, SF_SMOKE, "lineitem")
    o = load_table(spark, SF_SMOKE, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    got = sk.bloom_semi_join(li, o, "l_orderkey", "o_orderkey")
    keys = o.select(F.col("o_orderkey").alias("l_orderkey")).distinct()
    want = li.join(keys, "l_orderkey", "left_semi")
    assert got.count() == want.count()
    assert got.select("l_orderkey").subtract(want.select("l_orderkey")).count() == 0


def test_bloom_prune_plan_is_narrow_filter_then_broadcast_semi(spark):
    """Scale contract: the bloom predicate must sit scan-side as a pure
    narrow filter (no join/exchange feeding it) and the exactness join
    must broadcast — no SortMergeJoin, no extra shuffle of the fact."""
    from kmeans_mapreduce_spark import plans
    from kmeans_mapreduce_spark.analytics import q_lineitem_bloom_prune
    from tests.conftest import SF_SMOKE

    plan = plans.explain_str(q_lineitem_bloom_prune(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert "SortMergeJoin" not in plan
    # the bloom conjunction (element_at over the literal bitmap) is a
    # Filter in the fact scan stage, below the join
    assert "element_at" in plan


def test_chunk_udtf_matches_vectorized_twin(spark):
    """The Python UDTF (API surface) and the Catalyst built-in twin
    (hot path) must produce identical chunk rows."""
    from kmeans_mapreduce_spark.operators import textops as tx
    from kmeans_mapreduce_spark.sources.loaders import load_table
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents")
    a = tx.chunk_docs_udtf(docs)
    b = tx.chunk_docs_vectorized(docs)
    assert a.count() == b.count()
    assert a.subtract(b).count() == 0 and b.subtract(a).count() == 0


def test_chunk_vectorized_is_narrow(spark):
    from kmeans_mapreduce_spark import plans
    from kmeans_mapreduce_spark.operators import textops as tx
    from kmeans_mapreduce_spark.sources.loaders import load_table
    from tests.conftest import SF_SMOKE

    df = tx.chunk_docs_vectorized(load_table(spark, SF_SMOKE, "documents"))
    plan = plans.explain_str(df)
    assert "Exchange" not in plan and "Join" not in plan
    assert set(plans.scan_columns(df)) == {"doc_id", "text"}


def test_pca_matches_single_node_numpy(spark):
    """Distributed sufficient-statistics PCA must equal numpy PCA on
    the collected matrix: same components (sign-fixed), same projected
    coordinates, orthonormal basis, descending explained variance."""
    import numpy as np

    from kmeans_mapreduce_spark.operators import pca
    from kmeans_mapreduce_spark.sources.loaders import load_table
    from tests.conftest import SF_SMOKE

    emb = load_table(spark, SF_SMOKE, "embeddings")
    mean, comps, evs = pca.pca_fit(emb, "embedding", k=8)
    W = np.array(comps)

    X = np.array(
        [r["embedding"] for r in emb.select("embedding").collect()],
        dtype=np.float64,
    )
    ref_mean = X.mean(axis=0)
    cov = np.cov(X, rowvar=False, ddof=1)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:8]
    ref = []
    for idx in order:
        vec = v[:, idx]
        j = int(np.argmax(np.abs(vec)))
        ref.append(vec if vec[j] >= 0 else -vec)
    ref = np.array(ref)

    assert np.allclose(mean, ref_mean, atol=1e-9)
    assert np.allclose(W, ref, atol=1e-6)
    assert np.allclose(W @ W.T, np.eye(8), atol=1e-9)  # orthonormal
    assert all(a >= b - 1e-12 for a, b in zip(evs, evs[1:]))  # sorted
    assert np.allclose(evs, [w[i] for i in order], atol=1e-6)

    got = {
        r["vec_id"]: r["pc"]
        for r in pca.pca_project(emb, mean, comps).collect()
    }
    ids = [r["vec_id"] for r in emb.select("vec_id").collect()]
    want = np.round((X - ref_mean) @ ref.T, 6)
    for i, vid in enumerate(ids):
        assert np.allclose(got[vid], want[i], atol=1e-5)


def test_pca_projection_variance_equals_eigenvalues(spark):
    import numpy as np

    from kmeans_mapreduce_spark.operators import pca
    from kmeans_mapreduce_spark.sources.loaders import load_table
    from tests.conftest import SF_SMOKE

    emb = load_table(spark, SF_SMOKE, "embeddings")
    mean, comps, evs = pca.pca_fit(emb, "embedding", k=4)
    P = np.array(
        [r["pc"] for r in pca.pca_project(emb, mean, comps).collect()]
    )
    assert np.allclose(P.var(axis=0, ddof=1), evs, rtol=1e-3)


def test_quality_checks_count_planted_violations(spark):
    from kmeans_mapreduce_spark.operators import quality as qc

    df = spark.createDataFrame(
        [(1, 10.0, "A"), (1, -5.0, "B"), (2, 50.0, None), (3, None, "zz")],
        "k LONG, price DOUBLE, status STRING",
    )
    rows = {
        r["check"]: (r["violations"], r["passed"])
        for r in qc.row_checks(
            df,
            [
                qc.not_null("status"),
                qc.in_range("price", 0.0, 100.0),
                qc.matches("status", "^[A-Z]$"),
            ],
        ).collect()
    }
    assert rows["not_null(status)"] == (1, False)
    # -5 out of range, NULL price counts as violation
    assert rows["in_range(price,0.0,100.0)"] == (2, False)
    # NULL and "zz" fail the regex
    assert rows["matches(status)"] == (2, False)

    uniq = qc.unique_check(df, "k").collect()[0]
    assert (uniq["violations"], uniq["passed"]) == (2, False)

    dim = spark.createDataFrame([(1,), (2,)], "k LONG")
    fk = qc.foreign_key_check(df, "k", dim, "k").collect()[0]
    assert (fk["violations"], fk["passed"]) == (1, False)


def test_quality_row_checks_single_scan_no_join(spark):
    from kmeans_mapreduce_spark import plans
    from kmeans_mapreduce_spark.operators import quality as qc
    from kmeans_mapreduce_spark.sources.loaders import load_table
    from tests.conftest import SF_SMOKE

    o = load_table(spark, SF_SMOKE, "orders")
    df = qc.row_checks(
        o, [qc.not_null("o_custkey"), qc.in_range("o_totalprice", 0.0, 1e6)]
    )
    plan = plans.explain_str(df)
    assert "Join" not in plan
    # one base scan feeds every check: the union re-reads the
    # checkpointed 1-row aggregate, never the table
    assert plan.count("Scan parquet") == 0
    assert "Scan ExistingRDD" in plan or "LocalTableScan" in plan


def test_surprisal_ranks_rare_tokens_above_common_prose(spark):
    from kmeans_mapreduce_spark.operators import textops as tx

    rows = [(i, "the cat sat on the mat") for i in range(20)]
    rows.append((99, "qzx wvu jkl ptd"))  # tokens that occur once each
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    got = {r["doc_id"]: r for r in tx.lm_surprisal(docs).collect()}
    assert got[99]["n_tokens"] == 4
    common = max(got[i]["bits_per_token"] for i in range(20))
    assert got[99]["bits_per_token"] > common + 1.0  # clearly separated


def test_table_digest_detects_each_divergence_class(spark):
    """digest_sum + digest_xor + n_rows together catch: corruption
    (both flip), a duplicated row (xor cancels at even copies — the
    sum and count still move), and reordering (nothing moves)."""
    rows = [(i, f"payload-{i}") for i in range(8)]
    schema = "id LONG, payload STRING"
    mk = lambda rs: spark.createDataFrame(rs, schema)
    dig = lambda df: sk.table_digest(
        df,
        F.concat(F.col("id").cast("string"), F.lit("|"), F.col("payload")),
        F.lit(0),
    ).collect()[0]
    base = dig(mk(rows))
    # order independence: reversed input → identical digest triple
    rev = dig(mk(rows[::-1]))
    assert (base["n_rows"], base["digest_sum"], base["digest_xor"]) == (
        rev["n_rows"], rev["digest_sum"], rev["digest_xor"])
    # single-row corruption flips both digests, count unchanged
    corrupt = dig(mk(rows[:3] + [(3, "payload-X")] + rows[4:]))
    assert corrupt["n_rows"] == base["n_rows"]
    assert corrupt["digest_sum"] != base["digest_sum"]
    assert corrupt["digest_xor"] != base["digest_xor"]
    # a row present twice: xor cancels back to the 7-row value, but
    # sum and count still catch it — why both digests ship
    dup = dig(mk(rows + [rows[0]]))
    without = dig(mk(rows[1:]))
    assert dup["digest_xor"] == without["digest_xor"]  # the xor blind spot
    assert dup["n_rows"] == base["n_rows"] + 1
    assert dup["digest_sum"] != base["digest_sum"]


def test_custdist_zero_bucket_survives_join_condition_filter(spark):
    """Q13's defining trap: the order-class predicate lives INSIDE the
    left-outer join condition — a customer whose every order is
    excluded must still appear in the 0-bucket (a WHERE after the join
    would silently drop them)."""
    from kmeans_mapreduce_spark.operators import relational as rel

    customer = spark.createDataFrame(
        [(1,), (2,), (3,)], "c_custkey LONG"
    )
    orders = spark.createDataFrame(
        [
            (10, 1, "2-HIGH"),
            (11, 1, "1-URGENT"),   # excluded
            (12, 2, "1-URGENT"),   # customer 2's ONLY order is excluded
        ],
        "o_orderkey LONG, o_custkey LONG, o_orderpriority STRING",
    )
    got = {
        r["c_count"]: r["custdist"]
        for r in rel.customer_order_histogram(customer, orders).collect()
    }
    # customer 1 -> 1 qualifying order; customers 2 (all excluded) and
    # 3 (no orders) -> the 0-bucket
    assert got == {1: 1, 0: 2}, got


def test_top_revenue_suppliers_emits_all_ties(spark):
    """Q15's argmax-with-ties contract: every supplier whose
    cents-rounded revenue equals the maximum is returned."""
    from kmeans_mapreduce_spark.operators import relational as rel

    supplier = spark.createDataFrame(
        [(1, "s1"), (2, "s2"), (3, "s3")], "s_suppkey LONG, s_name STRING"
    )
    rows = [
        # suppliers 1 and 2 tie at 100.00 revenue; supplier 3 lower
        (1, 100.0, 0.0, "1998-02-01"),
        (2, 50.0, 0.0, "1998-02-01"),
        (2, 50.0, 0.0, "1998-03-01"),
        (3, 10.0, 0.0, "1998-02-01"),
        (1, 999.0, 0.0, "1997-06-01"),  # outside the quarter
    ]
    lineitem = spark.createDataFrame(
        [(s, p, d, __import__("datetime").datetime.fromisoformat(ts))
         for s, p, d, ts in rows],
        "l_suppkey LONG, l_extendedprice DOUBLE, l_discount DOUBLE, "
        "l_shipdate TIMESTAMP",
    )
    got = {
        (r["s_suppkey"], r["total_revenue"])
        for r in rel.top_revenue_suppliers(supplier, lineitem).collect()
    }
    assert got == {(1, 100.0), (2, 100.0)}, got
