"""Plan-property regression tests: the scale contract, asserted.

Each test pins a physical-plan property that makes an operator viable
at 100 TB — column pruning reaching the parquet scan, dimension joins
broadcasting instead of shuffling, no accidental cartesian products,
narrow (shuffle-free) assignment. A change that silently breaks one of
these still passes value-correctness tests; these catch it.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kmeans_mapreduce_spark import plans
from kmeans_mapreduce_spark.operators import dedup as dd
from kmeans_mapreduce_spark.operators import kmeans as km
from kmeans_mapreduce_spark.sources.derive import points_2d
from kmeans_mapreduce_spark.sources.loaders import load_table

SF = "/root/testdata/sf0.001"


def test_points_scan_prunes_columns(spark):
    # lineitem has 16 columns; the point derivation needs 5
    cols = plans.scan_columns(points_2d(spark, SF))
    assert set(cols) == {
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        "l_suppkey",
        "l_extendedprice",
        "l_quantity",
    }


def test_filter_pushdown_reaches_scan(spark):
    df = load_table(spark, SF, "documents").filter(F.col("doc_id") < 10).select("doc_id")
    assert plans.has_pushed_filters(df)
    assert plans.scan_columns(df) == ["doc_id"]


def test_assign_is_narrow_no_join_no_shuffle(spark):
    df = km.assign(points_2d(spark, SF), [(0, 1.0, 1.0), (1, 9.0, 9.0)])
    plan = plans.explain_str(df)
    assert "Join" not in plan
    assert "Exchange" not in plan  # pure map: scan → project


def test_assign_df_broadcasts_centroids(spark):
    cents = spark.createDataFrame(
        [(0, 1.0, 1.0), (1, 9.0, 9.0)], "cid INT, cx DOUBLE, cy DOUBLE"
    )
    df = km.assign_df(points_2d(spark, SF), cents)
    assert plans.has_broadcast_join(df)
    assert not plans.has_cartesian(df)


def test_minhash_candidates_join_is_not_cartesian(spark):
    docs = load_table(spark, SF, "documents")
    cands = dd.candidate_pairs(dd.lsh_bands(dd.minhash_signatures(docs)))
    assert not plans.has_cartesian(cands)


def test_lsh_bands_from_array_is_shuffle_free(spark):
    # the long-format path pays a groupBy exchange to rebuild bands;
    # the array path must be a pure projection + explode
    docs = load_table(spark, SF, "documents")
    arr_plan = plans.explain_str(dd.lsh_bands_from_array(dd.minhash_signature_array(docs)))
    assert "Exchange" not in arr_plan
    long_plan = plans.explain_str(dd.lsh_bands(dd.minhash_signatures(docs)))
    assert long_plan.count("Exchange") >= 1


def test_lsh_band_paths_agree(spark):
    # identical (doc_id, band_id, band_hash) from both physical forms
    docs = load_table(spark, SF, "documents").limit(50)
    arr = dd.lsh_bands_from_array(dd.minhash_signature_array(docs))
    long = dd.lsh_bands(dd.minhash_signatures(docs))
    assert arr.exceptAll(long).count() == 0
    assert long.exceptAll(arr).count() == 0


def test_revenue_join_broadcasts_dimensions(spark):
    from kmeans_mapreduce_spark.operators import relational as rel

    df = rel.revenue_by_nation(
        load_table(spark, SF, "lineitem"),
        load_table(spark, SF, "orders"),
        load_table(spark, SF, "customer"),
        load_table(spark, SF, "nation"),
    )
    plan = plans.explain_str(df)
    assert not plans.has_cartesian(df)
    # customer and nation must build broadcast hash relations
    assert plan.count("BroadcastHashJoin") >= 2
    # grouped sum partially aggregates map-side
    assert plan.count("HashAggregate") >= 2


def test_pricing_summary_pushes_filter_and_combines_map_side(spark):
    """TPC-H Q1 shape: the shipdate predicate must reach the parquet
    scan (PushedFilters), the scan must prune to the 7 needed columns,
    and the tiny-cardinality groupBy must partially aggregate before
    the exchange — the shuffle carries O(groups), not O(rows)."""
    from kmeans_mapreduce_spark.operators import relational as rel

    df = rel.pricing_summary(load_table(spark, SF, "lineitem"))
    plan = plans.explain_str(df)
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan or "LessThanOrEqual(l_shipdate" in plan
    assert plan.count("HashAggregate") >= 2
    assert "partial_sum" in plan
    # column pruning: the scan schema must not include unused key cols
    assert "l_orderkey" not in plan.split("ReadSchema")[1][:400]


def test_recompute_has_partial_aggregation(spark):
    df = km.recompute(km.assign(points_2d(spark, SF), [(0, 1.0, 1.0)]))
    plan = plans.explain_str(df)
    # partial+final HashAggregate pair = map-side combine the reference
    # lacks (its shuffle carries every point, mapper.py:53-74)
    assert plan.count("HashAggregate") >= 2
    assert "partial_avg" in plan or "partial_average" in plan.lower()


def test_topk_forms_agree_and_dispatch(spark):
    """The window and grouped top-k forms return identical rows, and
    auto-dispatch picks window for small Q / grouped (no Window exec,
    partial-aggregated) for large Q."""
    from kmeans_mapreduce_spark.operators import similarity as sim

    emb = load_table(spark, SF, "embeddings")
    qids = [0, 1, 2, 3]
    winf = sim.cosine_topk(emb, qids, k=3, form="window")
    grpf = sim.cosine_topk(emb, qids, k=3, form="grouped")
    assert winf.exceptAll(grpf).count() == 0
    assert grpf.exceptAll(winf).count() == 0

    win_plan = plans.explain_str(winf)
    grp_plan = plans.explain_str(grpf)
    assert "Window" in win_plan
    assert "Window" not in grp_plan
    assert grp_plan.count("ObjectHashAggregate") >= 2  # partial collect_list

    auto_small = plans.explain_str(sim.cosine_topk(emb, qids, k=3))
    assert "Window" in auto_small
    many = list(range(sim.SMALL_Q + 1))
    auto_large = plans.explain_str(sim.cosine_topk(emb, many, k=3))
    assert "Window" not in auto_large


def test_asof_join_is_join_free(spark):
    """The as-of operator is a union + one user-keyed window — there
    must be NO join operator (the naive per-row range-scan join is the
    plan this operator exists to avoid)."""
    from kmeans_mapreduce_spark.operators import events as ev

    df = ev.asof_latest(load_table(spark, SF, "events"), "click", "purchase")
    plan = plans.explain_str(df)
    assert "Join" not in plan
    assert "Window" in plan


def test_range_join_is_bucketed_equi_join(spark):
    """The bounded range join must execute as an equi-join on
    (user, bucket) with a residual filter — never a cartesian or
    broadcast-nested-loop theta join."""
    from kmeans_mapreduce_spark.operators import events as ev

    df = ev.range_join_counts(load_table(spark, SF, "events"), "click", "purchase", 3600)
    plan = plans.explain_str(df)
    assert not plans.has_cartesian(df)
    assert "BroadcastNestedLoopJoin" not in plan


def test_hash_sample_is_narrow_and_deterministic(spark):
    """Hash-bucket sampling must be a pure narrow filter (no shuffle,
    no rand) and return the identical row set on re-execution."""
    from kmeans_mapreduce_spark.operators import sampling as sp

    docs = load_table(spark, SF, "documents")
    s = sp.hash_sample_stratified(docs, {"en": 0.5}, 0.1)
    plan = plans.explain_str(s)
    assert "Exchange" not in plan
    assert "rand" not in plan.lower()
    a = sorted(r["doc_id"] for r in s.select("doc_id").collect())
    b = sorted(r["doc_id"] for r in s.select("doc_id").collect())
    assert a == b and len(a) > 0


def test_partitioned_fact_join_uses_dynamic_partition_pruning(spark, tmp_path):
    """Joining a partitioned fact table to a filtered dim must prune
    fact partitions AT RUNTIME (Catalyst DPP): the fact scan carries a
    dynamicpruning subquery on the partition column instead of reading
    every partition and filtering post-join — at 100 TB this is the
    difference between touching one directory and the whole lake."""
    import pyspark.sql.functions as F

    li = load_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_quantity"
    )
    fact_path = str(tmp_path / "li_by_flag")
    li.write.mode("overwrite").partitionBy("l_returnflag").parquet(fact_path)
    fact = spark.read.parquet(fact_path)
    dim = spark.createDataFrame(
        [("A", "keep"), ("R", "drop")], "l_returnflag STRING, tag STRING"
    ).filter(F.col("tag") == "keep")
    # broadcast the dim explicitly: at test scale the fact side is tiny
    # enough that Spark would otherwise broadcast IT, and DPP only
    # fires on the probe side of a broadcast join
    joined = fact.join(F.broadcast(dim), "l_returnflag").groupBy("tag").agg(
        F.sum("l_quantity").alias("q")
    )
    plan = plans.explain_str(joined)
    assert "dynamicpruning" in plan.lower()


def test_bpe_count_and_shuffle_are_narrow_pruned_scans(spark):
    """The two corpus-wide per-row ops (BPE-ish token count, epoch
    shuffle key) must stay pure narrow maps with column pruning to
    their two input columns — at 100 TB either picking up an Exchange
    or scanning all columns would dominate the job."""
    from kmeans_mapreduce_spark.operators import sampling as sp
    from kmeans_mapreduce_spark.operators import textops as tx

    docs = load_table(spark, SF, "documents")
    bpe = tx.token_stats_bpe(docs)
    assert "Exchange" not in plans.explain_str(bpe)
    assert set(plans.scan_columns(bpe)) == {"doc_id", "text"}
    shuf = sp.global_shuffle(docs)
    assert "Exchange" not in plans.explain_str(shuf)
    assert plans.scan_columns(shuf) == ["doc_id"]
    # the BPE segment APPLY (M-deep literal replace chain) is the same
    # contract: zero-shuffle codegen projection over (doc_id, text)
    seg = tx.bpe_segment_stats(
        docs, [("ab", ""), ("c", "")]
    )
    assert "Exchange" not in plans.explain_str(seg)
    assert set(plans.scan_columns(seg)) == {"doc_id", "text"}


def test_global_topk_is_take_ordered_not_full_sort(spark):
    """ORDER BY + LIMIT must run as TakeOrderedAndProject (per-partition
    top-K heaps, driver merge) — not a full global sort-shuffle."""
    from kmeans_mapreduce_spark.extensions import q_text_top_quality

    plan = plans.explain_str(q_text_top_quality(spark, SF))
    assert "TakeOrderedAndProject" in plan


def test_minhash_signature_forms_agree(spark):
    """The pandas and Catalyst signature builders must emit bit-identical
    signatures (same md5 base hash, same int64 family arithmetic)."""
    docs = load_table(spark, SF, "documents").limit(100)
    a = {r["doc_id"]: list(r["sig"]) for r in dd.minhash_signature_array(docs, impl="pandas").collect()}
    b = {r["doc_id"]: list(r["sig"]) for r in dd.minhash_signature_array(docs, impl="expr").collect()}
    assert a == b and len(a) == 100


def test_salted_join_matches_unsalted(spark):
    """Salting must not change the join result — one hot key (80% of
    the left side) spread across salt buckets still produces exactly
    the unsalted output, including duplicate right-side matches."""
    from kmeans_mapreduce_spark.operators import relational as rel

    left = spark.createDataFrame(
        [(0 if i < 800 else i % 50, i) for i in range(1000)], "k LONG, lv LONG"
    )
    right = spark.createDataFrame(
        [(k, k * 10) for k in range(50)] + [(0, -1)], "k LONG, rv LONG"
    )
    salted = sorted(
        map(tuple, rel.salted_join(left, right, "k", salt=8).collect())
    )
    plain = sorted(map(tuple, left.join(right, "k").collect()))
    assert salted == plain and len(plain) > 1000  # hot key matched twice


def test_aqe_splits_skewed_join_partition(spark):
    """Scale contract for skew the engine does NOT hand-salt: AQE's
    skew-join rule must kick in on a hot key and split the oversized
    partition (SortMergeJoin(skew=true) in the final adaptive plan).
    salted_join covers the manual path; this pins the automatic one."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    saved = {}
    for k, v in confs.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        # 150k rows on ONE hot key vs a uniform right side
        left = spark.range(0, 160_000).select(
            F.when(F.col("id") < 150_000, F.lit(7))
            .otherwise(F.col("id") % 100)
            .alias("k"),
            F.concat(F.lit("payload-"), F.col("id").cast("string")).alias("pl"),
        )
        right = spark.range(0, 100).select(
            F.col("id").alias("k"), F.col("id").alias("rv")
        )
        joined = left.join(right, "k")
        # execute THIS dataset so its own AdaptiveSparkPlan finalizes
        # (count() would plan and run a different Dataset)
        assert len(joined.collect()) == 160_000
        final_plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in final_plan, final_plan[:2000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_incremental_dedup_band_probe_broadcasts(spark):
    # the new-batch band side must broadcast onto the historical index
    # (the persisted-index production shape) — a shuffled band join
    # would exchange the whole history every night
    docs = load_table(spark, SF, "documents")
    df = dd.incremental_minhash_pairs(docs, threshold=0.2)
    assert plans.has_broadcast_join(df)
    assert not plans.has_cartesian(df)


def test_cross_snapshot_dedup_band_probe_broadcasts(spark):
    # two-snapshot variant of the incremental probe: the (small) new
    # side's bands broadcast onto the historical band index exactly
    # like the split-based plan — shared _cross_band_pairs core
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    new = docs.filter(F.col("doc_id") % 5 == 0)
    old = docs.filter(F.col("doc_id") % 5 != 0)
    df = dd.cross_snapshot_minhash_pairs(new, old, threshold=0.2)
    assert plans.has_broadcast_join(df)
    assert not plans.has_cartesian(df)


def test_dsir_bucket_scores_broadcast_back(spark):
    # the ≤n_buckets scored table must broadcast onto the token
    # explode; a shuffle join would exchange the corpus by bucket
    from kmeans_mapreduce_spark.operators import selection as sel

    docs = load_table(spark, SF, "documents")
    df = sel.dsir_logweights(docs)
    assert plans.has_broadcast_join(df)
    assert not plans.has_cartesian(df)


def test_bpe_merges_is_take_ordered(spark):
    # corpus-wide top-k must be per-partition heaps + driver merge,
    # never a full global sort-shuffle
    from kmeans_mapreduce_spark.operators import textops as tx

    docs = load_table(spark, SF, "documents")
    s = plans.explain_str(tx.bpe_merge_candidates(docs), "simple")
    assert "TakeOrderedAndProject" in s


def test_span_dedup_has_no_self_join(spark):
    # span dedup must stay linear: one explode, one keep-first window,
    # one re-aggregate — no self-join, no cartesian anywhere
    docs = load_table(spark, SF, "documents")
    df = dd.span_dedup(docs)
    s = plans.explain_str(df, "simple")
    assert not plans.has_cartesian(df)
    assert "SortMergeJoin" not in s and "ShuffledHashJoin" not in s


def test_substring_dedup_has_no_self_join(spark):
    # ExactSubstr must stay linear in the corpus: stride-1 window
    # generate, one keep-first window, covered-position explode, one
    # token-level anti-join — never a doc×doc self-join or cartesian
    docs = load_table(spark, SF, "documents")
    df = dd.substring_dedup(docs)
    s = plans.explain_str(df, "simple")
    assert not plans.has_cartesian(df)
    assert "SortMergeJoin Inner" not in s and "ShuffledHashJoin Inner" not in s
    assert "LeftAnti" in s  # the covered-token cut is an anti-join


def test_token_shard_plan_offsets_broadcast_back(spark):
    # the <=n_buckets offset table must broadcast onto the corpus scan;
    # a shuffled join would exchange the corpus a second time, and the
    # prefix-sum must never move the DATA through a single partition
    # (only the constant-size bucket-totals rollup may)
    from kmeans_mapreduce_spark.operators import sampling as sp

    docs = load_table(spark, SF, "documents")
    df = sp.token_shard_plan(docs)
    assert plans.has_broadcast_join(df)
    assert not plans.has_cartesian(df)


def test_vocab_coverage_truncates_before_ranking(spark):
    # the corpus-sized vocabulary must reach the rank window only
    # after TakeOrdered truncation to max(vs) rows — never a full
    # global sort of all token types
    from kmeans_mapreduce_spark.operators import textops as tx

    docs = load_table(spark, SF, "documents")
    s = plans.explain_str(tx.vocab_coverage(docs), "simple")
    assert "TakeOrderedAndProject" in s


def test_bm25_never_exchanges_the_corpus(spark):
    """BM25's only exchanges are the 1-row stats aggregate and its
    broadcast: no hashpartitioning exchange keyed by doc/term, no
    token explode, top-k via TakeOrderedAndProject. The tf/dl
    projection sits behind a localCheckpoint (both the stats and the
    scoring pass consume it), so the parquet-scan shape is asserted on
    the pre-checkpoint projection and the downstream contract on the
    full query."""
    from kmeans_mapreduce_spark.operators import textops as tx

    docs = load_table(spark, SF, "documents")
    plan = plans.explain_str(tx.bm25_topk(docs, ["dup", "hash", "merge"]))
    assert "Exchange hashpartitioning" not in plan
    assert "TakeOrderedAndProject" in plan
    assert "Generate" not in plan  # no explode anywhere
    proj = docs.select(
        "doc_id",
        F.size(F.split(F.coalesce(F.col("text"), F.lit("")), " ")).alias("dl"),
    )
    assert plans.scan_columns(proj) == ["doc_id", "text"]


def test_int8_quantization_is_narrow(spark):
    """quantize_int8 is scan → project → posexplode: no join, no
    exchange of any kind."""
    from kmeans_mapreduce_spark.operators.similarity import quantize_int8

    emb = load_table(spark, SF, "embeddings")
    plan = plans.explain_str(quantize_int8(emb))
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_int8_topk_broadcasts_probes_only(spark):
    """int8_cosine_topk: the corpus side reaches the probe join with no
    hash exchange — only the broadcast of the quantized query rows and
    the small top-k window shuffle keyed by query_id."""
    from kmeans_mapreduce_spark.operators.similarity import int8_cosine_topk

    emb = load_table(spark, SF, "embeddings")
    df = int8_cosine_topk(emb, [0, 1, 2, 3], k=5)
    plan = plans.explain_str(df)
    assert plans.has_broadcast_join(df)
    assert not plans.has_cartesian(df)
    # the only hashpartitioning exchange is the query_id-keyed window
    import re

    keys = re.findall(r"Exchange hashpartitioning\(([a-zA-Z_0-9#]+)", plan)
    assert all(k.startswith("query_id") for k in keys), keys


def test_priority_check_is_semi_join_with_pushed_quarter(spark):
    """The Q4-shape EXISTS must run as ONE left-semi hash join (the
    inequality riding as residual), never a correlated rescan or a
    cartesian; the quarter predicate must reach the orders scan."""
    from kmeans_mapreduce_spark.operators import relational as rel

    df = rel.order_priority_check(
        load_table(spark, SF, "orders"), load_table(spark, SF, "lineitem")
    )
    plan = plans.explain_str(df)
    assert "LeftSemi" in plan
    assert not plans.has_cartesian(df)
    assert "BroadcastNestedLoopJoin" not in plan
    assert plans.has_pushed_filters(df)


def test_promo_share_broadcasts_the_dimension(spark):
    """Q14 shape: part is the broadcast side — the month-filtered fact
    never shuffles for the join (no Exchange below the join)."""
    from kmeans_mapreduce_spark.operators import relational as rel

    df = rel.promo_revenue_share(
        load_table(spark, SF, "lineitem"), load_table(spark, SF, "part")
    )
    plan = plans.explain_str(df)
    assert "BroadcastHashJoin" in plan
    assert not plans.has_cartesian(df)


def test_m4_window_and_aggregate_share_one_exchange(spark):
    """m4_downsample's window sort and its aggregate key on the same
    (event_type, bucket) — the aggregate must reuse the window's
    shuffle, so the whole plan carries exactly ONE hash exchange (plus
    zero joins): the O(types×buckets) output never costs a second
    corpus shuffle."""
    from kmeans_mapreduce_spark.operators import events as ev

    import re

    e = load_table(spark, SF, "events")
    plan = plans.explain_str(ev.m4_downsample(e))
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1
    assert "hashpartitioning(event_type" in plan
    assert "Join" not in plan


def test_exact_quantiles_single_exchange(spark):
    """exact_quantiles: one type-keyed shuffle feeds both the window
    sort and the same-keyed aggregate."""
    from kmeans_mapreduce_spark.operators import events as ev

    import re

    e = load_table(spark, SF, "events")
    plan = plans.explain_str(ev.exact_quantiles(e))
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1
    assert "hashpartitioning(event_type" in plan
    assert "Join" not in plan


def test_twa_single_user_exchange(spark):
    """time_weighted_avg: the lead() window's user-keyed shuffle is
    reused by the user-keyed aggregate — one exchange, no join."""
    from kmeans_mapreduce_spark.operators import events as ev

    import re

    e = load_table(spark, SF, "events")
    plan = plans.explain_str(ev.time_weighted_avg(e))
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1
    assert "hashpartitioning(user_id" in plan
    assert "Join" not in plan


def test_rolling_active_never_explodes_raw_events(spark):
    """rolling_active_users: the sequence explode must sit ABOVE the
    distinct (day,user) aggregate, not on raw events — the plan's
    Generate node consumes an aggregated child."""
    from kmeans_mapreduce_spark.operators import events as ev

    e = load_table(spark, SF, "events")
    plan = plans.explain_str(ev.rolling_active_users(e))
    gen = plan.find("Generate")
    agg = plan.find("HashAggregate")
    assert gen != -1 and agg != -1
    # formatted plans list operators leaves-last: the first
    # HashAggregate printed is the plan root's side; instead assert
    # via the simple string that Generate's child is an Aggregate
    simple = plans.explain_str(ev.rolling_active_users(e), mode="simple")
    import re
    m = re.search(r"Generate explode[\s\S]{0,400}?(HashAggregate|Exchange)", simple)
    assert m is not None and "HashAggregate" in m.group(0)


def test_radius_join_is_broadcast_equi_no_bnlj(spark):
    """The spatial radius join must block on grid cells: broadcast
    probe side, cell equi-join, d² as a residual — never a
    BroadcastNestedLoopJoin or cartesian over the corpus."""
    from kmeans_mapreduce_spark.operators import relational as rel
    from kmeans_mapreduce_spark.queries import K4_CENTERS
    from kmeans_mapreduce_spark.sources.derive import points_2d

    df = rel.radius_join_counts(points_2d(spark, SF), K4_CENTERS)
    plan = plans.explain_str(df)
    assert "BroadcastHashJoin" in plan
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_url_dedup_prunes_scan_and_avoids_cartesian(spark):
    """corpus_url_dedup's plan contract: the synth+canonicalize stage
    prunes the documents scan to exactly (doc_id, source) — the synth
    expression's only inputs — and the rank/host-count stages join on
    keys (no cartesian / nested-loop fallback). The host count is a
    partial-aggregated groupBy joined back (not a window over host),
    the shape AQE skew-split can handle on a hot host."""
    from kmeans_mapreduce_spark.extensions import q_corpus_url_dedup

    df = q_corpus_url_dedup(spark, SF)
    s = plans.explain_str(df)
    assert set(plans.scan_columns(df)) == {"doc_id", "source"}
    assert "CartesianProduct" not in s
    assert "BroadcastNestedLoopJoin" not in s
    # exactly one window operator (url_rank over canon_url) in the
    # physical plan; host_docs must NOT be a second window
    simple = plans.explain_str(df, "simple")
    assert simple.count("Window") == 1, simple


def test_frontdoor_funnel_has_no_window_one_corpus_exchange(spark):
    """pipeline_crawl_frontdoor's hot-host contract (r12 verdict task
    5): the funnel must contain ZERO Window operators — a window over
    host pins a hot host's every row in one task and AQE cannot split
    window partitions — and the only corpus-keyed exchange is
    hashpartitioning(canon_url); the host-level aggregate runs over
    canonical-url GROUP rows with map-side partial aggregation."""
    import re

    from kmeans_mapreduce_spark.extensions import q_pipeline_crawl_frontdoor

    df = q_pipeline_crawl_frontdoor(spark, SF)
    simple = plans.explain_str(df, "simple")
    assert "Window" not in simple, simple
    # corpus-keyed exchanges: hashpartitioning on canon_url only —
    # every other exchange is over group/host-level aggregate rows or
    # the final single-row cross join
    hashes = re.findall(r"hashpartitioning\(([^),]+)", simple)
    keys = {h.split("#")[0].strip() for h in hashes}
    assert "canon_url" in keys, simple
    assert "doc_id" not in keys and "url" not in keys, keys
    # partial aggregation is present (map-side combine absorbs a hot
    # host before any exchange)
    assert "partial_count" in plans.explain_str(df) or "HashAggregate" in simple
    # r15: every aggregate must be hash-based — the r14 struct-MIN rep
    # forced SortAggregate, i.e. a full-corpus sort before the partial
    # aggregate (min_by over scalar longs restores mutable buffers)
    assert "SortAggregate" not in simple, simple


def test_min_cost_supplier_broadcasts_dims_no_cartesian(spark):
    """Q2 shape: the decorrelated min-cost chain must broadcast every
    dimension (supplier/nation/region/part), never cartesian or
    nested-loop over the fact, and take the final top-N as
    TakeOrderedAndProject, not a global sort."""
    from kmeans_mapreduce_spark.extensions import q_join_min_cost_supplier

    df = q_join_min_cost_supplier(spark, SF)
    s = plans.explain_str(df)
    assert "BroadcastHashJoin" in s
    assert "CartesianProduct" not in s
    assert "BroadcastNestedLoopJoin" not in s
    assert "TakeOrderedAndProject" in s
    # r15: the per-part argmin is a window over hash-aggregated pair
    # rows — the r14 struct-MIN forced SortAggregate (Sort + Exchange
    # + Sort); keep every aggregate in this plan hash-based
    assert "SortAggregate" not in s, s
    assert "HashAggregate" in s


def test_phash_pairs_join_is_not_cartesian(spark):
    """The pHash near-dup self-join must be the banded equi-join
    (candidates keyed on (band, value)), never a cartesian — the same
    contract as simhash/minhash."""
    from kmeans_mapreduce_spark.operators import multimodal as mm

    docs = load_table(spark, SF, "documents")
    pairs = dd.hamming_banded_pairs(
        mm.image_phash(mm.images_with_planted_copies(docs)),
        "phash",
        bits=mm.PHASH_BITS,
        max_hamming=mm.PHASH_MAX_HAMMING,
        id_col="media_id",
        out_prefix="media",
    )
    assert not plans.has_cartesian(pairs)


def test_waiting_suppliers_semi_anti_no_rescan(spark):
    """Q21 shape contract: the EXISTS/NOT-EXISTS pair must plan as
    LEFT SEMI + LEFT ANTI hash joins on the order key (residual
    supplier inequality inside the join), never a cartesian and never
    a correlated per-row rescan; supplier and nation broadcast."""
    from kmeans_mapreduce_spark.operators import relational as rel

    df = rel.waiting_suppliers(
        load_table(spark, SF, "supplier"),
        load_table(spark, SF, "nation"),
        load_table(spark, SF, "orders"),
        load_table(spark, SF, "lineitem"),
    )
    plan = plans.explain_str(df)
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan
    assert not plans.has_cartesian(df)
    assert plan.count("BroadcastHashJoin") >= 2  # supplier + nation
    # the joined fact is localCheckpointed (r14 review finding): its
    # three uses must NOT re-execute the orders⋈lineitem join — after
    # the checkpoint the visible plan contains no parquet fact scans
    assert plan.count("lineitem.parquet") == 0, "fact join re-executed"


def test_excess_stock_single_fact_scan_window_total(spark):
    """Q20 shape contract: the correlated per-part aggregate is a
    window SUM over the already-aggregated pair table — exactly one
    lineitem scan in the whole plan — with part broadcast and no
    cartesian."""
    from kmeans_mapreduce_spark.operators import relational as rel

    df = rel.excess_stock_suppliers(
        load_table(spark, SF, "supplier"),
        load_table(spark, SF, "lineitem"),
        load_table(spark, SF, "part"),
    )
    plan = plans.explain_str(df)
    assert plan.count("lineitem.parquet") == 1, plan
    assert "Window" in plan
    assert not plans.has_cartesian(df)
    assert plan.count("BroadcastHashJoin") >= 2  # part + supplier


def test_custdist_and_top_revenue_plan_shapes(spark):
    """Q13: one outer hash join + two aggregates, no cartesian.
    Q15: broadcast 1-row max + broadcast supplier, no cartesian, no
    window over the fact."""
    from kmeans_mapreduce_spark.operators import relational as rel

    q13 = rel.customer_order_histogram(
        load_table(spark, SF, "customer"), load_table(spark, SF, "orders")
    )
    p13 = plans.explain_str(q13)
    assert not plans.has_cartesian(q13)
    assert "LeftOuter" in p13
    assert p13.count("HashAggregate") >= 4  # partial+final x two levels

    q15 = rel.top_revenue_suppliers(
        load_table(spark, SF, "supplier"), load_table(spark, SF, "lineitem")
    )
    p15 = plans.explain_str(q15)
    assert not plans.has_cartesian(q15)
    assert p15.count("BroadcastHashJoin") >= 1  # supplier lookup
    assert "Window" not in p15


def test_supplier_cnt_anti_broadcast_distinct(spark):
    """Q16 shape contract: blacklist NOT-IN as a broadcast LEFT ANTI,
    part dim pruned then broadcast, two-phase COUNT(DISTINCT) — no
    cartesian, fact scanned once."""
    from kmeans_mapreduce_spark.operators import relational as rel

    df = rel.supplier_count_by_part_class(
        load_table(spark, SF, "part"),
        load_table(spark, SF, "lineitem"),
        load_table(spark, SF, "supplier"),
    )
    plan = plans.explain_str(df)
    assert not plans.has_cartesian(df)
    assert "LeftAnti" in plan
    assert plan.count("BroadcastHashJoin") >= 2  # blacklist + part dim
    assert plan.count("lineitem.parquet") == 1, "fact scanned once"
