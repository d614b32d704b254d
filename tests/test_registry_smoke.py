"""Registry-wide smoke: EVERY queries() entry must execute at sf0.001
and return a stable schema — the cheap guard against runtime breaks
(renamed columns, broken imports, bad plans) in queries the oracle
sweep isn't run on in CI. Value correctness lives in
tools/check_oracle.py; this only proves the surface executes.
"""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"

# iterative / heavyweight entries exercised by their own dedicated
# tests — excluded here to keep the smoke pass fast
SLOW = {
    "kmeans_fit",
    "kmeans_fit_kmpp",
    "kmeans_nd_fit",
    "kmeans_nd_fit_fixed",
    "kmeans_fit_fixed",
    "kmeans_mllib",
    "corpus_quality_classifier",
}


def _registry():
    import __spark_entry__ as entry

    q = entry.queries()
    return sorted(n for n in q if n not in SLOW)


def test_oracle_keys_subset_of_queries():
    import __spark_entry__ as entry

    q, o = entry.queries(), entry.oracle_sql()
    assert set(o) <= set(q), sorted(set(o) - set(q))


def test_bench_never_clobbers_better_conditioned_artifact(tmp_path):
    """r14 verdict task 2 + r15 verdict task 3a: a worse-conditioned
    degraded rerun must never overwrite a better-conditioned artifact —
    neither a clean one (r13's 153.99 s baseline replaced by a
    7.13%-steal rerun) nor a better degraded one (r15: the driver's
    2.73%-steal run displaced the builder's committed 1.76%-steal
    artifact). Clean runs always write through; diverted filenames
    take an attempt counter (ADVICE r15)."""
    import json

    from bench import _divert_if_worse_conditioned

    p = tmp_path / "bench_r99.json"

    def run(health, steal=None, gbps=None):
        d = {"health": {"verdict": health, "reasons": []}}
        if steal is not None:
            d["cpu_steal_pct"] = steal
        if gbps is not None:
            d["mem_stream_gbps_start"] = gbps
            d["mem_stream_gbps_end"] = gbps
        return d

    # no prior artifact: write through
    assert _divert_if_worse_conditioned(str(p), run("degraded")) == str(p)
    p.write_text(json.dumps(run("clean", 0.1, 11.0)))
    # clean prior + degraded new: divert
    assert _divert_if_worse_conditioned(
        str(p), run("degraded", 2.0, 10.0)
    ) == str(tmp_path / "bench_r99_degraded.json")
    # a SECOND diverted rerun takes an attempt counter, never silently
    # overwriting the first diverted artifact (ADVICE r15)
    (tmp_path / "bench_r99_degraded.json").write_text("{}")
    assert _divert_if_worse_conditioned(
        str(p), run("degraded", 2.0, 10.0)
    ) == str(tmp_path / "bench_r99_degraded2.json")
    # clean prior + clean new: write through (fresher clean run wins)
    assert _divert_if_worse_conditioned(str(p), run("clean", 0.5)) == str(p)
    # degraded prior 1.76% steal: a WORSE degraded run (2.73%) diverts,
    # a better one (0.5%) and a clean one write through (counter skips
    # only files that EXIST — _degraded2 was returned but never written)
    p.write_text(json.dumps(run("degraded", 1.76, 10.0)))
    assert _divert_if_worse_conditioned(
        str(p), run("degraded", 2.73, 10.0)
    ) == str(tmp_path / "bench_r99_degraded2.json")
    assert _divert_if_worse_conditioned(
        str(p), run("degraded", 0.5, 10.0)
    ) == str(p)
    assert _divert_if_worse_conditioned(str(p), run("clean", 0.2)) == str(p)
    # legacy prior with NO health key = unknown-conditioned: stays
    # replaceable even by a degraded run (explicit ADVICE r15 decision)
    p.write_text(json.dumps({"value": 1.0}))
    assert _divert_if_worse_conditioned(
        str(p), run("degraded", 2.0, 10.0)
    ) == str(p)


def test_bench_stdout_line_anchors_prev_round_queries(tmp_path):
    """r15 verdict task 3b: the budgeted stdout line's slowest-first
    fill made PERF blind to wins — a query that sped up fell off the
    line and was filed "dropped_from_bench" (12 phantom drops in r15).
    The anchor helper must return exactly the PREVIOUS round's
    parsed-line names so they print first."""
    import json

    from bench import _prev_round_stdout_queries

    (tmp_path / "BENCH_r07.json").write_text(
        json.dumps({"parsed": {"queries": {"old_q": 1.0}}})
    )
    (tmp_path / "BENCH_r15.json").write_text(
        json.dumps({"parsed": {"queries": {"q_a": 2.0, "q_b": 0.5}}})
    )
    # latest round BELOW the current one wins
    assert _prev_round_stdout_queries(str(tmp_path), "16") == {"q_a", "q_b"}
    # current-or-later artifacts are ignored (never anchor on self)
    (tmp_path / "BENCH_r16.json").write_text(
        json.dumps({"parsed": {"queries": {"self_q": 1.0}}})
    )
    assert _prev_round_stdout_queries(str(tmp_path), "16") == {"q_a", "q_b"}
    # unparseable prev degrades to no anchors, never raises
    (tmp_path / "BENCH_r15.json").write_text("not json")
    assert _prev_round_stdout_queries(str(tmp_path), "16") == set()


def test_bench_badness_orders_unknown_steal_worst():
    """ADVICE r14: a pass with no steal sample is UNKNOWN, not
    0%-steal — in the both-degraded tie-break it must lose to any
    measured steal, and the DRAM stream rate breaks remaining ties."""
    from bench import _badness

    def mm(steal, gbps, verdict="degraded"):
        extra = {"health": {"verdict": verdict, "reasons": []}}
        if steal is not None:
            extra["cpu_steal_pct"] = steal
        if gbps is not None:
            extra["mem_stream_gbps_start"] = gbps
            extra["mem_stream_gbps_end"] = gbps
        return extra

    # the REAL module-level function (ADVICE r15: no source-grep pins,
    # no re-implementation): degraded flag, then steal (None sorts
    # worst), then -min(gbps)
    assert _badness(mm(5.0, 10.0)) < _badness(mm(None, 10.0))
    assert _badness(mm(2.0, 11.0)) < _badness(mm(2.0, 3.0))
    assert _badness(mm(0.1, 11.0, "clean")) < _badness(mm(0.0, 11.0))
    # no-health-key legacy artifact = unknown: loses to any measured
    # run, clean or degraded-with-samples
    assert _badness(mm(0.1, 11.0, "clean")) < _badness({})
    assert _badness(mm(2.0, 10.0)) < _badness({})


def test_bench_accounting_is_a_partition():
    """No query silently falls through the bench: every registry entry
    is either tracked by bench.py (BENCH_EXTENSION_QUERIES or a core
    timed entry) or carries a written reason in BENCH_EXCLUDED_REASONS.
    Round 11 found kmeans_wssse listed for the bench but never run
    (bench.py iterated only extension_queries()); this partition makes
    that class of silent gap impossible, and also catches stale names
    left behind when a query is renamed or removed."""
    import __spark_entry__ as entry
    from kmeans_mapreduce_spark.queries import (
        BENCH_EXCLUDED_REASONS,
        BENCH_EXTENSION_QUERIES,
    )

    q = set(entry.queries())
    core_benched = {"kmeans_assign"}  # timed directly by bench.py
    benched = BENCH_EXTENSION_QUERIES | core_benched
    excluded = set(BENCH_EXCLUDED_REASONS)
    assert not benched & excluded, sorted(benched & excluded)
    assert benched <= q, f"stale bench names: {sorted(benched - q)}"
    assert excluded <= q, f"stale excluded names: {sorted(excluded - q)}"
    missing = q - benched - excluded
    assert not missing, f"silently unbenched, no reason: {sorted(missing)}"
    empty = [n for n in excluded if not BENCH_EXCLUDED_REASONS[n].strip()]
    assert not empty, f"empty reasons: {empty}"


def test_driver_window_samples_every_family():
    """The grading driver verifies only the first 50 queries() entries;
    that prefix must (a) exactly realize DRIVER_WINDOW_QUERIES — every
    listed name registered, no typos silently shrinking the window —
    and (b) keep one representative of each operator family inside the
    window, with all but the declared rows-only queries oracle-gated."""
    import __spark_entry__ as entry
    from kmeans_mapreduce_spark.queries import DRIVER_WINDOW_QUERIES

    q, o = entry.queries(), entry.oracle_sql()
    assert len(DRIVER_WINDOW_QUERIES) == 50
    missing = [n for n in DRIVER_WINDOW_QUERIES if n not in q]
    assert not missing, f"window names not registered: {missing}"
    first50 = list(q)[:50]
    assert first50 == DRIVER_WINDOW_QUERIES

    # round-12 rotation: representatives follow the rotated window —
    # anchors where the family keeps one, a growth or canary pick
    # otherwise
    families = {
        "core-loop": "kmeans_fit_fixed",
        "minhash-lsh": "dedup_minhash_pairs",
        "semantic-dedup": "dedup_semantic_trained",
        "ivf-ann": "similarity_ann_ivf",
        "pq-ann": "similarity_ann_pq_rerank_trained",
        "trained-serving": "similarity_ann_ivf_trained",
        "hybrid-rrf": "similarity_hybrid_rrf",
        "multimodal": "multimodal_meta",
        "multimodal-video": "multimodal_mjpeg",
        "multimodal-audio": "multimodal_audio",
        "text": "text_quality",
        "url-dedup": "corpus_url_dedup",
        "sampling": "corpus_temperature_mix",
        "embeddings-quant": "embeddings_binary_quant",
        "events": "events_exact_quantiles",
        "time-travel": "table_time_travel",
        "streaming": "events_stream_replay",
        "streaming-stateful": "events_stream_native_dedup_replay",
        # round-13 promotions + growth (kept one more round)
        "free-fit-gate": "kmeans_fit",
        "nd-free-fit-gate": "kmeans_nd_fit",
        "pca-gate": "embeddings_pca",
        "streaming-tws": "events_stream_ttl_dedup_tws_replay",
        "line-dedup": "corpus_line_dedup",
        "q2-join": "join_min_cost_supplier",
        "anomaly": "events_anomaly_mad",
        "observe": "events_observed_metrics",
        # round-14 growth (gated from this round)
        "image-near-dup": "multimodal_phash_pairs",
        "audio-near-dup": "multimodal_afp_pairs",
        "video-near-dup": "multimodal_video_phash",
        "image-dedup-funnel": "pipeline_image_dedup",
        "q21-join": "join_waiting_suppliers",
        "q20-join": "join_excess_stock",
        "q13-join": "join_custdist",
        "q15-join": "join_top_revenue_supplier",
        "q16-join": "join_supplier_cnt",
        "streaming-outer-join": "events_stream_join_outer_replay",
    }
    for fam, name in families.items():
        assert name in first50, f"family {fam} missing from driver window"
        assert name in o, f"family {fam} representative lost its oracle"


def test_tracked_replays_record_progress_split():
    """Every bench-TRACKED streaming replay must record its micro-batch
    progress into extensions.REPLAY_PROGRESS (r12 verdict task 2: the
    bench derives the setup-vs-compute split from it — a new tracked
    replay that skips the instrumentation would silently re-distort the
    headline total with setup wall)."""
    import inspect

    from kmeans_mapreduce_spark import extensions as X
    from kmeans_mapreduce_spark.queries import BENCH_EXTENSION_QUERIES

    tracked = [
        n
        for n in BENCH_EXTENSION_QUERIES
        if "_stream_" in n and n.endswith("_replay")
    ]
    assert tracked, "replay split exists because replays are benched"
    reg = X.extension_queries()
    for n in tracked:
        fn_src = inspect.getsource(reg[n])
        assert (
            "_drain_bounded_replay(" in fn_src
            or f'_record_replay_progress("{n}"' in fn_src
        ), f"{n} is bench-tracked but never records its replay progress"
        # the helper keys progress by the registry name — the literal
        # must appear in the function, not a diverging alias
        assert f'"{n}"' in fn_src, n


def test_replay_progress_populated_by_cheapest_tracked_replay(spark):
    """Runtime half of the split contract: running a tracked replay
    leaves a well-formed progress record behind."""
    from kmeans_mapreduce_spark import extensions as X

    X.REPLAY_PROGRESS.pop("events_stream_enrich_replay", None)
    df = X.q_events_stream_enrich_replay(spark, SF)
    assert df.count() >= 0
    p = X.REPLAY_PROGRESS["events_stream_enrich_replay"]
    assert set(p) == {
        "n_batches", "n_data_batches", "trigger_exec_ms", "add_batch_ms",
    }
    assert p["n_batches"] >= 1
    assert p["n_data_batches"] >= 1
    assert p["trigger_exec_ms"] > 0


@pytest.mark.parametrize("name", _registry())
def test_query_executes(spark, name):
    import __spark_entry__ as entry

    df = entry.queries()[name](spark, SF)
    cols = df.columns
    assert cols, name
    df.limit(5).collect()  # any runtime break surfaces here
