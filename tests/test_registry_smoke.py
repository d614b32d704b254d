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
        "semantic-dedup": "dedup_semantic",
        "ivf-ann": "similarity_ann_ivf",
        "pq-ann": "similarity_ann_pq_trained",
        "trained-serving": "similarity_ann_recall_trained",
        "hybrid-rrf": "similarity_hybrid_rrf",
        "multimodal": "multimodal_meta",
        "multimodal-video": "multimodal_mjpeg",
        "multimodal-audio": "multimodal_audio",
        "text": "text_bpe_segment",
        "url-dedup": "corpus_url_dedup",
        "sampling": "corpus_sample_stratified",
        "embeddings-quant": "embeddings_int8_quant",
        "events": "events_funnel",
        "time-travel": "table_time_travel",
        "streaming": "events_stream_replay",
        "streaming-stateful": "events_stream_ttl_dedup_replay",
    }
    for fam, name in families.items():
        assert name in first50, f"family {fam} missing from driver window"
        assert name in o, f"family {fam} representative lost its oracle"


@pytest.mark.parametrize("name", _registry())
def test_query_executes(spark, name):
    import __spark_entry__ as entry

    df = entry.queries()[name](spark, SF)
    cols = df.columns
    assert cols, name
    df.limit(5).collect()  # any runtime break surfaces here
