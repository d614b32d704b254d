"""Hypothesis property tests — invariants that hold for ALL inputs,
not just the fixtures (SURVEY §5.2 item 2's strategy, generalized to
the round-3 operators)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st


@given(
    st.lists(
        st.floats(
            min_value=-1e6,
            max_value=1e6,
            allow_nan=False,
            allow_infinity=False,
        ),
        min_size=1,
        max_size=50,
    ),
    st.integers(min_value=0, max_value=8),
)
@settings(max_examples=200, deadline=None)
def test_round_half_up_always_matches_duckdb(vals, digits):
    """Driver-side rounding ≡ DuckDB ROUND for arbitrary doubles and
    scales (the oracle-gate contract, fuzzed)."""
    import duckdb

    from kmeans_mapreduce_spark.operators.kmeans import round_half_up

    con = duckdb.connect()
    for v in vals:
        duck = con.execute(
            f"SELECT ROUND(CAST(? AS DOUBLE), {digits})", [v]
        ).fetchone()[0]
        assert round_half_up(v, digits) == duck


@given(
    st.lists(st.integers(min_value=1, max_value=500), min_size=1, max_size=60),
    st.integers(min_value=10, max_value=1000),
)
@settings(max_examples=15, deadline=None)
def test_pack_sequences_matches_sequential_replay(token_counts, budget):
    """For any doc stream, the distributed window form must equal the
    sequential spec replayed in pure Python — bin = floor(prefix-sum-
    before-doc / budget) — and bin ids must be monotone over the
    packing order. (Hypothesis found during development that stronger
    claims — contiguous bin ids, every non-tail bin full — are NOT
    invariants: one doc spanning several budget widths skips ids, and
    a doc starting just under a boundary leaves a short bin.)"""
    from kmeans_mapreduce_spark.operators import sampling as sp
    from kmeans_mapreduce_spark.session import get_spark

    spark = get_spark("prop-tests")
    rows = [(i, "en", int(nt)) for i, nt in enumerate(token_counts)]
    df = spark.createDataFrame(rows, "doc_id LONG, lang STRING, n_tokens LONG")
    got = {
        r["doc_id"]: r["bin_id"]
        for r in sp.pack_sequences(df, budget_tokens=budget).collect()
    }
    prefix = 0
    prev_bin = 0
    for i, nt in enumerate(token_counts):
        want = prefix // budget
        assert got[i] == want
        assert want >= prev_bin  # monotone over the packing order
        prev_bin = want
        prefix += nt


@given(st.sampled_from([0.0, 0.1, 0.3, 0.5, 0.9, 1.0]))
@settings(max_examples=6, deadline=None)
def test_hash_sample_rate_monotone(rate):
    """A lower-rate hash sample is always a SUBSET of a higher-rate one
    (thresholds nest), and both are deterministic — the property that
    makes hash sampling auditable where rand() sampling is not."""
    from pyspark.sql import functions as F

    from kmeans_mapreduce_spark.operators import sampling as sp
    from kmeans_mapreduce_spark.session import get_spark
    from kmeans_mapreduce_spark.sources.loaders import load_table

    spark = get_spark("prop-tests")
    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "lang"
    )
    low = {
        r["doc_id"]
        for r in sp.hash_sample_stratified(docs, {}, rate).collect()
    }
    high = {
        r["doc_id"]
        for r in sp.hash_sample_stratified(docs, {}, min(1.0, rate + 0.1)).collect()
    }
    assert low <= high
    again = {
        r["doc_id"]
        for r in sp.hash_sample_stratified(docs, {}, rate).collect()
    }
    assert low == again
