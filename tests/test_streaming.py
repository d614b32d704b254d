"""Structured Streaming tests: the streaming operators must agree with
their batch twins on identical data (semantics parity), and the custom
stateful sessionizer must carry state across micro-batches.

Input: the driver's events table, re-written as TWO time-ordered
parquet files so ``maxFilesPerTrigger=1`` yields two micro-batches with
sessions that straddle the batch boundary.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kmeans_mapreduce_spark.operators import events as ev
from kmeans_mapreduce_spark.sources.loaders import load_table
from kmeans_mapreduce_spark.streaming import stream_ops as so

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    """Two time-ordered parquet files → two deterministic micro-batches."""
    out = str(tmp_path_factory.mktemp("events_stream"))
    e = load_table(spark, SF, "events").withColumn(
        "ts_sec", F.expr("ts div 1000000000")
    )
    mid = e.approxQuantile("ts_sec", [0.5], 0.0)[0]
    e.filter(F.col("ts_sec") <= mid).drop("ts_sec").coalesce(1).write.parquet(
        f"{out}/f0"
    )
    e.filter(F.col("ts_sec") > mid).drop("ts_sec").coalesce(1).write.parquet(
        f"{out}/f1"
    )
    # flatten: move part files into one dir with ordered names
    import glob
    import shutil

    dest = str(tmp_path_factory.mktemp("events_flat"))
    for i, sub in enumerate(["f0", "f1"]):
        for j, p in enumerate(sorted(glob.glob(f"{out}/{sub}/part-*.parquet"))):
            shutil.copy(p, f"{dest}/{i:02d}_{j}.parquet")
    return dest


@pytest.fixture(scope="module")
def schema(spark):
    return load_table(spark, SF, "events").schema


def test_stream_window_counts_matches_batch(spark, events_dir, schema):
    stream = so.events_stream(spark, events_dir, schema)
    agg = so.stream_window_counts(stream, watermark_sec=None)
    so.run_stream_to_memory(agg, "win_counts", mode="complete")
    got = {
        (int(r["w"]["start"].timestamp()), r["event_type"]): (
            r["n_events"],
            round(r["value_sum"], 2),
        )
        for r in spark.table("win_counts").collect()
    }
    want = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["value_sum"])
        for r in ev.window_agg(load_table(spark, SF, "events")).collect()
    }
    assert set(got) == set(want)
    assert got == want


def test_stream_scoring_stateless(spark, events_dir, schema):
    centers = [(0, 0.0, 0.0), (1, 100.0, 100.0)]
    stream = so.events_stream(spark, events_dir, schema).select(
        F.col("value").alias("x"), (F.col("user_id") % 100).cast("double").alias("y")
    )
    scored = so.score_stream(stream, centers)
    so.run_stream_to_memory(scored, "scored", mode="append")
    rows = spark.table("scored").collect()
    assert len(rows) == load_table(spark, SF, "events").count()
    assert {r["cid"] for r in rows} <= {0, 1}
    assert all(r["min_d2"] >= 0 for r in rows)


def test_stream_dedup_exact_across_batches(spark, tmp_path_factory):
    import pandas as pd

    out = str(tmp_path_factory.mktemp("docs_stream"))
    # batch 0: docs 0,1 (1 is a dup of 0); batch 1: doc 2 dups 0 again
    pd.DataFrame(
        {"doc_id": [0, 1], "text": ["hello world", "hello world"]}
    ).to_parquet(f"{out}/00.parquet")
    pd.DataFrame({"doc_id": [2], "text": ["hello world"]}).to_parquet(
        f"{out}/01.parquet"
    )
    stream = (
        spark.readStream.schema("doc_id LONG, text STRING")
        .option("maxFilesPerTrigger", 1)
        .parquet(out)
    )
    so.run_stream_to_memory(so.stream_dedup_exact(stream), "dedup_stream", "update")
    rows = spark.table("dedup_stream").collect()
    # one fp, two batches → two rows; keeper pinned to doc 0 in BOTH,
    # count carries 2 → 3 across the batch boundary
    assert [(r["keep_doc_id"], r["n_copies"], r["is_new"]) for r in
            sorted(rows, key=lambda r: r["n_copies"])] == [(0, 2, True), (0, 3, False)]


def test_stream_sessionize_carries_state_across_batches(spark, events_dir, schema):
    stream = so.events_stream(spark, events_dir, schema)
    sess = so.stream_sessionize(stream)
    so.run_stream_to_memory(sess, "sessions", mode="update")
    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"]): round(
            r["value_sum"], 2
        )
        for r in spark.table("sessions").collect()
    }
    # batch truth: every session except each user's LAST (still open in
    # the state store when the stream drains)
    batch = ev.sessionize(load_table(spark, SF, "events")).collect()
    last_idx = {}
    for r in batch:
        last_idx[r["user_id"]] = max(
            last_idx.get(r["user_id"], -1), r["session_idx"]
        )
    want = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"]): r[
            "value_sum"
        ]
        for r in batch
        if r["session_idx"] != last_idx[r["user_id"]]
    }
    assert got == want
    assert len(got) > 0  # the fixture really produces closed sessions
