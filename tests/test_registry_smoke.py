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


@pytest.mark.parametrize("name", _registry())
def test_query_executes(spark, name):
    import __spark_entry__ as entry

    df = entry.queries()[name](spark, SF)
    cols = df.columns
    assert cols, name
    df.limit(5).collect()  # any runtime break surfaces here
