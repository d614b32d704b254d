"""Physical-plan inspection helpers — the engine's scale contract,
made assertable.

The reference hard-codes its physical strategy (static splits, RPC
broadcast, mod-R partitioning — ``/root/reference/master.py:50-77``,
``mapper.py:63-69``); this engine instead PROMISES plan properties and
lets Catalyst deliver them. These helpers read ``explain`` output so
tests (tests/test_plans.py) fail if a regression re-introduces a
cartesian product, drops predicate pushdown, or un-broadcasts a
dimension join.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def has_broadcast_join(df: DataFrame) -> bool:
    """True if every join in the plan is broadcast (hash or nested
    loop); False when any shuffle-based join appears."""
    plan = explain_str(df)
    joins = re.findall(r"(\w+Join\w*)", plan)
    if not joins:
        return False
    return all("Broadcast" in j for j in joins)


def has_cartesian(df: DataFrame) -> bool:
    return "CartesianProduct" in explain_str(df)


def has_pushed_filters(df: DataFrame) -> bool:
    """True if the scan carries at least one pushed-down filter."""
    m = re.search(r"PushedFilters: \[([^\]]*)\]", explain_str(df))
    return bool(m and m.group(1).strip())


def partition_filters(df: DataFrame) -> str:
    """The scan's PartitionFilters clause — partition PRUNING contract:
    a filter on a partition column must reach the file listing (whole
    directories skipped), not run as a post-scan row filter."""
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", explain_str(df))
    return m.group(1).strip() if m else ""


def scan_columns(df: DataFrame) -> list[str]:
    """Columns the parquet scan actually reads (ReadSchema) — the
    column-pruning contract: a 2-column projection must not scan 16."""
    m = re.search(r"ReadSchema: struct<([^>]*)>", explain_str(df))
    if not m:
        return []
    return [c.split(":")[0] for c in m.group(1).split(",") if c]
