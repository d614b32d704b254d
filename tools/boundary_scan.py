"""Rounding-boundary risk scan.

The sf0.1 sweep caught a one-ulp cross-engine flip: a quality score of
0.42943749999999997 rounds differently under Spark's exact-decimal
HALF_UP and DuckDB's float ROUND. This tool quantifies the RESIDUAL
risk across the whole registry: for every gated query it runs the
DuckDB twin (cheap, value-identical to Spark when the gate is green)
and flags double values whose 6-digit-scaled fractional part lies
within ``eps`` of the 0.5 rounding boundary — the values a one-ulp
engine difference could flip.

Scope: values with |x·1e6| < 2^45 — above that, the scaled double's
own ulp approaches the 0.5 threshold and proximity is granularity,
not risk (the 2-digit big-sum family, e.g. pricing-summary sums of
~4e9, is out of scope here; its cross-engine agreement is evidenced
by the three-SF sweep instead).

A query with zero near-boundary values cannot flip at this SF no
matter which engine rounds; a query with hits is where the
ieee_round_pos discipline (functions/text.py) should be extended next.

Usage: python tools/boundary_scan.py [sf_dir ...]   (one JSON line)
"""

from __future__ import annotations

import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from kmeans_mapreduce_spark.schema import TESTDATA_TABLES

EPS = 1e-7  # one-ulp noise at these magnitudes is ~1e-10; 1e-7 is generous


def scan_sf(sf_dir: str) -> dict[str, object]:
    import __spark_entry__ as entry

    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    out: dict[str, object] = {}
    flagged = {}
    for name, sql in entry.oracle_sql().items():
        try:
            df = con.sql(sql).df()
        except Exception as ex:  # pragma: no cover - diagnostic tool
            flagged[name] = f"twin error: {str(ex)[:80]}"
            continue
        hits = 0
        worst = None
        for col in df.columns:
            if df[col].dtype.kind != "f":
                continue
            for v in df[col].dropna():
                scaled = float(v) * 1e6
                frac = abs(scaled - math.floor(scaled) - 0.5)
                if frac < EPS and abs(scaled) < 2**45:
                    hits += 1
                    if worst is None or frac < worst[1]:
                        worst = (col, frac, float(v))
        if hits:
            flagged[name] = {
                "near_boundary_values": hits,
                "worst": {"col": worst[0], "gap": worst[1], "value": worst[2]},
            }
    out["flagged"] = flagged
    out["queries_scanned"] = len(entry.oracle_sql())
    return out


def main() -> int:
    sf_dirs = sys.argv[1:] or [
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    ]
    report = {sf: scan_sf(sf) for sf in sf_dirs}
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
