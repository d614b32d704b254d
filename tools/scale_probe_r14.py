"""Round-14 scale probe: 1x/4x/16x wall slopes for the operators that
landed this round — pHash sketching, the banded pHash pair join, and
the Q21/Q20 relational shapes.

Replication jitters CONTENT, not just ids: each replica's text gets a
copy suffix so digests (and hence pHashes) differ — otherwise every
replica would hash identical to its original and the pair join would
be output-bound quadratic by construction rather than measuring the
banding. Slope convention matches scale_probe_r13: slope =
(wall_16x / wall_1x) / 16 — sublinear < 1.

Usage: python tools/scale_probe_r14.py [sf_dir]  (one JSON line +
writes tools/scale_probe_r14.json)
"""

from __future__ import annotations

import gc
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    from kmeans_mapreduce_spark.operators import dedup as dd
    from kmeans_mapreduce_spark.operators import multimodal as mm
    from kmeans_mapreduce_spark.operators import relational as rel
    from kmeans_mapreduce_spark.session import get_spark
    from kmeans_mapreduce_spark.sources.loaders import load_table

    spark = get_spark("scale-probe-r14")
    out: dict[str, object] = {"sf_dir": sf_dir}

    def timed(fn, reps=2):
        walls = []
        for _ in range(reps):
            t0 = time.time()
            fn()
            walls.append(time.time() - t0)
        return round(statistics.median(walls), 3)

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n_docs = docs.count()

    def docs_at(factor: int):
        d = docs
        for i in range(1, factor):
            d = d.union(
                docs.select(
                    (F.col("doc_id") + F.lit(3 * 10_000_000 * i)).alias(
                        "doc_id"
                    ),
                    F.concat(F.col("text"), F.lit(f"~{i}")).alias("text"),
                )
            )
        return d

    # --- pHash sketch + banded pair join slopes ----------------------
    for name, run in (
        (
            "phash_sketch",
            lambda d: mm.image_phash(mm.images_with_planted_copies(d))
            .write.format("noop")
            .mode("overwrite")
            .save(),
        ),
        (
            "phash_pairs",
            lambda d: dd.hamming_banded_pairs(
                mm.image_phash(mm.images_with_planted_copies(d)),
                "phash",
                bits=mm.PHASH_BITS,
                max_hamming=mm.PHASH_MAX_HAMMING,
                id_col="media_id",
                out_prefix="media",
            )
            .write.format("noop")
            .mode("overwrite")
            .save(),
        ),
    ):
        walls = {}
        for factor in (1, 4, 16):
            d = docs_at(factor).localCheckpoint()  # materialize the union
            walls[factor] = timed(lambda d=d: run(d))
            del d
            gc.collect()  # drop checkpoint blocks BEFORE the next leg —
            # resident blocks from earlier factors evict under pressure
            # and contaminate later legs (first r14 run: q21 read 50.6 s
            # at 16x inside the shared session vs 19.6 s isolated)
        out[name] = {
            "n_docs_1x": n_docs,
            "walls": walls,
            "slope_16x": round(walls[16] / walls[1] / 16, 3),
        }
        print(f"[probe] {name}: {out[name]}", file=sys.stderr)

    # --- Q21 / Q20 slopes (fact replicated, dims fixed) ---------------
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    part = load_table(spark, sf_dir, "part")
    KSHIFT = 1_000_000_000

    def fact_at(factor: int):
        l, o = li, orders
        for i in range(1, factor):
            l = l.union(
                li.withColumn(
                    "l_orderkey", F.col("l_orderkey") + F.lit(KSHIFT * i)
                )
            )
            o = o.union(
                orders.withColumn(
                    "o_orderkey", F.col("o_orderkey") + F.lit(KSHIFT * i)
                )
            )
        return l, o

    walls = {}
    for factor in (1, 4, 16):
        l, o = fact_at(factor)
        l, o = l.localCheckpoint(), o.localCheckpoint()
        walls[factor] = timed(
            lambda l=l, o=o: rel.waiting_suppliers(supplier, nation, o, l)
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        del l, o
        gc.collect()
    out["join_waiting_suppliers"] = {
        "walls": walls,
        "slope_16x": round(walls[16] / walls[1] / 16, 3),
    }
    print(f"[probe] q21: {out['join_waiting_suppliers']}", file=sys.stderr)

    walls = {}
    for factor in (1, 4, 16):
        l, _ = fact_at(factor)
        l = l.localCheckpoint()
        walls[factor] = timed(
            lambda l=l: rel.excess_stock_suppliers(supplier, l, part)
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        del l
        gc.collect()
    out["join_excess_stock"] = {
        "walls": walls,
        "slope_16x": round(walls[16] / walls[1] / 16, 3),
    }
    print(f"[probe] q20: {out['join_excess_stock']}", file=sys.stderr)

    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "scale_probe_r14.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
