"""Measure the pagerank lineage-vs-barrier crossover (r16 verdict
task 7).

Each pagerank iteration references ranks(i-1) twice, so the
unbarriered loop re-executes the previous iteration's subtree twice
per iteration — bounded and measured-cheaper at loop2, geometric
beyond it. This probe times lineage vs per-iteration narrow_barrier at
n_iter in {2, 4, 8} ALTERNATING inside one session (box waves hit both
arms) and reports medians + health stamps, so PAGERANK_BARRIER_AFTER
is a measured constant, not a guess.

Usage: python tools/pagerank_scale_probe.py [reps-per-arm, default 3]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _cpu_ticks, _mem_stream_gbps, _steal_pct  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3

    import kmeans_mapreduce_spark.extensions as X
    from kmeans_mapreduce_spark.operators import similarity as sim
    from kmeans_mapreduce_spark.session import get_spark

    spark = get_spark("pagerank-scale-probe")
    spark.range(
        512, numPartitions=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ).mapInPandas(lambda it: it, "id LONG").count()

    emb = X.load_table(spark, SF_DIR, "embeddings")
    centers, _pts = X._nd_centers_and_points(emb)

    walls: dict[str, list[float]] = defaultdict(list)
    ticks0 = _cpu_ticks()
    gbps0 = _mem_stream_gbps()
    for r in range(reps):
        for n_iter in (2, 4, 8):
            for barrier in (False, True):
                import gc

                gc.collect()
                arm = f"iters={n_iter} barrier={barrier}"
                spark.sparkContext.setJobDescription(f"pr-probe {arm}")
                t0 = time.time()
                sim.pagerank_loop2(
                    emb,
                    centers,
                    4,
                    n_iter=n_iter,
                    iter_barrier=barrier,
                ).write.format("noop").mode("overwrite").save()
                wall = round(time.time() - t0, 3)
                walls[arm].append(wall)
                print(f"[pr] rep{r} {arm}: {wall}s", file=sys.stderr)
    out = {
        "sf_dir": SF_DIR,
        "steal_pct": _steal_pct(ticks0, _cpu_ticks()),
        "mem_stream_gbps": [gbps0, _mem_stream_gbps()],
        "arms": {
            a: {"median": round(statistics.median(v), 3), "walls": v}
            for a, v in walls.items()
        },
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
