"""End-to-end parity with the reference's job lifecycle
(/root/reference/master.py:337-369): read "x,y" points → split/
distribute (Spark file source) → seeded init within the bounding box →
iterate assign/reduce with empty-cluster repair → converge on |ΔWSSSE|
→ write the final centroid generation. A user of the reference could
run this exact workflow here.
"""

from __future__ import annotations

import random

from kmeans_mapreduce_spark.operators import kmeans as km
from kmeans_mapreduce_spark.sources import loaders


def test_reference_workflow_end_to_end(spark, tmp_path):
    # two well-separated blobs, reference CSV format
    rng = random.Random(7)
    lines = []
    for _ in range(200):
        lines.append(f"{rng.uniform(0, 2):.6f},{rng.uniform(0, 2):.6f}")
    for _ in range(200):
        lines.append(f"{rng.uniform(50, 52):.6f},{rng.uniform(50, 52):.6f}")
    src = tmp_path / "points.txt"
    src.write_text("\n".join(lines) + "\n")

    pts = loaders.read_points_csv(spark, str(src))
    res = km.fit(pts, k=2, max_iter=20, tol=0.5, seed=42)

    assert res.converged
    assert sorted(c[0] for c in res.centers) == [0, 1]
    # each center sits inside one blob
    xs = sorted(c[1] for c in res.centers)
    assert 0 <= xs[0] <= 2 and 50 <= xs[1] <= 52
    # WSSSE strictly dropped from first iteration to last
    assert res.wssse_history[-1] < res.wssse_history[0]

    out = tmp_path / "centroids"
    cdf = spark.createDataFrame(
        [(c, x, y) for c, x, y in res.centers], "cid INT, cx DOUBLE, cy DOUBLE"
    )
    loaders.write_centroids(cdf, str(out))
    back = spark.read.parquet(str(out))
    assert back.count() == 2  # the final generation, like centroids.txt
