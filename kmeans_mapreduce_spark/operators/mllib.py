"""MLlib KMeans path (SURVEY §7 Phase 4) — cross-check and perf baseline.

The reference's whole program IS k-means; MLlib's ``KMeans`` is the
industrial Spark implementation of the same algorithm (Lloyd's with
``random`` or ``k-means||`` init — Bahmani et al., VLDB 2012). We wrap
it behind the same point-set interface to (a) cross-check our
DataFrame-native engine's WSSSE and (b) serve as the BASELINE.md B2
performance bar.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.ml.clustering import KMeans as MLKMeans
from pyspark.ml.functions import array_to_vector
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class MLlibResult:
    centers: list[tuple[int, float, float]]
    wssse: float
    cluster_sizes: list[int]


def fit_mllib_2d(
    points: DataFrame,
    k: int,
    max_iter: int = 10,
    seed: int = 42,
    init_mode: str = "random",
    tol: float = 1e-4,
) -> MLlibResult:
    """Run MLlib KMeans on a (point_id, x, y) DataFrame."""
    feats = points.select(
        "point_id", array_to_vector(F.array("x", "y")).alias("features")
    )
    model = (
        MLKMeans(k=k, maxIter=max_iter, seed=seed, initMode=init_mode, tol=tol)
        .fit(feats)
    )
    centers = [
        (i, float(c[0]), float(c[1])) for i, c in enumerate(model.clusterCenters())
    ]
    return MLlibResult(
        centers=centers,
        wssse=float(model.summary.trainingCost),
        cluster_sizes=[int(n) for n in model.summary.clusterSizes],
    )
