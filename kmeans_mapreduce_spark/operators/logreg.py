"""Distributed logistic regression over hashed text features — the
"train the cheap quality classifier in-engine" operator (real
pipelines distill an expensive judge into a fasttext-style linear
model and run THAT over the crawl; e.g. the CCNet/LLaMA-style quality
filters).

Scale shape (same pattern as the k-means Lloyd loop, kmeans.py O13,
and the PCA sufficient-statistics pass): full-batch gradient descent
where each iteration is ONE Arrow ``mapInPandas`` pass emitting a
constant-size partial per partition — the dense D-vector
``X_part^T (σ(X_part w) − y_part)`` plus bias/count scalars (D≈1KB·8 →
~8 KB per partition, independent of row count). The driver sums
partials, steps, rounds, and rebuilds the next iteration from
literals: no shuffle of the corpus, no growing lineage — the
parameter-server round-trip replaced by a broadcast + tiny collect.

Oracle parity (mirrors kmeans_loop2's discipline): weights round
HALF_UP to 6 digits per iteration so the unrolled DuckDB twin replays
the REAL driver loop value-for-value; the learning rate is a power of
two so the update multiply is exact; labels come from the same rounded
quality_score ≥ tau rule both engines compute bit-identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kmeans_mapreduce_spark.functions.hashing import h64
from kmeans_mapreduce_spark.functions.text import (
    ieee_round_pos,
    quality_score_expr,
    stopword_ratio,
    tokens,
    type_token_ratio,
)
from kmeans_mapreduce_spark.operators.selection import DSIR_QUALITY_TAU
from kmeans_mapreduce_spark.barrier import narrow_barrier

LR_BUCKETS = 1024
LR_RATE = 0.5  # loop2 gate rate (power of two: the step multiply is exact)
LR_ROUND_DIGITS = 6
# free-form classifier settings (measured at sf0.01: acc 0.96 vs 0.71
# base rate at 50 iterations; binary presence features + the three
# engineered signals scaled ×4 condition the GD far better than raw
# counts, which stall near the base rate)
CLS_RATE = 4.0
CLS_ITERS = 50
CLS_FEATURE_SCALE = 4.0
N_ENGINEERED = 3


def featurized(
    docs: DataFrame,
    buckets: int = LR_BUCKETS,
    tau: float = DSIR_QUALITY_TAU,
    binary: bool = False,
    engineered: bool = False,
    scale: float = CLS_FEATURE_SCALE,
) -> DataFrame:
    """(doc_id, fb ARRAY<INT>, fx ARRAY<DOUBLE>, y DOUBLE): hashed
    token buckets (distinct when ``binary``), optional engineered
    signals [len/100 capped, stopword ratio, TTR] × ``scale``, and the
    label — the engine's own rounded quality score ≥ tau (the
    expensive judge being distilled). One narrow projection, zero
    shuffle; same score formula/rounding as ``textops.quality`` so the
    SQL twin reuses ``_quality_sql``."""
    toks = F.col("__toks")
    nt = F.size(toks).cast("double")
    sw = stopword_ratio(toks)
    ttr = type_token_ratio(toks)
    score = quality_score_expr(toks)
    fb = F.transform(
        toks, lambda t: F.pmod(h64(t), F.lit(buckets)).cast("int")
    )
    if binary:
        fb = F.array_sort(F.array_distinct(fb))
    fx = (
        F.array(
            F.least(nt / F.lit(100.0), F.lit(1.0)) * scale,
            sw * scale,
            ttr * scale,
        )
        if engineered
        else F.array().cast("array<double>")
    )
    return docs.withColumn("__toks", tokens(F.col("text"))).select(
        "doc_id",
        fb.alias("fb"),
        fx.alias("fx"),
        # ieee_round_pos keeps the label gate boundary-safe across
        # engines (see textops.quality)
        (ieee_round_pos(score, 6) >= tau).cast("double").alias("y"),
    )


def _partials(feats: DataFrame, w, b: float, buckets: int, n_extra: int):
    """One gradient pass: per Arrow batch emit (g ARRAY<DOUBLE>, gb, n)
    where g = X^T (σ(Xw + b) − y) over the batch's feature matrix
    [bucket counts | engineered columns]."""
    import numpy as np
    import pandas as pd

    w_bc = [float(x) for x in w]
    dim = buckets + n_extra

    def grad(batches):
        W = np.asarray(w_bc)
        for pdf in batches:
            n = len(pdf)
            if not n:
                continue
            X = np.zeros((n, dim))
            rows = np.repeat(np.arange(n), pdf["fb"].map(len).to_numpy())
            cols = np.concatenate(
                [np.asarray(v, dtype=np.int64) for v in pdf["fb"]]
            ) if len(rows) else np.array([], dtype=np.int64)
            np.add.at(X, (rows, cols), 1.0)
            if n_extra:
                X[:, buckets:] = np.stack(pdf["fx"].to_numpy())
            z = X @ W + b
            r = 1.0 / (1.0 + np.exp(-z)) - pdf["y"].to_numpy()
            yield pd.DataFrame(
                {"g": [(X.T @ r).tolist()], "gb": [float(r.sum())], "n": [n]}
            )

    return feats.mapInPandas(grad, "g ARRAY<DOUBLE>, gb DOUBLE, n LONG")


def fit_logreg(
    feats: DataFrame,
    buckets: int = LR_BUCKETS,
    n_extra: int = 0,
    iters: int = 2,
    lr: float = LR_RATE,
    round_digits: int = LR_ROUND_DIGITS,
) -> tuple[list[float], float]:
    """Full-batch GD from w=0, b=0; per-iteration rounding to
    ``round_digits`` keeps every iteration's inputs bit-identical to
    the unrolled SQL twin (same discipline as ``kmeans_nd_loop2``).
    The rounding is the PINNED IEEE floor(x·10^d + ½)/10^d form on
    both sides (sign-safe: half-toward-+inf by definition, the same
    pinning as the PCA suffstats) — decimal HALF_UP here vs DuckDB's
    float ROUND in the twin is the divergent pairing that can flip
    within one ulp of a .5 boundary, and 10 iterations × 1025 rounded
    values is material boundary exposure. Returns (weights, bias);
    weights [0, buckets) are hashed-token coefficients, the tail
    ``n_extra`` the engineered-feature ones."""
    import math

    import numpy as np

    scale = float(10**round_digits)

    def r6(x: float) -> float:
        return math.floor(float(x) * scale + 0.5) / scale

    feats = feats.transform(narrow_barrier)
    w = np.zeros(buckets + n_extra)
    b = 0.0
    for _ in range(iters):
        parts = _partials(feats, w, b, buckets, n_extra).collect()
        n = sum(p["n"] for p in parts)
        if n == 0:
            raise ValueError("fit_logreg: empty feature table (0 rows)")
        g = np.sum([np.asarray(p["g"]) for p in parts], axis=0)
        gb = sum(p["gb"] for p in parts)
        w = np.asarray([r6(v) for v in (w - lr * (g / n))])
        b = r6(b - lr * (gb / n))
    return [float(x) for x in w], float(b)


def score_logreg(
    feats: DataFrame,
    w: list[float],
    b: float,
    buckets: int = LR_BUCKETS,
    digits: int = 4,
) -> DataFrame:
    """Apply a trained model: (doc_id, p, pred, y_true, correct). The
    weights ship as a BROADCAST 1-row table and the logit folds the
    joined weight array per token bucket plus the engineered-feature
    dot — a narrow map over a 1-row broadcast join, the production
    inference shape (a literal weight array costs ~seconds of
    plan-analysis per run; measured on corpus_lr_calibration and the
    bloom bitmap literals)."""
    extra = [float(x) for x in w[buckets:]]
    wdf = feats.sparkSession.createDataFrame(
        [([float(x) for x in w[:buckets]], extra, float(b))],
        "warr ARRAY<DOUBLE>, wx ARRAY<DOUBLE>, b DOUBLE",
    )
    feats = feats.crossJoin(F.broadcast(wdf))
    z = F.aggregate(
        F.col("fb"),
        F.col("b"),
        lambda acc, fb: acc + F.element_at(F.col("warr"), fb + 1),
    )
    if extra:
        z = z + F.aggregate(
            F.zip_with(F.col("fx"), F.col("wx"), lambda a, c: a * c),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    return feats.select(
        "doc_id",
        F.round(p, digits).alias("p"),
        (p >= 0.5).alias("pred"),
        (F.col("y") >= 0.5).alias("y_true"),
        ((p >= 0.5) == (F.col("y") >= 0.5)).alias("correct"),
    )
