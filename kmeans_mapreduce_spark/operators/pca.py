"""Distributed PCA over embedding columns — the dimensionality-
reduction step a training pipeline runs before ANN indexing / whitening
(none of this exists in the reference; SURVEY §2.2).

Scale design: the ONLY distributed work is one pass computing the
sufficient statistics (n, Σx, ΣxxT) via Arrow partial aggregation —
each partition emits a single (1 + d + d²)-value row, so the shuffle is
P rows of ~33 KB at d=64 regardless of input size (same
partials-to-driver shape as the Lloyd loop). The d×d eigendecomposition
is driver-side numpy (d is small by construction; for d in the
thousands you'd switch to randomized SVD over the same partials), and
the projection back over the data is a narrow numpy map — no shuffle
anywhere. This mirrors MLlib's own RowMatrix.computePrincipalComponents
contract (Gram on executors, eig on the driver).

Determinism: partial sums are reduced in sorted partition order and the
eigenvector sign is fixed (largest-|component| entry positive), so
repeated fits on the same data produce identical components; a test
pins the whole thing against single-node numpy PCA on the collected
matrix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PCA_K = 8


def _suffstats(emb: DataFrame, vec_col: str):
    """Driver-side (n, sum, gram) reduced from one Arrow pass."""
    import numpy as np

    first = emb.select(vec_col).first()
    if first is None:
        raise ValueError("pca_fit: input has no rows")
    d = len(first[0])

    def partials(batches):
        import pandas as pd

        n = 0
        s = np.zeros(d)
        g = np.zeros((d, d))
        for pdf in batches:
            X = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            if len(X):
                n += len(X)
                s += X.sum(axis=0)
                g += X.T @ X
        yield pd.DataFrame(
            {"n": [n], "s": [s.tolist()], "g": [g.ravel().tolist()]}
        )

    rows = (
        emb.select(vec_col)
        .mapInPandas(partials, "n LONG, s ARRAY<DOUBLE>, g ARRAY<DOUBLE>")
        .collect()
    )
    import numpy as np

    # total sort key (full partial content) -> bit-stable reduction
    # order regardless of collect order or partitioning
    rows = sorted(rows, key=lambda r: (r["n"], tuple(r["s"]), tuple(r["g"])))
    n = sum(r["n"] for r in rows)
    s = np.sum([np.array(r["s"]) for r in rows], axis=0)
    g = np.sum([np.array(r["g"]).reshape(d, d) for r in rows], axis=0)
    return n, s, g


def pca_fit(emb: DataFrame, vec_col: str = "embedding", k: int = PCA_K):
    """Fit: returns (mean, components [k×d], explained_variance [k]).

    cov = (ΣxxT − n·mean·meanT) / (n − 1); eigenvectors sorted by
    descending eigenvalue, sign-fixed so each component's
    largest-magnitude entry is positive.
    """
    import numpy as np

    n, s, g = _suffstats(emb, vec_col)
    return fit_from_suffstats(n, s, g, k)


def fit_from_suffstats(n: int, s, g, k: int = PCA_K):
    """The driver-side eigh half of :func:`pca_fit`, factored so the
    gated ``embeddings_pca`` query can fit and compute its
    verification trace from ONE suffstats pass."""
    import numpy as np

    if n < 2:
        raise ValueError("pca_fit: needs at least 2 rows (covariance divides by n-1)")
    mean = np.asarray(s) / n
    cov = (np.asarray(g) - n * np.outer(mean, mean)) / (n - 1)
    w, v = np.linalg.eigh(cov)  # ascending
    order = np.argsort(w)[::-1][:k]
    comps = []
    evs = []
    for idx in order:
        vec = v[:, idx]
        j = int(np.argmax(np.abs(vec)))
        if vec[j] < 0:
            vec = -vec
        comps.append(vec.tolist())
        evs.append(float(w[idx]))
    return mean.tolist(), comps, evs


def pca_project(
    emb: DataFrame,
    mean: list[float],
    components: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    digits: int = 6,
) -> DataFrame:
    """Project: (id, pc ARRAY<DOUBLE>[k]) — numpy per Arrow batch,
    centered then multiplied by the broadcast (d×k) literal matrix; a
    narrow map stage, no shuffle."""
    import numpy as np

    M = np.array(mean)
    W = np.array(components).T  # d × k

    def proj(batches):
        import pandas as pd

        for pdf in batches:
            X = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            out = (X - M) @ W if len(X) else np.zeros((0, W.shape[1]))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "pc": np.round(out, digits).tolist(),
                }
            )

    return emb.select(id_col, vec_col).mapInPandas(
        proj, f"{id_col} LONG, pc ARRAY<DOUBLE>"
    )


def pca_pipeline(
    emb: DataFrame,
    k: int = PCA_K,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """fit + project in one call (the queries() entry): rows-only by
    declared contract — eigendecomposition is numerical, not ANSI-SQL-
    expressible, like kmeans_fit; correctness is pinned instead by the
    numpy-parity + orthonormality + variance tests."""
    mean, comps, _ = pca_fit(emb, vec_col, k)
    return pca_project(emb, mean, comps, id_col, vec_col)
