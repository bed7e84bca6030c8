"""Distributed PCA / whitening for embedding columns.

Embedding spaces from real encoders are anisotropic — a few directions
carry most of the variance — which hurts cosine-based retrieval and makes
product quantizers waste codebook entries.  PCA projection (and optional
whitening, scaling each component to unit variance) is the standard fix
before ANN indexing (e.g. the OPQ/PCA preprocessing in FAISS pipelines).

Scale shape (the 100 TB story):
- mean and covariance come from ONE pass: each partition reduces its rows
  to (count, sum_vec, X^T.X) in numpy via mapInPandas — d*(d+1) doubles
  per PARTITION, independent of row count — and the driver sums the
  per-partition rows (bounded by partition count);
- the eigendecomposition runs on the driver over the d x d covariance
  (d is the embedding width — 64..4096 — never data-sized), with a
  deterministic sign convention (largest-|loading| coordinate positive)
  so results are reproducible run to run;
- the projection broadcasts the (d x k) component matrix inside the UDF
  closure and applies one numpy matmul per Arrow batch — narrow, zero
  shuffle.

No reference counterpart: feathub has no linear-algebra surface; this is
beyond-reference capability for the embedding-pipeline family
(datapipe/similarity.py).
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame, functions as F

from feathub_spark.common.parallelism import ensure_parallelism


def fit_pca(
    df: DataFrame,
    vec_col: str,
    k: Optional[int] = None,
    whiten: bool = False,
    eps: float = 1e-9,
):
    """Fit PCA over ``vec_col`` (array<float|double>, fixed width).

    Returns (mean: list[float], components: list[list[float]] with k rows
    of length d, explained_variance: list[float]) — plain Python values
    sized by the embedding width, ready to broadcast.  ``whiten=True``
    scales each component by 1/sqrt(eigenvalue + eps) so projected
    coordinates have unit variance."""
    import numpy as np

    def partial(iterator):
        import pandas as pd

        n, s, g = 0, None, None
        for pdf in iterator:
            if len(pdf) == 0:
                continue
            x = np.asarray(pdf.iloc[:, 0].tolist(), dtype=np.float64)
            n += x.shape[0]
            s = x.sum(axis=0) if s is None else s + x.sum(axis=0)
            gx = x.T @ x
            g = gx if g is None else g + gx
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [s.tolist()], "g": [g.reshape(-1).tolist()]}
            )

    parts = (
        ensure_parallelism(df)
        # a single NULL vector would reach numpy as None inside a list of
        # lists and fail the whole fit with an opaque ragged-array error —
        # and a NULL ELEMENT inside a vector fails the same way (float +
        # NoneType TypeError in the partial), so guard element-level too
        .filter(F.col(vec_col).isNotNull())
        .filter(
            ~F.expr(f"exists(`{vec_col}`, e -> e IS NULL OR isnan(e))")
        )
        .select(F.col(vec_col).cast("array<double>"))
        .mapInPandas(partial, "n long, s array<double>, g array<double>")
        .collect()
    )
    if not parts:
        raise ValueError("fit_pca: empty input")
    n = sum(r["n"] for r in parts)
    s = np.sum([np.asarray(r["s"]) for r in parts], axis=0)
    d = s.shape[0]
    g = np.sum([np.asarray(r["g"]).reshape(d, d) for r in parts], axis=0)
    mean = s / n
    cov = g / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh((cov + cov.T) / 2.0)  # ascending
    order = np.argsort(evals)[::-1]
    evals, evecs = evals[order], evecs[:, order]
    k = d if k is None else int(k)
    evals, evecs = evals[:k], evecs[:, :k]
    # deterministic sign: the largest-|loading| coordinate of each
    # component is positive (eigenvectors are sign-ambiguous)
    for j in range(evecs.shape[1]):
        i = int(np.argmax(np.abs(evecs[:, j])))
        if evecs[i, j] < 0:
            evecs[:, j] = -evecs[:, j]
    comps = evecs.T  # (k, d)
    if whiten:
        comps = comps / np.sqrt(np.maximum(evals, 0.0) + eps)[:, None]
    return mean.tolist(), comps.tolist(), evals.tolist()


def pca_project(
    df: DataFrame,
    vec_col: str,
    k: Optional[int] = None,
    whiten: bool = False,
    out_col: str = "pca",
    model=None,
    round_to: Optional[int] = None,
) -> DataFrame:
    """Append ``out_col``: the (optionally whitened) k-dim PCA projection
    of ``vec_col``.  Fits on ``df`` unless ``model`` (a :func:`fit_pca`
    result — fit once on a sample, project everything) is given.  One
    numpy matmul per Arrow batch; ``round_to`` rounds coordinates for
    hash-stable comparisons."""
    import numpy as np

    mean, comps, _ = model if model is not None else fit_pca(
        df, vec_col, k=k, whiten=whiten
    )
    mu = np.asarray(mean)
    w = np.asarray(comps).T  # (d, k)

    @F.pandas_udf("array<double>")
    def project(vecs):
        import pandas as pd

        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        # NULL vectors — and vectors containing null/NaN/inf elements —
        # project to NULL.  Arrow hands a null ELEMENT to the UDF as NaN
        # inside the float array, so the guard is a finiteness test, not
        # an identity test; without it the NaN silently propagates into
        # every projected coordinate of that row.
        def _finite(v):
            if v is None:
                return False
            a = np.asarray(v, dtype=np.float64)
            return bool(np.all(np.isfinite(a)))

        mask = vecs.map(_finite)
        out = pd.Series([None] * len(vecs), dtype=object)
        if mask.any():
            x = np.asarray(vecs[mask].tolist(), dtype=np.float64)
            y = (x - mu) @ w
            if round_to is not None:
                y = np.round(y, round_to)
            out[mask] = pd.Series(
                list(map(list, y)), index=vecs[mask].index, dtype=object
            )
        return out

    return ensure_parallelism(df).withColumn(
        out_col, project(F.col(vec_col).cast("array<double>"))
    )
