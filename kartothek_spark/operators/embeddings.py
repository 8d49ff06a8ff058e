"""PCA over embedding columns: exact distributed moments, driver eigh.

Dimensionality reduction is the embedding-pipeline workhorse (whitening,
compression before ANN indexing, drift visualization). Spark-first split
of the work:

* the **distributed part** — mean vector and covariance moments over N
  rows — is a single ``mapInPandas`` pass emitting one partial-sum row
  per Arrow batch (quantized int64 arithmetic, chunked so no batch
  partial can overflow), reduced exactly on the driver with Python
  integers. For d=64 a partial row is d + d² longs; the driver holds
  ``num_batches`` such rows — never the data.
* the **driver part** — a d×d symmetric eigendecomposition — is O(d³)
  on a matrix that fits in a cache line budget; distributing it would be
  theater. Eigenvector signs are normalized (largest-|component| entry
  positive) so the model is unique.

Determinism: the moments are exact integers (any partitioning, any
batch split); eigh sees the identical float matrix everywhere, and the
per-row projection is a fixed numpy matmul. The correctness gate
value-oracles the exact moments against DuckDB; the eigh/projection
algebra is pinned by planted-structure tests (an SQL engine cannot
eigendecompose).

No reference counterpart (no ML surface in the reference).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kartothek_spark.operators.similarity import QUANT, quantize

# rows per int64 partial-sum chunk: with |x| <= 2 quantized at 2^24 the
# largest square is (2^25)^2 = 2^50, so a chunk of 2^12 rows sums to at
# most 2^62 < int64 max. Each chunk emits its OWN partial row (no
# cross-chunk int64 accumulation — the driver reduces with python ints).
_CHUNK_ROWS = 1 << 12


@dataclass
class PCAModel:
    mean: list[float]          # d
    components: list[list[float]]  # k x d, rows orthonormal
    eigenvalues: list[float]   # k, descending
    n: int
    # exact integer moments at QUANT scale (kept for the value oracle
    # and for incremental merges): s1[d], s2_diag[d]
    s1: list[int]
    s2_diag: list[int]


def _moment_partials(df: DataFrame, vec_col: str) -> list:
    """One (n, s1[d], s2[d*d]) exact-integer partial row per Arrow batch."""
    qdf = df.select(quantize(F.col(vec_col)).alias("q")).where(F.col("q").isNotNull())

    def gen(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.array([np.asarray(v, dtype="int64") for v in pdf["q"]], dtype="int64")
            if np.abs(X).max(initial=0) > (1 << 25):
                # the chunk bound assumes |value| <= 2.0; fail loudly
                # instead of wrapping int64 silently
                raise ValueError(
                    "embedding magnitude exceeds 2.0 — rescale before PCA "
                    "(fixed-point moment bound would overflow)"
                )
            for lo in range(0, len(X), _CHUNK_ROWS):
                C = X[lo : lo + _CHUNK_ROWS]
                yield pd.DataFrame(
                    {
                        "n": [len(C)],
                        "s1": [C.sum(axis=0).tolist()],
                        # int64-safe by the _CHUNK_ROWS bound
                        "s2": [(C.T @ C).reshape(-1).tolist()],
                    }
                )

    return qdf.mapInPandas(
        gen, "n long, s1 array<long>, s2 array<long>"
    ).collect()


def train_pca(df: DataFrame, k: int, vec_col: str = "embedding") -> PCAModel:
    """Fit a k-component PCA. One distributed pass; exact moments."""
    rows = _moment_partials(df, vec_col)
    if not rows:
        raise ValueError("empty embedding column")
    import numpy as np

    d = len(rows[0]["s1"])
    if not 0 < k <= d:
        raise ValueError(f"k must be in (0, {d}]")
    n = sum(int(r["n"]) for r in rows)
    if n < 2:
        raise ValueError("need at least 2 vectors")
    # exact python-int reduction: no overflow at any N
    s1 = [0] * d
    s2 = [0] * (d * d)
    for r in rows:
        for i, v in enumerate(r["s1"]):
            s1[i] += int(v)
        for i, v in enumerate(r["s2"]):
            s2[i] += int(v)
    S1 = np.array(s1, dtype="float64")
    S2 = np.array(s2, dtype="float64").reshape(d, d)
    mean = S1 / (n * QUANT)
    cov = (S2 - np.outer(S1, S1) / n) / ((n - 1) * QUANT * QUANT)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = []
    eigs = []
    for idx in order:
        v = evecs[:, idx]
        # sign convention: the largest-|entry| coordinate is positive
        j = int(np.argmax(np.abs(v)))
        if v[j] < 0:
            v = -v
        comps.append([float(x) for x in v])
        eigs.append(float(max(evals[idx], 0.0)))
    diag = [s2[i * d + i] for i in range(d)]
    return PCAModel(
        mean=[float(x) for x in mean],
        components=comps,
        eigenvalues=eigs,
        n=n,
        s1=s1,
        s2_diag=diag,
    )


def pca_transform(
    df: DataFrame,
    model: PCAModel,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    out_col: str = "reduced",
) -> DataFrame:
    """Project each vector onto the model: ``(x - mean) @ W^T``.
    Returns (id, out_col array<float>); one Arrow-batched matmul pass,
    model broadcast once."""
    import numpy as np

    spark = df.sparkSession
    W = np.array(model.components, dtype="float64")
    mu = np.array(model.mean, dtype="float64")
    bc = spark.sparkContext.broadcast((W, mu))

    def gen(batches: Iterator) -> Iterator:
        import pandas as pd

        bW, bmu = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.array([np.asarray(v, dtype="float64") for v in pdf["v"]])
            P = (X - bmu) @ bW.T
            yield pd.DataFrame(
                {"id": pdf["id"], "out": [p.astype("float32").tolist() for p in P]}
            )

    out = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v")
    ).mapInPandas(gen, "id long, out array<float>")
    return out.select(F.col("id").alias(id_col), F.col("out").alias(out_col))


def pca_moments_df(spark, model: PCAModel) -> DataFrame:
    """The model's exact per-dimension integer moments as rows
    ``(dim, n, s1, s2)`` — the value-oracle surface for the distributed
    part of :func:`train_pca`."""
    rows = [
        (i, model.n, model.s1[i], model.s2_diag[i])
        for i in range(len(model.s1))
    ]
    return spark.createDataFrame(rows, "dim long, n long, s1 long, s2 long")


def pca_moments_sql(table: str, dim: int, vec_col: str = "embedding") -> str:
    """DuckDB twin of the exact per-dimension moments at QUANT scale."""
    from kartothek_spark.operators.similarity import quantize_sql

    q = quantize_sql(vec_col)
    return f"""
WITH quant AS (
  SELECT {q} AS qv FROM {table} WHERE {vec_col} IS NOT NULL
), pos AS (
  SELECT i AS dim, qv[i + 1] AS x
  FROM quant, unnest(range(0, {dim})) AS u(i)
)
SELECT dim, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(x) AS BIGINT) AS s1,
       CAST(sum(x * x) AS BIGINT) AS s2
FROM pos GROUP BY dim
"""


__all__ = [
    "PCAModel",
    "train_pca",
    "pca_transform",
    "pca_moments_df",
    "pca_moments_sql",
]
