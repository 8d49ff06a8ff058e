"""PCA: exact moments, planted low-rank recovery, projection algebra,
partitioning determinism."""

import numpy as np
import pytest

from kartothek_spark.operators.embeddings import (
    pca_transform,
    train_pca,
)
from kartothek_spark.operators.similarity import QUANT


def _df(spark, X, ids=None):
    ids = ids if ids is not None else range(len(X))
    rows = [(int(i), [float(x) for x in v]) for i, v in zip(ids, X)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_moments_exact_and_partition_invariant(spark):
    rng = np.random.default_rng(3)
    X = rng.normal(scale=0.3, size=(200, 8)).astype("float32")
    df = _df(spark, X)
    m1 = train_pca(df, k=4)
    m2 = train_pca(df.repartition(13), k=4)
    assert (m1.n, m1.s1, m1.s2_diag) == (m2.n, m2.s1, m2.s2_diag)
    assert m1.components == m2.components and m1.eigenvalues == m2.eigenvalues
    # exact moments equal a python recomputation of the same quantization
    Q = np.floor(X.astype("float64") * QUANT + 0.5).astype(object)
    assert m1.s1 == [int(v) for v in Q.sum(axis=0)]
    assert m1.s2_diag == [int(v) for v in (Q * Q).sum(axis=0)]


def test_planted_low_rank_recovery(spark):
    """Data = 2-component linear model + tiny noise: PCA must recover the
    plane (top-2 explained variance ~ all of it; reconstruction ~ exact)."""
    rng = np.random.default_rng(7)
    basis, _ = np.linalg.qr(rng.normal(size=(6, 2)))
    Z = rng.normal(scale=0.4, size=(500, 2))
    X = Z @ basis.T + rng.normal(scale=1e-4, size=(500, 6)) + 0.1
    df = _df(spark, X)
    m = train_pca(df, k=2)
    total_var = X.var(axis=0, ddof=1).sum()
    assert sum(m.eigenvalues) / total_var > 0.999
    # projection reproduces numpy's
    P = {r.vec_id: np.array(r.reduced) for r in pca_transform(df, m).collect()}
    W = np.array(m.components)
    mu = np.array(m.mean)
    ref = (X - mu) @ W.T
    for i in range(500):
        assert np.allclose(P[i], ref[i], atol=1e-5)
    # distances in the plane are preserved by the orthonormal projection
    d_orig = np.linalg.norm(X[0] - X[1])
    d_proj = np.linalg.norm(ref[0] - ref[1])
    assert abs(d_orig - d_proj) < 1e-2


def test_pca_validations(spark):
    df = _df(spark, np.zeros((3, 4)))
    with pytest.raises(ValueError, match="k must be"):
        train_pca(df, k=9)
    # magnitude guard: values past the fixed-point bound fail loudly
    # instead of wrapping the int64 moment sums
    big = _df(spark, np.full((4, 4), 3.0))
    with pytest.raises(Exception, match="magnitude"):
        train_pca(big, k=2)
    with pytest.raises(ValueError, match="at least 2"):
        train_pca(_df(spark, np.zeros((1, 4))), k=2)
    with pytest.raises(ValueError, match="empty"):
        train_pca(df.where("vec_id < 0"), k=2)
