"""Similarity search over embedding columns (`array<float>`).

Two paths, as a 100 TB design demands:

* **brute force** — exact cosine top-k; the baseline and the verifier.
  cross-join (broadcast the query side) × vectorized column math. All
  arithmetic is an explicit left-to-right double fold so DuckDB oracles
  reproduce results bit-for-bit.
* **LSH-bucketed** — random-hyperplane sign buckets from *deterministic*
  pseudo-random planes (hash-derived, no RNG state), so the bucketing
  itself is reproducible in SQL. Candidates = same bucket; at scale the
  cross-join shrinks from N×Q to |bucket|×Q and the bucket id is a
  shuffle-friendly integer key. Recall is tunable via number of planes /
  multi-probe; exactness is NOT claimed.

No Python UDFs: `zip_with`/`aggregate` run inside codegen. For very wide
vectors a Pandas-UDF BLAS path can be swapped in, but at dim=64 the
JVM fold wins by avoiding Arrow transfer entirely.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from kartothek_spark.functions.hashing import h60, h60_sql, H60_MAX
from kartothek_spark.operators._util import scale_out

LSH_PLANES = 8  # 2^8 buckets


def _fold_sum(arr: Column) -> Column:
    return F.aggregate(arr, F.lit(0.0), lambda acc, v: acc + v)


def dot(a: Column, b: Column) -> Column:
    return _fold_sum(F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")))


def norm(a: Column) -> Column:
    return F.sqrt(_fold_sum(F.transform(a, lambda x: x.cast("double") * x.cast("double"))))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def dot_sql(a: str, b: str, dim: int) -> str:
    return (
        f"list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        f"list_transform(range(1, {dim + 1}), i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))), "
        f"(x, y) -> x + y)"
    )


def norm_sql(a: str, dim: int) -> str:
    return (
        f"sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        f"list_transform(range(1, {dim + 1}), i -> CAST({a}[i] AS DOUBLE) * CAST({a}[i] AS DOUBLE))), "
        f"(x, y) -> x + y))"
    )


def cosine_sql(a: str, b: str, dim: int) -> str:
    return f"({dot_sql(a, b, dim)} / ({norm_sql(a, dim)} * {norm_sql(b, dim)}))"


def brute_force_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k neighbors per query vector.

    ``queries`` is broadcast (small side); the corpus is scanned once.
    Ties and float noise are controlled: rank orders by (rounded cosine
    DESC, neighbor id ASC) — fully deterministic.
    Output: (query_id, neighbor_id, rank, cos_sim).
    """
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv"))
    c = scale_out(df).select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv"))
    sims = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("__qv"), F.col("__cv")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("long").alias("rank"), "cos_sim")
    )


def brute_force_topk_sql(
    table: str, query_filter: str, k: int, dim: int, id_col: str = "vec_id", vec_col: str = "embedding"
) -> str:
    cos = cosine_sql("q.v", "c.v", dim)
    return f"""
WITH q AS (
  SELECT {id_col} AS query_id, {vec_col} AS v FROM {table} WHERE {query_filter}
), c AS (
  SELECT {id_col} AS neighbor_id, {vec_col} AS v FROM {table}
), sims AS (
  SELECT q.query_id, c.neighbor_id, round({cos}, 6) AS cos_sim
  FROM c, q WHERE q.query_id <> c.neighbor_id
)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, cos_sim FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
  FROM sims
) WHERE rank <= {k}
"""


def embedding_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cos >= threshold, id_a < id_b).
    Exact all-pairs form; at scale, run :func:`lsh_bucket` first and join
    within buckets only."""
    df = scale_out(df)
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(cosine(F.col("__va"), F.col("__vb")), 6).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= threshold)
    )


def embedding_dup_pairs_sql(table: str, threshold: float, dim: int, id_col: str = "vec_id", vec_col: str = "embedding") -> str:
    cos = cosine_sql("a.{v}".format(v=vec_col), f"b.{vec_col}", dim)
    return f"""
SELECT a.{id_col} AS id_a, b.{id_col} AS id_b, round({cos}, 6) AS cos_sim
FROM {table} a JOIN {table} b ON a.{id_col} < b.{id_col}
WHERE round({cos}, 6) >= {threshold}
"""


def _plane_weight(p: int, j: int) -> float:
    """Deterministic pseudo-random hyperplane component in [-1, 1):
    the Python rendering of ``(h60('<p>,<j>') / H60_MAX) * 2 - 1``. The
    planes are CONSTANTS — computed once here and embedded as literals in
    both engines (repr(float) round-trips exactly in Spark and DuckDB),
    never as per-row md5 expressions."""
    import hashlib

    h = int(hashlib.md5(f"{p},{j}".encode()).hexdigest()[:15], 16)
    return (h / float(H60_MAX)) * 2.0 - 1.0


def lsh_bucket(vec: Column, dim: int, planes: int = LSH_PLANES) -> Column:
    """Sign-bucket id: bit p = (vec · plane_p) >= 0. Integer in [0, 2^planes);
    the plane loop is unrolled in Python (shift amounts must be literals);
    plane weights are literal arrays, so the per-row work is exactly
    planes × dim fused multiply-adds."""
    total = F.lit(0).cast("long")
    for p in range(planes):
        plane = F.array(*[F.lit(_plane_weight(p, j)) for j in range(dim)])
        d = _fold_sum(F.zip_with(vec, plane, lambda x, w: x.cast("double") * w))
        total = total + F.when(d >= 0, F.lit(1 << p).cast("long")).otherwise(F.lit(0).cast("long"))
    return total


def lsh_bucket_sql(vec: str, dim: int, planes: int = LSH_PLANES) -> str:
    def plane_dot(p: int) -> str:
        lit = "[" + ", ".join(repr(_plane_weight(p, j)) for j in range(dim)) + "]"
        return (
            f"list_reduce(list_prepend(CAST(0 AS DOUBLE), "
            f"list_transform(range(1, {dim + 1}), i -> CAST({vec}[i] AS DOUBLE) * ({lit})[i])), "
            f"(x, y) -> x + y)"
        )

    terms = " + ".join(
        f"(CASE WHEN {plane_dot(p)} >= 0 THEN CAST({1 << p} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
        for p in range(planes)
    )
    return f"({terms})"


def lsh_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 5,
    dim: int = 64,
    planes: int = LSH_PLANES,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates share the query's LSH bucket; exact
    cosine rank within candidates. The scale path — the join key is the
    bucket id, so the N×Q cross-join never materializes."""
    c = scale_out(df).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        lsh_bucket(F.col(vec_col), dim, planes).alias("__bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        lsh_bucket(F.col(vec_col), dim, planes).alias("__bucket"),
    )
    sims = (
        c.join(F.broadcast(q), "__bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("__qv"), F.col("__cv")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("long").alias("rank"), "cos_sim")
    )
