"""Distributed k-means and cluster-blocked semantic dedup (SemDeDup).

The reference engine has no clustering layer (its surface stops at
indices/cubes, ``kartothek/io_components/metapartition.py``); this module
is part of the beyond-reference LLM-curation surface, implementing the
SemDeDup recipe (Abbas et al. 2023, arXiv:2303.09540): cluster the
embedding space with k-means, then search near-duplicates only *within*
a cluster — turning the quadratic all-pairs problem into k independent
block problems.

Scale design (100 TB / 1000-executor framing):

* **Assignment is a pure codegen'd expression** over broadcast-literal
  centroids — no join, no shuffle, no Python. Each row folds over the
  k-entry centroid array with the fixed-point contract shared with
  ``operators/similarity.py`` (``quantize``/``qdot``/``cos_from_ints``),
  so assignments are bit-identical across engines and SQL-twin-checkable.
  Beyond ``EXPR_MAX_TERMS`` centroid terms (k·d), assignment falls back
  to a vectorized Arrow-batched NumPy pass (one int64 matmul per batch)
  — same math, same rounding, still zero shuffle.
* **The Lloyd update is map-side combined**: rows explode to
  (cluster, dim, value) but the partial ``sum`` happens before the
  exchange, so the shuffle is k·(d+1)·partitions rows regardless of
  corpus size; the driver only ever holds the k×d centroid matrix.
* **SemDeDup pair search reuses the block-matrix kernel** of
  :func:`kartothek_spark.operators.similarity.embedding_dup_pairs` with
  ``group_col="cluster"`` — one int64 matmul per (cluster, block-pair)
  task; k bounds the biggest matmul, exactly the paper's contract
  (size k so N/k rows fit a task).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kartothek_spark.operators.similarity import (
    QUANT,
    cos_from_ints,
    cos_from_ints_sql,
    qdot,
    qdot_sql,
    quantize,
    quantize_sql,
)

# k*d ceiling for the literal-expression assignment path; above it the
# generated fold would stress codegen method limits, so assignment drops
# to the Arrow-batched NumPy pass (identical math). 16384 ≈ k=256 at d=64.
EXPR_MAX_TERMS = 16384


@dataclass
class KMeansModel:
    """Trained centroids (float64 driver-side matrix, k×d) + final sizes."""

    centroids: list[list[float]]
    sizes: list[int]

    @property
    def k(self) -> int:
        return len(self.centroids)


def _quantize_centroids(centroids):
    """Driver-side mirror of :func:`quantize` (float64 math == JVM double)."""
    import numpy as np

    C = np.asarray(centroids, dtype="float64")
    if C.ndim != 2 or C.shape[0] == 0:
        raise ValueError("centroids must be a non-empty k x d matrix")
    Cq = np.floor(C * QUANT + 0.5).astype("int64")
    nq = (Cq * Cq).sum(axis=1)
    return Cq, nq


def _assign_struct(qcol: Column, nv: Column, Cq, nq) -> Column:
    """struct(cluster long, cos_sim double) for one row's quantized vector.

    Fold: per centroid, struct(cos, -index); array_max picks max cos and
    breaks rounded-cosine ties toward the smallest centroid index —
    matching the SQL twin's ``ORDER BY cos DESC, c ASC``.
    """
    entries = [
        F.struct(
            F.array(*[F.lit(int(x)) for x in row]).cast("array<long>").alias("cq"),
            F.lit(int(n)).cast("long").alias("nq"),
            F.lit(int(-i)).alias("ni"),
        )
        for i, (row, n) in enumerate(zip(Cq.tolist(), nq.tolist()))
    ]
    scores = F.transform(
        F.array(*entries),
        lambda s: F.struct(
            cos_from_ints(qdot(qcol, s["cq"]), nv, s["nq"]).alias("cos"),
            s["ni"].alias("ni"),
        ),
    )
    best = F.array_max(scores)
    return F.struct(
        (-best["ni"]).cast("long").alias("cluster"), best["cos"].alias("cos_sim")
    )


def _with_cluster_expr(df: DataFrame, centroids, vec_col: str) -> DataFrame:
    Cq, nq = _quantize_centroids(centroids)
    # bind the quantized vector and its norm as lambda VARIABLES (nested
    # single-element transforms): expressions captured by a HOF lambda are
    # re-evaluated per element, so via plain withColumn staging quantize()
    # would re-run once per centroid (see functions/hashing.py:bind_once)
    q_expr = quantize(F.col(vec_col))
    best = F.element_at(
        F.transform(
            F.array(q_expr),
            lambda q: F.element_at(
                F.transform(
                    F.array(qdot(q, q)),
                    lambda nv: _assign_struct(q, nv, Cq, nq),
                ),
                1,
            ),
        ),
        1,
    )
    out = df.withColumn("__a", best)
    return (
        out.withColumn("cluster", F.col("__a")["cluster"])
        .withColumn("cos_sim", F.col("__a")["cos_sim"])
        .drop("__a")
    )


def _with_cluster_batches(df: DataFrame, centroids, vec_col: str) -> DataFrame:
    """Arrow-batched fallback for large k·d: one int64 matmul per batch,
    identical fixed-point math and rounding; ``argmax`` returns the first
    maximum, i.e. the smallest centroid index — same tie-break."""
    import numpy as np
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    Cq, nq = _quantize_centroids(centroids)
    cn = np.sqrt(nq.astype("float64"))
    schema = StructType(
        list(df.schema.fields)
        + [StructField("cluster", LongType()), StructField("cos_sim", DoubleType())]
    )

    def fn(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.array(
                [np.asarray(v, dtype="float64") for v in pdf[vec_col]], dtype="float64"
            )
            Vq = np.floor(V * QUANT + 0.5).astype("int64")
            nv = np.sqrt((Vq * Vq).sum(axis=1).astype("float64"))
            cosm = np.round((Vq @ Cq.T).astype("float64") / (nv[:, None] * cn[None, :]), 6)
            best = cosm.argmax(axis=1)
            out = pdf.copy()
            out["cluster"] = best.astype("int64")
            out["cos_sim"] = cosm[np.arange(len(best)), best]
            yield out

    return df.mapInPandas(fn, schema)


def with_cluster(df: DataFrame, centroids, vec_col: str = "embedding") -> DataFrame:
    """``df`` + (``cluster`` long, ``cos_sim`` double): nearest centroid by
    fixed-point cosine, ties toward the smaller index. Narrow (no shuffle,
    no join) in both the expression and the batched path."""
    rows = len(centroids)
    dim = len(centroids[0]) if rows else 0
    if rows * dim <= EXPR_MAX_TERMS:
        return _with_cluster_expr(df, centroids, vec_col)
    return _with_cluster_batches(df, centroids, vec_col)


def kmeans_assign(
    df: DataFrame,
    centroids,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, cluster, cos_sim) nearest-centroid assignment."""
    return with_cluster(df, centroids, vec_col).select(id_col, "cluster", "cos_sim")


def kmeans_assign_seeded_sql(
    table: str, k: int, dim: int, id_col: str = "vec_id", vec_col: str = "embedding"
) -> str:
    """DuckDB twin of ``kmeans_assign`` with centroids = the rows whose id
    is < k (the SQL-expressible centroid source the gate uses)."""
    cos = cos_from_ints_sql(qdot_sql("v.q", "s.cq", dim), "v.n", "s.cn")
    return f"""
WITH q AS (SELECT {id_col} AS id, {quantize_sql(vec_col)} AS q FROM {table}),
base AS (SELECT id, q, {qdot_sql('q', 'q', dim)} AS n FROM q),
seeds AS (SELECT id AS c, q AS cq, n AS cn FROM base WHERE id < {k}),
scored AS (
  SELECT v.id, s.c, {cos} AS cos_sim,
         row_number() OVER (PARTITION BY v.id ORDER BY {cos} DESC, s.c ASC) AS rn
  FROM base v CROSS JOIN seeds s)
SELECT id AS {id_col}, c AS cluster, cos_sim FROM scored WHERE rn = 1
"""


INIT_SAMPLE_FACTOR = 10


def _greedy_init(df: DataFrame, k: int, vec_col: str, id_col: str, sample_rows: int):
    """Deterministic farthest-first centroid init on a hash-smallest sample.

    One TakeOrdered job draws ``sample_rows`` pseudo-random rows (stable
    across runs and partitionings — ``xxhash64(id)`` order), then the
    driver greedily picks k centers, each maximizing its cosine distance
    to the nearest already-chosen center (ties break toward the earliest
    hash-ordered sample row — ``np.argmin`` takes the first minimum in
    sample order, which is xxhash64 order, not id order).
    The sample is bounded driver memory; the spread init is what lets
    Lloyd's recover well-separated clusters instead of merging them under
    a uniform random draw.

    Sample-size contract: the greedy walk can only pick centers the
    sample contains, so the sample must comfortably oversample k — a
    sample barely above k degenerates to "take whatever hashed smallest"
    and Lloyd's merges real clusters. Enforced: ``sample_rows`` must be
    at least ``INIT_SAMPLE_FACTOR * k`` (the k-means|| oversampling
    ratio, Bahmani et al. 2012 use l = 2k per round x ~5 rounds = 10k
    total); callers with large k raise ``init_sample_rows`` accordingly.
    Driver memory stays bounded at sample_rows * d float64s — at the
    enforced minimum that is 10k*d, the same order as the k*d centroid
    matrix the driver already holds."""
    import numpy as np

    if sample_rows < INIT_SAMPLE_FACTOR * k:
        raise ValueError(
            f"init sample of {sample_rows} rows is too small for k={k}: "
            f"the farthest-first walk needs >= {INIT_SAMPLE_FACTOR}x "
            f"oversampling ({INIT_SAMPLE_FACTOR * k} rows) to have real "
            "cluster structure to choose from — raise init_sample_rows"
        )
    rows = (
        df.select(F.col(vec_col).alias("v"), F.col(id_col).alias("i"))
        .orderBy(F.xxhash64(F.col("i")), F.col("i"))
        .limit(sample_rows)
        .collect()
    )
    if len(rows) < k:
        raise ValueError(f"k={k} exceeds the {len(rows)} available rows")
    X = np.array([np.asarray(r["v"], dtype="float64") for r in rows], dtype="float64")
    norms = np.linalg.norm(X, axis=1)
    Xn = X / np.maximum(norms, 1e-30)[:, None]
    chosen = [0]  # hash-smallest row seeds the walk
    best = Xn @ Xn[0]  # cosine to the nearest chosen center so far
    for _ in range(1, k):
        nxt = int(np.argmin(best))  # farthest (argmin takes the first = smallest id)
        chosen.append(nxt)
        best = np.maximum(best, Xn @ Xn[nxt])
    return X[chosen]


def _train_partials(df: DataFrame, C, vec_col: str) -> DataFrame:
    """One Lloyd iteration's sufficient statistics: assignment AND
    per-cluster (count, component-sum) partials in a single Arrow pass
    per partition (the classic scalable k-means shape — MLlib's
    treeAggregate analog). Each partition emits at most k·(d+1) rows
    ``(cluster, pos, s)`` with pos 0 = count sentinel, so the shuffle is
    k·(d+1)·partitions regardless of corpus size; the assignment math is
    byte-identical to :func:`_with_cluster_batches` (fixed-point cosine,
    first-max = smallest index)."""
    import numpy as np
    import pandas as pd

    Cq, nq = _quantize_centroids(C)
    cn = np.sqrt(nq.astype("float64"))
    k, d = np.asarray(C, dtype="float64").shape

    def fn(batches):
        sums = np.zeros((k, d + 1), dtype="float64")
        seen = False
        for pdf in batches:
            if len(pdf) == 0:
                continue
            seen = True
            V = np.array(
                [np.asarray(v, dtype="float64") for v in pdf[vec_col]], dtype="float64"
            )
            Vq = np.floor(V * QUANT + 0.5).astype("int64")
            nv = np.sqrt((Vq * Vq).sum(axis=1).astype("float64"))
            cosm = np.round((Vq @ Cq.T).astype("float64") / (nv[:, None] * cn[None, :]), 6)
            a = cosm.argmax(axis=1)
            X = np.concatenate([np.ones((len(V), 1)), V], axis=1)
            for c in np.unique(a):
                sums[c] += X[a == c].sum(axis=0)
        if not seen:
            return
        nz = np.nonzero(sums[:, 0] > 0)[0]
        yield pd.DataFrame(
            {
                "cluster": np.repeat(nz, d + 1).astype("int64"),
                "pos": np.tile(np.arange(d + 1, dtype="int32"), len(nz)),
                "s": sums[nz].ravel(),
            }
        )

    return (
        df.select(vec_col)
        .mapInPandas(fn, "cluster long, pos int, s double")
        .groupBy("cluster", "pos")
        .agg(F.sum("s").alias("s"))
    )


def kmeans_train(
    df: DataFrame,
    k: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    iters: int = 8,
    init_sample_rows: int = 4096,
) -> KMeansModel:
    """Distributed Lloyd's k-means over cosine geometry.

    Init is the deterministic greedy farthest-first walk of
    :func:`_greedy_init`. Each iteration is ONE job: a vectorized Arrow
    pass fusing assignment with per-cluster partial sums
    (:func:`_train_partials`), then a k·(d+1)-row aggregation; only
    k·(d+1) scalars ever reach the driver. Empty clusters keep their
    previous centroid. (The public :func:`kmeans_assign` path stays a
    pure JVM expression — training fuses the two steps because paying an
    Arrow transfer once per iteration beats two passes.)
    """
    import numpy as np

    C = _greedy_init(df, k, vec_col, id_col, init_sample_rows)
    d = C.shape[1]
    sizes = [0] * k
    for _ in range(max(1, iters)):
        partials = _train_partials(df, C, vec_col).collect()
        sums = np.zeros((k, d), dtype="float64")
        counts = np.zeros(k, dtype="float64")
        for r in partials:
            if r["pos"] == 0:
                counts[r["cluster"]] = r["s"]
            else:
                sums[r["cluster"], r["pos"] - 1] = r["s"]
        nonempty = counts > 0
        C = np.where(nonempty[:, None], sums / np.maximum(counts, 1.0)[:, None], C)
        sizes = counts.astype("int64").tolist()
    return KMeansModel(centroids=C.tolist(), sizes=sizes)


def semantic_dup_pairs(
    df: DataFrame,
    centroids,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    target_block_rows: int = 4096,
    cluster_col: str | None = None,
    n: int | None = None,
) -> DataFrame:
    """(id_a, id_b, cos_sim) near-duplicate pairs searched only within a
    k-means cluster (the SemDeDup candidate restriction). Pair discovery
    is the shared block-matrix kernel grouped by cluster, so the biggest
    single matmul is bounded by the largest cluster's block size. Pass
    ``cluster_col`` when ``df`` already carries an assignment (e.g. from
    :func:`with_cluster`) to skip re-assigning, and ``n`` (the row count)
    when the caller already knows it — sizing blocks otherwise costs a
    count job over ``df``, which for a pre-assigned frame re-runs the
    quantize/cosine assignment expressions just to count rows."""
    import math

    if cluster_col is None:
        clustered = with_cluster(df, centroids, vec_col).select(
            id_col, vec_col, "cluster"
        )
        cluster_col = "cluster"
    else:
        clustered = df
    from kartothek_spark.operators.similarity import embedding_dup_pairs

    if n is None:
        n = df.count()
    blocks = max(1, math.ceil(n / (max(1, len(centroids)) * target_block_rows)))
    return embedding_dup_pairs(
        clustered,
        threshold=threshold,
        id_col=id_col,
        vec_col=vec_col,
        blocks=blocks,
        group_col=cluster_col,
    )


def semantic_dedup(
    df: DataFrame,
    centroids,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep: str = "min_id",
) -> DataFrame:
    """SemDeDup application: for every in-cluster near-dup pair
    (cos >= threshold), drop one member (pairwise rule, not a transitive
    closure — the paper's per-cluster ε-dedup; for full
    connected-components semantics compose with
    :func:`kartothek_spark.operators.dedup.duplicate_clusters`).

    ``keep="min_id"`` drops the higher id (deterministic canonical).
    ``keep="farthest"`` is the paper's diversity rule (Abbas et al. 2023
    §3: keep the example with the LOWEST cosine to its centroid): the
    pair member closer to the centroid is the more redundant one and is
    dropped; centroid-cosine ties drop the higher id.

    Returns the kept rows WITH their assignment columns (``cluster``,
    ``cos_sim``) — the single assignment pass feeds pair mining, the
    farthest rule, and the output."""
    if keep not in ("min_id", "farthest"):
        raise ValueError(f"keep must be 'min_id' or 'farthest', got {keep!r}")
    from kartothek_spark.operators._util import release_on_gc

    # assign ONCE; the assignment feeds pair mining, the farthest rule's
    # centroid cosines, and the returned rows (which carry cluster +
    # cos_sim — callers get the assignment for free). Block sizing counts
    # the RAW input (n=...): counting the assigned frame would re-run the
    # assignment expressions just to get a row count.
    # PINNED with scoped release: the plan consumes `assigned` from up to
    # four branches (pair mining, both centroid-cosine joins, the final
    # anti-join return), so unpinned it re-runs the quantize/cosine
    # assignment once per branch — 1.45x wall on the sf0.1 farthest gate,
    # and extra full corpus passes at scale. The pin releases when the
    # returned frame is garbage-collected (see release_on_gc).
    assigned = with_cluster(df, centroids, vec_col).persist()
    pairs = semantic_dup_pairs(
        assigned, centroids, threshold, id_col, vec_col,
        cluster_col="cluster", n=df.count(),
    )
    if keep == "min_id":
        drops = pairs.select(F.col("id_b").alias(id_col)).distinct()
    else:
        cent = assigned.select(
            F.col(id_col).alias("__cid"), F.col("cos_sim").alias("__ccos")
        )
        scored = (
            pairs.join(cent.withColumnRenamed("__cid", "id_a"), "id_a")
            .withColumnRenamed("__ccos", "__cos_a")
            .join(cent.withColumnRenamed("__cid", "id_b"), "id_b")
            .withColumnRenamed("__ccos", "__cos_b")
        )
        drops = scored.select(
            F.when(F.col("__cos_a") > F.col("__cos_b"), F.col("id_a"))
            .when(F.col("__cos_b") > F.col("__cos_a"), F.col("id_b"))
            .otherwise(F.greatest("id_a", "id_b"))
            .alias(id_col)
        ).distinct()
    return release_on_gc(assigned.join(drops, id_col, "left_anti"), assigned)


def save_kmeans_model(
    spark, model, root: str, model_uuid: str = "kmeans_model", extra_metadata=None
):
    """Persist centroids as a tiny managed dataset (cluster, centroid,
    size) with k/dim in manifest metadata — the model-registry form: a
    trained model becomes a versioned, GC-safe, copyable table that any
    session (or stream) can load without re-training."""
    from kartothek_spark.dataset.write import store_dataframe_as_dataset

    if isinstance(model, KMeansModel):
        cents, sizes = model.centroids, model.sizes
    else:
        cents, sizes = [list(c) for c in model], [0] * len(model)
    rows = [
        (i, [float(x) for x in c], int(s))
        for i, (c, s) in enumerate(zip(cents, sizes))
    ]
    meta = {"kmeans_k": len(cents), "kmeans_dim": len(cents[0]) if cents else 0}
    if extra_metadata:
        meta.update(extra_metadata)
    df = spark.createDataFrame(rows, "cluster long, centroid array<double>, size long")
    return store_dataframe_as_dataset(
        spark, df, root, model_uuid, metadata=meta, overwrite=True
    )


def load_kmeans_model(spark, root: str, model_uuid: str = "kmeans_model") -> KMeansModel:
    from kartothek_spark.dataset.read import read_table

    rows = read_table(spark, root, model_uuid).orderBy("cluster").collect()
    return KMeansModel(
        centroids=[list(r["centroid"]) for r in rows],
        sizes=[int(r["size"]) for r in rows],
    )


def build_cluster_assignments(
    spark,
    df: DataFrame,
    root: str,
    assign_uuid: str,
    centroids,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    extra_metadata=None,
):
    """Materialize assignments as a managed dataset PARTITIONED BY
    cluster — the persisted semantic shard map: downstream per-cluster
    work (SemDeDup passes, cluster-local extracts, shard exports) becomes
    a partition-pruned read of one directory instead of a corpus scan +
    re-assignment."""
    from kartothek_spark.dataset.write import store_dataframe_as_dataset

    assigned = kmeans_assign(df, centroids, vec_col, id_col)
    return store_dataframe_as_dataset(
        spark, assigned, root, assign_uuid,
        partition_on=["cluster"], metadata=extra_metadata,
    )


def sync_cluster_assignments(
    spark,
    new_df: DataFrame,
    root: str,
    assign_uuid: str,
    centroids,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    extra_metadata=None,
):
    """O(new rows) append of the new vectors' assignments in one atomic
    commit (fixed centroids — the online half of the offline-train /
    online-assign split)."""
    from kartothek_spark.dataset.write import update_dataset

    assigned = kmeans_assign(new_df, centroids, vec_col, id_col)
    return update_dataset(spark, assigned, root, assign_uuid, metadata=extra_metadata)


def merge_kmeans_stats(model: KMeansModel, partials, k: int, d: int) -> KMeansModel:
    """Fold one batch's sufficient statistics (rows of
    :func:`_train_partials`) into a model: counts-weighted running means
    — the mini-batch / streaming k-means update (each centroid moves to
    the weighted average of its stored mass and the batch's new mass).
    Empty-in-batch clusters keep their centroid and size."""
    import numpy as np

    C = np.asarray(model.centroids, dtype="float64")
    old_n = np.asarray(model.sizes, dtype="float64")
    sums = np.zeros((k, d), dtype="float64")
    counts = np.zeros(k, dtype="float64")
    for r in partials:
        if r["pos"] == 0:
            counts[r["cluster"]] = r["s"]
        else:
            sums[r["cluster"], r["pos"] - 1] = r["s"]
    total = old_n + counts
    safe = np.maximum(total, 1.0)
    newC = (C * old_n[:, None] + sums) / safe[:, None]
    newC = np.where((total > 0)[:, None], newC, C)
    return KMeansModel(centroids=newC.tolist(), sizes=total.astype("int64").tolist())


def cluster_profile(
    df: DataFrame,
    centroids,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Per-cluster observability: (cluster, n_members, sum_cos_micro,
    min_cos, max_cos). Cohesion is exposed as an exact integer-micro SUM
    of the (already 1e-6-rounded) cosines — float averages are summation-
    order-dependent across engines, integer micros are not, so the whole
    profile is value-twin-checkable; mean cohesion = sum_cos_micro / 1e6
    / n_members at the call site. One narrow assignment + one k-row
    aggregation."""
    a = with_cluster(df, centroids, vec_col)
    return a.groupBy("cluster").agg(
        F.count("*").alias("n_members"),
        F.sum(F.round(F.col("cos_sim") * 1e6).cast("long")).alias("sum_cos_micro"),
        F.min("cos_sim").alias("min_cos"),
        F.max("cos_sim").alias("max_cos"),
    )


def cluster_profile_seeded_sql(
    table: str, k: int, dim: int, id_col: str = "vec_id", vec_col: str = "embedding"
) -> str:
    cos = cos_from_ints_sql(qdot_sql("v.q", "s.cq", dim), "v.n", "s.cn")
    return f"""
WITH q AS (SELECT {id_col} AS id, {quantize_sql(vec_col)} AS q FROM {table}),
base AS (SELECT id, q, {qdot_sql('q', 'q', dim)} AS n FROM q),
seeds AS (SELECT id AS c, q AS cq, n AS cn FROM base WHERE id < {k}),
scored AS (
  SELECT v.id, s.c, {cos} AS cos_sim,
         row_number() OVER (PARTITION BY v.id ORDER BY {cos} DESC, s.c ASC) AS rn
  FROM base v CROSS JOIN seeds s),
assigned AS (SELECT id, c AS cluster, cos_sim FROM scored WHERE rn = 1)
SELECT cluster, CAST(count(*) AS BIGINT) AS n_members,
       CAST(sum(CAST(round(cos_sim * 1e6) AS BIGINT)) AS BIGINT) AS sum_cos_micro,
       min(cos_sim) AS min_cos, max(cos_sim) AS max_cos
FROM assigned GROUP BY cluster
"""


def semantic_dedup_seeded_sql(
    table: str,
    k: int,
    threshold: float,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep: str = "min_id",
) -> str:
    """DuckDB twin of assignment (seed centroids = ids < k) + in-cluster
    pair mining + the drop rule (higher id, or — ``keep='farthest'`` —
    the centroid-closer member), returning kept (id, cluster)."""
    acos = cos_from_ints_sql(qdot_sql("v.q", "s.cq", dim), "v.n", "s.cn")
    pcos = cos_from_ints_sql(qdot_sql("a.q", "b.q", dim), "a.n", "b.n")
    if keep == "min_id":
        drop_expr = "b.id"
    else:
        drop_expr = (
            "CASE WHEN a.cos_sim > b.cos_sim THEN a.id "
            "WHEN b.cos_sim > a.cos_sim THEN b.id "
            "ELSE greatest(a.id, b.id) END"
        )
    return f"""
WITH q AS (SELECT {id_col} AS id, {quantize_sql(vec_col)} AS q FROM {table}),
base AS (SELECT id, q, {qdot_sql('q', 'q', dim)} AS n FROM q),
seeds AS (SELECT id AS c, q AS cq, n AS cn FROM base WHERE id < {k}),
scored AS (
  SELECT v.id, v.q, v.n, s.c, {acos} AS cos_sim,
         row_number() OVER (PARTITION BY v.id ORDER BY {acos} DESC, s.c ASC) AS rn
  FROM base v CROSS JOIN seeds s),
assigned AS (SELECT id, q, n, c AS cluster, cos_sim FROM scored WHERE rn = 1),
drops AS (
  SELECT DISTINCT {drop_expr} AS id
  FROM assigned a JOIN assigned b ON a.cluster = b.cluster AND a.id < b.id
  WHERE {pcos} >= {threshold})
SELECT id AS {id_col}, cluster FROM assigned WHERE id NOT IN (SELECT id FROM drops)
"""
