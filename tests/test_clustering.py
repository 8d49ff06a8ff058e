"""k-means + SemDeDup (operators/clustering.py).

The embeddings testdata's `label` column is NOT geometric (intra-label and
inter-label mean cosine are both ~0), so cluster-recovery quality is pinned
on planted well-separated blobs, the same planted-structure strategy the
ANN recall tests use. Assignment exactness is pinned by the gate's DuckDB
value twin; here we pin expr-vs-batched-path parity and the planted
guarantees.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType, LongType, StructField, StructType

from kartothek_spark.operators import clustering
from kartothek_spark.operators.clustering import (
    kmeans_assign,
    kmeans_train,
    semantic_dedup,
    semantic_dup_pairs,
    with_cluster,
)

_SCHEMA = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
        StructField("label", LongType()),
    ]
)


def _blobs(spark, n=600, k=10, dim=64, noise=0.08, seed=7):
    rng = np.random.RandomState(seed)
    centers = rng.normal(size=(k, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    for i in range(n):
        c = i % k
        v = (centers[c] + noise * rng.normal(size=dim)).astype(np.float32)
        rows.append((i, [float(x) for x in v], c))
    return spark.createDataFrame(rows, _SCHEMA), centers


def _purity(assigned_rows):
    from collections import Counter

    by_cluster = {}
    for r in assigned_rows:
        by_cluster.setdefault(r["cluster"], Counter())[r["label"]] += 1
    return sum(c.most_common(1)[0][1] for c in by_cluster.values()) / len(assigned_rows)


def test_kmeans_recovers_planted_blobs(spark):
    df, centers = _blobs(spark)
    model = kmeans_train(df, 10, iters=6)
    assert model.k == 10 and sum(model.sizes) == 600
    assigned = (
        kmeans_assign(df, model.centroids)
        .join(df.select("vec_id", "label"), "vec_id")
        .select("cluster", "label")
        .collect()
    )
    assert _purity(assigned) >= 0.98
    # trained centroids sit on the planted centers (cos > 0.98 for each)
    C = np.asarray(model.centroids)
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
    best = (Cn @ centers.T).max(axis=1)
    assert (best > 0.98).all()


def test_assign_expr_and_batched_paths_agree(spark, monkeypatch):
    df, _ = _blobs(spark, n=120)
    cents = [r["embedding"] for r in df.where(F.col("vec_id") < 5).collect()]
    expr = kmeans_assign(df, cents).orderBy("vec_id").collect()
    monkeypatch.setattr(clustering, "EXPR_MAX_TERMS", 0)  # force the NumPy path
    batched = kmeans_assign(df, cents).orderBy("vec_id").collect()
    assert [tuple(r) for r in expr] == [tuple(r) for r in batched]


def test_assign_nearest_and_tiebreak(spark):
    rows = [
        (0, [1.0, 0.0], 0),
        (1, [0.0, 1.0], 0),
        (2, [0.9, 0.1], 0),
        (3, [0.5, 0.5], 0),  # equidistant from both centroids -> cluster 0
    ]
    schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("embedding", ArrayType(FloatType())),
            StructField("label", LongType()),
        ]
    )
    df = spark.createDataFrame(rows, schema)
    got = {
        r["vec_id"]: r["cluster"]
        for r in kmeans_assign(df, [[1.0, 0.0], [0.0, 1.0]]).collect()
    }
    assert got == {0: 0, 1: 1, 2: 0, 3: 0}


def test_semantic_dedup_drops_planted_copies(spark):
    df, _ = _blobs(spark, n=300)
    copies = df.withColumn("vec_id", F.col("vec_id") + 100000)
    both = df.unionByName(copies)
    model = kmeans_train(df, 10, iters=4)
    kept = semantic_dedup(both, model.centroids, threshold=0.95)
    kept_ids = {r["vec_id"] for r in kept.select("vec_id").collect()}
    # every exact copy shares its original's cluster (identical vector,
    # deterministic assignment) with cos 1.0 >= 0.95 and a higher id
    assert not {i for i in kept_ids if i >= 100000}
    assert {i for i in kept_ids if i < 100000} == set(range(300))


def test_grouped_pairs_subset_of_global_pairs(spark):
    """Cluster-scoped pair mining = global all-pairs restricted to pairs
    whose two sides land in the same cluster."""
    from kartothek_spark.operators.similarity import embedding_dup_pairs

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    seeds = [
        r["embedding"] for r in emb.where(F.col("vec_id") < 8).orderBy("vec_id").collect()
    ]
    got = {
        (r["id_a"], r["id_b"])
        for r in semantic_dup_pairs(emb, seeds, threshold=0.4).collect()
    }
    clusters = {
        r["vec_id"]: r["cluster"] for r in with_cluster(emb, seeds).collect()
    }
    want = {
        (r["id_a"], r["id_b"])
        for r in embedding_dup_pairs(emb, threshold=0.4, blocks=3).collect()
        if clusters[r["id_a"]] == clusters[r["id_b"]]
    }
    assert got == want and got


def test_cluster_profile_micro_sum_exact(spark):
    from kartothek_spark.operators.clustering import cluster_profile, kmeans_assign

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    seeds = [
        r["embedding"] for r in emb.where(F.col("vec_id") < 8).orderBy("vec_id").collect()
    ]
    prof = {r["cluster"]: r for r in cluster_profile(emb, seeds).collect()}
    rows = kmeans_assign(emb, seeds).collect()
    assert sum(p["n_members"] for p in prof.values()) == len(rows)
    by_c = {}
    for r in rows:
        by_c.setdefault(r["cluster"], []).append(r["cos_sim"])
    for c, cs in by_c.items():
        assert prof[c]["n_members"] == len(cs)
        assert prof[c]["sum_cos_micro"] == sum(round(x * 1e6) for x in cs)
        assert prof[c]["min_cos"] == min(cs) and prof[c]["max_cos"] == max(cs)


def test_semantic_dedup_farthest_keeps_diverse_member(spark):
    """keep='farthest' (the paper's rule) keeps the pair member with the
    LOWER centroid cosine; keep='min_id' keeps the lower id."""
    rows = [
        (0, [0.99, 0.14], 0),  # closer to the [1, 0] centroid
        (1, [0.90, 0.44], 0),  # farther — the diverse member
        (2, [-1.0, 0.0], 0),   # its own corner, no dup
    ]
    df = spark.createDataFrame(rows, _SCHEMA)
    cents = [[1.0, 0.0]]
    kept_far = {
        r["vec_id"]
        for r in semantic_dedup(df, cents, threshold=0.9, keep="farthest").collect()
    }
    kept_min = {
        r["vec_id"]
        for r in semantic_dedup(df, cents, threshold=0.9, keep="min_id").collect()
    }
    assert kept_far == {1, 2} and kept_min == {0, 2}
    with pytest.raises(ValueError):
        semantic_dedup(df, cents, keep="median")


def test_knn_classify_recovers_blob_labels(spark):
    """Label propagation from a third of the corpus recovers the planted
    blob labels on the unlabeled rest (≥ 0.95 accuracy)."""
    from kartothek_spark.operators.similarity import knn_classify

    df, _ = _blobs(spark, n=300)
    labeled = df.where(F.col("vec_id") % 3 == 0)
    pred = knn_classify(df.where(F.col("vec_id") % 3 != 0), labeled, k=5)
    joined = pred.join(df.select("vec_id", "label"), "vec_id").collect()
    acc = sum(r["pred_label"] == r["label"] for r in joined) / len(joined)
    assert len(joined) == 200 and acc >= 0.95


def test_kmeans_model_roundtrip_and_incremental_assignments(spark, tmp_path):
    """Persisted model loads back exactly; build + O(new) sync of the
    cluster-partitioned assignment map equals one batch assignment over
    the union; the shard read prunes by partition."""
    from kartothek_spark.dataset.read import read_table
    from kartothek_spark.operators.clustering import (
        build_cluster_assignments,
        kmeans_train,
        load_kmeans_model,
        save_kmeans_model,
        sync_cluster_assignments,
    )

    df, _ = _blobs(spark, n=200)
    model = kmeans_train(df, 5, iters=3)
    root = str(tmp_path / "store")
    save_kmeans_model(spark, model, root)
    back = load_kmeans_model(spark, root)
    assert back.centroids == model.centroids and back.sizes == model.sizes

    first = df.where(F.col("vec_id") < 120)
    rest = df.where(F.col("vec_id") >= 120)
    build_cluster_assignments(spark, first, root, "amap", back.centroids)
    sync_cluster_assignments(spark, rest, root, "amap", back.centroids)
    got = {
        (r["vec_id"], r["cluster"], r["cos_sim"])
        for r in read_table(spark, root, "amap").collect()
    }
    want = {
        (r["vec_id"], r["cluster"], r["cos_sim"])
        for r in kmeans_assign(df, back.centroids).collect()
    }
    assert got == want
    shard = read_table(spark, root, "amap", predicates=[[("cluster", "==", 2)]])
    assert {r["cluster"] for r in shard.collect()} == {2}


def test_assign_paths_agree_on_random_vectors(spark, monkeypatch):
    """Property check: the codegen'd expression path and the Arrow batch
    path produce identical (cluster, cos_sim) on random float vectors —
    including negative components, tiny magnitudes, and duplicated rows.
    Complements the gate's DuckDB twin (which pins the expr path) by
    pinning path parity on adversarial inputs."""
    import random

    rng = random.Random(99)
    dims = 16
    rows = []
    for i in range(120):
        # the fixed-point contract's domain: roughly unit-scale components
        # (|v| >> 1 overflows the int64 dot — see quantize())
        scale = 10.0 ** rng.randint(-3, 0)
        rows.append(
            (i, [float(rng.uniform(-1, 1)) * scale for _ in range(dims)], 0)
        )
    rows += [(1000 + i, rows[i][1], 0) for i in range(10)]  # exact duplicates
    df = spark.createDataFrame(rows, _SCHEMA)
    cents = [rows[i][1] for i in range(7)]
    expr = {r["vec_id"]: (r["cluster"], r["cos_sim"]) for r in kmeans_assign(df, cents).collect()}
    monkeypatch.setattr(clustering, "EXPR_MAX_TERMS", 0)
    batch = {r["vec_id"]: (r["cluster"], r["cos_sim"]) for r in kmeans_assign(df, cents).collect()}
    assert expr == batch
    # duplicated vectors must land identically to their originals
    for i in range(10):
        assert expr[1000 + i] == expr[i]


def test_merge_kmeans_stats_weighted_mean(spark):
    from kartothek_spark.operators.clustering import KMeansModel, merge_kmeans_stats

    model = KMeansModel(centroids=[[0.0, 0.0], [1.0, 1.0]], sizes=[2, 0])
    # batch stats: cluster 0 gains 2 points summing to (4, 2); cluster 1 none
    partials = [
        {"cluster": 0, "pos": 0, "s": 2.0},
        {"cluster": 0, "pos": 1, "s": 4.0},
        {"cluster": 0, "pos": 2, "s": 2.0},
    ]
    out = merge_kmeans_stats(model, partials, k=2, d=2)
    # weighted mean: (old_mean*2 + batch_sum) / 4 = (0*2+4)/4, (0*2+2)/4
    assert out.centroids[0] == [1.0, 0.5]
    assert out.centroids[1] == [1.0, 1.0]  # untouched cluster keeps centroid
    assert out.sizes == [4, 0]


def test_stream_kmeans_update_recovers_blobs(spark, tmp_path):
    """Mini-batch streaming k-means over planted blobs: the drained
    model's assignment purity stays >= 0.9 and the model's mass equals
    everything ingested."""
    from kartothek_spark.operators.clustering import kmeans_assign, load_kmeans_model
    from kartothek_spark.streaming.update import stream_kmeans_update

    df, _ = _blobs(spark, n=400)
    root = str(tmp_path / "store")
    src = str(tmp_path / "src")
    df.repartition(4).write.parquet(src)
    stream = (
        spark.readStream.format("parquet")
        .schema(df.schema)
        .option("maxFilesPerTrigger", "1")
        .load(src)
    )
    q = stream_kmeans_update(
        stream, root, k=10,
        checkpoint_dir=str(tmp_path / "ckpt"),
        trigger={"availableNow": True},
    )
    assert q.awaitTermination(300)
    model = load_kmeans_model(spark, root)
    assert sum(model.sizes) == 400
    assigned = (
        kmeans_assign(df, model.centroids)
        .join(df.select("vec_id", "label"), "vec_id")
        .select("cluster", "label")
        .collect()
    )
    assert _purity(assigned) >= 0.9


def test_kmeans_k_exceeds_rows_raises(spark):
    df, _ = _blobs(spark, n=5)
    with pytest.raises(ValueError):
        kmeans_train(df, 10)


def test_assign_bit_identical_at_expr_max_terms_boundary(spark, monkeypatch):
    """The codegen-limit seam (EXPR_MAX_TERMS, k*d=16384) must never let
    the two assignment paths diverge silently: the SAME fixture runs with
    k*d just UNDER the boundary (expression path natural, NumPy forced)
    and just OVER it (NumPy path natural, expression forced), asserting
    bit-identical (cluster, cos_sim) in both directions."""
    dim = 64
    df, _ = _blobs(spark, n=80, k=8, dim=dim)
    rng = np.random.RandomState(11)

    def centroids(k):
        C = rng.normal(size=(k, dim))
        C /= np.linalg.norm(C, axis=1, keepdims=True)
        return [[float(x) for x in row] for row in C]

    # k*d = 16384 == EXPR_MAX_TERMS: natural path is the expression
    k_under = clustering.EXPR_MAX_TERMS // dim
    cents = centroids(k_under)
    natural = [tuple(r) for r in kmeans_assign(df, cents).orderBy("vec_id").collect()]
    monkeypatch.setattr(clustering, "EXPR_MAX_TERMS", 0)
    forced_numpy = [tuple(r) for r in kmeans_assign(df, cents).orderBy("vec_id").collect()]
    assert natural == forced_numpy
    monkeypatch.undo()

    # k*d = 16448 > EXPR_MAX_TERMS: natural path is the NumPy batch pass
    cents_over = cents + centroids(1)
    assert len(cents_over) * dim > clustering.EXPR_MAX_TERMS
    natural_over = [
        tuple(r) for r in kmeans_assign(df, cents_over).orderBy("vec_id").collect()
    ]
    monkeypatch.setattr(clustering, "EXPR_MAX_TERMS", 1 << 30)
    forced_expr = [
        tuple(r) for r in kmeans_assign(df, cents_over).orderBy("vec_id").collect()
    ]
    assert natural_over == forced_expr


def test_greedy_init_sample_contract_raises(spark):
    """init_sample_rows < 10*k is rejected up front (the sample must
    oversample k for the farthest-first walk to see cluster structure)."""
    df, _ = _blobs(spark, n=300, k=10)
    with pytest.raises(ValueError, match="init sample"):
        kmeans_train(df, 32, iters=1, init_sample_rows=100)


def test_greedy_init_large_k_quality(spark):
    """Large-k init at the contract minimum (sample = 10*k) still seeds
    well enough for Lloyd's to recover the planted blobs."""
    k = 40
    df, centers = _blobs(spark, n=800, k=k, dim=32, noise=0.05, seed=3)
    model = kmeans_train(df, k, iters=5, init_sample_rows=10 * k)
    assigned = (
        kmeans_assign(df, model.centroids)
        .join(df.select("vec_id", "label"), "vec_id")
        .select("cluster", "label")
        .collect()
    )
    assert _purity(assigned) >= 0.95


def test_stream_kmeans_k_mismatch_fails_loudly(spark, tmp_path):
    """Resuming a k-means stream with a different k than the persisted
    model must raise a clear ValueError, not a NumPy shape error inside
    merge_kmeans_stats."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from kartothek_spark.operators.clustering import kmeans_train, save_kmeans_model
    from kartothek_spark.streaming.update import stream_kmeans_update

    df, _ = _blobs(spark, n=200)
    root = str(tmp_path / "store")
    model = kmeans_train(df, 10, iters=2)
    save_kmeans_model(spark, model, root, "kmeans_model")

    src = str(tmp_path / "src")
    df.write.parquet(src)
    stream = spark.readStream.format("parquet").schema(df.schema).load(src)
    q = stream_kmeans_update(
        stream, root, k=5,
        checkpoint_dir=str(tmp_path / "ckpt"),
        trigger={"availableNow": True},
    )
    with pytest.raises(StreamingQueryException, match="k is part of the model"):
        q.awaitTermination(300)
