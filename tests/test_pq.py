"""IVF-PQ: determinism, recall vs brute force, planted-duplicate probe."""

import os

from pyspark.sql import functions as F

from tests.conftest import SF_DIR

from kartothek_spark.operators.pq import ivfpq_topk
from kartothek_spark.operators.similarity import brute_force_topk

DIM = 64


def _emb(spark):
    return spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet")).select(
        "vec_id", "embedding"
    )


def _topk_sets(df):
    out = {}
    for r in df.collect():
        out.setdefault(r.query_id, set()).add(r.neighbor_id)
    return out


def test_ivfpq_deterministic(spark):
    emb = _emb(spark)
    q = emb.where(F.col("vec_id") < 5)
    a = sorted(map(tuple, ivfpq_topk(emb, q, k=5, dim=DIM).collect()))
    b = sorted(map(tuple, ivfpq_topk(emb, q, k=5, dim=DIM).collect()))
    assert a == b


def test_ivfpq_recall_vs_brute_force(spark):
    emb = _emb(spark)
    q = emb.where(F.col("vec_id") < 20)
    approx = _topk_sets(ivfpq_topk(emb, q, k=5, dim=DIM, nprobe=8, refine=8))
    exact = _topk_sets(brute_force_topk(emb, q, k=5))
    hits = sum(len(approx.get(qid, set()) & nb) for qid, nb in exact.items())
    recall = hits / sum(len(nb) for nb in exact.values())
    # measured 0.85 on this data (synthetic embeddings have weak cell
    # structure, so half-probe caps recall); generous floor for stability
    assert recall >= 0.6, f"recall@5 {recall:.2f} below floor"


def test_ivfpq_full_probe_high_recall(spark):
    """nprobe == n_centroids: every cell probed, so the only loss is PQ
    quantization inside the ADC shortlist — with a generous refine the
    exact re-rank recovers nearly everything (measured 1.00)."""
    emb = _emb(spark)
    q = emb.where(F.col("vec_id") < 10)
    approx = _topk_sets(
        ivfpq_topk(emb, q, k=5, dim=DIM, n_centroids=8, nprobe=8, refine=10)
    )
    exact = _topk_sets(brute_force_topk(emb, q, k=5))
    hits = sum(len(approx.get(qid, set()) & nb) for qid, nb in exact.items())
    recall = hits / sum(len(nb) for nb in exact.values())
    assert recall >= 0.9, f"full-probe recall@5 {recall:.2f}"


def test_ivfpq_planted_duplicate_is_rank1(spark):
    """A corpus clone of each query vector must come back at rank 1 with
    cos_sim 1.0: its ADC distance equals the query's own reconstruction
    distance (minimal), and the exact re-rank pins it first."""
    emb = _emb(spark).where(F.col("vec_id") < 200)
    q = emb.where(F.col("vec_id") < 5)
    clones = q.select((F.col("vec_id") + 10000).alias("vec_id"), "embedding")
    corpus = emb.unionByName(clones)
    top = ivfpq_topk(corpus, q, k=3, dim=DIM, nprobe=4, refine=4)
    r1 = {r.query_id: (r.neighbor_id, r.cos_sim) for r in top.where("rank = 1").collect()}
    for qid, (nid, cos) in r1.items():
        assert nid == qid + 10000, f"query {qid}: rank1={nid}"
        assert cos == 1.0


def test_ivfpq_cos_matches_brute_force_values(spark):
    """For neighbors both operators return, cos_sim must be bit-equal
    (same fixed-point contract)."""
    emb = _emb(spark)
    q = emb.where(F.col("vec_id") < 10)
    a = {(r.query_id, r.neighbor_id): r.cos_sim for r in ivfpq_topk(emb, q, k=5, dim=DIM).collect()}
    b = {(r.query_id, r.neighbor_id): r.cos_sim for r in brute_force_topk(emb, q, k=5).collect()}
    shared = set(a) & set(b)
    assert shared, "no overlap between approx and exact top-k at all"
    for key in shared:
        assert a[key] == b[key]
