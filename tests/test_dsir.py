"""DSIR importance resampling (operators/dsir.py).

Pins: Spark scores == DuckDB twin bit-for-bit (integer micro contract),
Gumbel-top-k selection deterministic and twin-identical, planted-target
signal (docs whose features match the target score higher), token-free
docs score 0.
"""

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _docs(spark, n=200):
    return (
        spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
        .where(F.col("doc_id") < n)
        .select("doc_id", "text")
    )


def _con():
    con = duckdb.connect()
    pq = os.path.join(SF_DIR, "documents.parquet")
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{pq}')")
    return con


RAW_SQL = "SELECT doc_id, text FROM documents WHERE doc_id < 200"
TGT_SQL = "SELECT doc_id, text FROM documents WHERE doc_id < 200 AND doc_id % 9 = 0"


def test_weights_match_sql_twin(spark):
    from kartothek_spark.operators.dsir import dsir_weights, dsir_weights_sql

    raw = _docs(spark)
    target = raw.where("doc_id % 9 = 0")
    got = sorted(tuple(r) for r in dsir_weights(raw, target, buckets=512).collect())
    want = sorted(
        tuple(r)
        for r in _con().execute(
            dsir_weights_sql(RAW_SQL, TGT_SQL, buckets=512)
        ).fetchall()
    )
    assert got == want and got


def test_resample_matches_sql_twin_and_is_deterministic(spark):
    from kartothek_spark.operators.dsir import dsir_resample, dsir_resample_sql

    raw = _docs(spark)
    target = raw.where("doc_id % 9 = 0")
    got = sorted(
        tuple(r)
        for r in dsir_resample(raw, target, k=40, seed=7, buckets=512).collect()
    )
    again = sorted(
        tuple(r)
        for r in dsir_resample(raw, target, k=40, seed=7, buckets=512).collect()
    )
    assert got == again and len(got) == 40
    want = sorted(
        tuple(r)
        for r in _con().execute(
            dsir_resample_sql(RAW_SQL, TGT_SQL, k=40, seed=7, buckets=512)
        ).fetchall()
    )
    assert got == want

    other = sorted(
        tuple(r)
        for r in dsir_resample(raw, target, k=40, seed=8, buckets=512).collect()
    )
    assert other != got  # a different seed reshuffles the Gumbel keys


def test_planted_target_signal(spark):
    """Docs belonging to the target subset share its feature distribution
    exactly, so their mean importance weight must exceed the rest's."""
    from kartothek_spark.operators.dsir import dsir_weights

    raw = _docs(spark)
    target = raw.where("doc_id % 9 = 0")
    w = dsir_weights(raw, target, buckets=512)
    means = {
        bool(r["hit"]): r["m"]
        for r in w.groupBy((F.col("doc_id") % 9 == 0).alias("hit"))
        .agg(F.avg("score_micro").alias("m"))
        .collect()
    }
    assert means[True] > means[False]


def test_tokenfree_docs_score_zero_and_k_overshoot(spark):
    from kartothek_spark.operators.dsir import dsir_resample, dsir_weights

    extra = spark.createDataFrame(
        [(900001, ""), (900002, "???!!!")], "doc_id long, text string"
    )
    raw = _docs(spark, n=40).unionByName(extra)
    target = raw.where("doc_id % 9 = 0")
    w = {r.doc_id: r.score_micro for r in dsir_weights(raw, target, buckets=512).collect()}
    assert w[900001] == 0 and w[900002] == 0

    n = raw.count()
    sel = dsir_resample(raw, target, k=n + 50, buckets=512)
    assert sel.count() == n  # k past the corpus returns everything
