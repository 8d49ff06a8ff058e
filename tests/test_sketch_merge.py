"""Mergeable sketches (operators/sketch.py CMS + HLL): estimate
guarantees, merge associativity, accuracy vs exact, and streaming
maintenance parity."""

import os

from pyspark.sql import functions as F

from tests.conftest import SF_DIR

from kartothek_spark.functions.hashing import tokens


def _docs(spark):
    return spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))


def test_cms_never_underestimates_and_error_bounded(spark):
    """est >= true count for EVERY token (the CMS structural
    guarantee), and the overestimate is bounded by the sketch's
    e/width · total contract (checked with slack on the fixture)."""
    import math

    from kartothek_spark.operators.sketch import CMS_WIDTH, cms_estimate, cms_sketch

    docs = _docs(spark)
    toks = docs.select(F.explode(tokens(F.col("text"))).alias("token"))
    truth = {r.token: r.c for r in toks.groupBy("token").agg(F.count("*").alias("c")).collect()}
    total = sum(truth.values())
    probe = toks.distinct()
    est = {r.token: r.est for r in cms_estimate(cms_sketch(docs), probe).collect()}
    assert set(est) == set(truth)
    assert all(est[t] >= c for t, c in truth.items())
    bound = math.e / CMS_WIDTH * total
    over = [est[t] - truth[t] for t in truth]
    # the e/w bound holds with prob 1-1/e^depth per query; allow the
    # fixture a small tail but require the bulk inside it
    assert sum(1 for o in over if o > bound) <= max(1, len(over) // 20)


def test_cms_merge_matches_full_and_is_order_free(spark):
    from kartothek_spark.operators.sketch import cms_sketch, merge_cms

    docs = _docs(spark)
    parts = [docs.where(F.col("doc_id") % 3 == i) for i in range(3)]
    full = {(r.row, r.col): r.cnt for r in cms_sketch(docs).collect()}
    m1 = {(r.row, r.col): r.cnt for r in merge_cms(*[cms_sketch(p) for p in parts]).collect()}
    m2 = {
        (r.row, r.col): r.cnt
        for r in merge_cms(*[cms_sketch(p) for p in reversed(parts)]).collect()
    }
    assert m1 == full and m2 == full


def test_hll_estimate_tracks_exact_distinct(spark):
    """The HLL estimate lands within the published error envelope of
    the exact distinct-token count, globally and per source."""
    from kartothek_spark.operators.sketch import HLL_P, hll_estimate, hll_registers

    docs = _docs(spark)
    exact = (
        docs.select(F.explode(tokens(F.col("text"))).alias("t")).distinct().count()
    )
    est = hll_estimate(hll_registers(docs)).collect()[0].est
    tol = max(3 * 1.04 / (1 << HLL_P) ** 0.5, 0.05)
    assert abs(est - exact) / exact < tol


def test_hll_merge_is_idempotent_max(spark):
    """Register-wise max: merging overlapping slices — or the same
    slice twice — equals the full build (re-delivery can never corrupt
    an HLL)."""
    from kartothek_spark.operators.sketch import hll_registers, merge_hll

    docs = _docs(spark)
    h1 = hll_registers(docs.where("doc_id % 2 = 0"))
    h2 = hll_registers(docs.where("doc_id % 3 != 1"))  # overlaps h1
    h3 = hll_registers(docs)
    merged = {(r.bucket, r.rho) for r in merge_hll(h1, h2, h3, h1).collect()}
    full = {(r.bucket, r.rho) for r in hll_registers(docs).collect()}
    assert merged == full


def test_stream_sketches_equal_batch(spark, tmp_root):
    """Drained streaming CMS and HLL equal their batch builds over
    everything ingested."""
    from kartothek_spark.dataset.read import read_table
    from kartothek_spark.operators.sketch import cms_sketch, hll_registers
    from kartothek_spark.streaming.update import stream_cms_sketch, stream_hll_registers

    docs = _docs(spark).select("doc_id", "text", "source")
    src = os.path.join(tmp_root, "_src")
    docs.repartition(3).write.parquet(src)

    def drain(op, uuid, **kw):
        stream = (
            spark.readStream.format("parquet")
            .schema(docs.schema)
            .option("maxFilesPerTrigger", "1")
            .load(src)
        )
        q = op(
            stream, tmp_root, uuid,
            checkpoint_dir=os.path.join(tmp_root, f"_ckpt_{uuid}"),
            trigger={"availableNow": True}, **kw,
        )
        assert q.awaitTermination(300)

    drain(stream_cms_sketch, "cms")
    drain(stream_hll_registers, "hll", group_cols=("source",))

    got_cms = {(r.row, r.col): r.cnt for r in read_table(spark, tmp_root, "cms").collect()}
    want_cms = {(r.row, r.col): r.cnt for r in cms_sketch(docs).collect()}
    assert got_cms == want_cms
    got_hll = {
        (r.source, r.bucket): r.rho for r in read_table(spark, tmp_root, "hll").collect()
    }
    want_hll = {
        (r.source, r.bucket): r.rho
        for r in hll_registers(docs, group_cols=("source",)).collect()
    }
    assert got_hll == want_hll
