"""Persisted C4 span-hash index (operators/span_index.py).

Pins: incremental batch cleaning == the batch operator over
history ∪ batch restricted to the batch (the monotonic-id contract),
through build+sync histories, the pruned-read fast path == the join
fallback, and a small probe reads only its span buckets.
"""

import os

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _docs(spark, n=120):
    return (
        spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
        .where(F.col("doc_id") < n)
        .select("doc_id", "text")
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _batch(docs):
    """Monotonic-id ingest batch: clones of every 13th doc (full-span
    overlap with history) plus novel two-sentence docs (untouchable)."""
    clones = docs.where(F.col("doc_id") % 13 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    novel = docs.sparkSession.createDataFrame(
        [(2000001, "Novel alpha sentence. Novel beta sentence. Novel gamma sentence."),
         (2000002, "Short novel. Two only.")],
        "doc_id long, text string",
    )
    return clones.unionByName(novel)


def test_incremental_equals_batch_operator(spark, tmp_path):
    from kartothek_spark.operators.corpus import c4_span_dedup
    from kartothek_spark.operators.span_index import (
        build_span_index,
        c4_dedup_incremental,
    )

    docs = _docs(spark)
    batch = _batch(docs)
    root = str(tmp_path / "sx")
    build_span_index(spark, docs, root, "sx", n=3, buckets=8)

    got = _rows(c4_dedup_incremental(spark, batch, root, "sx"))
    batch_ids = {r.doc_id for r in batch.select("doc_id").collect()}
    want = sorted(
        tuple(r)
        for r in c4_span_dedup(docs.unionByName(batch), n=3).collect()
        if r.doc_id in batch_ids
    )
    assert got == want and got
    out = dict(got)
    assert out[2000001].startswith("Novel alpha")  # novel doc intact
    assert out[2000002] == "Short novel. Two only."  # <n sentences: verbatim


def test_sync_extends_history(spark, tmp_path):
    """build(h) + sync(b1): probing b2 must equal the batch operator over
    h ∪ b1 ∪ b2 restricted to b2 — history advances exactly."""
    from kartothek_spark.operators.corpus import c4_span_dedup
    from kartothek_spark.operators.span_index import (
        build_span_index,
        c4_dedup_incremental,
        sync_span_index,
    )

    docs = _docs(spark)
    b1 = _batch(docs)
    # b2 re-clones a b1 doc (dup vs b1's spans, not vs original history)
    b2 = b1.where("doc_id = 2000001").select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    ).unionByName(
        docs.sparkSession.createDataFrame(
            [(4000001, "Fresh one here. Fresh two here. Fresh three here.")],
            "doc_id long, text string",
        )
    )
    root = str(tmp_path / "sx")
    build_span_index(spark, docs, root, "sx", n=3, buckets=8)
    sync_span_index(spark, b1, root, "sx")

    got = _rows(c4_dedup_incremental(spark, b2, root, "sx"))
    b2_ids = {r.doc_id for r in b2.select("doc_id").collect()}
    want = sorted(
        tuple(r)
        for r in c4_span_dedup(docs.unionByName(b1).unionByName(b2), n=3).collect()
        if r.doc_id in b2_ids
    )
    assert got == want and got
    out = dict(got)
    assert out[3000001] == ""  # b2's re-clone drains against b1's spans
    assert out[4000001].startswith("Fresh one")


def test_pushdown_and_fallback_agree_and_prune(spark, tmp_path, monkeypatch):
    from kartothek_spark.operators import span_index as si

    docs = _docs(spark)
    root = str(tmp_path / "sx")
    si.build_span_index(spark, docs, root, "sx", n=3, buckets=16)

    # one 3-sentence clone of a history span -> exactly one span hash
    one = docs.sparkSession.createDataFrame(
        [(5000001, "Lone alpha here. Lone beta here. Lone gamma here.")],
        "doc_id long, text string",
    )
    out = si.c4_dedup_incremental(spark, one, root, "sx")
    buckets = {
        seg
        for f in out.inputFiles()
        for seg in f.split("/")
        if seg.startswith("sb=")
    }
    assert len(buckets) <= 1  # single span -> at most its own bucket

    batch = _batch(docs)
    fast = _rows(si.c4_dedup_incremental(spark, batch, root, "sx"))
    monkeypatch.setattr(si, "PUSHDOWN_MAX_SPANS", 0)
    slow = _rows(si.c4_dedup_incremental(spark, batch, root, "sx"))
    assert fast == slow and fast


def test_stream_span_index_matches_batch(spark, tmp_path):
    """Streaming maintenance (build on batch 0, O(batch) raw-span appends
    after) must probe exactly like one batch build over everything
    ingested."""
    from kartothek_spark.operators.span_index import (
        build_span_index,
        c4_dedup_incremental,
    )
    from kartothek_spark.streaming.update import stream_span_index

    docs = _docs(spark).localCheckpoint(eager=True)
    src = str(tmp_path / "src")
    docs.repartition(3).write.parquet(src)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    root = str(tmp_path / "store")
    q = stream_span_index(
        stream, root, "ssx", n=3, buckets=8,
        checkpoint_dir=str(tmp_path / "ckpt"),
        trigger={"availableNow": True},
    )
    assert q.awaitTermination(300), "stream did not drain"

    batch_root = str(tmp_path / "batch")
    build_span_index(spark, docs, batch_root, "bsx", n=3, buckets=8)
    probe = _batch(docs)
    got = _rows(c4_dedup_incremental(spark, probe, root, "ssx"))
    want = _rows(c4_dedup_incremental(spark, probe, batch_root, "bsx"))
    assert got == want and got
