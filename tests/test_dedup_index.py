"""Incremental MinHash index: union of per-sync pair sets == batch
operator output over the live corpus, for any append split."""

import os

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR

from kartothek_spark.dataset.read import read_table
from kartothek_spark.dataset.write import store_dataframe_as_dataset, update_dataset
from kartothek_spark.operators.dedup import minhash_lsh_pairs
from kartothek_spark.operators.dedup_index import sync_minhash_index

THRESHOLD = 0.2


def _docs(spark):
    return spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).select(
        "doc_id", "text"
    )


def _pairs_set(df):
    return {(r.id_a, r.id_b, r.jaccard) for r in df.collect()}


def test_incremental_equals_batch_two_splits(spark, tmp_root):
    docs = _docs(spark)
    # three append batches with a ragged split so ck clusters straddle them
    b1 = docs.where(F.col("doc_id") % 3 == 0)
    b2 = docs.where(F.col("doc_id") % 3 == 1)
    b3 = docs.where(F.col("doc_id") % 3 == 2)

    store_dataframe_as_dataset(spark, b1, tmp_root, "corpus", keep_history=True)
    p1 = sync_minhash_index(
        spark, tmp_root, "corpus", tmp_root, "mh_idx", threshold=THRESHOLD
    )
    update_dataset(spark, b2, tmp_root, "corpus")
    p2 = sync_minhash_index(
        spark, tmp_root, "corpus", tmp_root, "mh_idx", threshold=THRESHOLD
    )
    update_dataset(spark, b3, tmp_root, "corpus")
    p3 = sync_minhash_index(
        spark, tmp_root, "corpus", tmp_root, "mh_idx", threshold=THRESHOLD
    )

    got = _pairs_set(p1) | _pairs_set(p2) | _pairs_set(p3)
    want = _pairs_set(minhash_lsh_pairs(docs, threshold=THRESHOLD))
    assert got == want

    # per-sync sets are disjoint: nothing is emitted twice
    assert not (_pairs_set(p1) & _pairs_set(p2))
    assert not (_pairs_set(p2) & _pairs_set(p3))
    assert not (_pairs_set(p1) & _pairs_set(p3))

    # batch-1 pairs equal the batch operator on batch 1 alone
    assert _pairs_set(p1) == _pairs_set(minhash_lsh_pairs(b1, threshold=THRESHOLD))


def test_noop_sync_returns_empty(spark, tmp_root):
    docs = _docs(spark).limit(50)
    store_dataframe_as_dataset(spark, docs, tmp_root, "corpus", keep_history=True)
    sync_minhash_index(spark, tmp_root, "corpus", tmp_root, "mh_idx", threshold=THRESHOLD)
    again = sync_minhash_index(
        spark, tmp_root, "corpus", tmp_root, "mh_idx", threshold=THRESHOLD
    )
    assert again.count() == 0


def test_param_change_rejected(spark, tmp_root):
    docs = _docs(spark).limit(20)
    store_dataframe_as_dataset(spark, docs, tmp_root, "corpus", keep_history=True)
    sync_minhash_index(spark, tmp_root, "corpus", tmp_root, "mh_idx", threshold=THRESHOLD)
    with pytest.raises(ValueError, match="index identity"):
        sync_minhash_index(
            spark, tmp_root, "corpus", tmp_root, "mh_idx", threshold=0.9
        )


def test_refresh_on_partition_drop(spark, tmp_root):
    docs = _docs(spark).withColumn("bucket", (F.col("doc_id") % 2).cast("int"))
    store_dataframe_as_dataset(
        spark, docs, tmp_root, "corpus", partition_on=["bucket"], keep_history=True
    )
    sync_minhash_index(spark, tmp_root, "corpus", tmp_root, "mh_idx", threshold=THRESHOLD)
    update_dataset(spark, None, tmp_root, "corpus", delete_scope=[{"bucket": 1}])
    refreshed = sync_minhash_index(
        spark, tmp_root, "corpus", tmp_root, "mh_idx", threshold=THRESHOLD
    )
    live = read_table(spark, tmp_root, "corpus").select("doc_id", "text")
    want = _pairs_set(minhash_lsh_pairs(live, threshold=THRESHOLD))
    assert _pairs_set(refreshed) == want


def test_index_datasets_are_queryable(spark, tmp_root):
    docs = _docs(spark).limit(200)
    store_dataframe_as_dataset(spark, docs, tmp_root, "corpus", keep_history=True)
    sync_minhash_index(spark, tmp_root, "corpus", tmp_root, "mh_idx", threshold=THRESHOLD)
    idx = read_table(spark, tmp_root, "mh_idx")
    assert idx.columns == ["doc_id", "ck", "sig"]
    assert idx.count() == docs.where(F.col("text").isNotNull()).count()


def test_stream_dedup_index_matches_batch(spark, tmp_path):
    """Replay the documents corpus as a 3-file stream: after the stream
    drains, the pairs dataset must equal the batch operator over all
    ingested docs, and the index must cover every doc."""
    from kartothek_spark.streaming.update import stream_dedup_index

    docs = _docs(spark).limit(300).localCheckpoint(eager=True)
    src = str(tmp_path / "src")
    docs.repartition(3).write.parquet(src)

    root = str(tmp_path / "store")
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = stream_dedup_index(
        stream, root, threshold=THRESHOLD,
        checkpoint_dir=str(tmp_path / "ckpt"),
        trigger={"availableNow": True},
    )
    q.awaitTermination(180)

    got = _pairs_set(read_table(spark, root, "dup_pairs"))
    want = _pairs_set(minhash_lsh_pairs(docs, threshold=THRESHOLD))
    assert got == want
    assert read_table(spark, root, "mh_index").count() == docs.count()
