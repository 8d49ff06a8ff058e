"""Persisted benchmark contamination index (operators/contamination_index).

Pins: indexed cross-pairs == on-the-fly minhash_cross_pairs, indexed
decontamination == on-the-fly fuzzy_decontaminate, build(b1)+sync(b2) ==
build(union) — value-identity over the same frames is the family's
contract (the registry gates share the on-the-fly oracles verbatim).
"""

import os

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _docs(spark, n=150):
    return (
        spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
        .where(F.col("doc_id") < n)
        .select("doc_id", "text")
    )


def _bench(docs):
    """Perturbed benchmark slice: leading 11 chars stripped, same shape
    as the corpus_fuzzy_decontaminate gate."""
    return docs.where(F.col("doc_id") % 11 == 0).select(
        F.col("doc_id").alias("bench_id"),
        F.expr("substring(text, 12)").alias("text"),
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_indexed_cross_pairs_match_on_the_fly(spark, tmp_path):
    from kartothek_spark.operators.contamination_index import (
        build_contamination_index,
        minhash_cross_pairs_indexed,
    )
    from kartothek_spark.operators.dedup import minhash_cross_pairs

    docs = _docs(spark)
    bench = _bench(docs)
    root = str(tmp_path / "cx")
    build_contamination_index(spark, bench, root, "cx", id_col="bench_id")

    got = _rows(
        minhash_cross_pairs_indexed(
            spark, docs, root, "cx", threshold=0.35, right_id="bench_id"
        )
    )
    want = _rows(
        minhash_cross_pairs(docs, bench, threshold=0.35, right_id="bench_id")
    )
    assert got == want and got


def test_indexed_decontaminate_matches_on_the_fly(spark, tmp_path):
    from kartothek_spark.operators.contamination_index import (
        build_contamination_index,
        fuzzy_decontaminate_indexed,
    )
    from kartothek_spark.operators.dedup import fuzzy_decontaminate

    docs = _docs(spark)
    bench = _bench(docs)
    root = str(tmp_path / "cx")
    build_contamination_index(spark, bench, root, "cx", id_col="bench_id")

    got = _rows(
        fuzzy_decontaminate_indexed(spark, docs, root, "cx", threshold=0.35)
    )
    want = _rows(
        fuzzy_decontaminate(
            docs,
            bench.select(F.col("bench_id").alias("doc_id"), "text"),
            threshold=0.35,
        )
    )
    assert got == want
    assert got and len(got) < docs.count()  # something was removed


def test_sync_incremental_equals_batch(spark, tmp_path):
    from kartothek_spark.operators.contamination_index import (
        build_contamination_index,
        fuzzy_decontaminate_indexed,
        minhash_cross_pairs_indexed,
        sync_contamination_index,
    )

    docs = _docs(spark)
    bench = _bench(docs)
    # split includes a duplicated-ck overlap: batch 2 re-ships one suite
    b1 = bench.where("bench_id % 22 = 0")
    b2 = bench.where("bench_id % 22 <> 0 OR bench_id = 0")

    inc = str(tmp_path / "inc")
    build_contamination_index(spark, b1, inc, "cx", id_col="bench_id")
    sync_contamination_index(spark, b2, inc, "cx", id_col="bench_id")
    full = str(tmp_path / "full")
    build_contamination_index(spark, bench, full, "cx", id_col="bench_id")

    for q in (
        lambda r: minhash_cross_pairs_indexed(
            spark, docs, r, "cx", threshold=0.35, right_id="bench_id"
        ),
        lambda r: fuzzy_decontaminate_indexed(spark, docs, r, "cx", threshold=0.35),
    ):
        got, want = _rows(q(inc)), _rows(q(full))
        assert got == want and got


def test_stream_contamination_index_matches_batch(spark, tmp_path):
    """Streaming maintenance (build on batch 0, id-idempotent syncs
    after) must answer the decontaminate and pair queries exactly like
    one batch build over every suite ingested."""
    from kartothek_spark.operators.contamination_index import (
        build_contamination_index,
        fuzzy_decontaminate_indexed,
        minhash_cross_pairs_indexed,
    )
    from kartothek_spark.streaming.update import stream_contamination_index

    docs = _docs(spark)
    bench = _bench(docs).localCheckpoint(eager=True)
    src = str(tmp_path / "src")
    bench.repartition(3).write.parquet(src)
    stream = (
        spark.readStream.schema(bench.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    root = str(tmp_path / "store")
    q = stream_contamination_index(
        stream, root, "scx", id_col="bench_id",
        checkpoint_dir=str(tmp_path / "ckpt"),
        trigger={"availableNow": True},
    )
    assert q.awaitTermination(300), "stream did not drain"

    batch_root = str(tmp_path / "batch")
    build_contamination_index(spark, bench, batch_root, "bcx", id_col="bench_id")
    for query in (
        lambda r, u: minhash_cross_pairs_indexed(
            spark, docs, r, u, threshold=0.35, right_id="bench_id"
        ),
        lambda r, u: fuzzy_decontaminate_indexed(spark, docs, r, u, threshold=0.35),
    ):
        got = _rows(query(root, "scx"))
        want = _rows(query(batch_root, "bcx"))
        assert got == want and got


def test_band_duplicates_are_value_neutral(spark, tmp_path):
    """A torn streaming sync leaves duplicate (band, key, ck) rows; the
    query-side distinct must keep results identical (duplicates must not
    inflate bucket sizes past the cap)."""
    from kartothek_spark.dataset.read import read_table
    from kartothek_spark.dataset.write import update_dataset
    from kartothek_spark.operators.contamination_index import (
        _bands_uuid,
        build_contamination_index,
        minhash_cross_pairs_indexed,
    )

    docs = _docs(spark)
    bench = _bench(docs)
    root = str(tmp_path / "cx")
    build_contamination_index(spark, bench, root, "cx", id_col="bench_id")
    clean = _rows(
        minhash_cross_pairs_indexed(
            spark, docs, root, "cx", threshold=0.35, right_id="bench_id"
        )
    )
    # simulate the torn state: re-append the full bands table verbatim
    dup = read_table(spark, root, _bands_uuid("cx")).localCheckpoint(eager=True)
    update_dataset(spark, dup, root, _bands_uuid("cx"))
    torn = _rows(
        minhash_cross_pairs_indexed(
            spark, docs, root, "cx", threshold=0.35, right_id="bench_id"
        )
    )
    assert torn == clean and clean


def test_band_dataset_partitioned_and_metadata(spark, tmp_path):
    from kartothek_spark.core.manifest import DatasetManifest
    from kartothek_spark.operators.contamination_index import (
        build_contamination_index,
    )
    from kartothek_spark.operators.dedup import MINHASH_BANDS

    bench = _bench(_docs(spark))
    root = str(tmp_path / "cx")
    m = build_contamination_index(spark, bench, root, "cx", id_col="bench_id")
    assert int(m.metadata["minhash_num_hashes"]) > 0
    mb = DatasetManifest.load(root, "cx__bands")
    assert mb.partition_keys == ["band"]
    bands_seen = {
        int(lbl.split("band=")[1].split("/")[0])
        for lbl in mb.partitions
        if "band=" in lbl
    }
    assert bands_seen <= set(range(MINHASH_BANDS)) and bands_seen
