"""Composed cleaning pipeline (operators/pipeline.py +
streaming/update.py:stream_clean_corpus): batch composition semantics,
drained-stream == batch parity, torn-state healing, and the
history-is-scanned-never-shuffled plan shape."""

import os

from pyspark.sql import functions as F

from tests.conftest import SF_DIR

GOPHER = {"min_words": 20, "min_stopwords": 1}


def _docs(spark):
    return spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))


def _bench(docs):
    return docs.where(F.col("doc_id") % 11 == 0).select(
        "doc_id", F.expr("substring(text, 12)").alias("text")
    )


def _ingest(docs):
    clones = docs.where(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + F.lit(100000)).alias("doc_id"),
        "text", "lang", "source", "n_chars",
    )
    return docs.unionByName(clones)


def _batch_clean_ids(spark):
    from kartothek_spark.operators.pipeline import clean_corpus

    docs = _docs(spark)
    out = clean_corpus(_ingest(docs), _bench(docs), n=8, gopher=GOPHER)
    return {r.doc_id for r in out.select("doc_id").collect()}


def test_clean_corpus_equals_manual_composition(spark):
    """clean_corpus == gopher_filter |> decontaminate |> dedup_exact
    applied by hand in the documented order."""
    from kartothek_spark.operators.contamination import decontaminate
    from kartothek_spark.operators.dedup import dedup_exact
    from kartothek_spark.operators.text import gopher_filter

    docs = _docs(spark)
    ingest, bench = _ingest(docs), _bench(docs)
    manual = dedup_exact(decontaminate(gopher_filter(ingest, **GOPHER), bench, n=8))
    got = _batch_clean_ids(spark)
    assert got == {r.doc_id for r in manual.select("doc_id").collect()}
    # every stage did real work: clones dropped (dedup), contaminated
    # originals dropped (decon), and something failed quality
    assert got
    assert not any(i >= 100000 for i in got)
    assert len(got) < ingest.count()


def _drain(spark, root, ingest, bloom_root, slices, ckpt):
    from kartothek_spark.streaming.update import stream_clean_corpus as op

    src = os.path.join(root, "_src")
    os.makedirs(src, exist_ok=True)
    t0 = 1_000_000_000 + len(os.listdir(src)) * 10
    for i, sl in enumerate(slices):
        path = os.path.join(src, f"slice_{t0}_{i}.parquet")
        sl.toPandas().to_parquet(path)
        os.utime(path, (t0 + i, t0 + i))
    stream = (
        spark.readStream.format("parquet")
        .schema(ingest.schema)
        .option("maxFilesPerTrigger", "1")
        .load(src)
    )
    q = op(
        stream, root, "cc", bloom_root=bloom_root, bloom_uuid="blx",
        gopher=GOPHER, fp_m_bits=1 << 18,
        checkpoint_dir=os.path.join(root, ckpt),
        trigger={"availableNow": True},
    )
    assert q.awaitTermination(300)


def _stream_setup(spark, tmp_root):
    from kartothek_spark.operators.bloom import build_bloom_index

    docs = _docs(spark)
    ingest = _ingest(docs)
    bloom_root = os.path.join(tmp_root, "_bloom")
    build_bloom_index(spark, _bench(docs), bloom_root, "blx", n=8, m_bits=1 << 16)
    mx = docs.agg(F.max("doc_id")).first()[0]
    slices = [
        ingest.where(F.col("doc_id") <= mx // 2),
        ingest.where((F.col("doc_id") > mx // 2) & (F.col("doc_id") < 100000)),
        ingest.where(F.col("doc_id") >= 100000),
    ]
    return ingest, bloom_root, slices


def test_stream_clean_corpus_equals_batch(spark, tmp_root):
    """Drained ordered stream == the batch pipeline over everything
    ingested (the monotonic-arrival contract)."""
    from kartothek_spark.dataset.read import read_table

    ingest, bloom_root, slices = _stream_setup(spark, tmp_root)
    _drain(spark, tmp_root, ingest, bloom_root, slices, "_ckpt")
    got = {r.doc_id for r in read_table(spark, tmp_root, "cc").select("doc_id").collect()}
    assert got == _batch_clean_ids(spark)


def test_stream_clean_corpus_torn_bitmap_heals(spark, tmp_root):
    """A torn state where the fingerprint bitmap ran ahead of the data
    (sync's crash window: bitmap merged, rows never committed) must NOT
    lose the affected rows — bitmap hits are candidates, and the exact
    verification scan finds no committed twin, so they land on replay."""
    from kartothek_spark.dataset.read import read_table
    from kartothek_spark.dataset.write import store_dataframe_as_dataset
    from kartothek_spark.operators.bloom import bloom_words
    from kartothek_spark.operators.pipeline import with_fingerprint

    ingest, bloom_root, slices = _stream_setup(spark, tmp_root)
    _drain(spark, tmp_root, ingest, bloom_root, slices[:1], "_ckpt1")

    # poison the bitmap with slice-2 fingerprints BEFORE slice 2 streams
    # (as if a prior attempt crashed between its two commits; real
    # debris carries the stream's own hash-version stamp)
    from kartothek_spark.operators.bloom import BLOOM_HASH_VERSION, META_HASH_VERSION

    s2_words = bloom_words(
        with_fingerprint(slices[1], "text").select(F.col("fp").alias("kh")).distinct(),
        1 << 18,
    )
    merged = (
        read_table(spark, tmp_root, "cc__fpbloom")
        .unionByName(s2_words)
        .groupBy("word_idx")
        .agg(F.bit_or("word").alias("word"))
        .localCheckpoint(eager=True)
    )
    store_dataframe_as_dataset(
        spark, merged, tmp_root, "cc__fpbloom",
        sort_partitions_by=["word_idx"], overwrite=True,
        metadata={META_HASH_VERSION: BLOOM_HASH_VERSION},
    )

    _drain(spark, tmp_root, ingest, bloom_root, slices[1:], "_ckpt2")
    got = {r.doc_id for r in read_table(spark, tmp_root, "cc").select("doc_id").collect()}
    assert got == _batch_clean_ids(spark)


def test_stream_clean_corpus_stale_hash_version_heals(spark, tmp_root):
    """A sidecar bitmap stamped with an OLD hash version (or pre-stamp)
    must never be probed — bit positions derived under different hashing
    give FALSE NEGATIVES, i.e. committed duplicates. The stream heals by
    rebuilding the bitmap from the committed fingerprint column before
    probing. Proof the rebuild happens: the bitmap is replaced with an
    all-zeros one (every probe would miss) under a stale stamp, and the
    clone slice still dedups exactly."""
    from kartothek_spark.core.manifest import DatasetManifest
    from kartothek_spark.dataset.read import read_table
    from kartothek_spark.dataset.write import store_dataframe_as_dataset
    from kartothek_spark.operators.bloom import BLOOM_HASH_VERSION, META_HASH_VERSION

    ingest, bloom_root, slices = _stream_setup(spark, tmp_root)
    _drain(spark, tmp_root, ingest, bloom_root, slices[:2], "_ckpt1")

    # all-zeros bitmap + stale version stamp: unhealed, every
    # cross-batch duplicate in slice 3 (the clones) would slip through
    zeros = spark.createDataFrame([(0, 0)], "word_idx long, word long")
    store_dataframe_as_dataset(
        spark, zeros, tmp_root, "cc__fpbloom",
        sort_partitions_by=["word_idx"], overwrite=True,
        metadata={META_HASH_VERSION: BLOOM_HASH_VERSION - 1},
    )

    _drain(spark, tmp_root, ingest, bloom_root, slices[2:], "_ckpt2")
    got = {r.doc_id for r in read_table(spark, tmp_root, "cc").select("doc_id").collect()}
    assert got == _batch_clean_ids(spark)
    # healed sidecar is re-stamped with the current version
    md = DatasetManifest.load(tmp_root, "cc__fpbloom").metadata
    assert int(md[META_HASH_VERSION]) == BLOOM_HASH_VERSION


def test_history_check_is_broadcast_scan(spark, tmp_root):
    """The cross-batch dedup verification joins the candidate trickle
    BROADCAST into a column-pruned scan of history fingerprints —
    history is never shuffled (no SortMergeJoin, no hash-partition
    exchange on the history side)."""
    from kartothek_spark.dataset.read import read_table
    from kartothek_spark.dataset.write import store_dataframe_as_dataset
    from kartothek_spark.operators.pipeline import with_fingerprint

    docs = _docs(spark)
    hist = with_fingerprint(docs.limit(200), "text")
    store_dataframe_as_dataset(
        spark, hist, tmp_root, "hist", partition_on=["fpb"], sort_partitions_by=["fp"]
    )
    cand = with_fingerprint(docs.limit(10), "text").select("fp").distinct()
    plan = (
        read_table(spark, tmp_root, "hist", columns=["fp"])
        .join(F.broadcast(cand), "fp")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "ReadSchema: struct<fp:bigint>" in plan or "fp" in plan


def test_novelty_report_planted_cases(spark):
    """novelty_report semantics on planted docs: a verbatim copy of
    reference text scores 0, unique text scores 1, and a doc too short
    to carry ANY 8-gram reports novelty 1.0 (nothing was recycled)."""
    from kartothek_spark.operators.contamination import novelty_report

    ref_text = " ".join(f"ref{i}" for i in range(40))
    new_text = " ".join(f"new{i}" for i in range(40))
    half = " ".join(f"ref{i}" for i in range(20)) + " " + " ".join(
        f"new{i}" for i in range(20)
    )
    ref = spark.createDataFrame([(100, ref_text)], "doc_id long, text string")
    # a doc SHORTER than n still carries one partial shingle (the
    # slice truncates — same in the SQL twin), and it scores as novel
    probe = spark.createDataFrame(
        [(1, ref_text), (2, new_text), (3, half), (4, "too short")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in novelty_report(probe, ref, n=8).collect()}
    assert got[1].novelty == 0.0
    assert got[2].novelty == 1.0
    assert 0.0 < got[3].novelty < 1.0
    assert got[4].n_shingles == 1 and got[4].novelty == 1.0
    # counts are exact: a doc's novel + recycled == its distinct shingles
    assert all(r.n_novel <= r.n_shingles for r in got.values())


def test_stream_clean_corpus_full_duplicate_batch(spark, tmp_root):
    """Re-delivering an already-committed slice under a NEW checkpoint
    (so the exactly-once stamp does NOT skip it) must append nothing:
    every row is a cross-batch duplicate, the fingerprint bitmap flags
    all of them, verification matches all of them, and the empty
    append leaves the output unchanged."""
    from kartothek_spark.dataset.read import read_table

    ingest, bloom_root, slices = _stream_setup(spark, tmp_root)
    _drain(spark, tmp_root, ingest, bloom_root, slices[:1], "_ckptA")
    before = sorted(
        r.doc_id for r in read_table(spark, tmp_root, "cc").select("doc_id").collect()
    )
    _drain(spark, tmp_root, ingest, bloom_root, slices[:1], "_ckptB")  # re-deliver
    after = sorted(
        r.doc_id for r in read_table(spark, tmp_root, "cc").select("doc_id").collect()
    )
    assert after == before


def test_resample_events_locf_semantics(spark):
    """Planted series: grid points inside a gap carry the LAST
    observation forward; a grid point before the key's first event
    (the floored minimum) is NULL; dup timestamps resolve to the max
    event id."""
    import datetime as dt

    from kartothek_spark.operators.temporal import resample_events

    T = lambda m: dt.datetime(2024, 1, 1, 0, m)  # noqa: E731
    rows = [
        # user 1: events at :05, :07 (dup ts with ids 3>2), :35
        (1, T(5), 1, 10.0),
        (2, T(7), 1, 20.0),
        (3, T(7), 1, 30.0),
        (4, T(35), 1, 40.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    got = {
        (r.user_id, r.ts.minute): (r.last_id, r.last_value)
        for r in resample_events(ev, interval_seconds=600).collect()
    }
    # grid: floor(:05)=:00 .. floor(:35)=:30 step 10min
    assert got[(1, 0)] == (None, None)          # before first event
    assert got[(1, 10)] == (3, 30.0)            # dup ts -> max id wins
    assert got[(1, 20)] == (3, 30.0)            # gap carries forward
    assert got[(1, 30)] == (3, 30.0)            # :35 is after the :30 point
    assert len(got) == 4


def test_event_gaps_planted(spark):
    """Planted timeline: only the gap >= threshold surfaces, with the
    exact bounding events and integer-second length; per-key isolation
    (another key's events never close a gap)."""
    import datetime as dt

    from kartothek_spark.operators.temporal import event_gaps

    rows = [
        (1, dt.datetime(2024, 1, 1, 0, 0), 1, 0.0),
        (2, dt.datetime(2024, 1, 1, 0, 10), 1, 0.0),   # 600 s — below
        (3, dt.datetime(2024, 1, 1, 2, 10), 1, 0.0),   # 7200 s — gap
        (4, dt.datetime(2024, 1, 1, 1, 0), 2, 0.0),    # other key inside the gap
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    got = [(r.user_id, r.gap_start.minute + 60 * r.gap_start.hour,
            r.gap_end.hour, r.gap_seconds)
           for r in event_gaps(ev, min_gap_seconds=3600).collect()]
    assert got == [(1, 10, 2, 7200)]


def test_leakage_safe_split_guarantee(spark):
    """Every test doc survives; NO surviving train doc shares an 8-gram
    with any test doc (the zero-leakage contract); the split column is
    total; unknown test_split raises."""
    import os

    import pytest
    from pyspark.sql import functions as F

    from kartothek_spark.operators.contamination import contamination_hits
    from kartothek_spark.operators.pipeline import leakage_safe_split
    from tests.conftest import SF_DIR

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    out = leakage_safe_split(docs, {"train": 0.8, "test": 0.2}).cache()
    test = out.where(F.col("split") == "test")
    train = out.where(F.col("split") == "train")
    # test side intact: the split assignment alone decides membership
    assert test.count() > 0 and train.count() > 0
    assert out.count() == test.count() + train.count()
    # zero leakage: no surviving train doc shares a shingle with test
    assert contamination_hits(train, test, n=8).count() == 0
    # attrition happened only on the train side (some doc shared a gram)
    n_train_assigned = (
        docs.count() - test.count()
    )
    assert train.count() <= n_train_assigned
    with pytest.raises(ValueError, match="test_split"):
        leakage_safe_split(docs, {"train": 1.0}, test_split="test")
