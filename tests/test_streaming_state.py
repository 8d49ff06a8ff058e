"""Stateful streaming sessionization (applyInPandasWithState).

Deterministic oracle: feed the event log through a file-source stream one
file per micro-batch with availableNow; a session is emitted exactly when
a LATER event of the same user closes it, so the emitted set must equal
batch sessionization minus each user's final (still-open) session.
"""

import os

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def event_stream_dir(spark, tmp_path_factory):
    from __spark_entry__ import _events

    base = tmp_path_factory.mktemp("evstream")
    ev = _events(spark, SF_DIR).select("user_id", "ts").where(F.col("user_id") < 50)
    # two chronological halves → two micro-batches (sessions can span them)
    mid = ev.approxQuantile("user_id", [0.5], 0)[0]
    src = str(base / "src")
    ev.where(F.col("ts") < F.to_timestamp(F.lit("2024-01-02"))).coalesce(1).write.parquet(
        os.path.join(src, "f0")
    )
    ev.where(F.col("ts") >= F.to_timestamp(F.lit("2024-01-02"))).coalesce(1).write.parquet(
        os.path.join(src, "f1")
    )
    # flatten: streaming file source wants files under one dir
    flat = str(base / "flat")
    os.makedirs(flat)
    n = 0
    for sub in ("f0", "f1"):
        for name in os.listdir(os.path.join(src, sub)):
            if name.endswith(".parquet"):
                os.rename(
                    os.path.join(src, sub, name), os.path.join(flat, f"part{n}.parquet")
                )
                n += 1
    assert n == 2
    return flat, ev, str(base / "ckpt")


def test_sessionize_stream_matches_batch(spark, event_stream_dir):
    from kartothek_spark.streaming.update import sessionize, sessionize_stream

    flat, ev, ckpt = event_stream_dir
    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(flat)
    )
    out = sessionize_stream(stream, gap_minutes=30)
    q = (
        out.writeStream.format("memory")
        .queryName("sess_stream")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    # applyInPandasWithState + ProcessingTimeTimeout never self-terminates
    # under availableNow (awaitTermination would idle its full timeout and
    # leave a live stream behind) — drain on input accounting instead
    import time

    total = ev.count()
    deadline = time.monotonic() + 300
    seen = 0  # high-water mark: recentProgress keeps only ~100 updates
    try:
        while seen < total:
            seen = max(seen, sum(int(p["numInputRows"]) for p in q.recentProgress))
            assert time.monotonic() < deadline, "stream did not drain"
            time.sleep(0.5)
    finally:
        q.stop()

    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in spark.sql("SELECT * FROM sess_stream").collect()
    }
    batch = sessionize(ev, gap_minutes=30)
    # drop each user's last session — still open in stream state
    from pyspark.sql import Window

    w = Window.partitionBy("user_id")
    closed = (
        batch.withColumn("__max", F.max("session_seq").over(w))
        .where(F.col("session_seq") < F.col("__max"))
        .select("user_id", "session_start", "session_end", "n_events")
    )
    want = {
        (r.user_id, r.session_start, r.session_end, r.n_events) for r in closed.collect()
    }
    assert got == want
    assert len(want) > 10  # the fixture must actually exercise multi-session users


def test_stream_dedup_exact_matches_batch(spark, event_stream_dir, tmp_path):
    """Streaming dropDuplicatesWithinWatermark over the replayed event log
    must keep exactly one row per key, matching batch dropDuplicates —
    keys here are (user_id, ts) which re-occur across the synthetic log."""
    from __spark_entry__ import _events
    from kartothek_spark.streaming.update import stream_dedup_exact
    from tests.conftest import SF_DIR

    src, ev, _ckpt = event_stream_dir
    stream = (
        spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", "1").parquet(src)
    )
    q = (
        stream_dedup_exact(stream, ["user_id", "ts"])
        .writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT user_id, ts FROM dedup_stream")
    batch = _events(spark, SF_DIR).select("user_id", "ts").where(F.col("user_id") < 50)
    want = stream_dedup_exact(batch, ["user_id", "ts"])
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0


def test_corpus_ops_compose_with_streams(spark, tmp_path):
    """sample_corpus / quality_filter / mix_corpus are stateless
    expressions, so the same code runs unchanged over a stream — streamed
    results must equal the batch run on the same files."""
    import os

    from kartothek_spark.operators.corpus import quality_filter, sample_corpus
    from tests.conftest import SF_DIR

    src = str(tmp_path / "docs_src")
    os.makedirs(src)
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    docs.coalesce(4).write.mode("overwrite").parquet(src)
    batch = spark.read.parquet(src)

    def pipe(df):
        return sample_corpus(quality_filter(df), 0.5).select("doc_id")

    stream = spark.readStream.schema(batch.schema).option("maxFilesPerTrigger", "1").parquet(src)
    q = (
        pipe(stream)
        .writeStream.format("memory")
        .queryName("corpus_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_corpus"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT doc_id FROM corpus_stream")
    want = pipe(batch)
    assert got.count() == want.count() > 0
    assert got.exceptAll(want).count() == 0


def test_stream_ingest_with_history_is_time_travelable(spark, tmp_path):
    """Streaming ingest composes with the snapshot layer: every
    micro-batch commit is a version, read_changes tails exactly the later
    batches, and as_of reproduces any batch boundary."""
    from kartothek_spark.core.manifest import DatasetManifest
    from kartothek_spark.dataset.read import read_changes, read_table
    from kartothek_spark.streaming.update import stream_update_dataset

    src = str(tmp_path / "src")
    root = str(tmp_path / "store")
    batch = spark.range(100).selectExpr("id", "id % 4 AS k")
    # 3 source files → maxFilesPerTrigger=1 gives 3 micro-batches
    for i in range(3):
        batch.where(F.col("id") % 3 == i).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema("id long, k long")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = stream_update_dataset(
        stream, root, "ev", checkpoint_dir=str(tmp_path / "ckpt"),
        trigger={"availableNow": True}, keep_history=True,
    )
    q.awaitTermination(120)

    m = DatasetManifest.load(root, "ev")
    assert m.keep_history and m.version == 3  # one version per micro-batch
    assert read_table(spark, root, "ev").count() == 100
    # each snapshot is a prefix of the ingest
    sizes = [read_table(spark, root, "ev", as_of=v).count()
             for v in DatasetManifest.list_versions(root, "ev")]
    assert sizes == sorted(sizes) and sizes[-1] == 100
    # tail from v1: exactly the rows of batches 2..3
    assert read_changes(spark, root, "ev", since=1).count() == 100 - sizes[0]


def test_stream_stream_interval_join_matches_batch(spark, tmp_path):
    """The stream-stream interval join over a replayed event log must
    equal the batch form — same definition, bounded state via watermark +
    time-range condition."""
    from __spark_entry__ import _events
    from kartothek_spark.streaming.update import interval_join
    from tests.conftest import SF_DIR

    ev = _events(spark, SF_DIR).where(F.col("user_id") < 40)
    src = str(tmp_path / "src")
    ev.coalesce(2).write.parquet(src)

    def sides(df):
        v = df.where("event_type = 'view'").select(
            "user_id", F.col("ts").alias("v_ts"), F.col("event_id").alias("view_id")
        )
        p = df.where("event_type = 'purchase'").select(
            "user_id", F.col("ts").alias("p_ts"), F.col("event_id").alias("purchase_id")
        )
        return v, p

    stream = spark.readStream.schema(ev.schema).parquet(src)
    sv, sp = sides(stream)
    q = (
        interval_join(sv, sp, left_ts="v_ts", right_ts="p_ts", lookback="45 minutes")
        .writeStream.format("memory")
        .queryName("attr_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT user_id, view_id, purchase_id FROM attr_stream")
    bv, bp = sides(ev)
    want = interval_join(bv, bp, left_ts="v_ts", right_ts="p_ts",
                         lookback="45 minutes").select("user_id", "view_id", "purchase_id")
    assert want.count() > 0
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_stream_ingest_quarantines_violations(spark, tmp_path):
    """CHECK-constraint quarantine: a stream with bad rows keeps running,
    the main dataset holds only valid rows, and the dead-letter dataset
    names the violated constraint per row."""
    from kartothek_spark.dataset.read import read_table
    from kartothek_spark.streaming.update import quarantine_uuid, stream_update_dataset

    rows = [(i, float(i % 7) - 1.0) for i in range(100)]  # v == -1.0 for i%7==0
    batch = spark.createDataFrame(rows, "id long, v double").localCheckpoint(eager=True)
    src = str(tmp_path / "src")
    batch.repartition(3).write.parquet(src)
    stream = (
        spark.readStream.schema(batch.schema).option("maxFilesPerTrigger", "1").parquet(src)
    )
    root = str(tmp_path / "store")
    q = stream_update_dataset(
        stream, root, "ev",
        checkpoint_dir=str(tmp_path / "ckpt"),
        trigger={"availableNow": True},
        constraints={"v_nonneg": "v >= 0"},
        quarantine=True,
    )
    q.awaitTermination(120)

    good = read_table(spark, root, "ev")
    bad = read_table(spark, root, quarantine_uuid("ev"))
    assert good.count() == sum(1 for _i, v in rows if v >= 0)
    assert bad.count() == sum(1 for _i, v in rows if v < 0)
    assert good.where("v < 0").count() == 0
    assert {r.violated_constraint for r in bad.collect()} == {"v_nonneg"}
    assert good.count() + bad.count() == len(rows)
