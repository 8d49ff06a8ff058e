"""Persisted DSIR model (operators/dsir_model.py) + streaming scorer.

Pins: scoring a corpus against a model fitted on (that corpus, target)
equals the inline dsir_weights bit-for-bit (shared arithmetic, frozen
q̂); the model-backed Gumbel draw equals the inline resampler; streamed
per-batch scores drain to exactly the batch scorer's output.
"""

import os

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _docs(spark, n=200):
    return (
        spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
        .where(F.col("doc_id") < n)
        .select("doc_id", "text")
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_model_score_equals_inline_weights(spark, tmp_path):
    from kartothek_spark.operators.dsir import dsir_resample, dsir_weights
    from kartothek_spark.operators.dsir_model import (
        build_dsir_model,
        dsir_sample_from_model,
        dsir_score_from_model,
    )

    raw = _docs(spark)
    target = raw.where("doc_id % 9 = 0")
    root = str(tmp_path / "m")
    m = build_dsir_model(spark, raw, target, root, "dm", buckets=512)
    assert int(m.metadata["dsir_buckets"]) == 512

    got = _rows(dsir_score_from_model(spark, raw, root, "dm"))
    want = _rows(dsir_weights(raw, target, buckets=512))
    assert got == want and got

    got_s = _rows(dsir_sample_from_model(spark, raw, root, "dm", k=40, seed=7))
    want_s = _rows(dsir_resample(raw, target, k=40, seed=7, buckets=512))
    assert got_s == want_s and len(got_s) == 40

    # token-free docs score 0 (novel n-grams hash into occupied buckets
    # at small B — collision scoring is inherent to hashed features and
    # identical to the inline operator, covered by the equality above)
    empty = spark.createDataFrame([(900001, "???!!!")], "doc_id long, text string")
    s = dsir_score_from_model(spark, empty, root, "dm").collect()
    assert s[0].score_micro == 0


def test_stream_dsir_scores_match_batch(spark, tmp_path):
    from kartothek_spark.dataset.read import read_table
    from kartothek_spark.operators.dsir_model import (
        build_dsir_model,
        dsir_score_from_model,
    )
    from kartothek_spark.streaming.update import stream_dsir_scores

    raw = _docs(spark).localCheckpoint(eager=True)
    target = raw.where("doc_id % 9 = 0")
    model_root = str(tmp_path / "model")
    build_dsir_model(spark, raw, target, model_root, "dm", buckets=512)

    src = str(tmp_path / "src")
    raw.repartition(3).write.parquet(src)
    stream = (
        spark.readStream.schema(raw.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    root = str(tmp_path / "scores")
    q = stream_dsir_scores(
        stream, root, "sc", model_root, "dm",
        checkpoint_dir=str(tmp_path / "ckpt"),
        trigger={"availableNow": True},
    )
    assert q.awaitTermination(300), "stream did not drain"

    got = _rows(read_table(spark, root, "sc"))
    want = _rows(dsir_score_from_model(spark, raw, model_root, "dm"))
    assert got == want and got
