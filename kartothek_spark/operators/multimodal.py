"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The Spark-side machinery is REAL and tested — schema contracts, Arrow
batch shape, `mapInPandas` signatures, partition sizing — while the codec
step is STUBBED (`decode_stub=True` deterministic fake / explicit
``NotImplementedError``) because no image/audio libraries exist in this
container. Swapping the stub for PIL/ffmpeg is a one-function change.

Scale notes: binary payloads dominate partition size — pipelines should
``repartition`` by byte budget, not row count (see
``target_rows_per_batch``), and decoded features should be written as a
separate narrow dataset so later scans never touch the blobs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("content", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)


def make_media_df(df: DataFrame, id_col: str, payload_col: str, kind: str = "image") -> DataFrame:
    """Wrap any binary/string column as a typed media table (the ingest
    plumbing: stable ids, opaque content, typed metadata)."""
    content = F.col(payload_col).cast("binary")
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit(kind).alias("kind"),
        content.alias("content"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


def _fake_feature(blob: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a real decoder+featurizer: byte-histogram
    moments. Real implementation would decode and run a vision/audio model."""
    if blob is None:
        return [0.0] * dim
    n = len(blob)
    out = []
    for i in range(dim):
        chunk = blob[i::dim]
        out.append(round(sum(chunk) / (255.0 * max(len(chunk), 1)), 6))
    return out


def extract_features(media: DataFrame, decode_stub: bool = True, batch_rows: int = 256) -> DataFrame:
    """Feature extraction over media blobs via Arrow-batched mapInPandas.

    The batch iterator shape is the real contract: bounded batches of
    binary payloads in, narrow feature rows out — blobs never survive the
    operator. ``decode_stub=False`` raises ``NotImplementedError`` where a
    real codec (PIL / torchaudio / ffmpeg) would plug in.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        dim = 8
        phases = np.arange(dim, dtype="int64")
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real media decoding requires PIL/ffmpeg — not available; "
                    "use decode_stub=True for the deterministic fake featurizer"
                )
            # Vectorized _fake_feature over the whole batch (guide §4.2):
            # one flat uint8 view of the concatenated blobs, one bincount
            # per batch keyed (row, byte-phase) — replaces a per-row
            # Python loop doing dim strided slices + sums per blob. The
            # strided byte sums are exact integers (< 2^53, float64
            # accumulates them exactly); the final round() runs per cell
            # in Python so the rounding is bit-identical to the scalar
            # _fake_feature (pinned by test_multimodal parity).
            blobs = pdf["content"].tolist()
            n = len(blobs)
            lens = np.fromiter(
                (0 if b is None else len(b) for b in blobs), dtype="int64", count=n
            )
            total = int(lens.sum())
            if total:
                cat = np.frombuffer(
                    b"".join(b for b in blobs if b), dtype=np.uint8
                )
                starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
                row_id = np.repeat(np.arange(n, dtype="int64"), lens)
                pos = np.arange(total, dtype="int64") - np.repeat(starts, lens)
                key = row_id * dim + (pos % dim)
                sums = (
                    np.bincount(key, weights=cat, minlength=n * dim)
                    .astype("int64")
                    .reshape(n, dim)
                )
            else:
                sums = np.zeros((n, dim), dtype="int64")
            # len(blob[i::dim]) == ceil((len - i) / dim), floored at 0
            counts = np.maximum((lens[:, None] - phases[None, :] + dim - 1) // dim, 0)
            denom = 255.0 * np.maximum(counts, 1)
            feature = [
                [round(s / d, 6) for s, d in zip(srow, drow)]
                for srow, drow in zip(sums.tolist(), denom.tolist())
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": lens,
                    "feature": feature,
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize plumbing: schema/metadata update is real, pixel work is
    stubbed (content passed through; real impl decodes → resizes → encodes)."""
    return media.withColumn(
        "meta",
        F.struct(
            F.col("meta.mime").alias("mime"),
            F.lit(width).alias("width"),
            F.lit(height).alias("height"),
            F.col("meta.duration_ms").alias("duration_ms"),
        ),
    )


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: emits one row per sampled timestamp
    (every ``every_ms`` starting at 0, for every timestamp strictly below
    the duration — the final PARTIAL interval still yields its frame)
    with a stubbed frame payload (deterministic slice of the source blob).
    Zero/unknown duration emits the single t=0 frame."""
    frames = F.transform(
        F.sequence(
            F.lit(0),
            # last index with i*every < duration  ⇔  (duration-1) div every
            # (e.g. duration 1570 / every 1000 → indices 0 and 1)
            F.greatest(
                F.floor(
                    (F.coalesce(F.col("meta.duration_ms"), F.lit(0)) - 1) / every_ms
                ).cast("long"),
                F.lit(0),
            ),
        ),
        lambda i: F.struct(
            (i * every_ms).cast("long").alias("ts_ms"),
            # stub: real impl decodes the frame at ts; fake = hash-sized slice
            F.substring(F.col("content"), 1, 64).alias("frame"),
        ),
    )
    return media.where(F.col("kind") == "video").select(
        "media_id", F.explode(frames).alias("f")
    ).select("media_id", F.col("f.ts_ms").alias("ts_ms"), F.col("f.frame").alias("frame"))


def target_rows_per_batch(avg_blob_bytes: int, budget_mb: int = 64) -> int:
    """Rows per Arrow batch so a batch stays within an executor-memory
    budget — size batches by BYTES, not rows, when blobs are large."""
    return max(1, (budget_mb * 1024 * 1024) // max(avg_blob_bytes, 1))


def media_dedup_exact(media: DataFrame, id_col: str = "media_id") -> DataFrame:
    """Exact media dedup — the first (and cheapest) multimodal curation
    step: identical payloads collapse to their smallest id via one
    map-side-combinable groupBy on the content digest. No window, so a
    viral duplicate (the same image mirrored a billion times) is just a
    big combiner group, never one task's sort. Output:
    (id, content_md5), one row per distinct payload."""
    return (
        media.groupBy(F.md5("content").alias("content_md5"))
        .agg(F.min(id_col).alias(id_col))
        .select(id_col, "content_md5")
    )


def media_dup_pairs(
    media: DataFrame,
    threshold: float = 0.9999,
    blocks: int | None = None,
    target_block_rows: int = 1024,
) -> DataFrame:
    """NEAR-duplicate media pairs: featurize (stub — byte-histogram
    moments standing in for a perceptual/embedding model) then run the
    exact block-matrix cosine pair kernel shared with
    :func:`~kartothek_spark.operators.similarity.embedding_dup_pairs`.
    With a real codec the featurizer is the ONLY line that changes; the
    distributed pair machinery, fixed-point cosine, and oracle contract
    stay as-is. Note the stub's 8-dim histograms are weakly
    discriminative (same-alphabet payloads all score ≈ 0.998), hence the
    very high default threshold."""
    import math

    from kartothek_spark.operators.similarity import embedding_dup_pairs

    feats = extract_features(media).select(
        F.col("media_id").alias("vec_id"), F.col("feature").alias("embedding")
    )
    if blocks is None:
        # block sizing needs only the ROW COUNT, and the featurizer is
        # 1:1 row-preserving — count the raw media frame (a pruned scan
        # the parquet footer answers) instead of letting
        # embedding_dup_pairs count the featurized frame, which would
        # execute the whole decode+featurize pass once just to size the
        # blocks. Same count, same blocking, identical output.
        blocks = max(1, math.ceil(media.count() / target_block_rows))
    return embedding_dup_pairs(
        feats, threshold=threshold, blocks=blocks, target_block_rows=target_block_rows
    )


def read_binary_files(
    spark,
    source_dir: str,
    glob: str = "*",
    kind: str = "image",
    recursive: bool = False,
) -> DataFrame:
    """Raw media files → (file_name, n_bytes, content, kind) via Spark's
    native ``binaryFile`` source — the ingest edge of the multimodal
    pipeline (a directory of images/audio/video becomes a DataFrame of
    opaque blobs, one task per file split, no driver-side listing loop).

    Glob filtering happens at the source (``pathGlobFilter``), so
    non-matching files are never opened. Each row materializes a whole
    file (the source's contract; files above
    ``spark.sql.sources.binaryFile.maxLength`` raise) — for corpora of
    millions of tiny files, tar/shard upstream and carry the shards as
    rows instead. ``modificationTime`` is deliberately dropped: ingest
    output must be a pure function of file CONTENT so re-runs and
    mirrored copies produce identical datasets.
    """
    reader = spark.read.format("binaryFile").option("pathGlobFilter", glob)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    return _media_projection(reader.load(source_dir), kind)


def _media_projection(raw: DataFrame, kind: str) -> DataFrame:
    """binaryFile-source rows → the ingest schema (shared by the batch
    and streaming readers; modificationTime dropped — see
    :func:`read_binary_files`)."""
    return raw.select(
        F.element_at(F.split(F.col("path"), "/"), -1).alias("file_name"),
        F.col("length").alias("n_bytes"),
        F.col("content"),
        F.lit(kind).alias("kind"),
    )


BINARY_FILE_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("modificationTime", T.TimestampType()),
        T.StructField("length", T.LongType()),
        T.StructField("content", T.BinaryType()),
    ]
)


def ingest_binary_files(
    spark,
    root: str,
    dataset_uuid: str,
    source_dir: str,
    glob: str = "*",
    kind: str = "image",
    recursive: bool = False,
    overwrite: bool = False,
):
    """Ingest a directory of media files as a managed dataset (atomic
    manifest commit, GC/copy/delete lifecycle like any other table).
    Returns the committed manifest. Blob payloads dominate file size, so
    downstream feature extraction should write its (narrow) outputs to a
    separate dataset and never rescan the blobs."""
    from kartothek_spark.dataset.write import store_dataframe_as_dataset

    media = read_binary_files(spark, source_dir, glob=glob, kind=kind, recursive=recursive)
    return store_dataframe_as_dataset(
        spark, media, root, dataset_uuid, overwrite=overwrite
    )
