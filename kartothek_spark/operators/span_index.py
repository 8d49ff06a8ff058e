"""Persisted C4 span-hash index: incremental exact-span deduplication.

:func:`~kartothek_spark.operators.corpus.c4_span_dedup` recomputes every
document's span hashes per call — at 100 TB a daily-ingest pipeline
cannot re-split and re-hash the corpus history per batch. This family
stores the RAW corpus' n-sentence span hashes once and cleans each new
batch against history in O(batch): the same build-once/probe-many
inversion as the MinHash/SymSpell/winnow index siblings.

Layout: one row per ``(sb, h, doc_id, start)`` with ``sb = pmod(h,
buckets)`` the partition key and files sorted by ``h``; a small batch's
lookup dispatches as a manifest-pruned read with an ``h IN`` residual
(same adaptive thresholds as the winnow index), larger batches degrade
to one distributed equi-join — never a cartesian.

Ordering contract (stated, not inferred): C4 keeps a duplicated span's
FIRST occurrence by ``(doc_id, start)``, so incremental == batch holds
exactly when ingest ids are MONOTONIC — every batch's ids exceed all
indexed ids. Under that contract,
``c4_dedup_incremental(batch)`` equals
``c4_span_dedup(history ∪ batch)`` restricted to the batch's ids
(pinned by pytest and the shared SQL twin), because every historical
span outranks every batch span and within-batch ranking is unchanged.
The index stores RAW spans (canonicality is defined on the raw corpus,
not the cleaned one); sync appends the batch's raw spans after probing.

Reference analog: the X1-X5 persisted-index lifecycle
(kartothek/core/index.py:670-757); the reference has no text layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kartothek_spark.core.manifest import DatasetManifest
from kartothek_spark.functions.hashing import h60

META_N = "span_n"
META_BUCKETS = "span_buckets"

# same adaptive pushdown thresholds as the winnow index: bucket pruning
# is free at any size; the h IN residual only up to a small literal list
PUSHDOWN_MAX_SPANS = 20_000
H_RESIDUAL_MAX = 2_000


def _span_rows(df: DataFrame, text_col: str, id_col: str, n: int, buckets: int) -> DataFrame:
    """(sb, h, doc_id, start) raw span rows — same hashing as
    c4_span_dedup, so indexed spans are bit-identical to the batch
    operator's (which is what lets the probe share its oracle)."""
    from kartothek_spark.operators.corpus import _sentences

    nspan = F.size(F.col("__s")) - (n - 1)
    return (
        df.where(F.col(text_col).isNotNull())
        .select(F.col(id_col).alias("doc_id"), _sentences(F.col(text_col)).alias("__s"))
        .where(F.size("__s") >= n)
        .select(
            "doc_id",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(1), nspan),
                    lambda st: h60(F.concat_ws("\x02", F.slice("__s", st, n))),
                )
            ).alias("start", "h"),
        )
        .select(
            F.pmod(F.col("h"), F.lit(buckets)).cast("int").alias("sb"),
            "h",
            "doc_id",
            "start",
        )
    )


def build_span_index(
    spark: SparkSession,
    df: DataFrame,
    root: str,
    index_uuid: str,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 16,
    overwrite: bool = False,
    extra_metadata: dict | None = None,
) -> DatasetManifest:
    """Materialize the corpus' raw n-sentence span hashes as a managed
    dataset. ``n`` is baked into the hashes and recorded in metadata —
    spans at a different n are a different index."""
    from kartothek_spark.dataset.write import store_dataframe_as_dataset

    return store_dataframe_as_dataset(
        spark,
        _span_rows(df, text_col, id_col, n, buckets),
        root,
        index_uuid,
        partition_on=["sb"],
        sort_partitions_by=["h"],
        metadata={META_N: n, META_BUCKETS: buckets, **(extra_metadata or {})},
        overwrite=overwrite,
    )


def sync_span_index(
    spark: SparkSession,
    new_docs: DataFrame,
    root: str,
    index_uuid: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    extra_metadata: dict | None = None,
) -> DatasetManifest:
    """O(new docs) append of one ingest batch's RAW span rows — layout
    parameters read back from the manifest so every batch hashes
    identically. Ship each batch once (monotonic-id contract)."""
    from kartothek_spark.dataset.write import update_dataset

    manifest = DatasetManifest.load(root, index_uuid)
    return update_dataset(
        spark,
        _span_rows(
            new_docs,
            text_col,
            id_col,
            int(manifest.metadata[META_N]),
            int(manifest.metadata[META_BUCKETS]),
        ),
        root,
        index_uuid,
        sort_partitions_by=["h"],
        metadata=dict(extra_metadata or {}),
    )


def c4_dedup_incremental(
    spark: SparkSession,
    batch: DataFrame,
    root: str,
    index_uuid: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Clean ONE ingest batch against the span history: a batch span is a
    victim when its hash exists in the INDEX (history always outranks the
    batch under the monotonic-id contract) or when a lower-(doc_id,
    start) occurrence exists WITHIN the batch — exactly
    :func:`~kartothek_spark.operators.corpus.c4_span_dedup` over
    ``history ∪ batch`` restricted to the batch's ids (shared oracle).
    Output ``(doc_id, text)`` for every batch doc; the corpus history is
    never re-read beyond the probed span buckets. Callers then
    :func:`sync_span_index` the RAW batch to advance history."""
    from pyspark.sql import Window

    from kartothek_spark.dataset.read import read_table
    from kartothek_spark.operators.corpus import _sentences

    manifest = DatasetManifest.load(root, index_uuid)
    n = int(manifest.metadata[META_N])
    buckets = int(manifest.metadata[META_BUCKETS])

    # batch span rows feed the driver h-list collect AND two joins —
    # bounded by the batch's size, pinned once
    bspans = _span_rows(batch, text_col, id_col, n, buckets).localCheckpoint(eager=True)

    hs = [r.h for r in bspans.select("h").distinct().limit(PUSHDOWN_MAX_SPANS + 1).collect()]
    if not hs:
        hist = spark.createDataFrame([], "h long")
    elif len(hs) <= PUSHDOWN_MAX_SPANS:
        conj = [("sb", "in", sorted({h % buckets for h in hs}))]
        if len(hs) <= H_RESIDUAL_MAX:
            conj.append(("h", "in", sorted(hs)))
        hist = read_table(spark, root, index_uuid, predicates=[conj], columns=["h"])
    else:
        hist = read_table(spark, root, index_uuid, columns=["h"])
    hist = hist.select("h").distinct()

    wh = Window.partitionBy("h").orderBy(F.asc("doc_id"), F.asc("start"))
    # within-batch duplicate spans: every occurrence but the batch-first
    batch_dup = (
        bspans.join(
            bspans.groupBy("h").agg(F.count("*").alias("c")).where("c > 1").select("h"),
            "h",
        )
        .withColumn("__r", F.row_number().over(wh))
        .where(F.col("__r") > 1)
        .select("doc_id", "start")
    )
    # history hits: every batch occurrence of an indexed hash
    hist_dup = bspans.join(hist, "h").select("doc_id", "start")
    victims = batch_dup.unionByName(hist_dup).distinct()

    dead = victims.select(
        "doc_id", F.explode(F.sequence(F.col("start"), F.col("start") + (n - 1))).alias("i")
    ).distinct()
    sent = (
        batch.where(F.col(text_col).isNotNull())
        .select(F.col(id_col).alias("doc_id"), _sentences(F.col(text_col)).alias("__s"))
        .select("doc_id", F.posexplode("__s").alias("i", "s"))
    )
    kept = sent.join(dead, ["doc_id", "i"], "left_anti")
    cleaned = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(F.array_sort(F.collect_list(F.struct("i", "s"))), lambda x: x["s"]),
            " ",
        ).alias(text_col)
    )
    return (
        batch.select(F.col(id_col).alias("doc_id"))
        .join(cleaned, "doc_id", "left")
        .select("doc_id", F.coalesce(F.col(text_col), F.lit("")).alias(text_col))
    )


def c4_incremental_sql(
    history_sql: str,
    batch_sql: str,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of :func:`c4_dedup_incremental`: the batch operator's
    twin over ``history ∪ batch``, restricted to the batch's ids — valid
    under the monotonic-id contract the operator documents."""
    from kartothek_spark.operators.corpus import c4_span_dedup_sql

    union = (
        f"(SELECT {id_col}, {text_col} FROM ({history_sql})"
        f" UNION ALL SELECT {id_col}, {text_col} FROM ({batch_sql}))"
    )
    inner = c4_span_dedup_sql(union, n=n, text_col=text_col, id_col=id_col)
    return f"""
SELECT * FROM ({inner})
WHERE doc_id IN (SELECT {id_col} FROM ({batch_sql}))
"""


__all__ = [
    "build_span_index",
    "sync_span_index",
    "c4_dedup_incremental",
    "c4_incremental_sql",
]
