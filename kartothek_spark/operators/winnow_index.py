"""Persisted winnowing fingerprint index: MOSS fingerprints as a managed
dataset.

The MOSS service this family mirrors (Schleimer, Wilkerson & Aiken,
SIGMOD 2003 §5) IS a persisted fingerprint database: every submitted
document's selected fingerprints are stored once, and each new document
is fingerprinted and probed against the stored set. The on-the-fly
:func:`~kartothek_spark.operators.dedup.winnow_dup_pairs` recomputes the
whole corpus' fingerprints per call; at 100 TB that recomputation
dominates, exactly the way re-tokenizing dominates on-the-fly BM25 (see
:mod:`~kartothek_spark.operators.search_index`) and re-blocking dominates
on-the-fly SymSpell (:mod:`~kartothek_spark.operators.fuzzy_index`).

Layout: one row per ``(fb, fp, doc_id, pos)`` with ``fb = pmod(fp,
buckets)`` the partition key and files sorted by ``fp``, so a probe
batch's overlap query dispatches only its fingerprints' buckets
(manifest partition pruning) with an ``fp IN`` residual that skips row
groups inside them. Positions are preserved (MOSS locates matches, not
just detects them), but the pair queries deduplicate to the (doc, fp)
SET — the same set semantics as the on-the-fly operator.

Sync contract (matches the text/PQ/MinHash/SymSpell siblings): callers
ship NEW documents per batch; the append is O(new docs). Re-shipping a
document duplicates its rows — harmless for query correctness (every
query deduplicates (doc_id, fp) first) but wasted bytes, so ship deltas.

The reference has no fingerprint layer; the storage machinery is its own
store/commit/update surface (S13/S16/S19, ``kartothek/io/eager.py``,
``io_components/write.py``); the persisted-index pattern mirrors its
X1–X5 secondary-index lifecycle (``kartothek/core/index.py:670-757``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kartothek_spark.core.manifest import DatasetManifest
from kartothek_spark.operators.dedup import NGRAM_MAX_DF

META_K = "winnow_k"
META_W = "winnow_w"
META_BUCKETS = "winnow_buckets"

# driver-side pushdown cap: a probe batch whose fingerprint set has at
# most this many distinct values dispatches as a pruned read (fp list
# collected to the driver, 8 bytes each); anything larger runs as one
# distributed equi-join over the index instead — never a cartesian
PUSHDOWN_MAX_FPS = 20_000
# the row-group-skipping ``fp IN`` residual is pushed only when the list
# is this small: a multi-thousand-literal In filter costs more to plan
# and evaluate than the row groups it might skip (bucket-level manifest
# pruning via ``fb IN`` is free at any size and always applied)
FP_RESIDUAL_MAX = 2_000


def _fp_rows(
    df: DataFrame, text_col: str, id_col: str, k: int, w: int, buckets: int
) -> DataFrame:
    """``(fb, fp, doc_id, pos)`` index rows — the winnowing selection is
    the shared narrow-projection pass of
    :func:`~kartothek_spark.operators.dedup.winnow_fingerprints`, so
    indexed fingerprints are bit-identical to the on-the-fly operator's
    (which is what lets the indexed queries share its oracle)."""
    from kartothek_spark.operators.dedup import winnow_fingerprints
    from kartothek_spark.operators._util import scale_out

    return winnow_fingerprints(scale_out(df), text_col, id_col, k, w).select(
        F.pmod(F.col("fp"), F.lit(buckets)).cast("int").alias("fb"),
        "fp",
        F.col(id_col).alias("doc_id"),
        "pos",
    )


def build_winnow_index(
    spark: SparkSession,
    df: DataFrame,
    root: str,
    index_uuid: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    w: int = 4,
    buckets: int = 16,
    overwrite: bool = False,
    extra_metadata: dict | None = None,
) -> DatasetManifest:
    """Materialize the corpus' winnowing fingerprints as a managed
    dataset. ``k``/``w`` are baked into the layout and recorded in
    manifest metadata — fingerprints at different (k, w) are a different
    index (the guarantee threshold k+w-1 is a build-time property). Size
    ``buckets`` so one bucket's rows ≈ a few files at the target corpus
    (the selected set is ~len/w rows per document)."""
    from kartothek_spark.dataset.write import store_dataframe_as_dataset

    rows = _fp_rows(df, text_col, id_col, k, w, buckets)
    return store_dataframe_as_dataset(
        spark,
        rows,
        root,
        index_uuid,
        partition_on=["fb"],
        sort_partitions_by=["fp"],
        metadata={
            META_K: k,
            META_W: w,
            META_BUCKETS: buckets,
            **(extra_metadata or {}),
        },
        overwrite=overwrite,
    )


def sync_winnow_index(
    spark: SparkSession,
    new_docs: DataFrame,
    root: str,
    index_uuid: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    extra_metadata: dict | None = None,
) -> DatasetManifest:
    """O(new docs) append of one ingest batch's fingerprints — atomic
    commit, layout parameters read back from the manifest so every batch
    fingerprints identically; appended files keep the fp-sorted order the
    pruned lookup's row-group skipping relies on."""
    from kartothek_spark.dataset.write import update_dataset

    manifest = DatasetManifest.load(root, index_uuid)
    rows = _fp_rows(
        new_docs,
        text_col,
        id_col,
        int(manifest.metadata[META_K]),
        int(manifest.metadata[META_W]),
        int(manifest.metadata[META_BUCKETS]),
    )
    return update_dataset(
        spark,
        rows,
        root,
        index_uuid,
        sort_partitions_by=["fp"],
        metadata=dict(extra_metadata or {}),
    )


def winnow_dup_pairs_indexed(
    spark: SparkSession,
    root: str,
    index_uuid: str,
    min_shared: int = 3,
    max_df: int = NGRAM_MAX_DF,
) -> DataFrame:
    """Overlap pairs over the PERSISTED fingerprints — value-identical to
    :func:`~kartothek_spark.operators.dedup.winnow_dup_pairs` over the
    indexed corpus (same df-capped inverted-index join over the same
    (doc, fp) sets), but the fingerprint computation — the dominant cost,
    a full-corpus text pass — is a parquet read. The plan stays fully
    LAZY: the source is already materialized on disk, so there is no
    persist/localCheckpoint to manage (the eager pin the on-the-fly
    operator needs disappears with the index). Output
    ``(id_a, id_b, n_shared)`` with ``id_a < id_b``."""
    from kartothek_spark.dataset.read import read_table

    fp = (
        read_table(spark, root, index_uuid, columns=["fp", "doc_id"])
        .select(F.col("doc_id").alias("__id"), F.col("fp").alias("g"))
        .distinct()
    )
    rare = fp.groupBy("g").count().where(F.col("count") <= max_df).select("g")
    inv = fp.join(rare, "g")
    l, r = inv.alias("l"), inv.alias("r")
    return (
        l.join(r, (F.col("l.g") == F.col("r.g")) & (F.col("l.__id") < F.col("r.__id")))
        .groupBy(F.col("l.__id").alias("id_a"), F.col("r.__id").alias("id_b"))
        .agg(F.count("*").alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )


def search_winnow_index(
    spark: SparkSession,
    root: str,
    index_uuid: str,
    probes: DataFrame,
    text_col: str = "text",
    probe_id: str = "doc_id",
    min_shared: int = 3,
    max_df: int = NGRAM_MAX_DF,
) -> DataFrame:
    """Overlap lookup of a probe batch against the persisted index — the
    MOSS submission shape (new documents checked against the corpus
    without touching its text). Probes are fingerprinted on the fly at
    the INDEX's (k, w); a small batch dispatches as a manifest-pruned
    point read of only its fingerprints' ``fb`` buckets with the ``fp
    IN`` residual pushed into those files' row groups, a large batch
    degrades to one distributed equi-join — never a cartesian.

    The document-frequency cap is the INDEXED corpus' df per
    fingerprint, exact from the pruned read (a fingerprint's rows live
    entirely in its bucket) — same stop-fingerprint contract as
    :func:`~kartothek_spark.operators.dedup.winnow_dup_pairs`, mirrored
    in the SQL twin. Indexed rows whose doc_id equals the probe's id are
    excluded (re-probing an already-indexed document must not match
    itself). Output columns are always ``(doc_id, probe_id, n_shared)``
    — ``probe_id`` names the INPUT id column of ``probes``."""
    from kartothek_spark.dataset.read import read_table
    from kartothek_spark.operators.dedup import winnow_fingerprints

    manifest = DatasetManifest.load(root, index_uuid)
    k = int(manifest.metadata[META_K])
    w = int(manifest.metadata[META_W])
    buckets = int(manifest.metadata[META_BUCKETS])

    # probe fingerprints feed the driver fp-list collect AND the overlap
    # join — materialized once, bounded by the probe batch's ~len/w
    # selected set (same rationale as fuzzy_index's pblocks checkpoint)
    pfp = (
        winnow_fingerprints(probes, text_col, probe_id, k, w)
        .select(F.col(probe_id).alias("__pid"), F.col("fp").alias("g"))
        .distinct()
        .localCheckpoint(eager=True)
    )

    fps = [
        r.g for r in pfp.select("g").distinct().limit(PUSHDOWN_MAX_FPS + 1).collect()
    ]
    if not fps:  # empty probe batch: zero-job empty result, typed
        return spark.createDataFrame([], "doc_id long, probe_id long, n_shared long")
    if len(fps) <= PUSHDOWN_MAX_FPS:
        fbs = sorted({f % buckets for f in fps})
        conj = [("fb", "in", fbs)]
        if len(fps) <= FP_RESIDUAL_MAX:
            conj.append(("fp", "in", sorted(fps)))
        idx = read_table(
            spark, root, index_uuid, predicates=[conj], columns=["fp", "doc_id"]
        )
    else:
        idx = read_table(spark, root, index_uuid, columns=["fp", "doc_id"])

    ifp = idx.select("doc_id", F.col("fp").alias("g")).distinct()
    rare = ifp.groupBy("g").count().where(F.col("count") <= max_df).select("g")
    return (
        ifp.join(rare, "g")
        .join(pfp, "g")
        .where(F.col("doc_id") != F.col("__pid"))
        .groupBy("doc_id", F.col("__pid").alias("probe_id"))
        .agg(F.count("*").alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )


def winnow_probe_sql(
    corpus_sql: str,
    probe_sql: str,
    k: int = 8,
    w: int = 4,
    min_shared: int = 3,
    max_df: int = NGRAM_MAX_DF,
    id_col: str = "doc_id",
    probe_id: str = "probe_id",
) -> str:
    """DuckDB twin of :func:`search_winnow_index` over ``corpus_sql`` as
    the indexed corpus and ``probe_sql`` as the probe batch — built from
    the same shared fingerprint twin as the pair oracle, with the df cap
    computed over the full corpus (the pruned read's per-fp counts equal
    the global ones, so the restriction is value-neutral)."""
    from kartothek_spark.operators.dedup import winnow_fingerprints_sql

    cfp = winnow_fingerprints_sql(f"({corpus_sql})", "text", id_col, k, w)
    pfp = winnow_fingerprints_sql(f"({probe_sql})", "text", probe_id, k, w)
    return f"""
WITH cfp AS (SELECT DISTINCT {id_col} AS id, fp AS g FROM ({cfp})),
pfp AS (SELECT DISTINCT {probe_id} AS pid, fp AS g FROM ({pfp})),
rare AS (SELECT g FROM cfp GROUP BY g HAVING count(*) <= {max_df})
SELECT c.id AS doc_id, p.pid AS probe_id, count(*) AS n_shared
FROM cfp c
JOIN rare USING (g)
JOIN pfp p USING (g)
WHERE c.id <> p.pid
GROUP BY c.id, p.pid
HAVING count(*) >= {min_shared}
"""


__all__ = [
    "build_winnow_index",
    "sync_winnow_index",
    "winnow_dup_pairs_indexed",
    "search_winnow_index",
    "winnow_probe_sql",
]
