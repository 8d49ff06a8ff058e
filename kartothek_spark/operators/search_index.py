"""Persisted inverted text index: BM25 postings as a managed dataset.

At 100 TB you do not re-tokenize the corpus per query the way
:func:`~kartothek_spark.operators.search.bm25_search` does: the postings
are built ONCE as a dataset partitioned on a term-hash bucket, appended
to incrementally per ingest batch (O(new docs), like the MinHash and PQ
index siblings ``dedup_index`` / ``pq``), and a query becomes a
manifest-PRUNED read of only its terms' buckets — partition pruning on
``tb`` plus a ``term IN (...)`` parquet pushdown inside them, against
postings sorted by term for row-group skipping.

Exactness contract: scoring reuses ``search._bm25_rank``, the SAME
expression tree as the on-the-fly operator, over the same exact-integer
inputs (tf, dl as stored int64; the corpus scalars n_docs/total_len kept
as exact ints in the manifest metadata) — so indexed results are
value-identical to ``bm25_search`` over the indexed corpus, which is
exactly what the ``corpus_search_indexed`` gate's oracle checks.

The reference has no retrieval layer; the storage machinery used here is
its own store/commit/update surface (S13/S16/S19,
``kartothek/io/eager.py``, ``io_components/write.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kartothek_spark.core.manifest import DatasetManifest
from kartothek_spark.functions.hashing import h60, h60_py, tokens

META_N_DOCS = "bm25_n_docs"
META_TOTAL_LEN = "bm25_total_len"
META_BUCKETS = "bm25_buckets"


def _postings(
    df: DataFrame, text_col: str, id_col: str, buckets: int
) -> tuple[DataFrame, int, int, DataFrame]:
    """``(tb, term, doc_id, dl, tf)`` postings plus the exact corpus
    scalars ``(n_docs, total_len)`` — the ONLY driver values, both exact
    integers. ``dl`` is denormalized into every posting row (functionally
    dependent on doc_id): the corpus-sized doc-length join this saves at
    query time is the same scale-killer the bm25_search fix removed.

    Returns the PERSISTED tokenized base as the 4th element (already
    materialized by the scalar agg) so the postings write re-reads the
    cache instead of tokenizing the batch a second time — the dominant
    cost of an index build. Callers unpersist it after their commit."""
    base = df.select(
        F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("__t")
    ).persist()
    try:
        row = base.agg(
            F.count("*").alias("n"), F.sum(F.size("__t")).alias("total")
        ).collect()[0]
    except Exception:
        # callers only receive the handle on success — release the pin
        # here or a failed batch leaks cached blocks for the session
        base.unpersist()
        raise
    n_docs, total_len = int(row["n"]), int(row["total"] or 0)
    postings = (
        base.select(
            "doc_id",
            F.size("__t").cast("long").alias("dl"),
            F.explode("__t").alias("term"),
        )
        .groupBy("term", "doc_id", "dl")
        .agg(F.count("*").alias("tf"))
        .select(
            F.pmod(h60(F.col("term")), F.lit(buckets)).cast("int").alias("tb"),
            "term",
            "doc_id",
            "dl",
            "tf",
        )
    )
    return postings, n_docs, total_len, base


def build_text_index(
    spark: SparkSession,
    df: DataFrame,
    root: str,
    index_uuid: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 16,
    overwrite: bool = False,
    extra_metadata: dict | None = None,
) -> DatasetManifest:
    """Materialize the corpus' inverted postings as a managed dataset.

    Layout: ``partition_on=["tb"]`` (term-hash bucket — the pruning key a
    query dispatches on) with postings sorted by ``term`` inside each
    file so the ``term IN`` scan filter also prunes row groups. Size
    ``buckets`` so one bucket's postings ≈ a few files at the target
    corpus (buckets ≈ corpus_tokens × 16 B / (few × file_size)); query
    cost scales with the terms' buckets only, never the vocabulary."""
    from kartothek_spark.dataset.write import store_dataframe_as_dataset

    postings, n_docs, total_len, base = _postings(df, text_col, id_col, buckets)
    try:
        return store_dataframe_as_dataset(
            spark,
            postings,
            root,
            index_uuid,
            partition_on=["tb"],
            sort_partitions_by=["term"],
            metadata={
                META_N_DOCS: n_docs,
                META_TOTAL_LEN: total_len,
                META_BUCKETS: buckets,
                **(extra_metadata or {}),
            },
            overwrite=overwrite,
        )
    finally:
        base.unpersist()


def sync_text_index(
    spark: SparkSession,
    new_docs: DataFrame,
    root: str,
    index_uuid: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_conflict_retries: int = 3,
    extra_metadata: dict | None = None,
) -> DatasetManifest:
    """Append the postings of a NEW document batch in one atomic commit —
    per-sync cost is O(new docs), the corpus is never re-tokenized.
    Caller contract (same as the dedup/PQ index syncs): ``new_docs`` ids
    are disjoint from the already-indexed ones. The exact corpus scalars
    advance in the same commit, so a search planned against the new
    manifest version scores with the post-append N/avgdl.

    The counter advance is DELTA-based: the absolute N/total are derived
    via ``update_dataset``'s callable-metadata form from the manifest of
    EACH commit attempt (including conflict rebases), so concurrent syncs
    compose — a plain dict would re-apply stale absolutes and silently
    lose another sync's increment (the lost-update anomaly concurrent
    appenders must not see)."""
    from kartothek_spark.dataset.write import update_dataset

    manifest = DatasetManifest.load(root, index_uuid)
    buckets = int(manifest.metadata[META_BUCKETS])
    postings, n_new, total_new, base = _postings(new_docs, text_col, id_col, buckets)
    try:
        return update_dataset(
            spark,
            postings,
            root,
            index_uuid,
            sort_partitions_by=["term"],
            metadata=lambda m: {
                META_N_DOCS: int(m.metadata[META_N_DOCS]) + n_new,
                META_TOTAL_LEN: int(m.metadata[META_TOTAL_LEN]) + total_new,
                **(extra_metadata or {}),
            },
            max_conflict_retries=max_conflict_retries,
        )
    finally:
        base.unpersist()


def search_text_index(
    spark: SparkSession,
    root: str,
    index_uuid: str,
    query_terms: list[str],
    k: int = 10,
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k BM25 over the PERSISTED index — value-identical to
    ``bm25_search(corpus, query_terms, k)`` (same ``_bm25_rank``
    expression tree over the same exact inputs), but the corpus-side work
    is a pruned read: only the query terms' ``tb`` partitions are
    dispatched (driver-side ``h60_py``, no Spark job) and the ``term IN``
    residual pushes into those files' row groups. df(term) is exact from
    the pruned postings (a term's rows live entirely in its bucket)."""
    from kartothek_spark.dataset.read import read_table
    from kartothek_spark.operators.search import _bm25_rank

    terms = sorted({t.lower() for t in query_terms})
    if not terms:
        raise ValueError("query_terms must be non-empty")
    manifest = DatasetManifest.load(root, index_uuid)
    n_docs = int(manifest.metadata[META_N_DOCS])
    if n_docs == 0:
        raise ValueError("empty corpus")
    avgdl = int(manifest.metadata[META_TOTAL_LEN]) / n_docs
    buckets = int(manifest.metadata[META_BUCKETS])
    bkts = sorted({h60_py(t) % buckets for t in terms})

    tf = read_table(
        spark,
        root,
        index_uuid,
        predicates=[[("tb", "in", bkts), ("term", "in", terms)]],
        columns=["term", "doc_id", "dl", "tf"],
    ).select(
        F.col("doc_id").alias("__id"),
        F.col("dl").cast("double").alias("__dl"),
        F.col("term").alias("__term"),
        F.col("tf").cast("double").alias("__tf"),
    )
    return _bm25_rank(tf, n_docs, avgdl, k, id_col)


def search_text_index_batch(
    spark: SparkSession,
    root: str,
    index_uuid: str,
    queries: dict[object, list[str]] | list[tuple[object, list[str]]],
    k: int = 10,
    id_col: str = "doc_id",
    qid_col: str = "query_id",
) -> DataFrame:
    """Top-k BM25 for MANY queries in ONE plan over the persisted index —
    the corpus-audit shape (a decontamination or eval-leak sweep runs
    thousands of benchmark queries): one manifest-PRUNED read of the
    UNION of all queries' term buckets, one ``term IN`` pushdown, one
    grouped ranking keyed by query id
    (:func:`~kartothek_spark.operators.search.\\_bm25_rank_grouped`).
    Per query, results are value-identical to :func:`search_text_index`
    — pinned by the batch-vs-single pytest and the gate's per-query SQL
    twin. ``queries`` maps query id → term list (dict or pair list)."""
    from kartothek_spark.dataset.read import read_table
    from kartothek_spark.operators.search import _bm25_rank_grouped

    pairs = list(queries.items()) if isinstance(queries, dict) else list(queries)
    if not pairs:
        raise ValueError("queries must be non-empty")
    norm: list[tuple[object, list[str]]] = []
    for qid, terms in pairs:
        ts = sorted({t.lower() for t in terms})
        if not ts:
            raise ValueError(f"query {qid!r} has no terms")
        norm.append((qid, ts))
    if len({qid for qid, _ in norm}) != len(norm):
        raise ValueError("query ids must be unique")

    all_terms = sorted({t for _, ts in norm for t in ts})
    manifest = DatasetManifest.load(root, index_uuid)
    n_docs = int(manifest.metadata[META_N_DOCS])
    if n_docs == 0:
        raise ValueError("empty corpus")
    avgdl = int(manifest.metadata[META_TOTAL_LEN]) / n_docs
    buckets = int(manifest.metadata[META_BUCKETS])
    bkts = sorted({h60_py(t) % buckets for t in all_terms})

    tf = read_table(
        spark,
        root,
        index_uuid,
        predicates=[[("tb", "in", bkts), ("term", "in", all_terms)]],
        columns=["term", "doc_id", "dl", "tf"],
    ).select(
        F.col("doc_id").alias("__id"),
        F.col("dl").cast("double").alias("__dl"),
        F.col("term").alias("__term"),
        F.col("tf").cast("double").alias("__tf"),
    )
    qdf = spark.createDataFrame(
        [(qid, t) for qid, ts in norm for t in ts], ["__qid", "__term"]
    )
    return _bm25_rank_grouped(tf, qdf, n_docs, avgdl, k, id_col, qid_col)
