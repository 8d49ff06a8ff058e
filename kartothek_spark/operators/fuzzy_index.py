"""Persisted SymSpell deletion-neighborhood index: fuzzy lookup as a
managed dataset.

The original SymSpell construction IS a precomputed dictionary — the
whole point of deletion blocking is that the expensive side (generating
the corpus keys' deletion neighborhoods, ~len^d/d! variants per key) is
done ONCE, and a lookup only generates the PROBE's neighborhood. The
on-the-fly :func:`~kartothek_spark.operators.dedup.fuzzy_join` re-blocks
the corpus per probe batch; at 100 TB that re-blocking dominates, the
same way re-tokenizing dominates on-the-fly BM25 (see
:mod:`~kartothek_spark.operators.search_index`, this module's sibling).

Layout: one row per (block hash, DISTINCT key) — ids are deliberately
NOT stored (a mega-duplicated key stays ONE index row; expansion to row
ids happens against the caller's corpus frame at query time, exactly the
``corpus=`` re-rank shape of ``search_pq_index``). Partitioned on
``bb = pmod(blk, buckets)`` so a small probe batch dispatches only its
blocks' buckets (manifest partition pruning + ``blk IN`` row-group
pushdown against blk-sorted files); a large batch degrades gracefully to
one full-index equi-join — never a cartesian.

Sync contract (matches the text/PQ/MinHash index siblings): callers ship
NEW rows per batch; the append is O(new keys). A key re-shipped in a
later batch duplicates its block rows — harmless for correctness (the
candidate set is de-duplicated before verification) but wasted bytes, so
ship deltas.

The reference has no fuzzy layer; the storage machinery is its own
store/commit/update surface (S13/S16/S19). Blocking completeness is the
public SymSpell/FastSS result, pinned by the hypothesis suite against
the brute-force quadratic oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kartothek_spark.core.manifest import DatasetManifest

META_MAX_DIST = "fuzzy_max_dist"
META_MAX_LEN = "fuzzy_max_len"
META_BUCKETS = "fuzzy_buckets"

# driver-side pushdown cap: a probe batch whose deletion neighborhood has
# at most this many distinct blocks dispatches as a pruned read (block
# list collected to the driver, ~8 bytes each); anything larger runs as a
# distributed equi-join over the index instead
PUSHDOWN_MAX_BLOCKS = 20_000


def _key_blocks(keys: DataFrame, max_dist: int, max_len: int) -> DataFrame:
    """(blk, key) — the deletion neighborhood of DISTINCT keys, one row
    per (variant hash, key), deduplicated (two different cuts of one key
    can hash to the same variant)."""
    from kartothek_spark.operators.dedup import _deletion_blocks

    # the key itself rides as the block pass's __id (the pass echoes ids
    # opaquely), so each output row is (variant hash, key) directly
    return (
        _deletion_blocks(
            keys.select(F.col("__s").alias("__id"), "__s"), max_dist, max_len
        )
        .select(F.col("__blk").alias("blk"), F.col("__id").alias("key"))
        .dropDuplicates(["blk", "key"])
    )


def _block_rows(
    df: DataFrame, string_col: str, max_dist: int, max_len: int, buckets: int
) -> DataFrame:
    keys = (
        df.select(F.col(string_col).alias("__s"))
        .where(F.col("__s").isNotNull())
        .distinct()
    )
    return _key_blocks(keys, max_dist, max_len).select(
        F.pmod(F.col("blk"), F.lit(buckets)).cast("int").alias("bb"), "blk", "key"
    )


def build_fuzzy_index(
    spark: SparkSession,
    df: DataFrame,
    root: str,
    index_uuid: str,
    max_dist: int = 2,
    string_col: str = "text",
    max_len: int = 48,
    buckets: int = 16,
    overwrite: bool = False,
    extra_metadata: dict | None = None,
) -> DatasetManifest:
    """Materialize the corpus keys' deletion-neighborhood blocks as a
    managed dataset (``max_dist``/``max_len`` are baked into the layout
    and recorded in manifest metadata — a lookup at a different distance
    needs its own index, same as SymSpell dictionaries)."""
    from kartothek_spark.dataset.write import store_dataframe_as_dataset
    from kartothek_spark.operators.dedup import _check_fuzzy_args

    _check_fuzzy_args(max_dist)
    rows = _block_rows(df, string_col, max_dist, max_len, buckets)
    return store_dataframe_as_dataset(
        spark,
        rows,
        root,
        index_uuid,
        partition_on=["bb"],
        sort_partitions_by=["blk"],
        metadata={
            META_MAX_DIST: max_dist,
            META_MAX_LEN: max_len,
            META_BUCKETS: buckets,
            **(extra_metadata or {}),
        },
        overwrite=overwrite,
    )


def sync_fuzzy_index(
    spark: SparkSession,
    df: DataFrame,
    root: str,
    index_uuid: str,
    string_col: str = "text",
    extra_metadata: dict | None = None,
) -> DatasetManifest:
    """O(new keys) append of one ingest batch's blocks — atomic commit,
    layout parameters read back from the manifest so every batch blocks
    identically."""
    from kartothek_spark.dataset.write import update_dataset

    manifest = DatasetManifest.load(root, index_uuid)
    rows = _block_rows(
        df,
        string_col,
        int(manifest.metadata[META_MAX_DIST]),
        int(manifest.metadata[META_MAX_LEN]),
        int(manifest.metadata[META_BUCKETS]),
    )
    return update_dataset(
        spark, rows, root, index_uuid,
        # keep the build layout's blk-sorted files: the pruned lookup's
        # `blk IN` predicate relies on row-group min/max skipping, which
        # unsorted appended batches would silently degrade (same reason
        # sync_text_index sorts by term)
        sort_partitions_by=["blk"],
        metadata=dict(extra_metadata or {}),
    )


def search_fuzzy_index(
    spark: SparkSession,
    root: str,
    index_uuid: str,
    probes: DataFrame,
    probe_key: str = "text",
    probe_id: str = "doc_id",
    corpus: DataFrame | None = None,
    corpus_key: str | None = None,
    corpus_id: str | None = None,
    max_dist: int | None = None,
) -> DataFrame:
    """Fuzzy lookup against the persisted index.

    Without ``corpus``: returns ``(probe_id, key, dist)`` — every indexed
    KEY within ``max_dist`` of each probe (dictionary-lookup semantics,
    the original SymSpell contract). With ``corpus`` (+ ``corpus_key`` /
    ``corpus_id``): expands keys to the corpus rows holding them and
    returns ``(corpus_id, probe_id, dist)`` — value-identical to
    ``fuzzy_join(corpus, probes, ...)`` while never re-blocking the
    corpus side. ``max_dist`` may TIGHTEN the indexed distance (the
    verify is exact), never exceed it."""
    from kartothek_spark.dataset.read import read_table

    manifest = DatasetManifest.load(root, index_uuid)
    idx_dist = int(manifest.metadata[META_MAX_DIST])
    max_len = int(manifest.metadata[META_MAX_LEN])
    buckets = int(manifest.metadata[META_BUCKETS])
    if max_dist is None:
        max_dist = idx_dist
    if max_dist > idx_dist:
        raise ValueError(
            f"index was built at max_dist={idx_dist}; cannot search at "
            f"{max_dist} (blocking would be incomplete) — rebuild the index"
        )
    if corpus is not None and (corpus_key is None or corpus_id is None):
        raise ValueError("corpus expansion needs corpus_key and corpus_id")
    if corpus is not None and corpus_id == probe_id:
        raise ValueError("corpus_id and probe_id must differ in the output")

    pkeys = (
        probes.select(F.col(probe_key).alias("__s"))
        .where(F.col("__s").isNotNull())
        .distinct()
    )
    # probe-side neighborhood at the INDEX's distance (candidate
    # completeness needs both sides blocked at the same d; a tighter
    # max_dist only tightens the exact verify below). Materialized once —
    # the driver block-list collect below AND the verify join both read
    # it; left lazy, the whole probe scan + variant generation would run
    # twice. localCheckpoint is bounded by the probe batch's neighborhood
    # and its blocks are released by the context cleaner when the plan is
    # garbage-collected (no session-lifetime pin to unwind).
    pblocks = (
        _key_blocks(pkeys, idx_dist, max_len)
        .select("blk", F.col("key").alias("__pk"))
        .localCheckpoint(eager=True)
    )

    # small probe batches dispatch as a manifest-pruned point read: the
    # distinct block list rides driver-side into (bucket, blk) predicates;
    # big batches fall back to one distributed equi-join on blk
    blks = [
        r.blk
        for r in pblocks.select("blk").distinct().limit(PUSHDOWN_MAX_BLOCKS + 1).collect()
    ]
    if len(blks) <= PUSHDOWN_MAX_BLOCKS:
        bbs = sorted({b % buckets for b in blks})
        idx = read_table(
            spark, root, index_uuid,
            predicates=[[("bb", "in", bbs), ("blk", "in", sorted(blks))]],
            columns=["blk", "key"],
        )
    else:
        idx = read_table(spark, root, index_uuid, columns=["blk", "key"])

    verified_keys = (
        idx.join(pblocks, "blk")
        .select("key", "__pk")
        .dropDuplicates(["key", "__pk"])
        .withColumn("dist", F.levenshtein("key", "__pk").cast("long"))
        .where(F.col("dist") <= max_dist)
    )
    pids = probes.select(
        F.col(probe_id).alias("__pid"), F.col(probe_key).alias("__pk")
    ).where(F.col("__pk").isNotNull())
    out = verified_keys.join(pids, "__pk")
    if corpus is None:
        return out.select(F.col("__pid").alias(probe_id), "key", "dist")
    cids = corpus.select(
        F.col(corpus_id).alias("__cid"), F.col(corpus_key).alias("key")
    ).where(F.col("key").isNotNull())
    return out.join(cids, "key").select(
        F.col("__cid").alias(corpus_id),
        F.col("__pid").alias(probe_id),
        "dist",
    )


__all__ = [
    "build_fuzzy_index",
    "sync_fuzzy_index",
    "search_fuzzy_index",
]
