"""Incremental derived-dataset maintenance over the snapshot history.

A CDC-style consumer of :func:`kartothek_spark.dataset.read.read_changes`:
keep a downstream dataset equal to ``transform(source)`` by reprocessing
ONLY the rows appended since the last sync — the incremental-ingest shape
a 100 TB pipeline needs (reprocess the day's new files, not the corpus).

Beyond the reference (single-version manifests can't diff); semantics
follow Delta CDF consumers: the sync cursor (source version) is recorded
in the DERIVED dataset's manifest metadata, so the pipeline is restartable
and exactly-once at the commit level — a crashed sync re-reads the same
changes and re-appends idempotently only after the failed commit never
landed.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

from pyspark.sql import DataFrame, SparkSession

from kartothek_spark.core.manifest import DatasetManifest

_SYNC_KEY = "ktk_sync"


def sync_derived_dataset(
    spark: SparkSession,
    src_root: str,
    src_uuid: str,
    dst_root: str,
    dst_uuid: str,
    transform: Callable[[DataFrame], DataFrame] | None = None,
    partition_on: Sequence[str] = (),
) -> dict[str, Any]:
    """Bring ``dst = transform(src)`` up to date with the source's live
    version. Returns ``{"mode", "src_version", "rows_processed"}``.

    * First call: full build from the live source (``mode="initial"``).
    * Appends only since the cursor: process ONLY the new files
      (``mode="incremental"`` — the scan never touches already-synced
      data; this is the hot path, O(new data)).
    * Source partitions were DROPPED since the cursor: a row-wise
      ``transform`` cannot un-derive their output, so the derived dataset
      is rebuilt from the live source (``mode="refresh"``). Correct for
      any transform; callers with delete-heavy sources should partition
      the derived dataset on the source's partition keys and mirror the
      delete_scope instead of relying on refresh.

    ``transform`` must be row-wise deterministic (filter / project /
    per-row derivation) for incremental == batch equivalence; aggregating
    transforms need the refresh path every time and are better served by
    the streaming operators."""
    from kartothek_spark.dataset.read import diff_versions, read_changes, read_table
    from kartothek_spark.dataset.write import (
        delete_dataset,
        store_dataframe_as_dataset,
        update_dataset,
    )

    transform = transform or (lambda df: df)
    src = DatasetManifest.load(src_root, src_uuid)
    if not src.keep_history:
        raise ValueError(
            f"source dataset {src_uuid!r} does not keep history "
            "(write it with keep_history=True to enable incremental sync)"
        )

    cursor: int | None = None
    if DatasetManifest.exists(dst_root, dst_uuid):
        dst = DatasetManifest.load(dst_root, dst_uuid)
        sync_meta = dst.metadata.get(_SYNC_KEY) or {}
        if sync_meta.get("src_uuid") != src_uuid:
            raise ValueError(
                f"dataset {dst_uuid!r} is not a sync target of {src_uuid!r}"
            )
        cursor = int(sync_meta["src_version"])

    meta = {_SYNC_KEY: {"src_uuid": src_uuid, "src_version": src.version}}

    if cursor is None:
        out = transform(read_table(spark, src_root, src_uuid))
        store_dataframe_as_dataset(
            spark, out, dst_root, dst_uuid, partition_on=partition_on, metadata=meta
        )
        return {"mode": "initial", "src_version": src.version,
                "rows_processed": _rows(dst_root, dst_uuid, spark)}

    if cursor == src.version:
        return {"mode": "noop", "src_version": src.version, "rows_processed": 0}

    _added, removed = diff_versions(src_root, src_uuid, since=cursor)
    if removed:
        # dropped source partitions invalidate previously-derived rows —
        # rebuild from live (see docstring for the delete-heavy alternative)
        delete_dataset(dst_root, dst_uuid)
        out = transform(read_table(spark, src_root, src_uuid))
        store_dataframe_as_dataset(
            spark, out, dst_root, dst_uuid, partition_on=partition_on, metadata=meta
        )
        return {"mode": "refresh", "src_version": src.version,
                "rows_processed": _rows(dst_root, dst_uuid, spark)}

    changes = transform(read_changes(spark, src_root, src_uuid, since=cursor))
    n = changes.count()
    update_dataset(spark, changes if n else None, dst_root, dst_uuid, metadata=meta)
    return {"mode": "incremental", "src_version": src.version, "rows_processed": n}


def _rows(root: str, uuid: str, spark: SparkSession) -> int:
    from kartothek_spark.dataset.read import read_table

    return read_table(spark, root, uuid).count()


__all__ = ["sync_derived_dataset", "sync_aggregate_dataset"]


_AGG_SYNC_KEY = "ktk_agg_sync"
_MERGEABLE = {"sum", "count", "min", "max"}


def sync_aggregate_dataset(
    spark: SparkSession,
    src_root: str,
    src_uuid: str,
    dst_root: str,
    dst_uuid: str,
    group_by: Sequence[str],
    aggs: Sequence[tuple[str, str, str]],
    partition_on: Sequence[str] | None = None,
) -> dict[str, Any]:
    """Incrementally-maintained materialized aggregate:
    ``dst = src.groupBy(group_by).agg(...)`` kept in sync over the
    snapshot history with PARTITION-GRANULAR rewrites.

    ``aggs`` is ``[(out_col, fn, in_col), ...]`` with ``fn`` one of
    ``sum | count | min | max`` — the decomposable aggregates whose
    partials merge associatively (count merges as a sum of partial
    counts; avg = maintain sum and count, divide at read time). That
    restriction is what makes the maintenance O(delta): appended rows
    aggregate alone, and only the groups they touch are rewritten.

    ``partition_on`` (default: first group column) must be a prefix-subset
    of ``group_by``; it is the rewrite granule. Each sync:

    1. aggregates ONLY the appended files (changes feed),
    2. reads back just the affected partitions of the materialized view
       (partition-pruned read),
    3. re-merges old+delta partials for those groups, and
    4. commits ``delete_scope=affected ∪ append`` in ONE atomic manifest
       swap — untouched partitions keep their files byte-identical.

    Dropped source partitions force a full refresh (a lost row cannot be
    un-summed); sources that delete routinely should partition the view
    on the source's partition keys so drops map to scope deletes.

    Group columns in the ``partition_on`` prefix must be NON-NULL: group
    values become the view's partition keys (non-nullable by engine
    contract) and scope predicates cannot address a null label. A null
    group value fails the sync with an actionable error — COALESCE in the
    source or choose a different ``partition_on`` prefix.
    Returns ``{"mode", "src_version", "groups_rewritten"}``."""
    from pyspark.sql import functions as F

    from kartothek_spark.dataset.read import diff_versions, read_changes, read_table
    from kartothek_spark.dataset.write import (
        delete_dataset,
        store_dataframe_as_dataset,
        update_dataset,
    )

    for _, fn, _ in aggs:
        if fn not in _MERGEABLE:
            raise ValueError(
                f"aggregate {fn!r} is not mergeable; supported: {sorted(_MERGEABLE)}"
            )
    group_by = list(group_by)
    partition_on = list(partition_on) if partition_on is not None else group_by[:1]
    if partition_on != group_by[: len(partition_on)]:
        raise ValueError(
            f"partition_on {partition_on} must be a prefix of group_by {group_by}"
        )

    def _first_agg(df):
        return df.groupBy(*group_by).agg(
            *[
                (F.count(in_col) if fn == "count" else getattr(F, fn)(in_col)).alias(out)
                for out, fn, in_col in aggs
            ]
        )

    def _merge_agg(df):
        # partial-merge: count partials re-merge as sums
        return df.groupBy(*group_by).agg(
            *[
                (F.sum(out) if fn in ("sum", "count") else getattr(F, fn)(out)).alias(out)
                for out, fn, _ in aggs
            ]
        )

    src = DatasetManifest.load(src_root, src_uuid)
    if not src.keep_history:
        raise ValueError(
            f"source dataset {src_uuid!r} does not keep history "
            "(write it with keep_history=True to enable incremental sync)"
        )

    cursor: int | None = None
    if DatasetManifest.exists(dst_root, dst_uuid):
        dst = DatasetManifest.load(dst_root, dst_uuid)
        meta = dst.metadata.get(_AGG_SYNC_KEY) or {}
        if meta.get("src_uuid") != src_uuid:
            raise ValueError(f"dataset {dst_uuid!r} is not an agg-sync target of {src_uuid!r}")
        cursor = int(meta["src_version"])

    meta = {_AGG_SYNC_KEY: {"src_uuid": src_uuid, "src_version": src.version}}

    def _rebuild(mode: str):
        if DatasetManifest.exists(dst_root, dst_uuid):
            delete_dataset(dst_root, dst_uuid)
        out = _first_agg(read_table(spark, src_root, src_uuid))
        try:
            store_dataframe_as_dataset(
                spark, out, dst_root, dst_uuid, partition_on=partition_on, metadata=meta
            )
        except ValueError as exc:
            # translate the write layer's generic null-partition-key abort
            # into the same actionable message the incremental path raises
            if "null values in partition keys" in str(exc):
                raise ValueError(
                    f"sync_aggregate_dataset: NULL value in group column(s) used "
                    f"as view partition keys {partition_on}; filter or COALESCE "
                    f"nulls in the source, or choose a non-null partition_on "
                    f"prefix of group_by"
                ) from None
            raise
        n = read_table(spark, dst_root, dst_uuid).count()
        return {"mode": mode, "src_version": src.version, "groups_rewritten": n}

    if cursor is None:
        return _rebuild("initial")
    if cursor == src.version:
        return {"mode": "noop", "src_version": src.version, "groups_rewritten": 0}
    _added, removed = diff_versions(src_root, src_uuid, since=cursor)
    if removed:
        return _rebuild("refresh")

    delta = _first_agg(read_changes(spark, src_root, src_uuid, since=cursor))
    scopes = [row.asDict() for row in delta.select(*partition_on).distinct().collect()]
    # group values become the view's partition keys, which are non-nullable
    # by engine contract (null-key raise, reference metapartition parity) —
    # and a (col, '==', None) scope predicate would never match a label.
    # Fail the sync with an actionable error instead of stalling on the
    # write's generic null-key abort.
    null_scopes = [s for s in scopes if any(v is None for v in s.values())]
    if null_scopes:
        raise ValueError(
            f"sync_aggregate_dataset: NULL value in group column(s) used as view "
            f"partition keys {partition_on} (e.g. {null_scopes[0]}); filter or "
            f"COALESCE nulls in the source, or choose a non-null partition_on "
            f"prefix of group_by"
        )
    if not scopes:
        update_dataset(spark, None, dst_root, dst_uuid, metadata=meta)
        return {"mode": "incremental", "src_version": src.version, "groups_rewritten": 0}
    preds = [[(c, "==", scope[c]) for c in partition_on] for scope in scopes]
    old = read_table(spark, dst_root, dst_uuid, predicates=preds)
    merged = _merge_agg(old.unionByName(delta)).localCheckpoint(eager=True)
    update_dataset(
        spark, merged, dst_root, dst_uuid, delete_scope=scopes, metadata=meta
    )
    return {
        "mode": "incremental",
        "src_version": src.version,
        "groups_rewritten": merged.count(),
    }
