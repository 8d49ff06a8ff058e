"""Row-level DML as partition-granular copy-on-write.

The engine's mutation primitives are partition-level (append / drop —
reference update.py:23-57). These operators add the row-level surface a
lakehouse user expects (DELETE by predicate, MERGE-style upsert) WITHOUT
a new storage mechanism: they rewrite only the hive partitions that can
contain affected rows and commit through the same atomic
append+delete-scope manifest swap — Delta/Iceberg copy-on-write
semantics. Untouched partitions are never read or written, which is the
entire scale story: a point delete on a date-partitioned 100 TB corpus
rewrites one day, not the corpus.
"""

from __future__ import annotations

from typing import Any, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kartothek_spark.core.manifest import DatasetManifest
from kartothek_spark.core.predicates import (
    Predicates,
    coerce_predicate_literals,
    predicates_to_column,
)


def _affected_scopes(
    manifest: DatasetManifest, labels: Sequence[str]
) -> list[dict[str, Any]]:
    """Distinct partition-key value dicts covering ``labels``. An
    unpartitioned dataset returns ``[{}]`` — the whole dataset is one
    rewrite unit (document the cost; partition if you need cheap DML)."""
    if not manifest.partition_keys:
        return [{}]
    seen: dict[tuple, dict[str, Any]] = {}
    for lbl in labels:
        values = manifest.partition_values(lbl)
        seen[tuple(values[k] for k in manifest.partition_keys)] = values
    return [seen[k] for k in sorted(seen)]


def _scope_predicates(manifest: DatasetManifest, scopes: list[dict[str, Any]]) -> Predicates | None:
    if scopes == [{}]:
        return None
    return [[(k, "==", v) for k, v in scope.items()] for scope in scopes]


def delete_rows(
    spark: SparkSession,
    root: str,
    dataset_uuid: str,
    predicates: Predicates,
    **update_kwargs: Any,
) -> DatasetManifest:
    """DELETE FROM dataset WHERE <DNF predicates> — copy-on-write.

    The planner prunes to the files that can contain matching rows
    (partition keys, secondary indices, manifest stats — the same
    :func:`dispatch_labels` a read uses); only THOSE hive partitions are
    read, filtered to the surviving rows (NULL predicate results survive,
    SQL DELETE semantics), and swapped in one atomic commit. Partitions
    the predicate cannot touch are not rewritten."""
    from kartothek_spark.dataset.read import dispatch_labels, read_table
    from kartothek_spark.dataset.write import update_dataset

    manifest = DatasetManifest.load(root, dataset_uuid)
    predicates = coerce_predicate_literals(predicates, manifest.schema)
    labels = dispatch_labels(spark, manifest, predicates)
    if not labels:
        return manifest
    scopes = _affected_scopes(manifest, labels)
    affected = read_table(
        spark, root, dataset_uuid, predicates=_scope_predicates(manifest, scopes)
    )
    # survivors: NOT matching — a NULL predicate result means "not matched"
    survivors = affected.where(~F.coalesce(predicates_to_column(predicates), F.lit(False)))
    return update_dataset(
        spark, survivors, root, dataset_uuid, delete_scope=scopes, **update_kwargs
    )


def upsert_dataset(
    spark: SparkSession,
    df: DataFrame,
    root: str,
    dataset_uuid: str,
    merge_keys: Sequence[str],
    broadcast_keys: bool = True,
    **update_kwargs: Any,
) -> DatasetManifest:
    """MERGE-style upsert: rows in ``df`` replace existing rows with the
    same ``merge_keys`` values; the rest are inserted — copy-on-write at
    partition granularity.

    Affected partitions are the distinct partition-key values present in
    ``df`` (one metadata-cheap ``collect`` of that bounded set); existing
    rows there are anti-joined on the merge keys against the incoming
    keys — BROADCAST by default (``broadcast_keys=True``), which keeps the
    existing rows un-shuffled; a batch whose distinct merge keys approach
    Spark's broadcast limit (8 GB / driver memory) should pass
    ``broadcast_keys=False`` to take a shuffle anti-join instead, or be
    split into several upserts. Results union with the new rows and swap
    in ONE atomic commit. Requires partition keys in ``df``; matched rows in
    partitions ``df`` does not touch cannot exist when the partition keys
    are part of the merge identity — callers merging across partition
    values (a row "moved" to a new date) should delete first, then upsert,
    or include the old partition value in a delete_scope."""
    from kartothek_spark.dataset.read import read_table
    from kartothek_spark.dataset.write import update_dataset

    manifest = DatasetManifest.load(root, dataset_uuid)
    if not merge_keys:
        raise ValueError("merge_keys must be non-empty")
    missing = [c for c in list(merge_keys) + list(manifest.partition_keys)
               if c not in df.columns]
    if missing:
        raise ValueError(f"upsert frame is missing columns: {missing}")

    if manifest.partition_keys:
        scope_rows = (
            df.select(*manifest.partition_keys).distinct().collect()
        )
        scopes = [row.asDict() for row in scope_rows]
        # canonicalize literal types against the schema (e.g. int vs long)
        scopes = [
            {k: v for k, v in scope.items()} for scope in sorted(
                scopes, key=lambda s: tuple(str(s[k]) for k in manifest.partition_keys)
            )
        ]
    else:
        scopes = [{}]

    existing = read_table(
        spark, root, dataset_uuid, predicates=_scope_predicates(manifest, scopes)
    )
    # broadcast the anti-join's key side: one upsert batch's merge keys are
    # small relative to the partitions they touch, and broadcasting them
    # means the existing rows are never shuffled — the dominant cost of a
    # copy-on-write merge. broadcast_keys=False opts out for giant batches.
    keys = df.select(*merge_keys).dropDuplicates()
    if broadcast_keys:
        keys = F.broadcast(keys)
    survivors = existing.join(keys, list(merge_keys), "left_anti")
    merged = survivors.unionByName(df.select(*existing.columns))
    return update_dataset(
        spark, merged, root, dataset_uuid, delete_scope=scopes, **update_kwargs
    )


__all__ = ["delete_rows", "upsert_dataset"]
