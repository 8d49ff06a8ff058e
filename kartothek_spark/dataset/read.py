"""Manifest-driven pruned read path.

Re-expresses the reference read lifecycle (survey §3.1:
``read_table`` io/eager.py:344, ``dispatch_metapartitions_from_factory``
io_components/read.py:75-178, ``MetaPartition.load_dataframes``
metapartition.py:735-884 in /root/reference) Spark-first:

* the PLANNER (driver, O(1) store round-trips) prunes the file list with
  the partition-key part of the DNF (labels parsed from hive paths) and
  with secondary inverted indices (distributed filter over index tables,
  collect labels only);
* the SCAN is one ``spark.read.parquet(*surviving_files)`` with
  ``basePath`` so partition columns are reconstructed typed from paths —
  Spark never even sees non-matching files, which is the entire point of
  the metadata layer at 100 TB (no S3 LIST, no footer reads for pruned
  files);
* row-group min/max pruning and residual filtering are delegated to
  Catalyst by pushing the full DNF as a ``where`` — checked via
  ``PushedFilters`` in the plan, not re-implemented.
"""

from __future__ import annotations

import os
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kartothek_spark.core import index as ktk_index
from kartothek_spark.core.manifest import DatasetManifest
from kartothek_spark.core.predicates import (
    Predicates,
    check_predicates,
    predicates_to_column,
    validate_predicate_types,
)


def dispatch_labels(
    spark: SparkSession,
    manifest: DatasetManifest,
    predicates: Predicates | None = None,
) -> list[str]:
    """Plan-time pruning: per conjunction, intersect (a) partition-key
    evaluation over labels with (b) each indexed column's index hits; OR =
    union across conjunctions (reference ``get_indices_as_dataframe`` +
    ``_evaluate_conjunction``, core/dataset.py:393-516)."""
    check_predicates(predicates)
    if predicates is None:
        return sorted(manifest.partitions)
    validate_predicate_types(predicates, manifest.schema)

    surviving: set[str] = set()
    for conj in predicates:
        labels = set(manifest.query([list(conj)]))
        if not labels:
            continue
        # group this conjunction's literals by indexed column
        by_col: dict[str, list] = {}
        for lit in conj:
            col = lit[0]
            if col in manifest.indices and col not in manifest.partition_keys:
                by_col.setdefault(col, []).append(lit)
        # smallest-first is irrelevant here: each index query returns a
        # label set; python set-intersection replaces the reference's
        # smallest-first frame joins
        for col, lits in by_col.items():
            hits = ktk_index.query_index_labels(spark, manifest, col, lits)
            labels &= hits
            if not labels:
                break
        surviving |= labels
    return sorted(surviving)


def empty_dataframe(spark: SparkSession, manifest: DatasetManifest, columns: Sequence[str] | None = None) -> DataFrame:
    schema = manifest.schema
    if columns is not None:
        by_name = {f.name: f for f in schema.fields}
        schema = T.StructType([by_name[c] for c in columns])
    return spark.createDataFrame([], schema)


def read_dataset_files(
    spark: SparkSession,
    root: str,
    dataset_uuid: str,
    predicates: Predicates | None = None,
) -> tuple[DatasetManifest, list[str]]:
    """(manifest, pruned absolute file list) — the planner output."""
    manifest = DatasetManifest.load(root, dataset_uuid)
    labels = dispatch_labels(spark, manifest, predicates)
    return manifest, manifest.files(labels)


def read_table(
    spark: SparkSession,
    root: str,
    dataset_uuid: str,
    predicates: Predicates | None = None,
    columns: Sequence[str] | None = None,
    dispatch_by: Sequence[str] | None = None,
) -> DataFrame:
    """Materialize a dataset as ONE DataFrame (reference S8 ``read_table``).

    ``dispatch_by`` ≈ the reference's plan-level grouping (read.py:132-164):
    we realize it as a repartition on those columns so each output partition
    holds exactly one value-combination's rows — zero extra shuffle when the
    columns are partition keys and AQE coalesces.
    """
    manifest = DatasetManifest.load(root, dataset_uuid)
    labels = dispatch_labels(spark, manifest, predicates)
    if not labels:
        return empty_dataframe(spark, manifest, columns)

    files = ["file:" + os.path.abspath(p) for p in manifest.files(labels)]
    df = spark.read.option("basePath", "file:" + os.path.abspath(manifest.data_root)).parquet(*files)

    if predicates is not None:
        # full DNF pushed to Catalyst: row-group stats pruning + residual
        # filtering happen JVM-side (PushedFilters in the plan)
        df = df.where(predicates_to_column(predicates))

    # enforce manifest types (hive partition columns come back from path
    # inference, e.g. IntegerType — cast to the normalized schema) and the
    # reference's column order guarantee
    by_name = {f.name: f.dataType for f in manifest.schema.fields}
    out_cols = list(columns) if columns is not None else [f.name for f in manifest.schema.fields]
    df = df.select(*[F.col(c).cast(by_name[c]).alias(c) for c in out_cols])

    if dispatch_by:
        df = df.repartition(*[F.col(c) for c in dispatch_by])
    return df


__all__ = ["dispatch_labels", "empty_dataframe", "read_dataset_files", "read_table"]
