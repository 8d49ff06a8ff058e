"""kartothek_spark — a PySpark-native dataset-management + query-planning engine.

A from-scratch re-expression of the capabilities of
JDASoftwareGroup/kartothek (reference surveyed in SURVEY.md) on top of
the Spark DataFrame API:

* datasets = immutable Parquet files + one JSON manifest (atomic commit)
* query planning = manifest + inverted-index file pruning before any
  ``spark.read``
* DNF predicate pushdown (partition keys / parquet row groups / residual
  — the latter two delegated to Catalyst)
* mutations = append/replace/delete partitions, GC, index rebuild
* cube = multi-dataset OLAP join planner with last-wins dedup
* LLM-pipeline operators: dedup, similarity search, text analysis,
  multimodal column plumbing
"""

from kartothek_spark.core.manifest import CommitConflict, DatasetManifest
from kartothek_spark.core.predicates import (
    columns_in_predicates,
    check_predicates,
    predicates_to_column,
)
from kartothek_spark.dataset.dml import delete_rows, upsert_dataset
from kartothek_spark.dataset.read import (
    diff_versions,
    read_changes,
    read_dataset_files,
    read_table,
)
from kartothek_spark.dataset.sync import sync_aggregate_dataset, sync_derived_dataset
from kartothek_spark.dataset.write import (
    attach_dataset,
    commit_dataset,
    compact_dataset,
    convert_dataset,
    copy_dataset,
    delete_dataset,
    expire_partitions,
    expire_snapshots,
    garbage_collect_dataset,
    store_dataframe_as_dataset,
    update_dataset,
)

__version__ = "0.2.0"


def create_temp_views(spark, root: str, prefix: str = "", view_prefix: str = "") -> list[str]:
    """Register every dataset under ``root`` as a Spark temp view so plain
    ``spark.sql`` works over managed datasets. The views are full
    ``read_table`` plans: Catalyst still gets hive partition pruning and
    parquet pushdown from SQL WHERE clauses; manifest index/stats pruning
    needs the ``read_table(predicates=...)`` form (views resolve before
    the planner can see the filters). Returns the created view names."""
    from kartothek_spark.core.manifest import list_datasets

    out = []
    for uuid in list_datasets(root, prefix):
        name = view_prefix + uuid
        read_table(spark, root, uuid).createOrReplaceTempView(name)
        out.append(name)
    return out


__all__ = [
    "CommitConflict",
    "DatasetManifest",
    "attach_dataset",
    "check_predicates",
    "columns_in_predicates",
    "commit_dataset",
    "compact_dataset",
    "convert_dataset",
    "copy_dataset",
    "create_temp_views",
    "delete_dataset",
    "delete_rows",
    "diff_versions",
    "expire_partitions",
    "expire_snapshots",
    "garbage_collect_dataset",
    "predicates_to_column",
    "read_changes",
    "read_dataset_files",
    "read_table",
    "store_dataframe_as_dataset",
    "sync_aggregate_dataset",
    "sync_derived_dataset",
    "update_dataset",
    "upsert_dataset",
]
