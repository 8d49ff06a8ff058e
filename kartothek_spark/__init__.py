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

from kartothek_spark.core.manifest import DatasetManifest
from kartothek_spark.core.predicates import (
    columns_in_predicates,
    check_predicates,
    predicates_to_column,
)
from kartothek_spark.dataset.read import read_table, read_dataset_files
from kartothek_spark.dataset.write import (
    commit_dataset,
    delete_dataset,
    garbage_collect_dataset,
    store_dataframe_as_dataset,
    update_dataset,
)

__version__ = "0.1.0"

__all__ = [
    "DatasetManifest",
    "check_predicates",
    "columns_in_predicates",
    "commit_dataset",
    "delete_dataset",
    "garbage_collect_dataset",
    "predicates_to_column",
    "read_dataset_files",
    "read_table",
    "store_dataframe_as_dataset",
    "update_dataset",
]
