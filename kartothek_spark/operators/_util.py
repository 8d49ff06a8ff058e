"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def scale_out(df: DataFrame, factor: int = 1) -> DataFrame:
    """Ensure enough input partitions for compute-heavy narrow stages.

    A small file set (e.g. one parquet file under
    ``spark.sql.files.maxPartitionBytes``) yields one input split, so a
    per-row-expensive projection (hashing every shingle, folding every
    embedding) runs on ONE core regardless of cluster size. Repartitioning
    the narrow input costs a shuffle of the raw rows — trivial next to the
    compute — and is a no-op at real scale, where the input already has at
    least ``defaultParallelism`` splits.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism * factor
    if df.rdd.getNumPartitions() < max(2, target // 2):
        return df.repartition(target)
    return df
