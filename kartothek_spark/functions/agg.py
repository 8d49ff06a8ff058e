"""Aggregation helpers (reference A4/A6).

* ``aggregate_to_lists`` — ``utils/pandas.py:255-331`` in /root/reference:
  groupby + collect-to-list. Spark: ``collect_list`` with ``sort_array``
  for a deterministic order (the reference's sorted-scan implementation
  yields encounter order of the pre-sorted frame; an explicit sort is the
  distributed-safe equivalent).
* ``hash_dataset`` — ``io/dask/dataframe.py:577-649``: per-group content
  hash for dataset comparison. Canonical engine hash: 40-bit residues of
  the 60-bit md5 row hash, summed per group. Order-independent, map-side
  combinable, and overflow-safe: a sum of n 40-bit values fits in int64
  for n < 2^23 rows per group; group sizes beyond that should add a
  sub-grouping key (int64 wrap-around differs between engines — DuckDB
  raises where the JVM wraps — so staying in-range is part of the
  contract).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kartothek_spark.functions.hashing import h60

HASH_RESIDUE_BITS = 40


def aggregate_to_lists(
    df: DataFrame, by: Sequence[str], col: str, out_col: str | None = None
) -> DataFrame:
    """One row per group with ``col`` collected into a SORTED array —
    deterministic across partitionings (``collect_list`` order is not)."""
    out_col = out_col or col
    return df.groupBy(*by).agg(F.sort_array(F.collect_list(col)).alias(out_col))


def row_content_hash(cols: Sequence[str | Column]) -> Column:
    """Canonical 40-bit row hash over '|'-joined string renderings."""
    joined = F.concat_ws("|", *[F.col(c) if isinstance(c, str) else c for c in cols])
    return h60(joined) % F.lit(1 << HASH_RESIDUE_BITS)


def hash_dataset(df: DataFrame, group_cols: Sequence[str], content_cols: Sequence[str]) -> DataFrame:
    """(group_cols..., content_hash, n) — order-independent content hash
    per group; map-side combined, one shuffle."""
    return df.groupBy(*group_cols).agg(
        F.sum(row_content_hash(content_cols)).alias("content_hash"),
        F.count("*").alias("n"),
    )


__all__ = ["aggregate_to_lists", "hash_dataset", "row_content_hash"]
