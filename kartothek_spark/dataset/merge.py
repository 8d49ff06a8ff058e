"""Dataset-level merge/align (reference J3-J5, deprecated upstream but part
of the surface: ``merge_datasets_as_delayed`` io/dask/delayed.py:167-263,
``align_datasets`` io_components/merge.py:25-128 in /root/reference).

Spark-first: the reference's partition-label alignment exists to get
co-partitioned local joins out of dask. Spark's join already co-partitions
by key, so ``merge_datasets`` is a pruned read of each side plus one
ordinary join — Catalyst picks broadcast/SMJ and AQE fixes skew. The
label-alignment helper is kept for manifest-level parity (it answers
"which partition files pair up", e.g. for file-level reconciliation)."""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession

from kartothek_spark.core.manifest import DatasetManifest
from kartothek_spark.core.predicates import Predicates
from kartothek_spark.dataset.read import read_table


def align_datasets(
    root: str,
    left_uuid: str,
    right_uuid: str,
    match_how: str = "exact",
) -> list[tuple[str, str]]:
    """Pair partition labels of two datasets (reference ``align_datasets``).
    ``match_how``: 'exact' | 'prefix' (either label is a string prefix of
    the other) — plus any callable(label_l, label_r) -> bool.

    'exact' and 'prefix' are near-linear (set intersection / sorted range
    scan + per-prefix lookups), so million-partition manifests align
    without an L×R driver loop; an arbitrary callable is inherently
    all-pairs and kept only for parity with the reference's hook."""
    import bisect

    left = DatasetManifest.load(root, left_uuid)
    right = DatasetManifest.load(root, right_uuid)
    pairs: list[tuple[str, str]] = []
    if match_how == "exact":
        shared = sorted(set(left.partitions) & set(right.partitions))
        pairs = [(lbl, lbl) for lbl in shared]
    elif match_how == "prefix":
        right_sorted = sorted(right.partitions)
        right_set = set(right_sorted)
        for ll in sorted(left.partitions):
            matched = set()
            # right labels extending ll: contiguous in sort order
            i = bisect.bisect_left(right_sorted, ll)
            while i < len(right_sorted) and right_sorted[i].startswith(ll):
                matched.add(right_sorted[i])
                i += 1
            # right labels that are proper prefixes of ll: O(len(ll)) probes
            for k in range(1, len(ll)):
                cand = ll[:k]
                if cand in right_set:
                    matched.add(cand)
            pairs.extend((ll, rl) for rl in sorted(matched))
    elif callable(match_how):
        for ll in sorted(left.partitions):
            for rl in sorted(right.partitions):
                if match_how(ll, rl):
                    pairs.append((ll, rl))
    else:
        raise ValueError(f"unknown match_how {match_how!r}")
    return pairs


def merge_datasets(
    spark: SparkSession,
    root: str,
    left_uuid: str,
    right_uuid: str,
    on: Sequence[str],
    how: str = "inner",
    predicates: Predicates | None = None,
) -> DataFrame:
    """Join two managed datasets on shared columns after per-side pruned
    reads. Each side is pre-pruned with the column-restricted WEAKENING of
    the DNF (sound: dropping literals only widens a conjunction); for inner
    joins the full DNF is re-applied to the joined frame for exact
    semantics. For outer joins a post-join re-filter would silently drop
    unmatched rows (their other-side columns are NULL, so any literal on
    them is false) — predicates referencing the nullable side are rejected
    instead of degenerating the join to inner semantics."""
    from kartothek_spark.core.predicates import columns_in_predicates, predicates_to_column

    left = read_table(spark, root, left_uuid, predicates=_side(predicates, root, left_uuid))
    right = read_table(spark, root, right_uuid, predicates=_side(predicates, root, right_uuid))
    out = left.join(right, list(on), how)
    if predicates is not None:
        nullable_cols: set[str] = set()
        join_keys = set(on)
        if how in ("left", "left_outer", "full", "outer", "full_outer"):
            nullable_cols |= set(right.columns) - join_keys
        if how in ("right", "right_outer", "full", "outer", "full_outer"):
            nullable_cols |= set(left.columns) - join_keys
        clash = columns_in_predicates(predicates) & nullable_cols
        if clash:
            raise ValueError(
                f"predicates on {sorted(clash)} reference the nullable side of "
                f"a {how!r} join — the filter would drop unmatched rows; "
                "filter that side before the merge or use an inner join"
            )
        out = out.where(predicates_to_column(predicates))
    return out


def merge_datasets_with_func(
    spark: SparkSession,
    root: str,
    left_uuid: str,
    right_uuid: str,
    on: Sequence[str],
    merge_func,
    output_schema,
    right_on: Sequence[str] | None = None,
    predicates: Predicates | None = None,
) -> DataFrame:
    """Custom-function merge (reference U2/J3 ``merge_dataframes`` with a
    user ``merge_func``, metapartition.py:983-1064): both sides are
    cogrouped on the join keys and ``merge_func(key_tuple, left_pdf,
    right_pdf) -> pandas.DataFrame`` runs per key group, Arrow-batched.
    ``right_on`` names the right side's key columns when they differ.
    The reference's ``type_safe=False`` schema re-derivation is
    deliberately NOT supported — ``output_schema`` is required, matching
    Spark's static-typing contract (survey §2.8 U1). One shuffle per side
    on the keys; groups stream through Python workers without ever
    materializing either dataset on one node."""
    left = read_table(spark, root, left_uuid, predicates=_side(predicates, root, left_uuid))
    right = read_table(spark, root, right_uuid, predicates=_side(predicates, root, right_uuid))
    keys = list(on)
    return (
        left.groupBy(*keys)
        .cogroup(right.groupBy(*(list(right_on) if right_on else keys)))
        .applyInPandas(merge_func, output_schema)
    )


def _side(predicates: Predicates | None, root: str, uuid: str) -> Predicates | None:
    """Column-restricted weakening of a DNF for one side: drop literals on
    columns the side lacks. If any conjunction loses ALL its literals it
    becomes always-true — then no pruning is possible (OR semantics)."""
    if predicates is None:
        return None
    cols = {f.name for f in DatasetManifest.load(root, uuid).schema.fields}
    restricted = [[lit for lit in conj if lit[0] in cols] for conj in predicates]
    if any(not conj for conj in restricted):
        return None
    return restricted


__all__ = ["align_datasets", "merge_datasets", "merge_datasets_with_func"]
