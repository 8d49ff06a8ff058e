"""Cube build / extend / append / remove lifecycle.

Parity targets in /root/reference: ``build_cube``/``extend_cube``
(io/eager_cube.py:73-321), ``prepare_data_for_ktk``
(io_components/cube/write.py:292-382), ``check_user_df`` (:163-265),
``append_to_cube`` (io/eager_cube.py:697-787), ``remove_partitions``
(io_components/cube/remove.py:12-91), ``check_datasets``
(api/consistency.py:267-331).
"""

from __future__ import annotations

from typing import Any, Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kartothek_spark.core.cube import Cube
from kartothek_spark.core.manifest import DatasetManifest, list_datasets
from kartothek_spark.dataset.write import (
    delete_dataset,
    garbage_collect_dataset,
    store_dataframe_as_dataset,
    update_dataset,
)


def get_cube_payload(df_columns: Sequence[str], cube: Cube) -> set[str]:
    """Payload = columns − dimensions − partition columns (reference
    ``get_cube_payload`` api/consistency.py:333-366)."""
    return set(df_columns) - set(cube.dimension_columns) - set(cube.partition_columns)


def _check_user_df(name: str, df: DataFrame, cube: Cube, existing_payload: Mapping[str, set[str]]) -> None:
    """Driver-side structural checks (schema only — no jobs)."""
    cols = set(df.columns)
    missing_part = set(cube.partition_columns) - cols
    if missing_part:
        raise ValueError(f"dataset {name!r} lacks partition columns {sorted(missing_part)}")
    if name == cube.seed_dataset:
        missing_dim = set(cube.dimension_columns) - cols
        if missing_dim:
            raise ValueError(f"seed dataset lacks dimension columns {sorted(missing_dim)}")
    if not (cols & set(cube.dimension_columns)):
        raise ValueError(f"dataset {name!r} shares no dimension columns with the cube")
    payload = get_cube_payload(df.columns, cube)
    for other, other_payload in existing_payload.items():
        if other == name:
            continue
        overlap = payload & other_payload
        if overlap:
            raise ValueError(
                f"payload overlap between {name!r} and {other!r}: {sorted(overlap)}"
            )


def _check_data(name: str, df: DataFrame, cube: Cube) -> None:
    """Fused distributed pre-write checks — ONE job instead of two scans:
    duplicate (partition+dimension)-key rows (reference ``_check_duplicates``
    cube/write.py:268-289) and nulls in dimension/partition/index columns
    (cube/write.py:133-160). groupBy the cell keys with map-side combine,
    fold null flags alongside, then a single global max."""
    cols = set(df.columns)
    keys = [c for c in (*cube.partition_columns, *cube.dimension_columns) if c in cols]
    check_cols = sorted(
        (set(cube.dimension_columns) | set(cube.partition_columns) | set(cube.index_columns)) & cols
    )
    extra = [c for c in check_cols if c not in keys]
    grouped = df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("__cnt"),
        *[F.max(F.col(c).isNull()).alias(f"__null_{c}") for c in extra],
    )
    row = grouped.agg(
        F.max("__cnt").alias("max_cnt"),
        *[F.max(F.col(f"__null_{c}")).alias(f"null_{c}") for c in extra],
        *[F.max(F.col(k).isNull()).alias(f"null_{k}") for k in keys if k in check_cols],
    ).first()
    if row is None:
        return
    if (row["max_cnt"] or 0) > 1:
        raise ValueError(f"dataset {name!r} has duplicate rows for keys {keys}")
    for c in check_cols:
        if row[f"null_{c}"]:
            raise ValueError(f"dataset {name!r} has nulls in dimension/partition/index columns")


def _indices_for(name: str, df: DataFrame, cube: Cube) -> list[str]:
    cols = set(df.columns)
    out = set(cube.index_columns) & cols
    if name == cube.seed_dataset:
        out |= set(cube.dimension_columns) - set(cube.suppress_index_on)
    return sorted(out & cols)


def build_cube(
    spark: SparkSession,
    data: Mapping[str, DataFrame],
    cube: Cube,
    root: str,
    metadata: Mapping[str, Any] | None = None,
    overwrite: bool = False,
) -> dict[str, DatasetManifest]:
    """Write all cube datasets; consistency-check at the end.

    Per-dataset pipelines (fused check job → write → index build) run in
    parallel threads — Spark schedules the independent jobs concurrently,
    so a 10-dataset cube build keeps the cluster saturated instead of
    serializing ten write barriers. Inputs are persisted across their
    check + write + index jobs (an enrichment input is often a join — we
    evaluate it once, not once per job)."""
    if cube.seed_dataset not in data:
        raise ValueError(f"seed dataset {cube.seed_dataset!r} missing from data")
    payloads = {n: get_cube_payload(df.columns, cube) for n, df in data.items()}
    for name, df in data.items():
        _check_user_df(name, df, cube, payloads)

    out: dict[str, DatasetManifest] = {}
    written: list[str] = []
    lock = __import__("threading").Lock()

    def _one(name: str) -> None:
        df = data[name].persist()
        try:
            _check_data(name, df, cube)
            m = store_dataframe_as_dataset(
                spark,
                df,
                root,
                cube.ktk_dataset_uuid(name),
                partition_on=list(cube.partition_columns),
                sort_partitions_by=[c for c in cube.dimension_columns if c in df.columns],
                secondary_indices=_indices_for(name, df, cube),
                metadata=dict(metadata or {}) | {"ktk_cube": _cube_spec_dict(cube)},
                overwrite=overwrite,
            )
            with lock:
                out[name] = m
                written.append(name)
        finally:
            df.unpersist()

    from concurrent.futures import ThreadPoolExecutor

    try:
        with ThreadPoolExecutor(max_workers=min(4, len(data))) as pool:
            futures = {pool.submit(_one, name): name for name in data}
            for fut in futures:
                fut.result()
        check_datasets(cube, root)
    except BaseException:
        # rollback freshly written datasets (reference cube/write.py:531-560)
        for name in written:
            if overwrite is False:
                delete_dataset(root, cube.ktk_dataset_uuid(name))
        raise
    return out


def extend_cube(
    spark: SparkSession,
    data: Mapping[str, DataFrame],
    cube: Cube,
    root: str,
    metadata: Mapping[str, Any] | None = None,
) -> dict[str, DatasetManifest]:
    """Add new enrichment datasets to an existing cube."""
    if cube.seed_dataset in data:
        raise ValueError("cannot extend with the seed dataset; use build_cube")
    existing = discover_datasets(cube, root)
    payloads = {
        n: get_cube_payload([f.name for f in m.schema.fields], cube) for n, m in existing.items()
    }
    payloads |= {n: get_cube_payload(df.columns, cube) for n, df in data.items()}
    out = {}
    for name, df in data.items():
        if name in existing:
            raise ValueError(f"dataset {name!r} already part of cube")
        _check_user_df(name, df, cube, payloads)
        _check_data(name, df, cube)
        out[name] = store_dataframe_as_dataset(
            spark,
            df,
            root,
            cube.ktk_dataset_uuid(name),
            partition_on=list(cube.partition_columns),
            sort_partitions_by=[c for c in cube.dimension_columns if c in df.columns],
            secondary_indices=_indices_for(name, df, cube),
            metadata=dict(metadata or {}) | {"ktk_cube": _cube_spec_dict(cube)},
        )
    check_datasets(cube, root)
    return out


def append_to_cube(
    spark: SparkSession,
    data: Mapping[str, DataFrame],
    cube: Cube,
    root: str,
    remove_conditions=None,
) -> dict[str, DatasetManifest]:
    """Append partitions; optionally remove partitions matching conditions
    on partition columns first — one commit per dataset (reference
    ``append_to_cube`` / ``update_cube_from_bag``)."""
    out = {}
    for name, df in data.items():
        delete_scope = None
        if remove_conditions is not None:
            manifest = DatasetManifest.load(root, cube.ktk_dataset_uuid(name))
            labels = manifest.query(remove_conditions)
            delete_scope = [manifest.partition_values(lbl) for lbl in labels]
        out[name] = update_dataset(
            spark,
            df,
            root,
            cube.ktk_dataset_uuid(name),
            delete_scope=delete_scope,
            sort_partitions_by=[c for c in cube.dimension_columns if c in df.columns],
        )
    return out


def remove_partitions(spark: SparkSession, cube: Cube, root: str, conditions, datasets: Sequence[str] | None = None) -> None:
    """Drop partitions matching conditions on partition columns ONLY
    (reference ``remove_partitions`` io_components/cube/remove.py:12-91)."""
    from kartothek_spark.core.predicates import columns_in_predicates

    bad = columns_in_predicates(conditions) - set(cube.partition_columns)
    if bad:
        raise ValueError(f"remove conditions may only use partition columns; got {sorted(bad)}")
    names = datasets if datasets is not None else list(discover_datasets(cube, root))
    for name in names:
        manifest = DatasetManifest.load(root, cube.ktk_dataset_uuid(name))
        labels = manifest.query(conditions)
        scopes = [manifest.partition_values(lbl) for lbl in labels]
        if scopes:
            update_dataset(spark, None, root, cube.ktk_dataset_uuid(name), delete_scope=scopes)


def copy_cube(
    cube: Cube, root: str, target_root: str, spark: SparkSession | None = None
) -> dict[str, DatasetManifest]:
    """Copy every member dataset to another store (reference ``copy_cube``
    io/eager_cube.py:461-558) — manifests rewritten by copy_dataset. With a
    SparkSession the file copy runs as one distributed job per dataset."""
    from kartothek_spark.dataset.write import copy_dataset

    return {
        name: copy_dataset(root, manifest.dataset_uuid, target_root, spark=spark)
        for name, manifest in discover_datasets(cube, root).items()
    }


def delete_cube(cube: Cube, root: str) -> None:
    for name in list(discover_datasets(cube, root)):
        delete_dataset(root, cube.ktk_dataset_uuid(name))


def cleanup_cube(cube: Cube, root: str) -> dict[str, list[str]]:
    """GC every cube dataset (reference ``cleanup_cube``)."""
    return {
        name: garbage_collect_dataset(root, cube.ktk_dataset_uuid(name))
        for name in discover_datasets(cube, root)
    }


def collect_cube_stats(spark: SparkSession, cube: Cube, root: str) -> dict[str, dict[str, int]]:
    """Per-dataset {files, row_groups, rows, size} (reference
    ``collect_stats`` io_components/cube/stats.py:44-110) — from parquet
    FOOTERS only (distributed), never a data scan."""
    from kartothek_spark.dataset.metadata import collect_stats

    return {
        name: collect_stats(spark, root, manifest.dataset_uuid)
        for name, manifest in discover_datasets(cube, root).items()
    }


def discover_datasets(cube: Cube, root: str) -> dict[str, DatasetManifest]:
    """Find cube member datasets by manifest prefix (reference
    ``discover_datasets`` api/discover.py:87-141)."""
    prefix = cube.ktk_dataset_uuid("")
    out = {}
    for uuid in list_datasets(root, prefix=prefix):
        out[cube.dataset_id_of(uuid)] = DatasetManifest.load(root, uuid)
    return out


def check_datasets(cube: Cube, root: str) -> dict[str, DatasetManifest]:
    """Cube invariants (reference ``check_datasets`` api/consistency.py:267-331):
    seed exists; every member is partitioned by the cube partition columns;
    shared-dimension presence; required indices exist."""
    datasets = discover_datasets(cube, root)
    if cube.seed_dataset not in datasets:
        raise ValueError(f"seed dataset {cube.seed_dataset!r} not found in cube")
    for name, m in datasets.items():
        if tuple(m.partition_keys) != tuple(cube.partition_columns):
            raise ValueError(
                f"dataset {name!r} partitioned by {m.partition_keys}, expected {list(cube.partition_columns)}"
            )
        cols = {f.name for f in m.schema.fields}
        if name == cube.seed_dataset:
            missing = set(cube.dimension_columns) - cols
            if missing:
                raise ValueError(f"seed lacks dimensions {sorted(missing)}")
            for dim in set(cube.dimension_columns) - set(cube.suppress_index_on):
                if dim not in m.indices:
                    raise ValueError(f"seed missing dimension index on {dim!r}")
        for icol in cube.index_columns & cols:
            if icol not in m.indices:
                raise ValueError(f"dataset {name!r} missing index on {icol!r}")
    return datasets


def _cube_spec_dict(cube: Cube) -> dict[str, Any]:
    return {
        "dimension_columns": list(cube.dimension_columns),
        "partition_columns": list(cube.partition_columns),
        "uuid_prefix": cube.uuid_prefix,
        "seed_dataset": cube.seed_dataset,
        "index_columns": sorted(cube.index_columns),
        "suppress_index_on": sorted(cube.suppress_index_on),
    }


def discover_cube(root: str, uuid_prefix: str) -> Cube:
    """Reconstruct a Cube spec from stored metadata (reference
    ``discover_cube`` api/discover.py:192-313)."""
    from kartothek_spark.core.cube import KTK_CUBE_UUID_SEPARATOR

    for uuid in list_datasets(root, prefix=uuid_prefix + KTK_CUBE_UUID_SEPARATOR):
        m = DatasetManifest.load(root, uuid)
        spec = m.metadata.get("ktk_cube")
        if spec:
            return Cube(
                dimension_columns=tuple(spec["dimension_columns"]),
                partition_columns=tuple(spec["partition_columns"]),
                uuid_prefix=spec["uuid_prefix"],
                seed_dataset=spec["seed_dataset"],
                index_columns=frozenset(spec["index_columns"]),
                suppress_index_on=frozenset(spec["suppress_index_on"]),
            )
    raise ValueError(f"no cube found under prefix {uuid_prefix!r}")
