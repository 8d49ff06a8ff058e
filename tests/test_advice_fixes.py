"""Regression tests for driver-side predicate coercion, URI-encoded path
joins, outer-join predicate semantics, and CLI literal coercion."""

import datetime

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from kartothek_spark.dataset.merge import merge_datasets
from kartothek_spark.dataset.read import read_table
from kartothek_spark.dataset.write import store_dataframe_as_dataset


@pytest.fixture()
def dated_df(spark):
    rows = [
        Row(d=datetime.date(2024, 1, day), L=l, V=float(day * 10 + l))
        for day in (1, 2, 3)
        for l in (1, 2)
    ]
    return spark.createDataFrame(rows)


def test_date_string_literal_on_date_partition(spark, tmp_root, dated_df):
    """ISO-string literals against a date partition key must prune AND
    match — not silently return empty (str vs datetime.date driver-side)."""
    store_dataframe_as_dataset(spark, dated_df, tmp_root, "ds", partition_on=["d"])
    got = read_table(spark, tmp_root, "ds", predicates=[[("d", "==", "2024-01-02")]])
    assert sorted((r.d, r.L) for r in got.collect()) == [
        (datetime.date(2024, 1, 2), 1),
        (datetime.date(2024, 1, 2), 2),
    ]
    # range op on a string literal must not raise TypeError driver-side
    got = read_table(spark, tmp_root, "ds", predicates=[[("d", ">", "2024-01-02")]])
    assert {r.d for r in got.collect()} == {datetime.date(2024, 1, 3)}
    # 'in' lists are coerced element-wise
    got = read_table(
        spark, tmp_root, "ds", predicates=[[("d", "in", ["2024-01-01", "2024-01-03"])]]
    )
    assert {r.d for r in got.collect()} == {
        datetime.date(2024, 1, 1),
        datetime.date(2024, 1, 3),
    }


def test_timestamp_string_literal_on_timestamp_partition(spark, tmp_root):
    rows = [
        Row(ts=datetime.datetime(2024, 1, 1, h, 30), L=l)
        for h in (0, 1)
        for l in (1, 2)
    ]
    df = spark.createDataFrame(rows)
    store_dataframe_as_dataset(spark, df, tmp_root, "ds", partition_on=["ts"])
    got = read_table(
        spark, tmp_root, "ds", predicates=[[("ts", "==", "2024-01-01 01:30:00")]]
    )
    assert sorted(r.L for r in got.collect()) == [1, 2]


def test_int_literal_against_double_column(spark, tmp_root, dated_df):
    """int literals widen to float against double columns (CLI parse path)."""
    store_dataframe_as_dataset(spark, dated_df, tmp_root, "ds", partition_on=["d"])
    got = read_table(spark, tmp_root, "ds", predicates=[[("V", ">", 25)]])
    want = read_table(spark, tmp_root, "ds", predicates=[[("V", ">", 25.0)]])
    assert sorted(r.V for r in got.collect()) == sorted(r.V for r in want.collect())
    assert got.count() > 0


def test_condition_dsl_int_literal_on_double(spark, tmp_root, dated_df):
    from kartothek_spark.core.conditions import parse_conjunction

    store_dataframe_as_dataset(spark, dated_df, tmp_root, "ds", partition_on=["d"])
    preds = parse_conjunction("V > 25").predicate
    got = read_table(spark, tmp_root, "ds", predicates=preds)
    assert got.count() == dated_df.where(F.col("V") > 25).count()


def test_index_complete_with_uri_special_partition_values(spark, tmp_root):
    """Secondary index build joins input_file_name() against manifest paths;
    partition values with ':' / ' ' / '%' must not drop rows from the index."""
    rows = [
        Row(P=p, L=l, V=float(l))
        for p in ("2024-01-01 10:30:00", "a b", "50%off", "plain")
        for l in (1, 2, 3)
    ]
    df = spark.createDataFrame(rows)
    store_dataframe_as_dataset(
        spark, df, tmp_root, "ds", partition_on=["P"], secondary_indices=["L"]
    )
    # every partition must appear in the index for L=2 — an under-inclusive
    # index silently drops files at read time
    got = read_table(spark, tmp_root, "ds", predicates=[[("L", "==", 2)]])
    assert sorted(r.P for r in got.collect()) == sorted(
        ["2024-01-01 10:30:00", "a b", "50%off", "plain"]
    )


def test_cube_lineage_with_uri_special_partition_values(spark, tmp_root):
    """Last-wins dedup lineage joins _metadata.file_path against manifest
    paths — URI-encoded partition values must not corrupt the ordinals."""
    from kartothek_spark.core.cube import Cube
    from kartothek_spark.cube.build import append_to_cube, build_cube
    from kartothek_spark.cube.query import query_cube

    seed = spark.createDataFrame(
        [Row(k=i, part="a b:c", x=i * 10) for i in range(1, 4)]
    )
    cube = Cube(
        dimension_columns=("k",), partition_columns=("part",), uuid_prefix="sp"
    )
    build_cube(spark, {"seed": seed}, cube, tmp_root)
    # overwrite k=2 via append: last write must win
    append_to_cube(
        spark,
        {"seed": spark.createDataFrame([Row(k=2, part="a b:c", x=999)])},
        cube,
        tmp_root,
    )
    got = {r.k: r.x for r in query_cube(spark, cube, tmp_root).collect()}
    assert got == {1: 10, 2: 999, 3: 30}


def test_merge_left_join_rejects_predicates_on_nullable_side(spark, tmp_root):
    facts = spark.createDataFrame([Row(L=l, V=float(l)) for l in (1, 2, 3)])
    dims = spark.createDataFrame([Row(L=1, name="dim1")])
    store_dataframe_as_dataset(spark, facts, tmp_root, "facts")
    store_dataframe_as_dataset(spark, dims, tmp_root, "dims")
    with pytest.raises(ValueError, match="nullable side"):
        merge_datasets(
            spark, tmp_root, "facts", "dims", on=["L"], how="left",
            predicates=[[("name", "==", "dim1")]],
        )
    # predicates on the preserved side are fine and keep unmatched rows
    out = merge_datasets(
        spark, tmp_root, "facts", "dims", on=["L"], how="left",
        predicates=[[("V", ">=", 2.0)]],
    )
    rows = sorted((r.L, r.name) for r in out.collect())
    assert rows == [(2, None), (3, None)]
