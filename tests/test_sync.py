"""Incremental derived-dataset sync (CDC consumer of the snapshot
history): appends flow through transform incrementally; source partition
drops trigger a correct full refresh; the cursor makes re-runs no-ops."""

import os

import pytest
from pyspark.sql import functions as F

from kartothek_spark.dataset.read import read_table
from kartothek_spark.dataset.sync import sync_derived_dataset
from kartothek_spark.dataset.write import store_dataframe_as_dataset, update_dataset

from tests.conftest import SF_DIR


def _customer(spark):
    return spark.read.parquet(os.path.join(SF_DIR, "customer.parquet"))


def _transform(df):
    return df.where(F.col("c_acctbal") > 0).select(
        "c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal"
    )


def _expected(spark, where):
    return _transform(_customer(spark).where(where))


def test_sync_lifecycle(spark, tmp_root):
    cust = _customer(spark)
    store_dataframe_as_dataset(
        spark, cust.where("c_nationkey < 15"), tmp_root, "src",
        partition_on=["c_nationkey"], keep_history=True,
    )
    r1 = sync_derived_dataset(spark, tmp_root, "src", tmp_root, "dst", _transform)
    assert r1["mode"] == "initial"
    got = read_table(spark, tmp_root, "dst")
    assert got.count() == _expected(spark, "c_nationkey < 15").count()

    # append → incremental: only new rows processed
    update_dataset(spark, cust.where("c_nationkey >= 15"), tmp_root, "src")
    r2 = sync_derived_dataset(spark, tmp_root, "src", tmp_root, "dst", _transform)
    assert r2["mode"] == "incremental"
    assert r2["rows_processed"] == _expected(spark, "c_nationkey >= 15").count()
    got = read_table(spark, tmp_root, "dst")
    exp = _expected(spark, "TRUE")
    assert got.count() == exp.count()
    assert (
        got.agg(F.sum("c_custkey")).first()[0] == exp.agg(F.sum("c_custkey")).first()[0]
    )

    # re-run with no source change → noop
    assert sync_derived_dataset(spark, tmp_root, "src", tmp_root, "dst", _transform)["mode"] == "noop"

    # source partition drop → refresh, content still exact
    update_dataset(spark, None, tmp_root, "src", delete_scope=[{"c_nationkey": 3}])
    r4 = sync_derived_dataset(spark, tmp_root, "src", tmp_root, "dst", _transform)
    assert r4["mode"] == "refresh"
    got = read_table(spark, tmp_root, "dst")
    exp = _expected(spark, "c_nationkey <> 3")
    assert got.count() == exp.count()
    assert (
        got.agg(F.sum("c_custkey")).first()[0] == exp.agg(F.sum("c_custkey")).first()[0]
    )


def test_sync_guards(spark, tmp_root):
    cust = _customer(spark)
    # no history on the source → refuse
    store_dataframe_as_dataset(spark, cust, tmp_root, "nohist")
    with pytest.raises(ValueError, match="keep_history"):
        sync_derived_dataset(spark, tmp_root, "nohist", tmp_root, "d1")
    # an unrelated existing dataset is not a silent sync target
    store_dataframe_as_dataset(
        spark, cust, tmp_root, "src2", keep_history=True
    )
    store_dataframe_as_dataset(spark, cust, tmp_root, "not_a_target")
    with pytest.raises(ValueError, match="not a sync target"):
        sync_derived_dataset(spark, tmp_root, "src2", tmp_root, "not_a_target")
