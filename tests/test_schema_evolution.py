"""Opt-in schema evolution on update_dataset (beyond the reference — it
rejects any column-set drift, common_metadata.py:586-671; semantics follow
Delta mergeSchema with stricter typing): add columns, omit non-key
columns, never cross type classes. Pre-evolution files read their missing
columns as NULL via the explicit-schema scan (no footer merging)."""

import os

import pytest
from pyspark.sql import functions as F

from kartothek_spark.core.manifest import DatasetManifest
from kartothek_spark.core.schema import SchemaIncompatible, evolve_schema
from kartothek_spark.dataset.read import read_table
from kartothek_spark.dataset.write import (
    build_dataset_indices,
    store_dataframe_as_dataset,
    update_dataset,
)

from tests.conftest import SF_DIR


def _orders(spark):
    return spark.read.parquet(os.path.join(SF_DIR, "orders.parquet"))


def test_evolve_schema_rules(spark):
    from pyspark.sql import types as T

    old = T.StructType([T.StructField("a", T.IntegerType()), T.StructField("b", T.StringType())])
    new = T.StructType([T.StructField("a", T.LongType()), T.StructField("c", T.DoubleType())])
    got = evolve_schema(old, new)
    assert [(f.name, f.dataType.simpleString()) for f in got.fields] == [
        ("a", "bigint"),  # widened by normalization
        ("b", "string"),  # kept though omitted from new
        ("c", "double"),  # appended
    ]
    bad = T.StructType([T.StructField("b", T.LongType())])
    with pytest.raises(SchemaIncompatible, match="cannot evolve"):
        evolve_schema(old, bad)


def test_update_rejects_drift_without_flag(spark, tmp_root):
    orders = _orders(spark)
    store_dataframe_as_dataset(spark, orders, tmp_root, "o", partition_on=["o_orderstatus"])
    evolved = orders.withColumn("o_flag", F.lit(1).cast("long"))
    with pytest.raises(SchemaIncompatible):
        update_dataset(spark, evolved, tmp_root, "o")


def test_add_column_old_files_read_null(spark, tmp_root):
    orders = _orders(spark)
    store_dataframe_as_dataset(
        spark, orders.where("o_orderkey % 2 = 0"), tmp_root, "o",
        partition_on=["o_orderstatus"],
    )
    evolved = orders.where("o_orderkey % 2 = 1").withColumn(
        "o_prio_class", F.substring("o_orderpriority", 1, 1)
    )
    update_dataset(spark, evolved, tmp_root, "o", schema_evolution=True)
    m = DatasetManifest.load(tmp_root, "o")
    assert m.schema.fields[-1].name == "o_prio_class"
    got = read_table(spark, tmp_root, "o")
    assert got.count() == orders.count()
    assert got.where("o_prio_class IS NULL").count() == orders.where("o_orderkey % 2 = 0").count()
    assert (
        got.where("o_prio_class = '1'").count()
        == orders.where("o_orderkey % 2 = 1 AND o_orderpriority LIKE '1%'").count()
    )
    # predicates on the evolved column plan + push down fine
    sel = read_table(spark, tmp_root, "o", predicates=[[("o_prio_class", "==", "5")]])
    assert sel.count() == orders.where("o_orderkey % 2 = 1 AND o_orderpriority LIKE '5%'").count()


def test_omitted_column_reads_null_for_new_files(spark, tmp_root):
    orders = _orders(spark)
    store_dataframe_as_dataset(
        spark, orders.where("o_orderkey % 2 = 0"), tmp_root, "o",
        partition_on=["o_orderstatus"],
    )
    slim = orders.where("o_orderkey % 2 = 1").drop("o_orderpriority")
    update_dataset(spark, slim, tmp_root, "o", schema_evolution=True)
    got = read_table(spark, tmp_root, "o")
    assert "o_orderpriority" in got.columns
    assert (
        got.where("o_orderpriority IS NULL").count()
        == orders.where("o_orderkey % 2 = 1").count()
    )


def test_cannot_drop_partition_key(spark, tmp_root):
    orders = _orders(spark)
    store_dataframe_as_dataset(spark, orders, tmp_root, "o", partition_on=["o_orderstatus"])
    with pytest.raises(SchemaIncompatible, match="partition/bucket keys"):
        update_dataset(
            spark, orders.drop("o_orderstatus"), tmp_root, "o", schema_evolution=True
        )


def test_index_build_after_evolution(spark, tmp_root):
    orders = _orders(spark)
    store_dataframe_as_dataset(
        spark, orders.where("o_orderkey % 2 = 0"), tmp_root, "o",
        partition_on=["o_orderstatus"],
    )
    evolved = orders.where("o_orderkey % 2 = 1").withColumn(
        "o_prio_class", F.substring("o_orderpriority", 1, 1)
    )
    update_dataset(spark, evolved, tmp_root, "o", schema_evolution=True)
    # post-hoc index over the evolved column: pre-evolution files contribute
    # nothing (NULLs dropped), pruned read equals the filter oracle
    build_dataset_indices(spark, tmp_root, "o", ["o_prio_class"])
    got = read_table(spark, tmp_root, "o", predicates=[[("o_prio_class", "==", "3")]])
    assert got.count() == orders.where("o_orderkey % 2 = 1 AND o_orderpriority LIKE '3%'").count()
