"""Row-level DML (DELETE by predicate, MERGE-style upsert) as
partition-granular copy-on-write over the atomic manifest swap."""

import os

import pytest
from pyspark.sql import functions as F

from kartothek_spark.core.manifest import DatasetManifest
from kartothek_spark.dataset.dml import delete_rows, upsert_dataset
from kartothek_spark.dataset.read import read_table
from kartothek_spark.dataset.write import store_dataframe_as_dataset

from tests.conftest import SF_DIR


def _orders(spark):
    return spark.read.parquet(os.path.join(SF_DIR, "orders.parquet"))


def test_delete_rows_rewrites_only_affected_partitions(spark, tmp_root):
    orders = _orders(spark)
    store_dataframe_as_dataset(spark, orders, tmp_root, "o", partition_on=["o_orderstatus"])
    before = DatasetManifest.load(tmp_root, "o")
    untouched = {
        lbl: e["file"] for lbl, e in before.partitions.items() if "o_orderstatus=P" in lbl
    }
    delete_rows(
        spark, tmp_root, "o",
        [[("o_orderstatus", "==", "F"), ("o_totalprice", ">", 150000.0)]],
    )
    after = DatasetManifest.load(tmp_root, "o")
    # P partitions were never rewritten — same physical files
    for lbl, f in untouched.items():
        assert after.partitions[lbl]["file"] == f
    got = read_table(spark, tmp_root, "o")
    exp = orders.where("NOT (o_orderstatus = 'F' AND o_totalprice > 150000.0)")
    assert got.count() == exp.count()
    assert got.agg(F.sum("o_orderkey")).first()[0] == exp.agg(F.sum("o_orderkey")).first()[0]


def test_delete_rows_no_match_is_noop(spark, tmp_root):
    orders = _orders(spark)
    store_dataframe_as_dataset(spark, orders, tmp_root, "o", partition_on=["o_orderstatus"])
    v_before = DatasetManifest.load(tmp_root, "o").version
    delete_rows(spark, tmp_root, "o", [[("o_orderstatus", "==", "ZZ")]])
    m = DatasetManifest.load(tmp_root, "o")
    assert m.version == v_before  # planner pruned to zero files, no commit
    assert read_table(spark, tmp_root, "o").count() == orders.count()


def test_upsert_updates_and_inserts(spark, tmp_root):
    orders = _orders(spark)
    store_dataframe_as_dataset(spark, orders, tmp_root, "o", partition_on=["o_orderstatus"])
    # update: re-price every F order below key 500; insert: brand-new keys
    updates = (
        orders.where("o_orderstatus = 'F' AND o_orderkey < 500")
        .withColumn("o_totalprice", F.lit(1.0))
    )
    inserts = orders.where("o_orderstatus = 'F'").limit(0).unionByName(
        orders.where("o_orderkey = 7").withColumn("o_orderkey", F.lit(9_999_991).cast("long"))
    )
    upsert_dataset(spark, updates.unionByName(inserts), tmp_root, "o",
                   merge_keys=["o_orderkey"])
    got = read_table(spark, tmp_root, "o")
    assert got.count() == orders.count() + 1
    assert got.where("o_orderkey = 9999991").count() == 1
    # updated rows carry the new price; untouched rows keep theirs
    assert (
        got.where("o_orderstatus = 'F' AND o_orderkey < 500 AND o_totalprice = 1.0").count()
        == orders.where("o_orderstatus = 'F' AND o_orderkey < 500").count()
    )
    assert (
        got.agg(F.sum(F.floor("o_totalprice"))).first()[0]
        != orders.agg(F.sum(F.floor("o_totalprice"))).first()[0]
    )
    # partitions not named in the upsert frame stay physically untouched
    m = DatasetManifest.load(tmp_root, "o")
    assert any("o_orderstatus=P" in lbl for lbl in m.partitions)


def test_upsert_guards(spark, tmp_root):
    orders = _orders(spark)
    store_dataframe_as_dataset(spark, orders, tmp_root, "o", partition_on=["o_orderstatus"])
    with pytest.raises(ValueError, match="non-empty"):
        upsert_dataset(spark, orders, tmp_root, "o", merge_keys=[])
    with pytest.raises(ValueError, match="missing columns"):
        upsert_dataset(spark, orders.drop("o_orderstatus"), tmp_root, "o",
                       merge_keys=["o_orderkey"])


def test_delete_rows_unpartitioned_full_rewrite(spark, tmp_root):
    orders = _orders(spark)
    store_dataframe_as_dataset(spark, orders, tmp_root, "o")
    delete_rows(spark, tmp_root, "o", [[("o_orderkey", "<", 100)]])
    got = read_table(spark, tmp_root, "o")
    assert got.count() == orders.where("o_orderkey >= 100").count()
