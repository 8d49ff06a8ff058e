"""End-to-end slice (SURVEY §7.2): write partitioned dataset → manifest →
pruned read with DNF predicates → values match a direct-filter oracle."""

import datetime

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from kartothek_spark.core.manifest import DatasetManifest
from kartothek_spark.dataset.read import dispatch_labels, read_table
from kartothek_spark.dataset.write import (
    garbage_collect_dataset,
    store_dataframe_as_dataset,
    update_dataset,
)


@pytest.fixture()
def fixture_df(spark):
    rows = [
        Row(P=p, L=l, TARGET=p, DATE=datetime.date(2009, 12, 31) if p % 2 else datetime.date(2010, 1, 1))
        for p in range(1, 5)
        for l in range(1, 4)
    ]
    return spark.createDataFrame(rows)


def test_write_read_roundtrip(spark, tmp_root, fixture_df):
    m = store_dataframe_as_dataset(
        spark, fixture_df, tmp_root, "ds", partition_on=["P"], secondary_indices=["L"]
    )
    assert DatasetManifest.exists(tmp_root, "ds")
    assert len(m.partitions) >= 4
    got = read_table(spark, tmp_root, "ds").orderBy("P", "L").collect()
    exp = fixture_df.orderBy("P", "L").collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in exp]


def test_partition_pruning(spark, tmp_root, fixture_df):
    store_dataframe_as_dataset(spark, fixture_df, tmp_root, "ds", partition_on=["P"])
    m = DatasetManifest.load(tmp_root, "ds")
    labels = dispatch_labels(spark, m, [[("P", "==", 2)]])
    assert labels and all(lbl.startswith("P=2/") for lbl in labels)
    got = read_table(spark, tmp_root, "ds", predicates=[[("P", "==", 2), ("L", ">", 1)]])
    assert {(r.P, r.L) for r in got.collect()} == {(2, 2), (2, 3)}


def test_secondary_index_pruning(spark, tmp_root, fixture_df):
    store_dataframe_as_dataset(
        spark, fixture_df, tmp_root, "ds", partition_on=["P"], secondary_indices=["TARGET"]
    )
    m = DatasetManifest.load(tmp_root, "ds")
    labels = dispatch_labels(spark, m, [[("TARGET", "==", 3)]])
    assert labels and all(lbl.startswith("P=3/") for lbl in labels)


def test_update_append_and_delete_scope(spark, tmp_root, fixture_df):
    store_dataframe_as_dataset(
        spark, fixture_df, tmp_root, "ds", partition_on=["P"], secondary_indices=["L"]
    )
    new = fixture_df.where(F.col("P") == 1).withColumn("TARGET", F.lit(99))
    update_dataset(spark, new, tmp_root, "ds", delete_scope=[{"P": 1}])
    got = read_table(spark, tmp_root, "ds", predicates=[[("P", "==", 1)]])
    assert {r.TARGET for r in got.collect()} == {99}
    # index maintenance: pruning via L still correct after update
    m = DatasetManifest.load(tmp_root, "ds")
    labels = dispatch_labels(spark, m, [[("L", "==", 2)]])
    got2 = read_table(spark, tmp_root, "ds", predicates=[[("L", "==", 2)]])
    assert got2.count() == 4  # one row per P


def test_gc_removes_orphans(spark, tmp_root, fixture_df):
    store_dataframe_as_dataset(
        spark, fixture_df, tmp_root, "ds", partition_on=["P"], secondary_indices=["L"]
    )
    update_dataset(spark, None, tmp_root, "ds", delete_scope=[{"P": 4}])
    deleted = garbage_collect_dataset(tmp_root, "ds")
    assert deleted  # dropped partition files + old index version
    # dataset still reads fine afterwards
    assert read_table(spark, tmp_root, "ds").count() == 9


def test_empty_result_schema(spark, tmp_root, fixture_df):
    store_dataframe_as_dataset(spark, fixture_df, tmp_root, "ds", partition_on=["P"])
    got = read_table(spark, tmp_root, "ds", predicates=[[("P", "==", 999)]])
    assert got.count() == 0
    assert [f.name for f in got.schema.fields] == ["P", "L", "TARGET", "DATE"]


def test_bucket_pruning(spark, tmp_root):
    import os

    from kartothek_spark.core.manifest import DatasetManifest
    from kartothek_spark.dataset.read import dispatch_labels, read_table
    from kartothek_spark.dataset.write import store_dataframe_as_dataset, update_dataset
    from tests.conftest import SF_DIR

    li = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
    store_dataframe_as_dataset(
        spark, li, tmp_root, "lb",
        partition_on=["l_returnflag"], bucket_by=["l_orderkey"], num_buckets=4,
    )
    m = DatasetManifest.load(tmp_root, "lb")
    assert m.num_buckets == 4 and m.bucket_by == ["l_orderkey"]
    all_labels = set(m.partitions)
    # equality on the bucket column prunes to <= 1 bucket per partition value
    pruned = dispatch_labels(spark, m, [[("l_orderkey", "==", 7)]])
    assert 0 < len(pruned) <= len(all_labels) // 4 + 1

    got = read_table(spark, tmp_root, "lb", predicates=[[("l_orderkey", "==", 7)]])
    want = li.where("l_orderkey = 7")
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.select(*got.columns).collect())
    )
    # non-equality predicates must NOT bucket-prune
    assert set(dispatch_labels(spark, m, [[("l_orderkey", ">", 0)]])) == all_labels

    # appends keep the bucket layout (update path reuses the spec)
    update_dataset(spark, li.limit(50), tmp_root, "lb")
    got2 = read_table(spark, tmp_root, "lb", predicates=[[("l_orderkey", "==", 7)]])
    n_dup = li.limit(50).where("l_orderkey = 7").count()
    assert got2.count() == want.count() + n_dup

    # full unpredicated roundtrip still matches (bucket col never leaks)
    full = read_table(spark, tmp_root, "lb")
    assert set(full.columns) == set(li.columns)
