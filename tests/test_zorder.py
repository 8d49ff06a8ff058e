"""Z-order multi-column clustering (Delta OSS-style, beyond the
reference): interleaved-bit key over per-column quantile bucket indices
drives the range layout, so per-file min/max skipping is selective on
EVERY zorder_by column — not just a leading sort column."""

import os

import pytest
from pyspark.sql import functions as F

from kartothek_spark.core.manifest import DatasetManifest
from kartothek_spark.dataset.read import dispatch_labels, read_table
from kartothek_spark.dataset.write import store_dataframe_as_dataset

from tests.conftest import SF_DIR


@pytest.fixture()
def zordered(spark, tmp_root):
    li = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
    spark.conf.set("spark.sql.files.maxRecordsPerFile", "500")
    try:
        store_dataframe_as_dataset(
            spark, li, tmp_root, "lz", zorder_by=["l_orderkey", "l_partkey"]
        )
    finally:
        spark.conf.unset("spark.sql.files.maxRecordsPerFile")
    return tmp_root, li


def test_zorder_skips_on_both_columns(spark, zordered):
    root, li = zordered
    m = DatasetManifest.load(root, "lz")
    assert set(m.stats_columns) == {"l_orderkey", "l_partkey"}
    n_files = len(m.partitions)
    assert n_files > 4
    for preds, sql in [
        ([[("l_orderkey", "<", 300)]], "l_orderkey < 300"),
        ([[("l_partkey", "<", 40)]], "l_partkey < 40"),
        ([[("l_orderkey", "<", 300), ("l_partkey", "<", 40)]],
         "l_orderkey < 300 AND l_partkey < 40"),
    ]:
        labels = dispatch_labels(spark, m, preds)
        # the layout must skip on each column independently
        assert len(labels) < n_files, (preds, len(labels), n_files)
        got = read_table(spark, root, "lz", predicates=preds)
        exp = li.where(sql)
        assert got.count() == exp.count()
        assert (
            got.agg(F.sum("l_orderkey"), F.sum("l_partkey")).first()
            == exp.agg(F.sum("l_orderkey"), F.sum("l_partkey")).first()
        )


def test_zorder_column_never_lands_in_files(spark, zordered):
    root, _li = zordered
    m = DatasetManifest.load(root, "lz")
    assert all("__ktk_zorder" not in lbl for lbl in m.partitions)
    got = read_table(spark, root, "lz")
    assert "__ktk_zorder" not in got.columns


def test_zorder_rejects_string_and_range_combo(spark, tmp_root):
    li = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
    with pytest.raises(TypeError, match="non-orderable-numeric"):
        store_dataframe_as_dataset(
            spark, li, tmp_root, "bad1", zorder_by=["l_returnflag"]
        )
    with pytest.raises(ValueError, match="mutually exclusive"):
        store_dataframe_as_dataset(
            spark, li, tmp_root, "bad2",
            zorder_by=["l_orderkey"], range_partition_by=["l_partkey"],
        )


def test_cluster_dataset_reclusters_live_dataset(spark, tmp_root):
    """cluster_dataset (Delta OPTIMIZE ZORDER analog): an unclustered
    dataset gains stats columns + a skipping layout post-hoc, in one
    atomic swap that preserves content exactly."""
    from kartothek_spark.dataset.write import cluster_dataset

    li = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
    spark.conf.set("spark.sql.files.maxRecordsPerFile", "500")
    try:
        store_dataframe_as_dataset(spark, li, tmp_root, "lc")
        before = DatasetManifest.load(tmp_root, "lc")
        assert not before.stats_columns
        # unclustered: a conjunction prunes nothing
        assert len(dispatch_labels(
            spark, before, [[("l_orderkey", "<", 300)]]
        )) == len(before.partitions)

        cluster_dataset(spark, tmp_root, "lc", zorder_by=["l_orderkey", "l_partkey"])
    finally:
        spark.conf.unset("spark.sql.files.maxRecordsPerFile")

    m = DatasetManifest.load(tmp_root, "lc")
    assert set(m.stats_columns) == {"l_orderkey", "l_partkey"}
    n_files = len(m.partitions)
    preds = [[("l_orderkey", "<", 300), ("l_partkey", "<", 40)]]
    labels = dispatch_labels(spark, m, preds)
    assert 0 < len(labels) < n_files
    got = read_table(spark, tmp_root, "lc", predicates=preds)
    exp = li.where("l_orderkey < 300 AND l_partkey < 40")
    assert got.count() == exp.count()
    # full content preserved by the rewrite
    assert read_table(spark, tmp_root, "lc").count() == li.count()
