"""Zero-copy attach of existing hive-partitioned parquet directories."""

import glob
import os

import pytest
from pyspark.sql import functions as F

from kartothek_spark.core.manifest import DatasetManifest
from kartothek_spark.dataset.read import dispatch_labels, read_table
from kartothek_spark.dataset.write import (
    attach_dataset,
    copy_dataset,
    delete_dataset,
    garbage_collect_dataset,
    store_dataframe_as_dataset,
    update_dataset,
)

from tests.conftest import SF_DIR


@pytest.fixture()
def raw_dir(spark, tmp_path):
    """A plain spark.write.partitionBy directory — no engine involved."""
    d = str(tmp_path / "raw")
    orders = spark.read.parquet(os.path.join(SF_DIR, "orders.parquet"))
    orders.write.partitionBy("o_orderstatus").parquet(d)
    return d, orders


def test_attach_reads_prunes_and_indexes(spark, tmp_root, raw_dir):
    d, orders = raw_dir
    m = attach_dataset(
        spark, tmp_root, "o", d, secondary_indices=["o_custkey"]
    )
    assert m.external_root == os.path.abspath(d)
    assert m.partition_keys == ["o_orderstatus"]  # inferred from hive dirs
    got = read_table(spark, tmp_root, "o")
    assert got.count() == orders.count()
    assert sorted(got.columns) == sorted(orders.columns)
    # partition pruning works on the attached layout
    labels = dispatch_labels(spark, m, [[("o_orderstatus", "==", "F")]])
    assert 0 < len(labels) < len(m.partitions)
    sel = read_table(spark, tmp_root, "o", predicates=[[("o_orderstatus", "==", "F")]])
    assert sel.count() == orders.where("o_orderstatus = 'F'").count()
    # secondary index built over external files serves pruned reads
    one = read_table(spark, tmp_root, "o", predicates=[[("o_custkey", "==", 349)]])
    assert one.count() == orders.where("o_custkey = 349").count()


def test_attach_mutation_gc_and_detach(spark, tmp_root, raw_dir):
    d, orders = raw_dir
    n_files_before = len(glob.glob(d + "/**/*.parquet", recursive=True))
    attach_dataset(spark, tmp_root, "o", d)
    # append flows into the external directory
    extra = orders.limit(50).withColumn("o_orderkey", F.col("o_orderkey") + 5_000_000)
    update_dataset(spark, extra, tmp_root, "o")
    assert read_table(spark, tmp_root, "o").count() == orders.count() + 50
    # GC never reclaims external payload (even after a delete_scope)
    update_dataset(spark, None, tmp_root, "o", delete_scope=[{"o_orderstatus": "P"}])
    assert garbage_collect_dataset(tmp_root, "o") == []
    assert len(glob.glob(d + "/**/*.parquet", recursive=True)) > n_files_before
    # detach: metadata gone, external payload untouched
    delete_dataset(tmp_root, "o")
    assert not DatasetManifest.exists(tmp_root, "o")
    assert len(glob.glob(d + "/**/*.parquet", recursive=True)) > n_files_before
    # copy refuses (ambiguous ownership)
    attach_dataset(spark, tmp_root, "o2", d)
    with pytest.raises(ValueError, match="external"):
        copy_dataset(tmp_root, "o2", tmp_root, "o3", spark=spark)


def test_attach_guards(spark, tmp_root, raw_dir):
    d, orders = raw_dir
    store_dataframe_as_dataset(spark, orders, tmp_root, "taken")
    with pytest.raises(ValueError, match="already exists"):
        attach_dataset(spark, tmp_root, "taken", d)
    with pytest.raises(ValueError, match="not a directory"):
        attach_dataset(spark, tmp_root, "x", d + "_nope")
    with pytest.raises(ValueError, match="not present"):
        attach_dataset(spark, tmp_root, "y", d, partition_keys=["nope"])
