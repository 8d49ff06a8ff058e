"""Hidden (transform) partitioning: Iceberg-style derived partition
columns with transform-aware predicate pruning."""

import datetime
import os

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR

from kartothek_spark.core.manifest import DatasetManifest
from kartothek_spark.dataset.read import dispatch_labels, read_changes, read_table
from kartothek_spark.dataset.write import store_dataframe_as_dataset, update_dataset


def _events(spark):
    return (
        spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
        .where(F.col("user_id") < 200)
        .select("user_id", "ts", "event_type", "value")
    )


def test_day_transform_roundtrip_hides_derived_column(spark, tmp_root):
    ev = _events(spark)
    store_dataframe_as_dataset(
        spark, ev, tmp_root, "ev", partition_transforms=[("d", "day", "ts")]
    )
    m = DatasetManifest.load(tmp_root, "ev")
    assert m.partition_keys == ["d"]
    assert m.partition_transforms == {"d": {"fn": "day", "src": "ts"}}

    got = read_table(spark, tmp_root, "ev")
    assert got.columns == ["user_id", "ts", "event_type", "value"]  # d hidden
    assert got.count() == ev.count()
    assert got.exceptAll(ev).count() == 0

    # explicit request surfaces the derived column
    withd = read_table(spark, tmp_root, "ev", columns=["ts", "d"])
    bad = withd.where(F.to_date("ts") != F.col("d")).count()
    assert bad == 0


def test_raw_timestamp_predicate_prunes_day_partitions(spark, tmp_root):
    ev = _events(spark)
    store_dataframe_as_dataset(
        spark, ev, tmp_root, "ev", partition_transforms=[("d", "day", "ts")]
    )
    m = DatasetManifest.load(tmp_root, "ev")
    lo = ev.agg(F.min("ts")).first()[0]
    cut = lo + datetime.timedelta(hours=30)

    preds = [[("ts", "<", cut)]]
    labels = dispatch_labels(spark, m, preds)
    assert 0 < len(labels) < len(m.partitions), "raw-ts predicate must prune days"

    got = read_table(spark, tmp_root, "ev", predicates=preds)
    want = ev.where(F.col("ts") < F.lit(cut))
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0

    # equality predicate prunes to (at most) one day
    some_ts = ev.orderBy("ts").limit(1).first().ts
    eq_labels = dispatch_labels(spark, m, [[("ts", "==", some_ts)]])
    assert len(eq_labels) == 1


def test_update_derives_transform_columns(spark, tmp_root):
    ev = _events(spark)
    b1 = ev.where(F.col("user_id") % 2 == 0)
    b2 = ev.where(F.col("user_id") % 2 == 1)
    store_dataframe_as_dataset(
        spark, b1, tmp_root, "ev", keep_history=True,
        partition_transforms=[("d", "day", "ts")],
    )
    update_dataset(spark, b2, tmp_root, "ev")  # b2 has no 'd' column
    got = read_table(spark, tmp_root, "ev")
    assert got.count() == ev.count()
    assert got.exceptAll(ev).count() == 0
    # changes feed hides the derived column too
    ch = read_changes(spark, tmp_root, "ev", since=1)
    assert ch.columns == ["user_id", "ts", "event_type", "value"]
    assert ch.count() == b2.count()


def test_truncate_transform_on_ints(spark, tmp_root):
    orders = spark.read.parquet(os.path.join(SF_DIR, "orders.parquet")).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    store_dataframe_as_dataset(
        spark, orders, tmp_root, "ord",
        partition_transforms=[("kb", "truncate:1000", "o_orderkey")],
    )
    m = DatasetManifest.load(tmp_root, "ord")
    labels = dispatch_labels(spark, m, [[("o_orderkey", "<", 500)]])
    assert len(labels) == 1  # only the kb=0 bucket
    got = read_table(spark, tmp_root, "ord", predicates=[[("o_orderkey", "<", 500)]])
    want = orders.where("o_orderkey < 500")
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0


def test_unknown_transform_rejected(spark, tmp_root):
    ev = _events(spark)
    with pytest.raises(ValueError, match="unknown partition transform"):
        store_dataframe_as_dataset(
            spark, ev, tmp_root, "ev", partition_transforms=[("d", "week", "ts")]
        )


def test_compact_and_copy_preserve_transforms(spark, tmp_root):
    ev = _events(spark)
    store_dataframe_as_dataset(
        spark, ev, tmp_root, "ev", partition_transforms=[("d", "day", "ts")]
    )
    from kartothek_spark.dataset.write import compact_dataset, copy_dataset

    compact_dataset(spark, tmp_root, "ev")
    assert DatasetManifest.load(tmp_root, "ev").partition_transforms == {
        "d": {"fn": "day", "src": "ts"}
    }
    copy_dataset(tmp_root, "ev", tmp_root + "/copy", spark=spark)
    m2 = DatasetManifest.load(tmp_root + "/copy", "ev")
    assert m2.partition_transforms == {"d": {"fn": "day", "src": "ts"}}
    lo = ev.agg(F.min("ts")).first()[0]
    labels = dispatch_labels(
        spark, m2, [[("ts", "<", lo + datetime.timedelta(hours=30))]]
    )
    assert 0 < len(labels) < len(m2.partitions)


def test_expire_partitions_retention(spark, tmp_root):
    """Retention drop of old day partitions by predicate on the hidden
    derived column — metadata-only, values equal the complementary
    filter."""
    from kartothek_spark.dataset.write import expire_partitions

    ev = _events(spark)
    store_dataframe_as_dataset(
        spark, ev, tmp_root, "ev", partition_transforms=[("d", "day", "ts")]
    )
    lo = ev.agg(F.min("ts")).first()[0]
    cutoff = (lo + datetime.timedelta(days=2)).date()
    dropped = expire_partitions(spark, tmp_root, "ev", [[("d", "<", cutoff)]])
    assert dropped
    got = read_table(spark, tmp_root, "ev")
    want = ev.where(F.to_date("ts") >= F.lit(cutoff))
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0

    # content-column predicates are rejected
    with pytest.raises(ValueError, match="partition keys only"):
        expire_partitions(spark, tmp_root, "ev", [[("value", ">", 1.0)]])


def test_hour_transform(spark, tmp_root):
    ev = _events(spark).limit(2000)
    store_dataframe_as_dataset(
        spark, ev, tmp_root, "evh", partition_transforms=[("h", "hour", "ts")]
    )
    m = DatasetManifest.load(tmp_root, "evh")
    lo = ev.agg(F.min("ts")).first()[0]
    cut = lo + datetime.timedelta(hours=3)
    labels = dispatch_labels(spark, m, [[("ts", "<", cut)]])
    assert 0 < len(labels) < len(m.partitions)
    got = read_table(spark, tmp_root, "evh", predicates=[[("ts", "<", cut)]])
    want = ev.where(F.col("ts") < F.lit(cut))
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0
