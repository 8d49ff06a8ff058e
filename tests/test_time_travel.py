"""Snapshot versioning: time-travel reads, incremental changes-since
feeds, expire + GC reclamation.

Beyond-reference capability (the reference manifest is single-version
last-writer-wins, io_components/write.py:232-235); semantics modeled on
Delta/Iceberg snapshots: every commit is a version, history snapshots are
immutable manifests, data files are shared across versions.
"""

import os

import pytest
from pyspark.sql import functions as F

from kartothek_spark.core.manifest import DatasetManifest
from kartothek_spark.dataset.read import (
    diff_versions,
    read_changes,
    read_table,
)
from kartothek_spark.dataset.write import (
    expire_snapshots,
    garbage_collect_dataset,
    store_dataframe_as_dataset,
    update_dataset,
)

from tests.conftest import SF_DIR


def _customer(spark):
    return spark.read.parquet(os.path.join(SF_DIR, "customer.parquet"))


@pytest.fixture()
def versioned(spark, tmp_root):
    """v1: nationkey < 15; v2: append >= 15, drop nationkey == 3."""
    cust = _customer(spark)
    store_dataframe_as_dataset(
        spark,
        cust.where("c_nationkey < 15"),
        tmp_root,
        "c",
        partition_on=["c_nationkey"],
        keep_history=True,
    )
    update_dataset(
        spark,
        cust.where("c_nationkey >= 15"),
        tmp_root,
        "c",
        delete_scope=[{"c_nationkey": 3}],
    )
    return tmp_root


def test_versions_advance_and_list(spark, versioned):
    m = DatasetManifest.load(versioned, "c")
    assert m.version == 2
    assert DatasetManifest.list_versions(versioned, "c") == [1, 2]


def test_time_travel_pins_old_content(spark, versioned):
    cust = _customer(spark)
    v1 = read_table(spark, versioned, "c", as_of=1)
    expected = cust.where("c_nationkey < 15")
    assert v1.count() == expected.count()
    assert (
        v1.agg(F.sum("c_custkey")).first()[0]
        == expected.agg(F.sum("c_custkey")).first()[0]
    )
    # live read reflects the mutation
    live = read_table(spark, versioned, "c")
    exp_live = cust.where("(c_nationkey < 15 AND c_nationkey != 3) OR c_nationkey >= 15")
    assert live.count() == exp_live.count()
    # as_of the CURRENT version works too (live manifest == snapshot)
    assert read_table(spark, versioned, "c", as_of=2).count() == live.count()


def test_time_travel_predicates_prune_against_snapshot(spark, versioned):
    # nationkey 3 exists in v1, deleted in v2
    v1 = read_table(spark, versioned, "c", as_of=1, predicates=[[("c_nationkey", "==", 3)]])
    assert v1.count() == _customer(spark).where("c_nationkey = 3").count() > 0
    assert read_table(spark, versioned, "c", predicates=[[("c_nationkey", "==", 3)]]).count() == 0


def test_diff_and_read_changes(spark, versioned):
    added, removed = diff_versions(versioned, "c", since=1)
    assert all("c_nationkey=3" not in lbl for lbl in added)
    assert removed and all("c_nationkey=3" in lbl for lbl in removed)
    changes = read_changes(spark, versioned, "c", since=1)
    expected = _customer(spark).where("c_nationkey >= 15")
    assert changes.count() == expected.count()
    assert (
        changes.agg(F.sum("c_custkey")).first()[0]
        == expected.agg(F.sum("c_custkey")).first()[0]
    )
    # no-op diff
    assert read_changes(spark, versioned, "c", since=2).count() == 0


def test_gc_keeps_snapshot_files_until_expired(spark, versioned):
    # the v1-only files (nationkey=3) are still referenced by the snapshot
    deleted = garbage_collect_dataset(versioned, "c")
    assert deleted == []
    assert read_table(spark, versioned, "c", as_of=1, predicates=[[("c_nationkey", "==", 3)]]).count() > 0
    # expire v1 → GC reclaims exactly the dropped partition's files
    assert expire_snapshots(versioned, "c", keep_last=1) == [1]
    deleted = garbage_collect_dataset(versioned, "c")
    assert deleted and all("c_nationkey=3" in p for p in deleted)
    with pytest.raises(ValueError, match="no snapshot v1"):
        read_table(spark, versioned, "c", as_of=1)
    # live content untouched
    live = read_table(spark, versioned, "c")
    exp_live = _customer(spark).where(
        "(c_nationkey < 15 AND c_nationkey != 3) OR c_nationkey >= 15"
    )
    assert live.count() == exp_live.count()


def test_history_off_by_default(spark, tmp_root):
    cust = _customer(spark)
    store_dataframe_as_dataset(spark, cust, tmp_root, "c", partition_on=["c_nationkey"])
    update_dataset(spark, None, tmp_root, "c", delete_scope=[{"c_nationkey": 3}])
    m = DatasetManifest.load(tmp_root, "c")
    assert m.version == 2 and not os.path.isdir(m.history_root)
    with pytest.raises(ValueError, match="no snapshot v1"):
        read_table(spark, tmp_root, "c", as_of=1)


def test_zstd_manifest_history_roundtrip(spark, tmp_root):
    cust = _customer(spark)
    store_dataframe_as_dataset(
        spark,
        cust.where("c_nationkey < 5"),
        tmp_root,
        "c",
        storage_format="zstd",
        keep_history=True,
    )
    update_dataset(spark, cust.where("c_nationkey >= 5"), tmp_root, "c")
    v1 = read_table(spark, tmp_root, "c", as_of=1)
    assert v1.count() == cust.where("c_nationkey < 5").count()


def test_timestamp_as_of(spark, versioned):
    from kartothek_spark.core.manifest import DatasetManifest

    t1 = DatasetManifest.load(versioned, "c", version=1).committed_at
    t2 = DatasetManifest.load(versioned, "c").committed_at
    assert t1 and t2 and t1 <= t2
    cust = _customer(spark)
    # exactly at v1's commit instant → v1 content
    got = read_table(spark, versioned, "c", as_of=t1)
    assert got.count() == cust.where("c_nationkey < 15").count()
    # at v2's instant (and with a 'Z' rendering) → live content
    z = t2.replace("+00:00", "Z")
    live = read_table(spark, versioned, "c", as_of=z)
    assert live.count() == cust.where(
        "(c_nationkey < 15 AND c_nationkey != 3) OR c_nationkey >= 15"
    ).count()
    # before the first commit → error
    with pytest.raises(ValueError, match="at or before"):
        read_table(spark, versioned, "c", as_of="2000-01-01T00:00:00+00:00")
