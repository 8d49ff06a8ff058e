"""JSONL table format + parquet bloom filter columns."""

import glob
import os

import pytest
from pyspark.sql import functions as F

from kartothek_spark.core.manifest import DatasetManifest
from kartothek_spark.dataset.read import read_table
from kartothek_spark.dataset.write import (
    store_dataframe_as_dataset,
    update_dataset,
)

from tests.conftest import SF_DIR


def _docs(spark):
    return spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))


def test_csv_gz_roundtrip_with_mutations(spark, tmp_root):
    """gzip CSV format (reference .csv.gz): payload files carry the
    .csv.gz suffix and ARE gzip streams; labels strip the full suffix;
    delete_scope + pruned read behave exactly like plain csv."""
    orders = spark.read.parquet(os.path.join(SF_DIR, "orders.parquet")).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    store_dataframe_as_dataset(
        spark, orders, tmp_root, "ogz", partition_on=["o_orderstatus"],
        table_format="csv.gz",
    )
    m = DatasetManifest.load(tmp_root, "ogz")
    assert m.partitions, "no partitions committed"
    for label, entry in m.partitions.items():
        assert entry["file"].endswith(".csv.gz")
        assert not label.endswith(".gz"), "label must strip the FULL suffix"
        with open(m.file_path(label), "rb") as fh:
            assert fh.read(2) == b"\x1f\x8b", "payload is not a gzip stream"
    update_dataset(spark, None, tmp_root, "ogz", delete_scope=[{"o_orderstatus": "P"}])
    got = read_table(spark, tmp_root, "ogz", predicates=[[("o_orderkey", "<", 100)]])
    want = orders.where("o_orderstatus <> 'P' AND o_orderkey < 100")
    assert got.count() == want.count()
    assert got.select(*want.columns).exceptAll(want).count() == 0


def test_jsonl_roundtrip_with_mutations(spark, tmp_root):
    docs = _docs(spark)
    store_dataframe_as_dataset(
        spark, docs, tmp_root, "d", partition_on=["lang"], table_format="jsonl"
    )
    m = DatasetManifest.load(tmp_root, "d")
    assert m.table_format == "jsonl"
    assert all(e["file"].endswith(".json") for e in m.partitions.values())
    got = read_table(spark, tmp_root, "d")
    assert got.count() == docs.count()
    assert [f.name for f in got.schema.fields] == [f.name for f in docs.schema.fields]
    assert (
        got.agg(F.sum("doc_id"), F.sum(F.length("text"))).first()
        == docs.agg(F.sum("doc_id"), F.sum(F.length("text"))).first()
    )
    # predicates evaluate (partition pruning + residual filter; no pushdown)
    one = read_table(spark, tmp_root, "d", predicates=[[("lang", "==", "en"), ("doc_id", "<", 100)]])
    assert one.count() == docs.where("lang = 'en' AND doc_id < 100").count()
    # mutation machinery works identically
    update_dataset(spark, None, tmp_root, "d", delete_scope=[{"lang": "en"}])
    assert read_table(spark, tmp_root, "d").count() == docs.where("lang <> 'en'").count()


def test_bloom_filter_columns(spark, tmp_root):
    docs = _docs(spark)
    store_dataframe_as_dataset(
        spark, docs, tmp_root, "plain", partition_on=["lang"]
    )
    store_dataframe_as_dataset(
        spark, docs, tmp_root, "bloomed", partition_on=["lang"],
        bloom_filter_columns=["doc_id"], bloom_ndv=10_000,
    )
    m = DatasetManifest.load(tmp_root, "bloomed")
    assert m.bloom_columns == ["doc_id"]

    def total_size(uuid):
        return sum(
            os.path.getsize(p)
            for p in glob.glob(os.path.join(tmp_root, uuid, "**", "*.parquet"), recursive=True)
        )

    # bloom bitsets are physically present (≈1.2 bytes/ndv per file)
    assert total_size("bloomed") > total_size("plain")
    # point lookup stays exact
    got = read_table(spark, tmp_root, "bloomed", predicates=[[("doc_id", "==", 42)]])
    assert got.count() == docs.where("doc_id = 42").count()
    # update path keeps writing blooms for new files
    before = total_size("bloomed")
    update_dataset(spark, docs.withColumn("doc_id", F.col("doc_id") + 1_000_000), tmp_root, "bloomed")
    m2 = DatasetManifest.load(tmp_root, "bloomed")
    assert m2.bloom_columns == ["doc_id"]
    assert total_size("bloomed") > before


def test_convert_dataset_jsonl_to_parquet(spark, tmp_root):
    from kartothek_spark.dataset.write import convert_dataset

    docs = _docs(spark)
    store_dataframe_as_dataset(
        spark, docs, tmp_root, "raw", partition_on=["lang"], table_format="jsonl"
    )
    m = convert_dataset(
        spark, tmp_root, "raw", "managed",
        secondary_indices=["source"], stats_columns=["doc_id"],
    )
    assert m.table_format == "parquet"
    assert m.partition_keys == ["lang"]  # carried over
    assert "source" in m.indices and m.stats_columns == ["doc_id"]
    got = read_table(spark, tmp_root, "managed")
    assert got.count() == docs.count()
    assert (
        got.agg(F.sum("doc_id"), F.sum(F.length("text"))).first()
        == docs.agg(F.sum("doc_id"), F.sum(F.length("text"))).first()
    )
    with pytest.raises(ValueError, match="must differ"):
        convert_dataset(spark, tmp_root, "raw", "raw")


def test_orc_roundtrip_with_mutations(spark, tmp_root):
    """ORC under the same manifest machinery: suffix dispatch, schema
    restore, partition pruning + residual predicates (Spark's ORC reader
    pushes them to stripes natively), delete_scope mutation."""
    docs = _docs(spark)
    store_dataframe_as_dataset(
        spark, docs, tmp_root, "d", partition_on=["lang"], table_format="orc"
    )
    m = DatasetManifest.load(tmp_root, "d")
    assert m.table_format == "orc"
    assert all(e["file"].endswith(".orc") for e in m.partitions.values())
    got = read_table(spark, tmp_root, "d")
    assert got.count() == docs.count()
    assert [f.name for f in got.schema.fields] == [f.name for f in docs.schema.fields]
    assert (
        got.agg(F.sum("doc_id"), F.sum(F.length("text"))).first()
        == docs.agg(F.sum("doc_id"), F.sum(F.length("text"))).first()
    )
    one = read_table(spark, tmp_root, "d", predicates=[[("lang", "==", "en"), ("doc_id", "<", 100)]])
    assert one.count() == docs.where("lang = 'en' AND doc_id < 100").count()
    update_dataset(spark, None, tmp_root, "d", delete_scope=[{"lang": "en"}])
    assert read_table(spark, tmp_root, "d").count() == docs.where("lang <> 'en'").count()


@pytest.mark.parametrize("fmt", ["orc", "jsonl", "csv"])
def test_nonparquet_stats_and_indices(spark, tmp_root, fmt):
    """Stats columns and secondary indices are serializer-agnostic
    (reference: indices work for every serializer,
    metapartition.py:1371-1420): non-parquet formats collect per-file
    min/max/null-count/rows through the scan-based stats job, the planner
    prunes files on them, and index-pruned reads dispatch correctly."""
    from kartothek_spark.dataset.read import count_rows, dispatch_labels

    docs = _docs(spark)
    store_dataframe_as_dataset(
        spark, docs, tmp_root, f"d_{fmt}",
        partition_on=["lang"], table_format=fmt,
        stats_columns=["doc_id"], secondary_indices=["doc_id"],
    )
    m = DatasetManifest.load(tmp_root, f"d_{fmt}")
    assert m.stats_format == 2
    assert "doc_id" in m.indices
    # every partition carries exact stats + rows
    for lbl, e in m.partitions.items():
        assert "rows" in e and e["rows"] > 0
        st = e["stats"]["doc_id"]
        assert st["min"] <= st["max"] and st["nulls"] == 0
    # metadata-only COUNT is exact
    assert count_rows(spark, tmp_root, f"d_{fmt}") == docs.count()
    # stats pruning: only the file(s) holding the global max can match
    hi = max(e["stats"]["doc_id"]["max"] for e in m.partitions.values())
    labels = dispatch_labels(spark, m, [[("doc_id", ">=", hi)]])
    assert 0 < len(labels) < len(m.partitions)
    # index-pruned point read matches a direct filter
    probe = docs.select("doc_id").first()[0]
    got = read_table(
        spark, tmp_root, f"d_{fmt}", predicates=[[("doc_id", "==", probe)]]
    )
    assert got.count() == docs.where(F.col("doc_id") == probe).count()
    labels = dispatch_labels(spark, m, [[("doc_id", "==", probe)]])
    assert len(labels) < len(m.partitions)


def test_nonparquet_stats_null_counts_exact(spark, tmp_root):
    """The scan-based collector records EXACT null counts (trusted for
    IS NULL skipping at stats_format 2) and omits min/max for an all-null
    file, which therefore can never be skipped."""
    from kartothek_spark.dataset.read import dispatch_labels

    df = spark.createDataFrame(
        [("a", 1), ("a", None), ("b", 7), ("c", None), ("c", None)],
        "k string, v int",
    )
    store_dataframe_as_dataset(
        spark, df, tmp_root, "n", partition_on=["k"],
        table_format="orc", stats_columns=["v"],
    )
    m = DatasetManifest.load(tmp_root, "n")
    by_key = {lbl.split("/")[0]: e for lbl, e in m.partitions.items()}
    assert by_key["k=a"]["stats"]["v"]["nulls"] == 1
    assert by_key["k=b"]["stats"]["v"]["nulls"] == 0
    assert "v" not in by_key["k=c"].get("stats", {})  # all-null: no min/max
    # IS NULL prunes k=b (zero nulls, trusted), keeps k=a and k=c
    labels = dispatch_labels(spark, m, [[("v", "==", None)]])
    assert sorted(l.split("/")[0] for l in labels) == ["k=a", "k=c"]
