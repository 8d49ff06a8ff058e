"""Reference-layout interop: import a kartothek-written dataset in place,
export reference-readable metadata for an engine dataset.

The fixture below hand-writes a metadata-v4 dataset following the
reference's documented format (core/dataset.py:208-236, naming.py:7-62,
partition.py:46-48, index.py:_index_dct_to_table,
common_metadata.py:362-391) — no reference code executed or copied."""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from kartothek_spark.core.manifest import DatasetManifest
from kartothek_spark.dataset.interop import (
    export_kartothek_metadata,
    import_kartothek_dataset,
    load_reference_metadata,
    reference_tables,
)
from kartothek_spark.dataset.read import dispatch_labels, read_table
from kartothek_spark.dataset.write import (
    delete_dataset,
    garbage_collect_dataset,
    store_dataframe_as_dataset,
)


@pytest.fixture()
def reference_store(tmp_path):
    """A reference-layout store with one partitioned dataset `refds`:

    * partition key `status` with values "A" and "B C" (URL-quoted label);
    * payload files store data columns only (id, category, amount);
    * one orphan parquet on disk NOT listed in the metadata (explicit
      partitions must hide it);
    * an embedded JSON index on `category` and an external index parquet
      on `id` (reference [column, partition] layout);
    * `_common_metadata` schema sidecar incl. the partition column.
    """
    store = str(tmp_path / "ref_store")
    table_dir = os.path.join(store, "refds", "table")
    rows = {
        "status=A/part-1": {"id": [1, 2], "category": ["x", "y"], "amount": [10.0, 20.0]},
        "status=B%20C/part-2": {"id": [3], "category": ["x"], "amount": [30.0]},
    }
    payload_schema = pa.schema(
        [
            pa.field("id", pa.int64()),
            pa.field("category", pa.string()),
            pa.field("amount", pa.float64()),
        ]
    )
    partitions = {}
    for label, data in rows.items():
        rel = label + ".parquet"
        path = os.path.join(table_dir, rel)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        pq.write_table(pa.table(data, schema=payload_schema), path)
        partitions[label] = {"files": {"table": f"refds/table/{rel}"}}
    # orphan from an aborted reference write: on disk, not in metadata
    orphan = os.path.join(table_dir, "status=A", "orphan.parquet")
    pq.write_table(
        pa.table({"id": [99], "category": ["z"], "amount": [0.0]}, schema=payload_schema),
        orphan,
    )
    # full schema incl. partition column, partition keys first
    # (common_metadata.py:151-215 ordering)
    full_schema = pa.schema([pa.field("status", pa.string())] + list(payload_schema))
    pq.write_metadata(full_schema, os.path.join(table_dir, "_common_metadata"))
    # external index on id: [<column>, partition: list<string>]
    idx_key = "refds/indices/id/2026-01-01T00%3A00%3A00.by-dataset-index.parquet"
    idx_path = os.path.join(store, idx_key)
    os.makedirs(os.path.dirname(idx_path), exist_ok=True)
    pq.write_table(
        pa.Table.from_arrays(
            [
                pa.array([1, 2, 3], type=pa.int64()),
                pa.array(
                    [["status=A/part-1"], ["status=A/part-1"], ["status=B%20C/part-2"]],
                    type=pa.list_(pa.string()),
                ),
            ],
            names=["id", "partition"],
        ),
        idx_path,
    )
    meta = {
        "dataset_metadata_version": 4,
        "dataset_uuid": "refds",
        "metadata": {"creation_time": "2026-01-01T00:00:00"},
        "partitions": partitions,
        "indices": {
            "id": idx_key,
            "category": {"x": ["status=A/part-1", "status=B%20C/part-2"], "y": ["status=A/part-1"]},
            "status": {},  # unloaded primary index, as the reference serializes it
        },
        "partition_keys": ["status"],
    }
    with open(os.path.join(store, "refds.by-dataset-metadata.json"), "w") as f:
        json.dump(meta, f)
    return store, orphan


def test_import_reads_in_place(spark, tmp_path, reference_store):
    store, orphan = reference_store
    root = str(tmp_path / "engine_root")
    os.makedirs(root)
    m = import_kartothek_dataset(spark, root, "imported", store, source_uuid="refds")

    # explicit partitions: the orphan is invisible
    assert sorted(m.partitions) == ["status=A/part-1", "status=B%20C/part-2"]
    assert set(m.indices) == {"id", "category"}  # primary index skipped
    assert [f.name for f in m.schema.fields][:1] == ["status"]

    df = read_table(spark, root, "imported")
    got = {tuple(r) for r in df.select("id", "status", "amount").collect()}
    assert got == {(1, "A", 10.0), (2, "A", 20.0), (3, "B C", 30.0)}

    # partition-key pruning on the quoted value
    labels = dispatch_labels(spark, m, [[("status", "==", "B C")]])
    assert labels == ["status=B%20C/part-2"]
    # secondary-index pruning through both converted indices
    assert dispatch_labels(spark, m, [[("id", "==", 2)]]) == ["status=A/part-1"]
    assert dispatch_labels(spark, m, [[("category", "==", "y")]]) == ["status=A/part-1"]

    # predicate read end-to-end
    out = read_table(spark, root, "imported", predicates=[[("id", "in", [1, 3])]])
    assert {r["id"] for r in out.collect()} == {1, 3}


def test_import_is_zero_copy_and_detach_safe(spark, tmp_path, reference_store):
    store, orphan = reference_store
    root = str(tmp_path / "engine_root")
    os.makedirs(root)
    m = import_kartothek_dataset(spark, root, "imported", store, source_uuid="refds")
    payload = [os.path.join(m.data_root, e["file"]) for e in m.partitions.values()]
    # GC never reclaims external payload (nor the unlisted orphan)
    garbage_collect_dataset(root, "imported")
    assert all(os.path.exists(p) for p in payload) and os.path.exists(orphan)
    # delete is a metadata-only detach
    delete_dataset(root, "imported")
    assert all(os.path.exists(p) for p in payload) and os.path.exists(orphan)
    assert not DatasetManifest.exists(root, "imported")


def test_import_validations(spark, tmp_path, reference_store):
    store, _ = reference_store
    root = str(tmp_path / "engine_root")
    os.makedirs(root)
    with pytest.raises(FileNotFoundError):
        import_kartothek_dataset(spark, root, "x", store, source_uuid="nope")
    with pytest.raises(ValueError, match="table 'wrong' not in"):
        import_kartothek_dataset(
            spark, root, "x", store, source_uuid="refds", table="wrong"
        )
    bad = json.load(open(os.path.join(store, "refds.by-dataset-metadata.json")))
    bad["dataset_metadata_version"] = 3
    with open(os.path.join(store, "bad.by-dataset-metadata.json"), "w") as f:
        json.dump({**bad, "dataset_uuid": "bad"}, f)
    with pytest.raises(ValueError, match="metadata version"):
        import_kartothek_dataset(spark, root, "x", store, source_uuid="bad")
    # a dataset-level index on a column this table does not have (the
    # multi-table case) is skipped, not a crash or a dangling index
    other = json.load(open(os.path.join(store, "refds.by-dataset-metadata.json")))
    other["dataset_uuid"] = "oth"
    other["indices"]["from_other_table"] = {"v": ["status=A/part-1"]}
    for part in other["partitions"].values():
        part["files"] = {
            "table": part["files"]["table"].replace("refds/", "oth/", 1)
        }
    with open(os.path.join(store, "oth.by-dataset-metadata.json"), "w") as f:
        json.dump(other, f)
    os.symlink(os.path.join(store, "refds"), os.path.join(store, "oth"))
    m = import_kartothek_dataset(spark, root, "oth_imp", store, source_uuid="oth")
    assert "from_other_table" not in m.indices and set(m.indices) == {"id", "category"}


def test_export_roundtrip(spark, tmp_path):
    """Engine dataset → reference metadata → re-import reads identically."""
    root = str(tmp_path / "root")
    os.makedirs(root)
    df = spark.createDataFrame(
        [(1, "A", 1.5), (2, "A", 2.5), (3, "B", 3.5)], "id long, grp string, v double"
    )
    store_dataframe_as_dataset(
        spark, df, root, "mine", partition_on=["grp"], secondary_indices=["id"]
    )
    legacy = str(tmp_path / "legacy_view")
    with pytest.raises(ValueError, match="target_root must differ"):
        export_kartothek_metadata(root, "mine", root)
    out = export_kartothek_metadata(root, "mine", legacy)
    # engine manifest untouched by the export
    assert DatasetManifest.load(root, "mine").partitions
    meta = load_reference_metadata(legacy, "mine")
    assert meta["dataset_metadata_version"] == 4
    assert reference_tables(meta) == ["table"]
    assert meta["partition_keys"] == ["grp"]
    # every exported partition resolves through its payload symlink
    for part in meta["partitions"].values():
        p = os.path.join(legacy, part["files"]["table"])
        assert os.path.islink(p) and os.path.exists(p)
    # exported index is reference-shaped
    idx = pq.read_table(os.path.join(legacy, meta["indices"]["id"]))
    assert idx.column_names == ["id", "partition"]
    # schema sidecar exists with pandas metadata and partition col
    sidecar = pq.read_schema(os.path.join(legacy, "mine", "table", "_common_metadata"))
    assert b"pandas" in (sidecar.metadata or {})
    assert "grp" in sidecar.names
    assert out.endswith("mine.by-dataset-metadata.json")

    # round-trip: import the exported legacy view as a new dataset
    m2 = import_kartothek_dataset(spark, root, "back", legacy, source_uuid="mine")
    a = {tuple(r) for r in read_table(spark, root, "mine").select("id", "grp", "v").collect()}
    b = {tuple(r) for r in read_table(spark, root, "back").select("id", "grp", "v").collect()}
    assert a == b == {(1, "A", 1.5), (2, "A", 2.5), (3, "B", 3.5)}
    assert dispatch_labels(spark, m2, [[("id", "==", 3)]]) == dispatch_labels(
        spark, DatasetManifest.load(root, "mine"), [[("id", "==", 3)]]
    )


def test_cli_import_export_kartothek(spark, tmp_path, reference_store, capsys):
    import json as _json

    from kartothek_spark import cli

    store, _ = reference_store
    root = str(tmp_path / "engine_root")
    os.makedirs(root)
    assert cli.main([
        "import-kartothek", "--root", root, "--dataset", "imp",
        "--source-root", store, "--source-uuid", "refds",
    ]) == 0
    out = _json.loads(capsys.readouterr().out)
    assert out["partitions"] == 2 and out["indices"] == ["category", "id"]
    assert read_table(spark, root, "imp").count() == 3

    legacy = str(tmp_path / "legacy")
    # external (imported-in-place) datasets cannot be exported as views
    with pytest.raises(ValueError, match="external"):
        cli.main([
            "export-kartothek", "--root", root, "--dataset", "imp",
            "--target-root", legacy,
        ])
    df = spark.createDataFrame([(1, "a")], "id long, s string")
    store_dataframe_as_dataset(spark, df, root, "own")
    assert cli.main([
        "export-kartothek", "--root", root, "--dataset", "own",
        "--target-root", legacy,
    ]) == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["metadata"].endswith("own.by-dataset-metadata.json")
    assert load_reference_metadata(legacy, "own")["dataset_metadata_version"] == 4


def test_export_rejects_unrepresentable(spark, tmp_path):
    root = str(tmp_path / "root")
    os.makedirs(root)
    df = spark.createDataFrame([(1, "a")], "id long, s string")
    store_dataframe_as_dataset(spark, df, root, "csvds", table_format="csv")
    with pytest.raises(ValueError, match="table_format"):
        export_kartothek_metadata(root, "csvds", str(tmp_path / "legacy"))


@pytest.mark.parametrize(
    "sql_type,values,probe",
    [
        ("boolean", [True, False], True),
        ("tinyint", [1, 2], 2),
        ("int", [10, 20], 20),
        ("long", [1, 2], 2),
        ("float", [1.5, 2.25], 2.25),
        ("double", [1.5, 2.25], 2.25),
        ("string", ["a b/c", "plain"], "a b/c"),
        ("binary", [b"\x01\x02", b"zz", bytes([0xFF, 0xFE])], bytes([0xFF, 0xFE])),
        (
            "timestamp",
            [
                __import__("datetime").datetime(2020, 1, 1, 10, 0),
                __import__("datetime").datetime(2021, 6, 2, 3, 4, 5),
            ],
            __import__("datetime").datetime(2021, 6, 2, 3, 4, 5),
        ),
        (
            "date",
            [__import__("datetime").date(2020, 1, 1), __import__("datetime").date(2021, 6, 2)],
            __import__("datetime").date(2021, 6, 2),
        ),
    ],
    ids=["bool", "int8", "int32", "int64", "float32", "float64", "str", "bytes", "timestamp", "date"],
)
def test_partition_key_dtype_roundtrip(spark, tmp_path, sql_type, values, probe):
    """Every reference-supported partition-key dtype
    (/root/reference docs/spec/indexing.rst:116-124: bool, ints, floats,
    str, bytes, timestamp, date) must survive the full loop:
    engine write -> export_kartothek_metadata -> import_kartothek_dataset
    -> value parity AND predicate dispatch/pruned-read parity through the
    _typed_value codec in BOTH directions. Binary includes non-UTF8 bytes
    — the case Spark's own hive rendering corrupts (the engine uses an
    x<hex> rendering; the export re-renders to the reference's
    percent-encoded layout)."""
    root = str(tmp_path / "root")
    os.makedirs(root)
    df = spark.createDataFrame(
        [(v, i) for i, v in enumerate(values)], f"pk {sql_type}, v long"
    )
    store_dataframe_as_dataset(spark, df, root, "d", partition_on=["pk"])
    legacy = str(tmp_path / "legacy")
    export_kartothek_metadata(root, "d", legacy)
    m2 = import_kartothek_dataset(spark, root, "back", legacy, source_uuid="d")

    def norm(rows):
        return sorted(
            (bytes(r[0]) if isinstance(r[0], (bytes, bytearray)) else r[0], r[1])
            for r in rows
        )

    want = norm([(v, i) for i, v in enumerate(values)])
    got_a = norm(read_table(spark, root, "d").select("pk", "v").collect())
    got_b = norm(read_table(spark, root, "back").select("pk", "v").collect())
    assert got_a == got_b == want

    # predicate dispatch parity: both layouts prune to exactly one label
    la = dispatch_labels(spark, DatasetManifest.load(root, "d"), [[("pk", "==", probe)]])
    lb = dispatch_labels(spark, m2, [[("pk", "==", probe)]])
    assert len(la) == 1 and len(lb) == 1

    # pruned read returns exactly the probe rows on both layouts
    probe_rows = norm([(v, i) for i, v in enumerate(values) if v == probe])
    pa_ = norm(
        read_table(spark, root, "d", predicates=[[("pk", "==", probe)]])
        .select("pk", "v").collect()
    )
    pb_ = norm(
        read_table(spark, root, "back", predicates=[[("pk", "==", probe)]])
        .select("pk", "v").collect()
    )
    assert pa_ == pb_ == probe_rows
