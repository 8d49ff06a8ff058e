"""Dataset manifest: the single JSON document that *is* the dataset state.

Parity target: the reference's ``<UUID>.by-dataset-metadata.json`` —
``kartothek/core/dataset.py:62,519`` and
``docs/spec/format_specification.rst:196-228`` in /root/reference. All
state (partition list, schema, index pointers, user metadata) lives in one
document updated copy-on-write; the single atomic put/rename of this file
is the commit boundary. Planning a query therefore costs O(1) store round
trips: one manifest read + the needed index reads — never a directory
listing. At 100 TB / millions of files this is the difference between a
millisecond plan and a multi-minute S3 LIST storm.

Layout (mirrors the reference's so partition-column reconstruction from
hive-style ``K=V`` path segments keeps working):

    <root>/<uuid>.by-dataset-metadata.json
    <root>/<uuid>/table/K1=V1/K2=V2/<file_uuid>.parquet
    <root>/<uuid>/indices/<col>/<ts>.by-dataset-index.parquet
"""

from __future__ import annotations

import json
import os
import tempfile
import uuid as _uuid
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import types as T

from kartothek_spark.core.urlencode import parse_partition_values

METADATA_VERSION = 4
TABLE = "table"  # single-table datasets (multi-table is deprecated upstream)
METADATA_SUFFIX = ".by-dataset-metadata.json"
# zstd-compressed manifest (reference `core/_zmsgpack.py` msgpack.zstd
# codec, io_components/write.py:232-235): at millions of partitions the
# manifest dominates plan latency and storage round-trips; the compressed
# codec keeps the SAME dict shape (compact JSON) under zstd via pyarrow —
# ~10x smaller, one object, still a single atomic put. JSON stays the
# default for debuggability (SURVEY §4.2 choice).
METADATA_SUFFIX_ZST = METADATA_SUFFIX + ".zst"


def _typed_value(raw: str, dt: T.DataType) -> Any:
    """Cast a path-string partition value to its schema type (primary-index
    reconstruction; reference ``metapartition.py:920-980``)."""
    import datetime

    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return int(raw)
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return float(raw)
    if isinstance(dt, T.BooleanType):
        return raw.lower() in ("true", "1")
    if isinstance(dt, T.DateType):
        return datetime.date.fromisoformat(raw)
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return datetime.datetime.fromisoformat(raw.replace(" ", "T"))
    return raw


@dataclass
class DatasetManifest:
    dataset_uuid: str
    root: str  # dataset collection root (directory / bucket prefix)
    schema: T.StructType
    partition_keys: list[str] = field(default_factory=list)
    # label -> {"file": relpath, "rows": int | None}
    partitions: dict[str, dict[str, Any]] = field(default_factory=dict)
    # indexed column -> relpath of index parquet (secondary inverted indices)
    indices: dict[str, str] = field(default_factory=dict)
    metadata: dict[str, Any] = field(default_factory=dict)
    metadata_version: int = METADATA_VERSION
    # payload file format: "parquet" (default) or "csv" (reference S3/S4
    # format dispatch, serialization/_generic.py:37-154 — CSV keeps parity
    # with the reference: no pushdown, schema supplied by the manifest)
    table_format: str = "parquet"
    # hash-bucketing spec (reference S20 `_hash_bucket`, _shuffle.py:23-37):
    # rows are hash-distributed on bucket_by into num_buckets path-encoded
    # sub-partitions, so equality reads on bucket_by prune to one bucket
    bucket_by: list[str] = field(default_factory=list)
    num_buckets: int | None = None
    # manifest codec: "json" (default, debuggable) or "zstd" (compact JSON
    # under zstd — the scale choice; see METADATA_SUFFIX_ZST note)
    storage_format: str = "json"
    # content columns with per-file min/max statistics kept in the manifest
    # (Delta/Iceberg-style data skipping, beyond the reference's partition
    # + secondary-index pruning): each partition entry gains
    # {"stats": {col: {"min": v, "max": v, "nulls": n}}} collected from
    # parquet footers by a distributed job at write time. The planner can
    # then drop files whose [min, max] can't satisfy a conjunction WITHOUT
    # opening them — at 100 TB the difference between touching thousands
    # of footers and touching none.
    stats_columns: list[str] = field(default_factory=list)

    # -- paths --------------------------------------------------------------
    @property
    def manifest_path(self) -> str:
        suffix = METADATA_SUFFIX_ZST if self.storage_format == "zstd" else METADATA_SUFFIX
        return os.path.join(self.root, self.dataset_uuid + suffix)

    @property
    def data_root(self) -> str:
        return os.path.join(self.root, self.dataset_uuid, TABLE)

    @property
    def index_root(self) -> str:
        return os.path.join(self.root, self.dataset_uuid, "indices")

    def file_path(self, label: str) -> str:
        return os.path.join(self.root, self.partitions[label]["file"])

    def files(self, labels: list[str] | None = None) -> list[str]:
        labels = list(self.partitions) if labels is None else labels
        return [self.file_path(lbl) for lbl in labels]

    # -- primary index (partition values parsed from labels) ----------------
    def partition_values(self, label: str) -> dict[str, Any]:
        raw = parse_partition_values(label, self.partition_keys)
        by_name = {f.name: f.dataType for f in self.schema.fields}
        return {k: _typed_value(v, by_name[k]) for k, v in raw.items()}

    def query(self, predicates=None, **kwargs: Any) -> list[str]:
        """Partition labels surviving partition-key predicate evaluation
        (reference ``core/dataset.py:317-347``). ``kwargs`` are equality
        shorthands (``delete_scope`` style)."""
        from kartothek_spark.core.predicates import evaluate_predicates_py

        if kwargs:
            extra = [[(k, "==", v) for k, v in kwargs.items()]]
            predicates = extra if predicates is None else [
                list(conj) + eq for conj in predicates for eq in extra
            ]
        if not self.partition_keys or predicates is None:
            return list(self.partitions)
        out = []
        for label in self.partitions:
            values = self.partition_values(label)
            if evaluate_predicates_py(predicates, values):
                out.append(label)
        return out

    # -- (de)serialization ---------------------------------------------------
    def to_dict(self) -> dict[str, Any]:
        return {
            "dataset_metadata_version": self.metadata_version,
            "dataset_uuid": self.dataset_uuid,
            "metadata": self.metadata,
            "partition_keys": self.partition_keys,
            "schema": json.loads(self.schema.json()),
            "partitions": self.partitions,
            "indices": self.indices,
            "format": self.table_format,
            **(
                {"bucket_by": self.bucket_by, "num_buckets": self.num_buckets}
                if self.num_buckets
                else {}
            ),
            **({"stats_columns": self.stats_columns} if self.stats_columns else {}),
        }

    @classmethod
    def from_dict(cls, d: dict[str, Any], root: str) -> "DatasetManifest":
        return cls(
            dataset_uuid=d["dataset_uuid"],
            root=root,
            schema=T.StructType.fromJson(d["schema"]),
            partition_keys=list(d.get("partition_keys", [])),
            partitions=dict(d.get("partitions", {})),
            indices=dict(d.get("indices", {})),
            metadata=dict(d.get("metadata", {})),
            metadata_version=d.get("dataset_metadata_version", METADATA_VERSION),
            table_format=d.get("format", "parquet"),
            bucket_by=list(d.get("bucket_by", [])),
            num_buckets=d.get("num_buckets"),
            stats_columns=list(d.get("stats_columns", [])),
        )

    @classmethod
    def load(cls, root: str, dataset_uuid: str) -> "DatasetManifest":
        path = os.path.join(root, dataset_uuid + METADATA_SUFFIX)
        if os.path.exists(path):
            with open(path) as fh:
                m = cls.from_dict(json.load(fh), root)
                m.storage_format = "json"
                return m
        zpath = os.path.join(root, dataset_uuid + METADATA_SUFFIX_ZST)
        import pyarrow as pa

        with open(zpath, "rb") as fh:
            blob = fh.read()
        # 8-byte LE plaintext-size header (pyarrow's one-shot decompress
        # needs the exact output size)
        size = int.from_bytes(blob[:8], "little")
        raw = pa.Codec("zstd").decompress(blob[8:], asbytes=True, decompressed_size=size)
        m = cls.from_dict(json.loads(raw), root)
        m.storage_format = "zstd"
        return m

    @classmethod
    def exists(cls, root: str, dataset_uuid: str) -> bool:
        return os.path.exists(
            os.path.join(root, dataset_uuid + METADATA_SUFFIX)
        ) or os.path.exists(os.path.join(root, dataset_uuid + METADATA_SUFFIX_ZST))

    def commit(self) -> None:
        """Atomic commit: write-temp + rename (POSIX atomic replace).

        On an object store this is a conditional put of one object — same
        single-key last-writer-wins semantics as the reference
        (``io_components/write.py:232-235``). No MVCC / concurrent-writer
        protection, matching the reference's documented limitation.
        """
        os.makedirs(self.root, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=self.root, suffix=".tmp")
        try:
            if self.storage_format == "zstd":
                import pyarrow as pa

                payload = json.dumps(
                    self.to_dict(), default=str, separators=(",", ":")
                ).encode("utf-8")
                with os.fdopen(fd, "wb") as fh:
                    fh.write(len(payload).to_bytes(8, "little"))
                    fh.write(pa.Codec("zstd").compress(payload, asbytes=True))
            else:
                with os.fdopen(fd, "w") as fh:
                    json.dump(self.to_dict(), fh, default=str)
            os.replace(tmp, self.manifest_path)
        except BaseException:
            if os.path.exists(tmp):
                os.unlink(tmp)
            raise


def new_uuid() -> str:
    return _uuid.uuid4().hex


def list_datasets(root: str, prefix: str = "") -> list[str]:
    """Discover dataset uuids under a root by manifest suffix
    (reference ``api/discover.py:87-141``)."""
    if not os.path.isdir(root):
        return []
    out = []
    for name in os.listdir(root):
        if not name.startswith(prefix):
            continue
        if name.endswith(METADATA_SUFFIX_ZST):
            out.append(name[: -len(METADATA_SUFFIX_ZST)])
        elif name.endswith(METADATA_SUFFIX):
            out.append(name[: -len(METADATA_SUFFIX)])
    return sorted(out)
