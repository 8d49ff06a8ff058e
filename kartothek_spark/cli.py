"""Thin admin CLI (reference C13, ``kartothek/cli/__init__.py:56-130``) —
argparse-based (no third-party CLI dependency): info / stats / query /
index / copy / delete / gc over managed datasets and cubes.

Usage::

    python -m kartothek_spark.cli info   --root /data --dataset li
    python -m kartothek_spark.cli stats  --root /data --dataset li
    python -m kartothek_spark.cli query  --root /data --dataset li \
        --condition "l_suppkey == 5 & l_quantity > 25" --limit 20
    python -m kartothek_spark.cli query  --root /data --dataset li --as-of 3
    python -m kartothek_spark.cli versions --root /data --dataset li
    python -m kartothek_spark.cli index  --root /data --dataset li --columns l_suppkey
    python -m kartothek_spark.cli copy   --root /data --dataset li --target-root /backup
    python -m kartothek_spark.cli gc     --root /data --dataset li
    python -m kartothek_spark.cli delete --root /data --dataset li
    python -m kartothek_spark.cli shell  --root /data   # interactive, tab-completed
"""

from __future__ import annotations

import argparse
import json
import sys


def _spark():
    from kartothek_spark.session import get_spark

    return get_spark("kartothek_spark_cli")


def cmd_info(args) -> int:
    from kartothek_spark.core.manifest import DatasetManifest, list_datasets

    if not args.dataset:
        print(json.dumps(list_datasets(args.root), indent=2))
        return 0
    m = DatasetManifest.load(args.root, args.dataset)
    print(json.dumps({
        "dataset_uuid": m.dataset_uuid,
        "format": m.table_format,
        "partition_keys": m.partition_keys,
        "partitions": len(m.partitions),
        "indices": sorted(m.indices),
        "columns": {f.name: f.dataType.simpleString() for f in m.schema.fields},
        "metadata": m.metadata,
    }, indent=2))
    return 0


def cmd_stats(args) -> int:
    from kartothek_spark.dataset.metadata import collect_stats

    print(json.dumps(collect_stats(_spark(), args.root, args.dataset), indent=2))
    return 0


def _coerce_predicates(predicates, manifest):
    """Widen parsed int literals against float/double columns: a CLI
    string like ``l_quantity > 25`` parses as int, but the engine's
    type-stability guard (rightly) rejects int-vs-double — the CLI is the
    one place literals arrive untyped, so it consults the schema
    (reference behavior: cli/_query.py prompts retype on mismatch)."""
    from pyspark.sql import types as T

    floaty = {
        f.name for f in manifest.schema.fields if isinstance(f.dataType, (T.FloatType, T.DoubleType))
    }

    def fix(val):
        if isinstance(val, bool):
            return val
        if isinstance(val, int):
            return float(val)
        if isinstance(val, list):
            return [fix(v) for v in val]
        return val

    return [
        [(col, op, fix(val) if col in floaty else val) for col, op, val in conj]
        for conj in predicates
    ]


def cmd_query(args) -> int:
    from kartothek_spark.core.conditions import parse_conjunction
    from kartothek_spark.core.manifest import DatasetManifest
    from kartothek_spark.dataset.read import read_table

    as_of = int(args.as_of) if getattr(args, "as_of", None) else None
    predicates = None
    if args.condition:
        predicates = parse_conjunction(args.condition).predicate
        m = DatasetManifest.load(args.root, args.dataset, version=as_of)
        predicates = _coerce_predicates(predicates, m)
    df = read_table(_spark(), args.root, args.dataset, predicates=predicates,
                    columns=args.columns.split(",") if args.columns else None,
                    as_of=as_of)
    df.show(args.limit, truncate=False)
    return 0


def cmd_count(args) -> int:
    """COUNT(*), metadata-only when the dataset records row counts and
    the condition touches only partition keys (zero Spark jobs)."""
    from kartothek_spark.core.conditions import parse_conjunction
    from kartothek_spark.core.manifest import DatasetManifest
    from kartothek_spark.dataset.read import count_rows

    predicates = None
    if args.condition:
        predicates = parse_conjunction(args.condition).predicate
        m = DatasetManifest.load(args.root, args.dataset)
        predicates = _coerce_predicates(predicates, m)
    n = count_rows(_spark(), args.root, args.dataset, predicates=predicates)
    print(json.dumps({"rows": n}))
    return 0


def cmd_versions(args) -> int:
    from kartothek_spark.core.manifest import DatasetManifest

    live = DatasetManifest.load(args.root, args.dataset)
    print(json.dumps({
        "live": live.version,
        "keep_history": live.keep_history,
        "readable": DatasetManifest.list_versions(args.root, args.dataset),
    }, indent=2))
    return 0


def cmd_index(args) -> int:
    from kartothek_spark.dataset.write import build_dataset_indices

    m = build_dataset_indices(_spark(), args.root, args.dataset, args.columns.split(","))
    print(json.dumps(sorted(m.indices)))
    return 0


def cmd_copy(args) -> int:
    from kartothek_spark.dataset.write import copy_dataset

    # pass the session so the file copy runs as a distributed job
    copy_dataset(args.root, args.dataset, args.target_root, args.target_uuid, spark=_spark())
    return 0


def cmd_compact(args) -> int:
    from kartothek_spark.dataset.write import compact_dataset

    m = compact_dataset(_spark(), args.root, args.dataset)
    print(json.dumps({"partitions": len(m.partitions), "version": m.version}))
    return 0


def cmd_cluster(args) -> int:
    """OPTIMIZE ZORDER: rewrite the dataset into a z-order layout on the
    given columns so later range conjunctions prune files via stats."""
    from kartothek_spark.dataset.write import cluster_dataset

    cols = [c.strip() for c in args.zorder_by.split(",") if c.strip()]
    m = cluster_dataset(_spark(), args.root, args.dataset, zorder_by=cols)
    print(json.dumps({
        "partitions": len(m.partitions),
        "version": m.version,
        "stats_columns": m.stats_columns,
    }))
    return 0


def cmd_expire(args) -> int:
    from kartothek_spark.dataset.write import expire_snapshots

    print(json.dumps(expire_snapshots(args.root, args.dataset,
                                      keep_last=int(args.keep_last))))
    return 0


def cmd_attach(args) -> int:
    from kartothek_spark.dataset.write import attach_dataset

    m = attach_dataset(_spark(), args.root, args.dataset, args.data_path)
    print(json.dumps({
        "dataset_uuid": m.dataset_uuid,
        "external_root": m.external_root,
        "partition_keys": m.partition_keys,
        "partitions": len(m.partitions),
    }, indent=2))
    return 0


def cmd_import_kartothek(args) -> int:
    """Zero-copy import of a reference-written (kartothek metadata-v4)
    dataset — the one-command migration path."""
    from kartothek_spark.dataset.interop import import_kartothek_dataset

    m = import_kartothek_dataset(
        _spark(), args.root, args.dataset, args.source_root,
        source_uuid=args.source_uuid, table=args.table,
    )
    print(json.dumps({
        "dataset_uuid": m.dataset_uuid,
        "imported_from": m.metadata.get("imported_from"),
        "partition_keys": m.partition_keys,
        "partitions": len(m.partitions),
        "indices": sorted(m.indices),
    }, indent=2))
    return 0


def cmd_export_kartothek(args) -> int:
    """Write a reference-readable legacy view (metadata + symlinked
    payload) of an engine dataset under --target-root."""
    from kartothek_spark.dataset.interop import export_kartothek_metadata

    path = export_kartothek_metadata(args.root, args.dataset, args.target_root)
    print(json.dumps({"metadata": path}))
    return 0


def cmd_convert(args) -> int:
    from kartothek_spark.dataset.write import convert_dataset

    m = convert_dataset(_spark(), args.root, args.dataset, args.target_uuid,
                        table_format=args.format or "parquet")
    print(json.dumps({"dataset_uuid": m.dataset_uuid, "format": m.table_format,
                      "partitions": len(m.partitions)}))
    return 0


def cmd_check(args) -> int:
    """Dataset integrity check (manifest <-> storage fsck): missing
    payload files, stale/unreadable indices, transform sources, history."""
    from kartothek_spark.dataset.metadata import verify_dataset

    report = verify_dataset(args.root, args.dataset)
    print(json.dumps(report))
    return 0 if report["ok"] else 1


def cmd_gc(args) -> int:
    from kartothek_spark.dataset.write import garbage_collect_dataset

    print(json.dumps(garbage_collect_dataset(args.root, args.dataset), indent=2))
    return 0


def cmd_delete(args) -> int:
    from kartothek_spark.dataset.write import delete_dataset

    delete_dataset(args.root, args.dataset)
    return 0


class KtkShell(__import__("cmd").Cmd):
    """Interactive admin shell (reference's click-based shell with
    completion, cli/_query.py:24-70, re-expressed on stdlib ``cmd`` /
    readline): tab-completes commands and dataset names, holds a current
    dataset, and reuses the one SparkSession across commands — the
    interactive win over one-shot subcommands is not paying session
    startup per query."""

    prompt = "ktk> "
    intro = "kartothek_spark shell — 'ls' datasets, 'use <ds>', 'query <cond>'; 'help' for all."

    def __init__(self, root: str, stdout=None):
        super().__init__(stdout=stdout)
        self.root = root
        self.dataset: str | None = None
        self.limit = 20

    # -- helpers ----------------------------------------------------------
    def _datasets(self) -> list[str]:
        from kartothek_spark.core.manifest import list_datasets

        return list_datasets(self.root)

    def _need_dataset(self) -> bool:
        if not self.dataset:
            print("no dataset selected — 'use <dataset>' first", file=self.stdout)
            return True
        return False

    def _args(self, **kw) -> argparse.Namespace:
        return argparse.Namespace(root=self.root, dataset=self.dataset, **kw)

    # -- commands ---------------------------------------------------------
    def do_ls(self, arg):
        """List datasets under the root."""
        for name in self._datasets():
            print(name, file=self.stdout)

    def do_use(self, arg):
        """use <dataset> — select the current dataset (tab-completes)."""
        name = arg.strip()
        if name not in self._datasets():
            print(f"unknown dataset: {name!r}", file=self.stdout)
            return
        self.dataset = name

    def complete_use(self, text, line, begidx, endidx):
        return [d for d in self._datasets() if d.startswith(text)]

    def do_info(self, arg):
        """Manifest summary of the current dataset."""
        if not self._need_dataset():
            cmd_info(self._args())

    def do_columns(self, arg):
        """Schema of the current dataset."""
        if self._need_dataset():
            return
        from kartothek_spark.core.manifest import DatasetManifest

        m = DatasetManifest.load(self.root, self.dataset)
        for f in m.schema.fields:
            print(f"{f.name}\t{f.dataType.simpleString()}", file=self.stdout)

    def do_stats(self, arg):
        """Distributed per-partition stats of the current dataset."""
        if not self._need_dataset():
            cmd_stats(self._args())

    def do_limit(self, arg):
        """limit <n> — rows shown by 'query' (default 20)."""
        try:
            self.limit = int(arg.strip())
        except ValueError:
            print("usage: limit <n>", file=self.stdout)

    def do_query(self, arg):
        """query [condition] — pruned read of the current dataset,
        e.g.: query l_returnflag == "A" & l_quantity > 25"""
        if self._need_dataset():
            return
        try:
            cmd_query(self._args(condition=arg.strip() or None, columns=None, limit=self.limit))
        except Exception as e:  # keep the shell alive on bad conditions
            print(f"error: {type(e).__name__}: {e}", file=self.stdout)

    def do_quit(self, arg):
        """Exit the shell."""
        return True

    do_EOF = do_quit


def cmd_shell(args) -> int:
    KtkShell(args.root).cmdloop()
    return 0


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="kartothek_spark.cli")
    sub = parser.add_subparsers(dest="cmd", required=True)
    for name, fn, extra in [
        ("info", cmd_info, []),
        ("stats", cmd_stats, []),
        ("query", cmd_query, ["condition", "columns", "limit", "as-of"]),
        ("count", cmd_count, ["condition"]),
        ("versions", cmd_versions, []),
        ("index", cmd_index, ["columns!"]),
        ("copy", cmd_copy, ["target-root!", "target-uuid"]),
        ("compact", cmd_compact, []),
        ("cluster", cmd_cluster, ["zorder-by!"]),
        ("expire", cmd_expire, ["keep-last!"]),
        ("attach", cmd_attach, ["data-path!"]),
        ("import-kartothek", cmd_import_kartothek, ["source-root!", "source-uuid", "table"]),
        ("export-kartothek", cmd_export_kartothek, ["target-root!"]),
        ("convert", cmd_convert, ["target-uuid!", "format"]),
        ("check", cmd_check, []),
        ("gc", cmd_gc, []),
        ("delete", cmd_delete, []),
        ("shell", cmd_shell, []),
    ]:
        p = sub.add_parser(name)
        p.add_argument("--root", required=True)
        p.add_argument("--dataset", required=(name not in ("info", "shell")))
        for opt in extra:
            required = opt.endswith("!")
            opt = opt.rstrip("!")
            if opt == "limit":
                p.add_argument("--limit", type=int, default=20)
            else:
                p.add_argument(f"--{opt}", required=required, default=None)
        p.set_defaults(fn=fn)
    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
