"""Thin admin CLI (reference C13, ``kartothek/cli/__init__.py:56-130``) —
argparse-based (no third-party CLI dependency): info / stats / query /
index / copy / delete / gc over managed datasets and cubes.

Usage::

    python -m kartothek_spark.cli info   --root /data --dataset li
    python -m kartothek_spark.cli stats  --root /data --dataset li
    python -m kartothek_spark.cli query  --root /data --dataset li \
        --condition "l_suppkey == 5 & l_quantity > 25" --limit 20
    python -m kartothek_spark.cli index  --root /data --dataset li --columns l_suppkey
    python -m kartothek_spark.cli copy   --root /data --dataset li --target-root /backup
    python -m kartothek_spark.cli gc     --root /data --dataset li
    python -m kartothek_spark.cli delete --root /data --dataset li
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


def cmd_query(args) -> int:
    from kartothek_spark.core.conditions import parse_conjunction
    from kartothek_spark.dataset.read import read_table

    predicates = None
    if args.condition:
        predicates = parse_conjunction(args.condition).predicate
    df = read_table(_spark(), args.root, args.dataset, predicates=predicates,
                    columns=args.columns.split(",") if args.columns else None)
    df.show(args.limit, truncate=False)
    return 0


def cmd_index(args) -> int:
    from kartothek_spark.dataset.write import build_dataset_indices

    m = build_dataset_indices(_spark(), args.root, args.dataset, args.columns.split(","))
    print(json.dumps(sorted(m.indices)))
    return 0


def cmd_copy(args) -> int:
    from kartothek_spark.dataset.write import copy_dataset

    copy_dataset(args.root, args.dataset, args.target_root, args.target_uuid)
    return 0


def cmd_gc(args) -> int:
    from kartothek_spark.dataset.write import garbage_collect_dataset

    print(json.dumps(garbage_collect_dataset(args.root, args.dataset), indent=2))
    return 0


def cmd_delete(args) -> int:
    from kartothek_spark.dataset.write import delete_dataset

    delete_dataset(args.root, args.dataset)
    return 0


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="kartothek_spark.cli")
    sub = parser.add_subparsers(dest="cmd", required=True)
    for name, fn, extra in [
        ("info", cmd_info, []),
        ("stats", cmd_stats, []),
        ("query", cmd_query, ["condition", "columns", "limit"]),
        ("index", cmd_index, ["columns!"]),
        ("copy", cmd_copy, ["target-root!", "target-uuid"]),
        ("gc", cmd_gc, []),
        ("delete", cmd_delete, []),
    ]:
        p = sub.add_parser(name)
        p.add_argument("--root", required=True)
        p.add_argument("--dataset", required=(name != "info"))
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
