"""Local replica of the driver's correctness gate: run each queries()
entry on Spark and its oracle_sql() on DuckDB over the same sf dir,
compare row count, column names, and order-insensitive values.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.10g}"
    if isinstance(v, list):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def frame_to_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    from kartothek_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark("check_oracles", 8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols, sdata = frame_to_rows(sdf.columns, [tuple(r) for r in srows])
        except Exception as e:
            print(f"FAIL {name}: spark error: {type(e).__name__}: {str(e)[:200]}")
            failures += 1
            continue
        if name not in oracles:
            print(f"OK?  {name}: rows-only ({len(sdata)} rows) — no oracle")
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
            dcols, ddata = frame_to_rows(dcols, drows)
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {type(e).__name__}: {str(e)[:200]}")
            failures += 1
            continue
        if scols != dcols:
            print(f"FAIL {name}: columns {scols} vs {dcols}")
            failures += 1
        elif len(sdata) != len(ddata):
            print(f"FAIL {name}: rowcount {len(sdata)} vs {len(ddata)}")
            failures += 1
        elif sdata != ddata:
            diff = [i for i, (a, b) in enumerate(zip(sdata, ddata)) if a != b][:3]
            print(f"FAIL {name}: values differ; first diffs at {diff}:")
            for i in diff:
                print(f"   spark: {sdata[i]}")
                print(f"   duck : {ddata[i]}")
            failures += 1
        else:
            print(f"PASS {name}: {len(sdata)} rows")
    print(f"\n{'ALL PASS' if failures == 0 else f'{failures} FAILURES'}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
