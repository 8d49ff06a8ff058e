"""Local replica of the driver's correctness gate: run each queries()
entry on Spark and its oracle_sql() on DuckDB over the same sf dir,
compare row count, column names, and order-insensitive values.

Mirrors the driver's canonicalization as closely as we can infer it:
both sides become pandas DataFrames (``toPandas()`` / ``.df()``), columns
are sorted by name, rows are sorted by all columns (this CRASHES on
array-valued columns, as the driver does), and cell values are rendered
dtype-strictly — ``int64 5`` != ``float64 5.0`` — with full-precision
float repr so ULP-level differences fail here before they fail the gate.
(DuckDB quirk this catches: ``sum(BIGINT)`` returns HUGEINT, which
``.df()`` converts to float64 — cast sums in oracle SQL.)

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    """Dtype-strict rendering: ints and floats must NOT collide."""
    if v is None:
        return "NULL"
    if isinstance(v, (np.floating, float)):
        f = float(v)
        if math.isnan(f):
            return "NaN"
        return repr(f)  # shortest round-trip repr — bit-exact comparison
    if isinstance(v, (np.integer, int)) and not isinstance(v, bool):
        return repr(int(v))
    if isinstance(v, pd.Timestamp):
        if pd.isna(v):
            return "NULL"
        return v.isoformat()
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, (list, np.ndarray)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    if v is pd.NaT:
        return "NULL"
    try:
        if pd.isna(v):
            return "NULL"
    except (TypeError, ValueError):
        pass
    return str(v)


def canon(pdf: pd.DataFrame):
    """Driver-style canonicalization: sort columns by name, sort rows by
    every column (raises on unhashable cells, like the driver), then render
    each cell dtype-strictly."""
    pdf = pdf[sorted(pdf.columns)]
    if len(pdf):
        pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort").reset_index(drop=True)
    rows = [tuple(norm_cell(v) for v in row) for row in pdf.itertuples(index=False, name=None)]
    return list(pdf.columns), rows


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
            spdf = sdf.toPandas()
            scols, sdata = canon(spdf)
        except Exception as e:
            print(f"FAIL {name}: spark/canon error: {type(e).__name__}: {str(e)[:200]}")
            failures += 1
            continue
        if name not in oracles:
            print(f"OK?  {name}: rows-only ({len(sdata)} rows) — no oracle")
            continue
        try:
            dpdf = con.execute(oracles[name]).df()
            dcols, ddata = canon(dpdf)
        except Exception as e:
            print(f"FAIL {name}: duckdb/canon error: {type(e).__name__}: {str(e)[:200]}")
            failures += 1
            continue
        # rows are sorted by raw values; compare as multisets of rendered rows
        sdata_s, ddata_s = sorted(sdata), sorted(ddata)
        if scols != dcols:
            print(f"FAIL {name}: columns {scols} vs {dcols}")
            failures += 1
        elif len(sdata) != len(ddata):
            print(f"FAIL {name}: rowcount {len(sdata)} vs {len(ddata)}")
            failures += 1
        elif sdata_s != ddata_s:
            diff = [i for i, (a, b) in enumerate(zip(sdata_s, ddata_s)) if a != b][:3]
            print(f"FAIL {name}: values differ; first diffs at {diff}:")
            for i in diff:
                print(f"   spark: {sdata_s[i]}")
                print(f"   duck : {ddata_s[i]}")
            failures += 1
        else:
            print(f"PASS {name}: {len(sdata)} rows")
    print(f"\n{'ALL PASS' if failures == 0 else f'{failures} FAILURES'}")
    # clean teardown: any stream still active (a gate that failed between
    # start and drain) would die WITH the SparkSession and print a
    # spurious StreamExecution stack trace at interpreter exit; stop
    # streams first, then the session, so the sweep log ends clean
    try:
        for q in spark.streams.active:
            q.stop()
        spark.stop()
    except Exception:
        pass
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
