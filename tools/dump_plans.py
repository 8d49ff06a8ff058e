"""Dump .explain("formatted") for named queries to files.

Usage:
    SPARK_GRAFT_SF_DIR=... python tools/dump_plans.py OUTDIR SUFFIX q1 q2 ...

Writes OUTDIR/<query>_<SUFFIX>.txt for each query. Run from the repo
whose plans you want (works from a git worktree of an older commit for
"before" captures). Diagnostic only; not part of the bench contract.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    outdir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(outdir, exist_ok=True)
    from kartothek_spark.session import get_spark
    import __spark_entry__ as entrymod
    from pyspark.sql import DataFrame

    # identity-patch localCheckpoint so eager-checkpointing operators
    # expose their FULL operator plan instead of a `Scan ExistingRDD`
    # stub (the checkpoint hides everything upstream from explain());
    # noted in each file header so readers know the production plan
    # consumes the checkpointed RDD at that point. PySpark 4 instantiates
    # the classic subclass, which overrides the base method — patch both.
    DataFrame.localCheckpoint = lambda self, eager=True: self
    try:
        from pyspark.sql.classic.dataframe import DataFrame as _CDF

        _CDF.localCheckpoint = lambda self, eager=True: self
    except ImportError:
        pass

    spark = get_spark("kartothek_spark_plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(
                "-- localCheckpoint identity-patched for plan visibility "
                "(production plans cut lineage at each checkpoint)\n"
            )
            fh.write(buf.getvalue())
        print(f"wrote {name}_{suffix}.txt", file=sys.stderr)


if __name__ == "__main__":
    main()
