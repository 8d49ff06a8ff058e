"""Tests: condition-language shim, two-phase write, filter_indices,
copy_cube, CLI."""

import json

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F


def test_condition_builder_compiles_to_dnf():
    from kartothek_spark.core.conditions import C, parse_condition, parse_conjunction

    cond = (C("x") == 5) & (C("y") > 1.5) & C("s").isin(["a", "b"])
    assert cond.predicate == [[("x", "==", 5), ("y", ">", 1.5), ("s", "in", ["a", "b"])]]
    assert cond.columns == {"x", "y", "s"}

    iv = C("t").in_interval(10, 20)
    assert iv.predicate == [[("t", ">=", 10), ("t", "<", 20)]]

    hit, miss = ((C("x") == 1) & (C("y") == 2)).split_by_column({"x"})
    assert hit.predicate_part == [("x", "==", 1)] and miss.predicate_part == [("y", "==", 2)]

    assert parse_condition("x >= 3").predicate_part == [("x", ">=", 3)]
    assert parse_condition("s == 'abc'").predicate_part == [("s", "==", "abc")]
    assert parse_condition("f < 1.25").predicate_part == [("f", "<", 1.25)]
    assert parse_condition("b == true").predicate_part == [("b", "==", True)]
    assert parse_condition("s in ('a', 'b')").predicate_part == [("s", "in", ["a", "b"])]
    conj = parse_conjunction("x == 1 & y > 2")
    assert conj.predicate == [[("x", "==", 1), ("y", ">", 2)]]


def test_condition_filter_df(spark):
    from kartothek_spark.core.conditions import C

    df = spark.createDataFrame([Row(x=i, y=i * 10) for i in range(5)])
    got = ((C("x") >= 2) & (C("y") != 30)).filter_df(df)
    assert sorted(r.x for r in got.collect()) == [2, 4]


def test_two_phase_write(spark, tmp_root):
    from kartothek_spark.dataset.read import read_table
    from kartothek_spark.dataset.write import (
        commit_dataset,
        create_empty_dataset_header,
        write_single_partition,
    )

    df = spark.createDataFrame([Row(P=p, V=p * 1.5) for p in range(1, 4)])
    create_empty_dataset_header(spark, tmp_root, "ds", df.schema, partition_keys=["P"])
    # header alone: dataset readable, zero rows, full schema
    empty = read_table(spark, tmp_root, "ds")
    assert empty.count() == 0 and [f.name for f in empty.schema.fields] == ["P", "V"]

    new = write_single_partition(spark, df, tmp_root, "ds")
    assert len(new) == 3
    # files invisible before commit
    assert read_table(spark, tmp_root, "ds").count() == 0
    commit_dataset(spark, tmp_root, "ds", new, df.schema, partition_keys=["P"])
    assert read_table(spark, tmp_root, "ds").count() == 3


def test_filter_indices(spark, tmp_root):
    from kartothek_spark.core import index as ktk_index
    from kartothek_spark.core.manifest import DatasetManifest
    from kartothek_spark.dataset.write import store_dataframe_as_dataset

    df = spark.createDataFrame([Row(P=p, S=f"s{p % 2}") for p in range(4)])
    store_dataframe_as_dataset(spark, df, tmp_root, "ds", partition_on=["P"], secondary_indices=["S"])
    m = DatasetManifest.load(tmp_root, "ds")
    keep = [lbl for lbl in m.partitions if "P=0" in lbl or "P=1" in lbl]
    restricted = ktk_index.filter_indices(spark, m, "S", keep)
    vals = {r.value: sorted(r.partitions) for r in restricted.collect()}
    assert set(vals) == {"s0", "s1"}
    assert all(len(v) == 1 for v in vals.values())


def test_copy_cube(spark, tmp_root, tmp_path):
    from kartothek_spark.core.cube import Cube
    from kartothek_spark.cube.build import build_cube, copy_cube, discover_datasets
    from kartothek_spark.cube.query import query_cube

    cube = Cube(dimension_columns=("x",), partition_columns=("p",), uuid_prefix="cc",
                index_columns=frozenset())
    seed = spark.createDataFrame([Row(x=i, p=i % 2, v=i) for i in range(6)])
    build_cube(spark, {"seed": seed}, cube, tmp_root)
    target = str(tmp_path / "target")
    copied = copy_cube(cube, tmp_root, target, spark=spark)
    assert set(copied) == {"seed"}
    assert set(discover_datasets(cube, target)) == {"seed"}
    got = query_cube(spark, cube, target)
    assert got.count() == 6


def test_cli_info_stats_query(spark, tmp_root, capsys):
    from kartothek_spark import cli
    from kartothek_spark.dataset.write import store_dataframe_as_dataset

    df = spark.createDataFrame([Row(P=p, V=float(p)) for p in range(3)])
    store_dataframe_as_dataset(spark, df, tmp_root, "ds", partition_on=["P"])

    assert cli.main(["info", "--root", tmp_root]) == 0
    assert json.loads(capsys.readouterr().out) == ["ds"]

    assert cli.main(["info", "--root", tmp_root, "--dataset", "ds"]) == 0
    info = json.loads(capsys.readouterr().out)
    assert info["partition_keys"] == ["P"] and info["partitions"] == 3

    assert cli.main(["stats", "--root", tmp_root, "--dataset", "ds"]) == 0
    stats = json.loads(capsys.readouterr().out)
    assert stats["rows"] == 3

    assert cli.main([
        "query", "--root", tmp_root, "--dataset", "ds", "--condition", "P >= 1", "--limit", "5",
    ]) == 0
    out = capsys.readouterr().out
    assert "V" in out


def test_cli_shell_drives_dataset_lifecycle(spark, tmp_root, capsys):
    """The interactive shell: ls / use (with completion) / columns /
    query with an int-literal condition against a double column — the
    schema-aware coercion path."""
    import io

    from kartothek_spark import cli
    from kartothek_spark.dataset.write import store_dataframe_as_dataset

    df = spark.createDataFrame(
        [(1, 10.5, "x"), (2, 30.0, "y"), (3, 50.25, "y")], "K long, V double, P string"
    )
    store_dataframe_as_dataset(spark, df, tmp_root, "ds", partition_on=["P"])

    out = io.StringIO()
    sh = cli.KtkShell(tmp_root, stdout=out)
    sh.onecmd("ls")
    assert "ds" in out.getvalue()
    assert sh.complete_use("d", "use d", 4, 5) == ["ds"]
    sh.onecmd("use nope")
    assert "unknown dataset" in out.getvalue()
    sh.onecmd("use ds")
    sh.onecmd("columns")
    assert "V\tdouble" in out.getvalue()
    # int literal 30 against double column V must widen, not raise
    capsys.readouterr()
    sh.onecmd("query V > 30")
    shown = capsys.readouterr().out
    assert "50.25" in shown and "10.5" not in shown
    # bad condition keeps the shell alive and reports
    sh.onecmd("query V ~~ 3")
    assert sh.onecmd("quit") is True


def test_cli_query_coerces_int_literals_against_double_columns(spark, tmp_root, capsys):
    from kartothek_spark import cli
    from kartothek_spark.dataset.write import store_dataframe_as_dataset

    df = spark.createDataFrame([(1, 10.5), (2, 30.0)], "K long, V double")
    store_dataframe_as_dataset(spark, df, tmp_root, "ds")
    assert cli.main(["query", "--root", tmp_root, "--dataset", "ds",
                     "--condition", "V > 25", "--limit", "5"]) == 0
    assert "30.0" in capsys.readouterr().out


def test_cli_versions_and_as_of_query(spark, tmp_root, capsys):
    from kartothek_spark import cli
    from kartothek_spark.dataset.write import store_dataframe_as_dataset, update_dataset

    df = spark.createDataFrame([Row(P=p, V=float(p)) for p in range(3)])
    store_dataframe_as_dataset(
        spark, df, tmp_root, "ds", partition_on=["P"], keep_history=True
    )
    update_dataset(spark, None, tmp_root, "ds", delete_scope=[{"P": 0}])

    assert cli.main(["versions", "--root", tmp_root, "--dataset", "ds"]) == 0
    v = json.loads(capsys.readouterr().out)
    assert v == {"live": 2, "keep_history": True, "readable": [1, 2]}

    # as-of 1 still sees the dropped partition; live does not
    assert cli.main([
        "query", "--root", tmp_root, "--dataset", "ds",
        "--condition", "P == 0", "--as-of", "1",
    ]) == 0
    assert "0.0" in capsys.readouterr().out
    assert cli.main([
        "query", "--root", tmp_root, "--dataset", "ds", "--condition", "P == 0",
    ]) == 0
    assert "0.0" not in capsys.readouterr().out


def test_cli_admin_lifecycle_subcommands(spark, tmp_root, tmp_path, capsys):
    """compact / expire / attach / convert round out the admin surface."""
    from kartothek_spark import cli
    from kartothek_spark.core.manifest import DatasetManifest
    from kartothek_spark.dataset.write import store_dataframe_as_dataset, update_dataset

    df = spark.createDataFrame([Row(P=p % 2, V=float(p)) for p in range(20)])
    store_dataframe_as_dataset(
        spark, df, tmp_root, "ds", partition_on=["P"], keep_history=True
    )
    update_dataset(spark, df.limit(5), tmp_root, "ds")

    assert cli.main(["compact", "--root", tmp_root, "--dataset", "ds"]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["version"] == 3

    assert cli.main(["expire", "--root", tmp_root, "--dataset", "ds", "--keep-last", "1"]) == 0
    assert json.loads(capsys.readouterr().out) == [1, 2]

    raw = str(tmp_path / "raw")
    df.write.partitionBy("P").parquet(raw)
    assert cli.main(["attach", "--root", tmp_root, "--dataset", "ext", "--data-path", raw]) == 0
    info = json.loads(capsys.readouterr().out)
    assert info["partition_keys"] == ["P"] and info["partitions"] >= 2

    assert cli.main(["convert", "--root", tmp_root, "--dataset", "ext",
                     "--target-uuid", "managed"]) == 0
    conv = json.loads(capsys.readouterr().out)
    assert conv["format"] == "parquet"
    assert DatasetManifest.load(tmp_root, "managed").external_root is None


def test_package_api_and_temp_views(spark, tmp_root):
    import kartothek_spark as ks

    df = spark.createDataFrame([Row(P=p % 3, V=float(p)) for p in range(30)])
    ks.store_dataframe_as_dataset(spark, df, tmp_root, "alpha", partition_on=["P"])
    ks.store_dataframe_as_dataset(spark, df.where("P = 0"), tmp_root, "beta")
    views = ks.create_temp_views(spark, tmp_root, view_prefix="ktk_")
    assert views == ["ktk_alpha", "ktk_beta"]
    got = spark.sql(
        "SELECT count(*) AS n, sum(V) AS s FROM ktk_alpha WHERE P = 1"
    ).first()
    exp = df.where("P = 1")
    assert (got.n, got.s) == (exp.count(), exp.agg(F.sum("V")).first()[0])


def test_cli_cluster_zorder(spark, tmp_root, capsys):
    """`cluster` CLI: post-hoc z-order rewrite records stats columns and
    the dataset keeps serving exact content."""
    from kartothek_spark import cli
    from kartothek_spark.dataset.read import read_table
    from kartothek_spark.dataset.write import store_dataframe_as_dataset

    df = spark.createDataFrame(
        [Row(a=i, b=(i * 37) % 100, v=float(i)) for i in range(2000)]
    )
    spark.conf.set("spark.sql.files.maxRecordsPerFile", "200")
    try:
        store_dataframe_as_dataset(spark, df, tmp_root, "dz")
        assert cli.main([
            "cluster", "--root", tmp_root, "--dataset", "dz",
            "--zorder-by", "a,b",
        ]) == 0
    finally:
        spark.conf.unset("spark.sql.files.maxRecordsPerFile")
    out = json.loads(capsys.readouterr().out)
    assert out["stats_columns"] == ["a", "b"] and out["version"] == 2
    got = read_table(spark, tmp_root, "dz", predicates=[[("a", "<", 100), ("b", "<", 20)]])
    assert got.count() == df.where("a < 100 AND b < 20").count()


def test_cli_count(spark, tmp_root, capsys):
    from kartothek_spark import cli
    from kartothek_spark.dataset.write import store_dataframe_as_dataset

    df = spark.createDataFrame([Row(P=p % 2, V=float(p)) for p in range(10)])
    store_dataframe_as_dataset(
        spark, df, tmp_root, "dc", partition_on=["P"], stats_columns=["V"]
    )
    assert cli.main(["count", "--root", tmp_root, "--dataset", "dc"]) == 0
    assert json.loads(capsys.readouterr().out) == {"rows": 10}
    assert cli.main([
        "count", "--root", tmp_root, "--dataset", "dc", "--condition", "P == 1",
    ]) == 0
    assert json.loads(capsys.readouterr().out) == {"rows": 5}
