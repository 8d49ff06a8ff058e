"""Hidden (transform) partitioning — Iceberg-style partition transforms.

A dataset can be partitioned on a DERIVED value of a content column —
``day(ts)``, ``month(ts)``, ``truncate[w](s)`` — without the caller ever
writing, naming, or filtering the derived column: writers derive it
automatically, readers never see it, and predicates on the RAW column
prune the derived partitions (the planner widens each raw literal to the
partition level using the transform's monotonicity).

This is beyond the reference (which partitions only on verbatim column
values, ``io_components/metapartition.py`` ``partition_on``); semantics
follow Iceberg's hidden partitioning: the transform is part of the table
metadata, not the query.

Soundness of predicate widening: every supported transform ``T`` is
monotone non-decreasing (``a <= b ⇒ T(a) <= T(b)``), so

* ``src == v``   ⇒ rows live only in partition ``T(v)``
* ``src <  v`` / ``<=`` ⇒ only partitions ``<= T(v)`` can match
* ``src >  v`` / ``>=`` ⇒ only partitions ``>= T(v)``
* ``src in [v…]`` ⇒ only partitions ``in [T(v)…]``
* ``!=`` and null-matching literals widen to "all partitions" (skipped).

Widened literals are ADDED to the conjunction (never replace the raw
literal), so pruning stays a strict superset of the scan-time filter —
the same superset invariant the index path maintains.
"""

from __future__ import annotations

import datetime
from typing import Any, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_WIDEN_OPS = {"==": "==", "<": "<=", "<=": "<=", ">": ">=", ">=": ">=", "in": "in"}


def check_transform(fn: str) -> None:
    if fn in ("hour", "day", "month", "year"):
        return
    if fn.startswith("truncate:"):
        try:
            w = int(fn.split(":", 1)[1])
        except ValueError:
            w = 0
        if w >= 1:
            return
        raise ValueError(f"truncate width must be a positive int: {fn!r}")
    raise ValueError(
        f"unknown partition transform {fn!r} "
        f"(supported: hour, day, month, year, truncate:<w>)"
    )


def transform_column(fn: str, src: str) -> Column:
    """Spark expression computing a datelike derived partition value
    (truncate needs the source dtype — see ``_truncate_column``)."""
    if fn == "hour":
        return F.date_trunc("hour", F.col(src))
    if fn == "day":
        return F.to_date(F.col(src))
    if fn == "month":
        return F.trunc(F.col(src), "month")
    if fn == "year":
        return F.trunc(F.col(src), "year")
    raise ValueError(fn)


def _truncate_column(src: str, w: int, dt: T.DataType) -> Column:
    c = F.col(src)
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        # floor-to-bucket (works for negatives too: pmod keeps the floor)
        return (c - F.pmod(c, F.lit(w))).cast(dt)
    if isinstance(dt, T.StringType):
        return c.substr(1, w)
    raise ValueError(f"truncate transform needs an int or string source, got {dt}")


def derived_field(fn: str, src_field: T.StructField, name: str) -> T.StructField:
    """Schema field of the derived partition column."""
    if fn in ("hour", "day", "month", "year"):
        if not isinstance(src_field.dataType, (T.TimestampType, T.TimestampNTZType, T.DateType)):
            raise ValueError(
                f"transform {fn!r} needs a timestamp/date source, got {src_field.dataType}"
            )
        if fn == "hour":
            return T.StructField(name, src_field.dataType)
        return T.StructField(name, T.DateType())
    check_transform(fn)
    return T.StructField(name, src_field.dataType)


def apply_transforms(df: DataFrame, transforms: dict[str, dict[str, str]]) -> DataFrame:
    """Add the derived partition columns (idempotent: already-present
    derived columns are trusted — the engine itself wrote them)."""
    by_name = {f.name: f for f in df.schema.fields}
    for pcol, spec in transforms.items():
        if pcol in by_name:
            continue
        fn, src = spec["fn"], spec["src"]
        if src not in by_name:
            raise ValueError(f"transform source column {src!r} not in schema")
        if fn.startswith("truncate:"):
            w = int(fn.split(":", 1)[1])
            df = df.withColumn(pcol, _truncate_column(src, w, by_name[src].dataType))
        else:
            derived_field(fn, by_name[src], pcol)  # validates source type
            df = df.withColumn(pcol, transform_column(fn, src))
    return df


def transform_value_py(fn: str, v: Any) -> Any:
    """Driver-side twin of :func:`transform_column` for literal widening."""
    if fn == "hour":
        if isinstance(v, datetime.datetime):
            return v.replace(minute=0, second=0, microsecond=0)
        return datetime.datetime(v.year, v.month, v.day)
    if fn == "day":
        if isinstance(v, datetime.datetime):
            return v.date()
        return v
    if fn == "month":
        d = v.date() if isinstance(v, datetime.datetime) else v
        return d.replace(day=1)
    if fn == "year":
        d = v.date() if isinstance(v, datetime.datetime) else v
        return d.replace(month=1, day=1)
    if fn.startswith("truncate:"):
        w = int(fn.split(":", 1)[1])
        if isinstance(v, bool):
            raise ValueError("truncate transform does not apply to booleans")
        if isinstance(v, int):
            return v - (v % w)
        if isinstance(v, str):
            return v[:w]
        raise ValueError(f"truncate transform literal must be int or str, got {type(v)}")
    raise ValueError(fn)


def widen_conjunction(
    conj: Sequence[tuple[str, str, Any]], transforms: dict[str, dict[str, str]]
) -> list[tuple[str, str, Any]]:
    """Partition-level literals implied by the conjunction's raw-column
    literals (sound: monotone transforms, widened ops, additive)."""
    by_src: dict[str, list[tuple[str, str]]] = {}
    for pcol, spec in transforms.items():
        by_src.setdefault(spec["src"], []).append((pcol, spec["fn"]))
    extra: list[tuple[str, str, Any]] = []
    for col, op, value in conj:
        if col not in by_src or op not in _WIDEN_OPS:
            continue
        if value is None or (op == "in" and any(v is None for v in value)):
            continue
        for pcol, fn in by_src[col]:
            if op == "in":
                extra.append((pcol, "in", [transform_value_py(fn, v) for v in value]))
            else:
                extra.append((pcol, _WIDEN_OPS[op], transform_value_py(fn, value)))
    return extra


__all__ = [
    "apply_transforms",
    "check_transform",
    "derived_field",
    "transform_value_py",
    "widen_conjunction",
]
