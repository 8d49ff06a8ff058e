"""Schema normalization and strict compatibility checks.

Re-expresses the reference's type system (survey §1.2;
``kartothek/core/common_metadata.py:286-331`` and
``docs/spec/type_system.rst`` in /root/reference) over Spark SQL types:

* int8..64 → LongType, float16/32/64 → DoubleType (uint maps to LongType
  too — Spark has no unsigned types; values > 2^63-1 are rejected at write)
* list[T] → ArrayType(norm(T)) recursively; structs normalized field-wise
* NullType columns are ignored during compatibility checks
* int vs float, bool vs int, string vs binary are *incompatible* classes —
  stricter than Spark's ``mergeSchema``, which we intentionally do not use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T


_INTEGRAL = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
_FRACTIONAL = (T.FloatType, T.DoubleType)


def normalize_type(dt: T.DataType) -> T.DataType:
    if isinstance(dt, _INTEGRAL):
        return T.LongType()
    if isinstance(dt, _FRACTIONAL):
        return T.DoubleType()
    if isinstance(dt, T.TimestampType):
        return T.TimestampType()  # Spark timestamps are µs natively — matches the reference's us coercion
    # nested nullability is normalized AWAY (containsNull/valueContainsNull
    # → true): parquet round-trips do not preserve it, so a manifest that
    # recorded a non-null element type would fail the read-back cast of the
    # exact data it described (observed with expression-derived arrays,
    # whose containsNull=false survives to the manifest but not to disk).
    # Same philosophy as the reference's width normalization: nullability
    # is an encoding detail, not part of the logical type.
    if isinstance(dt, T.ArrayType):
        return T.ArrayType(normalize_type(dt.elementType), True)
    if isinstance(dt, T.MapType):
        return T.MapType(normalize_type(dt.keyType), normalize_type(dt.valueType), True)
    if isinstance(dt, T.StructType):
        return T.StructType(
            [T.StructField(f.name, normalize_type(f.dataType), True) for f in dt.fields]
        )
    return dt


def normalize_schema(schema: T.StructType) -> T.StructType:
    return T.StructType(
        [T.StructField(f.name, normalize_type(f.dataType), True) for f in schema.fields]
    )


def normalize_dataframe(df: DataFrame) -> DataFrame:
    """Cast a DataFrame to its normalized schema (no-op columns stay as-is)."""
    out = []
    changed = False
    for f in df.schema.fields:
        norm = normalize_type(f.dataType)
        if norm != f.dataType:
            out.append(df[f.name].cast(norm).alias(f.name))
            changed = True
        else:
            out.append(df[f.name])
    return df.select(*out) if changed else df


def _type_class(dt: T.DataType) -> str:
    """Coarse compatibility class — cross-class comparisons are rejected
    (reference: docs/spec/type_system.rst:296-399)."""
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, _INTEGRAL):
        return "int"
    if isinstance(dt, _FRACTIONAL):
        return "float"
    if isinstance(dt, T.DecimalType):
        return "decimal"
    if isinstance(dt, T.StringType):
        return "string"
    if isinstance(dt, T.BinaryType):
        return "binary"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return "timestamp"
    if isinstance(dt, T.NullType):
        return "null"
    return dt.simpleString()


class SchemaIncompatible(ValueError):
    pass


def validate_compatible(schemas: list[T.StructType]) -> T.StructType:
    """All normalized schemas must be identical, modulo NullType columns
    (all-None columns carry no type information — reference
    ``common_metadata.py:586-671``). Returns the reference schema with
    NullType holes filled from peers where possible."""
    if not schemas:
        raise SchemaIncompatible("no schemas given")
    normed = [normalize_schema(s) for s in schemas]
    # establish the union view: every column name → first non-null type seen
    ref_fields: dict[str, T.DataType] = {}
    order: list[str] = []
    for s in normed:
        for f in s.fields:
            if f.name not in ref_fields:
                order.append(f.name)
                ref_fields[f.name] = f.dataType
            elif isinstance(ref_fields[f.name], T.NullType):
                ref_fields[f.name] = f.dataType
    for s in normed:
        names = [f.name for f in s.fields]
        if sorted(names) != sorted(order):
            raise SchemaIncompatible(
                f"column sets differ: {sorted(names)} vs {sorted(order)}"
            )
        for f in s.fields:
            ref = ref_fields[f.name]
            if isinstance(f.dataType, T.NullType) or isinstance(ref, T.NullType):
                continue
            if f.dataType != ref:
                raise SchemaIncompatible(
                    f"column {f.name!r}: {f.dataType.simpleString()} vs "
                    f"{ref.simpleString()} (normalized types must match exactly)"
                )
    return T.StructType([T.StructField(n, ref_fields[n], True) for n in order])


def evolve_schema(old: T.StructType, new: T.StructType) -> T.StructType:
    """Merge an incoming schema into a dataset schema (opt-in schema
    evolution; Delta ``mergeSchema``-style, stricter typing): columns
    present in both must match exactly after normalization (int widths /
    float widths already collapse — that IS the supported widening);
    columns only in ``old`` are kept (new files simply lack them and read
    as NULL); columns only in ``new`` are appended nullable. Cross-class
    changes (int vs float, string vs binary, ...) raise
    :class:`SchemaIncompatible` — silent lossy casts are how a 100 TB
    dataset rots."""
    old_n, new_n = normalize_schema(old), normalize_schema(new)
    by_name = {f.name: f.dataType for f in old_n.fields}
    out = list(old_n.fields)
    for f in new_n.fields:
        ref = by_name.get(f.name)
        if ref is None:
            out.append(T.StructField(f.name, f.dataType, True))
        elif isinstance(ref, T.NullType) and not isinstance(f.dataType, T.NullType):
            out[[x.name for x in out].index(f.name)] = T.StructField(f.name, f.dataType, True)
        elif not isinstance(f.dataType, T.NullType) and f.dataType != ref:
            raise SchemaIncompatible(
                f"column {f.name!r}: cannot evolve {ref.simpleString()} -> "
                f"{f.dataType.simpleString()} (only adding columns and "
                "int/float width widening are supported)"
            )
    return T.StructType(out)


def validate_predicate_literal(col_type: T.DataType, value) -> None:
    """Strict predicate-literal type check (reference
    ``serialization/_generic.py:353-418``): reject comparisons whose literal
    type class differs from the column's class before Catalyst's permissive
    implicit casts can hide the error."""
    import datetime

    cls = _type_class(normalize_type(col_type))
    ok: bool
    if isinstance(value, bool):  # bool is a subclass of int — check first
        ok = cls == "bool"
    elif isinstance(value, int):
        ok = cls == "int"
    elif isinstance(value, float):
        ok = cls == "float"
    elif isinstance(value, str):
        ok = cls in ("string", "date", "timestamp")  # ISO strings allowed for datelike
    elif isinstance(value, bytes):
        ok = cls == "binary"
    elif isinstance(value, datetime.datetime):
        ok = cls == "timestamp"
    elif isinstance(value, datetime.date):
        ok = cls == "date"
    elif value is None:
        ok = True
    else:
        ok = True  # unknown python type: defer to Spark
    if not ok:
        raise TypeError(
            f"predicate literal {value!r} ({type(value).__name__}) is not "
            f"type-stable against column class {cls!r}"
        )
