"""DNF predicate mini-language.

``predicates = [conjunction, ...]``, ``conjunction = [(col, op, value), ...]``
with ops ``== != <= >= < > in`` and null-aware ``==/!=/in`` — behavioral
parity with the reference predicate engine
(``kartothek/serialization/_generic.py:29-34,169-213,274-314`` in
/root/reference). Compilation target is a ``pyspark.sql.Column``, so
Catalyst performs row-group pruning and residual filtering natively; the
same DNF is also evaluated driver/planner-side against partition values and
secondary index tables for file pruning.
"""

from __future__ import annotations

import operator
from functools import reduce
from typing import Any, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

PredicateTuple = tuple  # (col, op, value)
Conjunction = Sequence[PredicateTuple]
Predicates = Sequence[Conjunction]

_OPS = {"==", "!=", "<=", ">=", "<", ">", "in"}

_PY_OPS = {
    "==": operator.eq,
    "!=": operator.ne,
    "<=": operator.le,
    ">=": operator.ge,
    "<": operator.lt,
    ">": operator.gt,
}


class MalformedPredicates(ValueError):
    pass


def check_predicates(predicates: Predicates | None) -> None:
    """DNF well-formedness (reference ``_generic.py:169-213``)."""
    if predicates is None:
        return
    if len(predicates) == 0:
        raise MalformedPredicates("empty predicate list (no conjunctions)")
    for conj in predicates:
        if len(conj) == 0:
            raise MalformedPredicates("empty conjunction")
        for lit in conj:
            if len(lit) != 3:
                raise MalformedPredicates(f"literal must be (col, op, value): {lit!r}")
            col, op, value = lit
            if not isinstance(col, str):
                raise MalformedPredicates(f"column must be str: {col!r}")
            if op not in _OPS:
                raise MalformedPredicates(f"unknown op {op!r}")
            if op == "in" and not isinstance(value, (list, tuple, set, frozenset)):
                raise MalformedPredicates(f"'in' needs a list-like value: {value!r}")


def columns_in_predicates(predicates: Predicates | None) -> set[str]:
    if predicates is None:
        return set()
    return {lit[0] for conj in predicates for lit in conj}


def filter_predicates_by_column(
    predicates: Predicates | None, columns: Sequence[str]
) -> Predicates | None:
    """Project the DNF onto a column subset for index-only evaluation
    (reference ``_generic.py:216-251``). Conjunctions that lose all their
    literals are dropped; an empty result means no pruning possible."""
    if predicates is None:
        return None
    cols = set(columns)
    out = []
    for conj in predicates:
        kept = [lit for lit in conj if lit[0] in cols]
        if kept:
            out.append(kept)
    return out or None


def split_predicates(
    predicates: Predicates | None, split_cols: Sequence[str]
) -> tuple[Predicates | None, Predicates | None]:
    """Split each conjunction into (on split_cols, remainder) — the
    partition-key vs content split (reference ``metapartition.py:642-662``)."""
    if predicates is None:
        return None, None
    cols = set(split_cols)
    key_part, rest_part = [], []
    for conj in predicates:
        key_part.append([lit for lit in conj if lit[0] in cols])
        rest_part.append([lit for lit in conj if lit[0] not in cols])
    return key_part, rest_part


def _literal_to_column(col: str, op: str, value: Any) -> Column:
    c = F.col(col)
    if op == "in":
        vals = list(value)
        if any(v is None for v in vals):
            nonnull = [v for v in vals if v is not None]
            cond = c.isNull()
            if nonnull:
                cond = cond | c.isin(nonnull)
            return cond
        if not vals:
            return F.lit(False)
        return c.isin(vals)
    if op == "==":
        return c.eqNullSafe(F.lit(value)) if value is None else (c == F.lit(value))
    if op == "!=":
        return ~c.eqNullSafe(F.lit(value)) if value is None else (c != F.lit(value))
    if op == "<=":
        return c <= F.lit(value)
    if op == ">=":
        return c >= F.lit(value)
    if op == "<":
        return c < F.lit(value)
    if op == ">":
        return c > F.lit(value)
    raise MalformedPredicates(f"unknown op {op!r}")


def predicates_to_column(predicates: Predicates) -> Column:
    """Compile DNF → one Spark Column: OR over conjunctions of ANDed
    literals. Catalyst pushes the result to the parquet scan."""
    conj_cols = []
    for conj in predicates:
        conj_cols.append(reduce(operator.and_, (_literal_to_column(*lit) for lit in conj)))
    return reduce(operator.or_, conj_cols)


def _coerce_literal(value: Any, dt: T.DataType) -> Any:
    """Schema-aware literal normalization (reference
    ``serialization/_generic.py`` ``_handle_timelike_values`` +
    ``_ensure_type_stability``): ISO strings become typed date/datetime
    against datelike columns, ints widen to float against float columns.
    Exact coercions only — anything else is returned unchanged and left to
    the strict type validator."""
    import datetime

    if isinstance(value, bool):
        return value
    if isinstance(value, str):
        if isinstance(dt, T.DateType):
            return datetime.date.fromisoformat(value)
        if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
            return datetime.datetime.fromisoformat(value.replace(" ", "T"))
    if isinstance(value, int) and isinstance(dt, (T.FloatType, T.DoubleType)):
        return float(value)
    return value


def coerce_predicate_literals(
    predicates: Predicates | None, schema: T.StructType
) -> Predicates | None:
    """Normalize every literal in the DNF against the schema so that both
    the driver-side planner evaluation (``evaluate_predicates_py`` over
    typed partition values) and the Catalyst pushdown see typed literals.
    Without this, a string literal like ``"2020-01-01"`` on a
    date-partitioned column silently matches nothing driver-side (str vs
    datetime.date is never ``==``) while Spark would happily cast it."""
    if predicates is None:
        return None
    by_name = {f.name: f.dataType for f in schema.fields}
    out = []
    for conj in predicates:
        new_conj = []
        for col, op, value in conj:
            dt = by_name.get(col)
            if dt is None:
                new_conj.append((col, op, value))
            elif op == "in":
                new_conj.append((col, op, [_coerce_literal(v, dt) for v in value]))
            else:
                new_conj.append((col, op, _coerce_literal(value, dt)))
        out.append(new_conj)
    return out


def validate_predicate_types(predicates: Predicates | None, schema: T.StructType) -> None:
    """Strict literal type checks against the schema (reference P3,
    ``_generic.py:353-418``) — applied before compiling to Columns."""
    if predicates is None:
        return
    from kartothek_spark.core.schema import validate_predicate_literal

    by_name = {f.name: f.dataType for f in schema.fields}
    for conj in predicates:
        for col, op, value in conj:
            if col not in by_name:
                raise MalformedPredicates(f"predicate column {col!r} not in schema")
            if op == "in":
                for v in value:
                    validate_predicate_literal(by_name[col], v)
            else:
                validate_predicate_literal(by_name[col], value)


# ---------------------------------------------------------------------------
# Driver-side evaluation against plain python partition values
# (the "1-row DataFrame trick" of metapartition.py:670-710 without pandas)
# ---------------------------------------------------------------------------

def _eval_literal_py(op: str, actual: Any, value: Any) -> bool:
    if op == "in":
        return actual in value
    if actual is None or value is None:
        if op == "==":
            return actual is None and value is None
        if op == "!=":
            return (actual is None) != (value is None)
        return False
    return _PY_OPS[op](actual, value)


def evaluate_conjunction_py(conj: Conjunction, values: dict[str, Any]) -> bool:
    """Evaluate the sub-conjunction restricted to keys present in ``values``.
    Literals on absent columns are treated as satisfiable (True)."""
    for col, op, value in conj:
        if col not in values:
            continue
        if not _eval_literal_py(op, values[col], value):
            return False
    return True


def evaluate_predicates_py(predicates: Predicates | None, values: dict[str, Any]) -> bool:
    if predicates is None:
        return True
    return any(evaluate_conjunction_py(conj, values) for conj in predicates)
