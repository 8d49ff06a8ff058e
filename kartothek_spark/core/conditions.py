"""Typed condition-builder shim over the DNF predicate language.

Parity target: the cube condition language (P11,
``kartothek/core/cube/conditions.py:68-540`` in /root/reference) — a
``C("col") == value`` overload DSL plus a string parser, compiling to the
same DNF tuples the rest of the engine consumes. ``pyspark.sql.Column``
*is* this language natively; the shim exists so cube call sites and CLI
strings keep reference ergonomics while everything downstream stays on
one predicate representation.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Any, Sequence


@dataclass(frozen=True)
class SimpleCondition:
    column: str
    op: str
    value: Any

    @property
    def predicate_part(self) -> list[tuple]:
        return [(self.column, self.op, self.value)]

    def __and__(self, other: "SimpleCondition | Conjunction") -> "Conjunction":
        return Conjunction([self]) & other

    @property
    def columns(self) -> set[str]:
        return {self.column}

    @property
    def predicate(self) -> list[list[tuple]]:
        return [self.predicate_part]

    def __str__(self) -> str:
        if self.op == "in":
            return f"{self.column} in {tuple(self.value)!r}"
        return f"{self.column} {self.op} {self.value!r}"


@dataclass(frozen=True)
class InIntervalCondition:
    """[start, stop) interval — compiles to ``>= start`` AND ``< stop``
    (reference ``InIntervalCondition``, conditions.py:390-428)."""

    column: str
    start: Any = None
    stop: Any = None

    @property
    def predicate_part(self) -> list[tuple]:
        out = []
        if self.start is not None:
            out.append((self.column, ">=", self.start))
        if self.stop is not None:
            out.append((self.column, "<", self.stop))
        return out

    def __and__(self, other) -> "Conjunction":
        return Conjunction([self]) & other

    @property
    def columns(self) -> set[str]:
        return {self.column}

    @property
    def predicate(self) -> list[list[tuple]]:
        return [self.predicate_part]


@dataclass(frozen=True)
class Conjunction:
    conditions: tuple

    def __init__(self, conditions: Sequence) -> None:
        object.__setattr__(self, "conditions", tuple(conditions))

    def __and__(self, other) -> "Conjunction":
        if isinstance(other, Conjunction):
            return Conjunction(self.conditions + other.conditions)
        return Conjunction(self.conditions + (other,))

    @property
    def columns(self) -> set[str]:
        return set().union(*(c.columns for c in self.conditions)) if self.conditions else set()

    @property
    def predicate_part(self) -> list[tuple]:
        return [lit for c in self.conditions for lit in c.predicate_part]

    @property
    def predicate(self) -> list[list[tuple]]:
        """The DNF form every engine API accepts (one conjunction)."""
        return [self.predicate_part]

    def split_by_column(self, columns: set[str]) -> tuple["Conjunction", "Conjunction"]:
        """(on columns, remainder) — reference ``split_by_column``
        conditions.py:507."""
        hit = [c for c in self.conditions if c.columns <= columns]
        miss = [c for c in self.conditions if not (c.columns <= columns)]
        return Conjunction(hit), Conjunction(miss)

    def filter_df(self, df):
        from kartothek_spark.core.predicates import predicates_to_column

        part = self.predicate_part
        return df.where(predicates_to_column([part])) if part else df


class C:
    """Virtual column: ``C("x") == 5``, ``C("x").isin([...])``,
    ``C("x").in_interval(lo, hi)`` (reference ``C``/``VirtualColumn``,
    conditions.py:68-127)."""

    def __init__(self, name: str) -> None:
        if not isinstance(name, str) or not name:
            raise ValueError("column name must be a non-empty string")
        self.name = name

    def __eq__(self, value):  # type: ignore[override]
        return SimpleCondition(self.name, "==", value)

    def __ne__(self, value):  # type: ignore[override]
        return SimpleCondition(self.name, "!=", value)

    def __lt__(self, value):
        return SimpleCondition(self.name, "<", value)

    def __le__(self, value):
        return SimpleCondition(self.name, "<=", value)

    def __gt__(self, value):
        return SimpleCondition(self.name, ">", value)

    def __ge__(self, value):
        return SimpleCondition(self.name, ">=", value)

    def isin(self, values) -> SimpleCondition:
        return SimpleCondition(self.name, "in", list(values))

    def in_interval(self, start=None, stop=None) -> InIntervalCondition:
        return InIntervalCondition(self.name, start, stop)

    __hash__ = None  # type: ignore[assignment]


_COND_RE = re.compile(
    r"^\s*(?P<col>[A-Za-z_][A-Za-z0-9_.]*)\s*"
    r"(?P<op>==|!=|<=|>=|<|>|in)\s*"
    r"(?P<val>.+?)\s*$"
)


def _parse_value(raw: str) -> Any:
    raw = raw.strip()
    if raw.startswith("(") and raw.endswith(")"):
        return [_parse_value(p) for p in raw[1:-1].split(",") if p.strip()]
    if (raw.startswith("'") and raw.endswith("'")) or (raw.startswith('"') and raw.endswith('"')):
        return raw[1:-1]
    low = raw.lower()
    if low in ("true", "false"):
        return low == "true"
    try:
        return int(raw)
    except ValueError:
        pass
    try:
        return float(raw)
    except ValueError:
        pass
    return raw


def parse_condition(expr: str) -> SimpleCondition:
    """Parse one ``col op value`` condition (reference ``from_string``,
    conditions.py:175-239). Values: quoted strings, ints, floats, bools,
    tuples for ``in``; everything else stays a string."""
    m = _COND_RE.match(expr)
    if not m:
        raise ValueError(f"cannot parse condition {expr!r}")
    return SimpleCondition(m.group("col"), m.group("op"), _parse_value(m.group("val")))


def parse_conjunction(expr: str) -> Conjunction:
    """Parse ``cond & cond & ...`` into one conjunction."""
    parts = [p for p in (s.strip() for s in expr.split("&")) if p]
    return Conjunction([parse_condition(p) for p in parts])


__all__ = [
    "C",
    "Conjunction",
    "InIntervalCondition",
    "SimpleCondition",
    "parse_condition",
    "parse_conjunction",
]
