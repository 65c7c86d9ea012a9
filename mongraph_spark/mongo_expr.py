"""Mongo-style predicate dict → Spark ``Column`` translator.

Covers the subset the reference actually exercises (SURVEY.md §2.6 —
equality, JS regex, ``$in``, ``$and``; reference src/processtools.coffee:59-66)
plus the obvious comparison operators so user predicates compose.

JS regex semantics: ``{name: /o/}`` is an *unanchored search* — translated to
``rlike`` (Spark's unanchored regex match), never full-string matching.
Case-insensitive flag becomes an inline ``(?i)``.
"""

from __future__ import annotations

import re
from typing import Any, Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

ColumnResolver = Callable[[str], Column]


def _default_resolver(field: str) -> Column:
    return F.col(field)


def _regex_to_column(col: Column, pattern: Any) -> Column:
    if isinstance(pattern, re.Pattern):
        pat = pattern.pattern
        if pattern.flags & re.IGNORECASE:
            pat = "(?i)" + pat
        return col.rlike(pat)
    return col.rlike(str(pattern))


# Mongo null semantics differ from SQL three-valued logic: a missing/null
# field *matches* $ne/$nin/$nor (it "is not equal").  Negations therefore
# wrap their operand in coalesce(x, false) before inverting.
def _not(cond: Column) -> Column:
    return ~F.coalesce(cond, F.lit(False))


_COMPARATORS = {
    "$gt": lambda c, v: c > F.lit(v),
    "$gte": lambda c, v: c >= F.lit(v),
    "$lt": lambda c, v: c < F.lit(v),
    "$lte": lambda c, v: c <= F.lit(v),
    "$ne": lambda c, v: _not(c.eqNullSafe(F.lit(v))),
    "$eq": lambda c, v: c == F.lit(v),
}


def _field_condition(col: Column, spec: Any) -> Column:
    if isinstance(spec, re.Pattern):
        return _regex_to_column(col, spec)
    if isinstance(spec, dict):
        conds: list[Column] = []
        for op, val in spec.items():
            if op == "$in":
                conds.append(col.isin(list(val)))
            elif op == "$nin":
                conds.append(_not(col.isin(list(val))))
            elif op == "$regex":
                pat = val
                if "$options" in spec and "i" in spec["$options"]:
                    pat = "(?i)" + pat
                conds.append(_regex_to_column(col, pat))
            elif op == "$options":
                continue  # consumed with $regex
            elif op == "$exists":
                conds.append(col.isNotNull() if val else col.isNull())
            elif op == "$not":
                conds.append(_not(_field_condition(col, val)))
            elif op == "$size":
                conds.append(F.size(col) == F.lit(val))
            elif op == "$all":
                required = F.array(*[F.lit(v) for v in val])
                conds.append(F.size(F.array_except(required, col)) == 0)
            elif op == "$mod":
                divisor, remainder = val
                conds.append(col % F.lit(divisor) == F.lit(remainder))
            elif op == "$elemMatch":
                conds.append(F.exists(col, lambda e: _field_condition(e, val)))
            elif op in _COMPARATORS:
                conds.append(_COMPARATORS[op](col, val))
            else:
                raise ValueError(f"unsupported mongo operator: {op!r}")
        out = conds[0]
        for c in conds[1:]:
            out = out & c
        return out
    if spec is None:
        return col.isNull()
    return col == F.lit(spec)


def mongo_to_column(condition: dict[str, Any], resolver: ColumnResolver | None = None) -> Column:
    """Translate a Mongo condition dict into one boolean Column.

    ``resolver`` maps a field name to a Column — used to point ``r.since``
    style relationship predicates at ``props['since']`` instead of a real
    column (reference WHERE translation, SURVEY.md §3.4).
    """
    resolve = resolver or _default_resolver
    conds: list[Column] = []
    for key, spec in condition.items():
        if key == "$and":
            sub = [mongo_to_column(s, resolve) for s in spec]
            c = sub[0]
            for s in sub[1:]:
                c = c & s
            conds.append(c)
        elif key == "$or":
            sub = [mongo_to_column(s, resolve) for s in spec]
            c = sub[0]
            for s in sub[1:]:
                c = c | s
            conds.append(c)
        elif key == "$nor":
            sub = [mongo_to_column(s, resolve) for s in spec]
            c = sub[0]
            for s in sub[1:]:
                c = c | s
            conds.append(_not(c))
        elif key.startswith("$"):
            raise ValueError(f"unsupported top-level mongo operator: {key!r}")
        else:
            conds.append(_field_condition(resolve(key), spec))
    if not conds:
        return F.lit(True)
    out = conds[0]
    for c in conds[1:]:
        out = out & c
    return out


# ---------------------------------------------------------------------------
# Driver-side evaluator over plain dict documents — used by the OLTP facade
# when populating already-collected path/edge results (fixture scale).  The
# distributed operators use mongo_to_column; both implement the same subset.
# ---------------------------------------------------------------------------


def _get_path(doc: dict, field: str) -> Any:
    cur: Any = doc
    for part in field.split("."):
        if not isinstance(cur, dict):
            return None
        cur = cur.get(part)
    return cur


def _match_field(value: Any, spec: Any) -> bool:
    if isinstance(spec, re.Pattern):
        return value is not None and spec.search(str(value)) is not None
    if isinstance(spec, dict):
        for op, v in spec.items():
            if op == "$in":
                if value not in v:
                    return False
            elif op == "$nin":
                if value in v:
                    return False
            elif op == "$regex":
                flags = re.IGNORECASE if "i" in spec.get("$options", "") else 0
                if value is None or re.search(v, str(value), flags) is None:
                    return False
            elif op == "$options":
                continue
            elif op == "$exists":
                if bool(value is not None) != bool(v):
                    return False
            elif op == "$not":
                if _match_field(value, v):
                    return False
            elif op == "$size":
                if not (isinstance(value, (list, tuple)) and len(value) == v):
                    return False
            elif op == "$all":
                if not (
                    isinstance(value, (list, tuple)) and all(x in value for x in v)
                ):
                    return False
            elif op == "$mod":
                divisor, remainder = v
                if value is None:
                    return False
                # truncated remainder (-7 mod 3 = -1), matching MongoDB/Java
                # and the Spark `%` used by mongo_to_column — NOT Python's
                # floored % (exact for ints; fmod would round big ints)
                trunc_rem = abs(value) % abs(divisor)
                if value < 0:
                    trunc_rem = -trunc_rem
                if trunc_rem != remainder:
                    return False
            elif op == "$elemMatch":
                if not (
                    isinstance(value, (list, tuple))
                    and any(_match_field(e, v) for e in value)
                ):
                    return False
            elif op == "$gt":
                if not (value is not None and value > v):
                    return False
            elif op == "$gte":
                if not (value is not None and value >= v):
                    return False
            elif op == "$lt":
                if not (value is not None and value < v):
                    return False
            elif op == "$lte":
                if not (value is not None and value <= v):
                    return False
            elif op == "$ne":
                if value == v:
                    return False
            elif op == "$eq":
                if value != v:
                    return False
            else:
                raise ValueError(f"unsupported mongo operator: {op!r}")
        return True
    if spec is None:
        return value is None
    return value == spec


def mongo_match(doc: dict, condition: dict[str, Any] | None) -> bool:
    """Evaluate a Mongo condition against a plain dict document."""
    if not condition:
        return True
    for key, spec in condition.items():
        if key == "$and":
            if not all(mongo_match(doc, s) for s in spec):
                return False
        elif key == "$or":
            if not any(mongo_match(doc, s) for s in spec):
                return False
        elif key == "$nor":
            if any(mongo_match(doc, s) for s in spec):
                return False
        elif key.startswith("$"):
            raise ValueError(f"unsupported top-level mongo operator: {key!r}")
        elif not _match_field(_get_path(doc, key), spec):
            return False
    return True


# ---------------------------------------------------------------------------
# Neo4j-1.x-style relationship WHERE strings (reference README.md:129,
# test/tests.coffee:762): `r.instrument = 'guitar'`, `r.category! = 'x'`.
# Translate to a Column over the edge props map: r.prop → props['prop'],
# `!` suffix → null-tolerant access (our map access is already null-tolerant),
# single `=` → equality.
# ---------------------------------------------------------------------------

_WHERE_PROP = re.compile(r"\b([a-zA-Z_][a-zA-Z0-9_]*)\.([a-zA-Z_][a-zA-Z0-9_.]*)!?")
_WHERE_EQ = re.compile(r"(?<![<>!=])=(?!=)")


def cypher_where_to_sql(where: str, ident_to_col: dict[str, str]) -> str:
    """Rewrite a reference-style WHERE string into a Spark SQL boolean expr.

    ``ident_to_col`` maps cypher identifiers (``r``, ``a``, ``b``) to the
    DataFrame column holding that entity's props map.
    """

    def repl(m: re.Match) -> str:
        ident, prop = m.group(1), m.group(2)
        target = ident_to_col.get(ident)
        if target is None:
            return m.group(0)
        return f"{target}['{prop}']"

    out = _WHERE_PROP.sub(repl, where)
    out = _WHERE_EQ.sub("==", out)
    return out
