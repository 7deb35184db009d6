"""Param-dict → Column predicate compiler: jane's query front door.

The reference parses HTTP query params against a per-document-type
``meta`` type dict and compiles them to casted jsonb predicates
[ref: src/jane/documents/ — index-queryset builder, and
src/jane/fdsnws/views/* param parsing, conf=M for exact location, H for
behavior; SURVEY.md §0 caveat applies]. This module is the Spark
equivalent: the same (field, op, typed-value) triple IR, compiled to a
``pyspark.sql.Column`` tree that Catalyst pushes into the parquet scan.

Supported parameter surface (SURVEY.md §2.2):

- ``field``            equality, or comma-separated alternatives (B5)
- ``min_field``        >=   (closed interval, B3)
- ``max_field``        <=   (B3)
- ``field_before``     <    (epoch edges, B10)
- ``field_after``      >    (B10)
- wildcards ``*``/``?`` in str values → LIKE translation (B4)
- ``-`` prefix on a list item → exclusion (B6, null-safe)
- declared types: str, int, float, bool, UTCDateTime (ISO-8601, µs)

Everything compiles to built-in Column ops — the compiled predicate is
fully visible to Catalyst (predicate pushdown, stats pruning); no UDFs.
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime
from functools import reduce
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

META_TYPES = {"str", "int", "float", "bool", "UTCDateTime"}


@dataclass(frozen=True)
class Triple:
    """IR #1 (SURVEY.md §3.1): one parsed query-param predicate."""

    field: str
    op: str  # eq | ge | le | lt | gt
    value: Any  # typed scalar, or list[str] for str alternatives


# ---------------------------------------------------------------- parsing


def _cast_value(raw: str, typ: str) -> Any:
    if typ == "int":
        return int(raw)
    if typ == "float":
        return float(raw)
    if typ == "bool":
        lowered = raw.strip().lower()
        if lowered in ("true", "t", "1", "yes"):
            return True
        if lowered in ("false", "f", "0", "no"):
            return False
        raise ValueError(f"not a boolean: {raw!r}")
    if typ == "UTCDateTime":
        # ISO-8601, µs precision, naive == UTC (ObsPy convention)
        return datetime.fromisoformat(raw.replace("Z", "+00:00")).replace(tzinfo=None)
    return raw


def parse_params(params: dict[str, str], meta: dict[str, str]) -> list[Triple]:
    """HTTP-style param dict → typed triple IR, validated against meta."""
    triples: list[Triple] = []
    for key, raw in params.items():
        field, op = key, "eq"
        for prefix, p_op in (("min_", "ge"), ("max_", "le")):
            if key.startswith(prefix) and key[len(prefix):] in meta:
                field, op = key[len(prefix):], p_op
                break
        else:
            for suffix, s_op in (("_before", "lt"), ("_after", "gt")):
                if key.endswith(suffix) and key[: -len(suffix)] in meta:
                    field, op = key[: -len(suffix)], s_op
                    break
        if field not in meta:
            raise KeyError(f"unknown query field: {key}")
        typ = meta[field]
        if typ not in META_TYPES:
            raise ValueError(f"unknown meta type {typ!r} for {field}")
        if typ == "str" and op == "eq":
            items = [s for s in str(raw).split(",") if s != ""]
            if not items:
                continue  # empty param == no constraint (jane drops blanks)
            triples.append(Triple(field, "eq", items))
        else:
            if op != "eq" and typ == "str":
                raise ValueError(f"range op on str field: {key}")
            triples.append(Triple(field, op, _cast_value(str(raw), typ)))
    return triples


# ---------------------------------------------------------- LIKE translation

_LIKE_SPECIAL = {"%": r"\%", "_": r"\_", "\\": "\\\\"}


def wildcard_to_like(pattern: str) -> str | None:
    """FDSN/SEED wildcards (``*`` any run, ``?`` one char) → SQL LIKE.

    Returns None when the pattern has no wildcards (caller should use
    equality/isin — cheaper and still pushdown-friendly).
    """
    if "*" not in pattern and "?" not in pattern:
        return None
    out = []
    for ch in pattern:
        if ch == "*":
            out.append("%")
        elif ch == "?":
            out.append("_")
        else:
            out.append(_LIKE_SPECIAL.get(ch, ch))
    return "".join(out)


# ---------------------------------------------------------------- compile


def _compile_str_alternatives(col: Column, items: list[str]) -> Column:
    """Comma list with optional ``-`` exclusions and wildcards.

    Positives OR together; negatives AND NOT. An all-negative list means
    "everything except" (jane's behavior for pure exclusions). NULL rows
    never match a positive and never *pass* a negation (SQL semantics).
    """
    pos = [i for i in items if not i.startswith("-")]
    neg = [i[1:] for i in items if i.startswith("-")]

    def one(item: str) -> Column:
        like = wildcard_to_like(item)
        return col.like(like) if like is not None else col == item

    clauses: list[Column] = []
    if pos:
        exact = [i for i in pos if wildcard_to_like(i) is None]
        wild = [i for i in pos if wildcard_to_like(i) is not None]
        alts = ([col.isin(exact)] if exact else []) + [one(w) for w in wild]
        clauses.append(reduce(lambda a, b: a | b, alts))
    for item in neg:
        clauses.append(~one(item) & col.isNotNull())
    return reduce(lambda a, b: a & b, clauses)


def compile_triples(triples: list[Triple]) -> Column:
    """Triple IR → one conjunctive Column predicate (IR #2 equivalent)."""
    if not triples:
        return F.lit(True)
    ops = {"ge": "__ge__", "le": "__le__", "lt": "__lt__", "gt": "__gt__"}
    clauses = []
    for t in triples:
        col = F.col(t.field)
        if t.op == "eq" and isinstance(t.value, list):
            clauses.append(_compile_str_alternatives(col, t.value))
        elif t.op == "eq":
            clauses.append(col == t.value)
        else:
            clauses.append(getattr(col, ops[t.op])(F.lit(t.value)))
    return reduce(lambda a, b: a & b, clauses)


def compile_params(params: dict[str, str], meta: dict[str, str]) -> Column:
    return compile_triples(parse_params(params, meta))


def search(df: DataFrame, params: dict[str, str], meta: dict[str, str]) -> DataFrame:
    """The REST index-search entry point: filter a typed index table by an
    HTTP-style param dict (SURVEY.md §3.1 lifecycle, Spark redesign)."""
    return df.filter(compile_params(params, meta))


# ------------------------------------------------- pure-Python reference

def match_row(row: dict[str, Any], params: dict[str, str], meta: dict[str, str]) -> bool:
    """Reference matcher for property tests: same semantics, no Spark."""
    import fnmatch

    for t in parse_params(params, meta):
        v = row.get(t.field)
        if t.op == "eq" and isinstance(t.value, list):
            if v is None:
                return False
            pos = [i for i in t.value if not i.startswith("-")]
            neg = [i[1:] for i in t.value if i.startswith("-")]

            def m(pat: str) -> bool:
                if wildcard_to_like(pat) is None:
                    return v == pat
                return fnmatch.fnmatchcase(str(v), pat)

            if pos and not any(m(p) for p in pos):
                return False
            if any(m(n) for n in neg):
                return False
        else:
            if v is None:
                return False
            if t.op == "eq" and not (v == t.value):
                return False
            if t.op == "ge" and not (v >= t.value):
                return False
            if t.op == "le" and not (v <= t.value):
                return False
            if t.op == "lt" and not (v < t.value):
                return False
            if t.op == "gt" and not (v > t.value):
                return False
    return True
