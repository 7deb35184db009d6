"""JVM-side XML construction helpers (SURVEY.md §2 A8 — jane's primary
station/event response formats are StationXML/QuakeML XML
[ref: src/jane/fdsnws/views/station_1.py, event_1.py — format=xml
default branch, conf=H; SURVEY.md §0 caveat]).

Everything is built from `pyspark.sql.functions` string expressions —
no UDFs, whole-stage-codegen friendly, and each construct has an exact
ANSI-SQL twin (replace chains / concat / string_agg) so XML-building
queries stay oracle-checkable. At 100 TB the serialization is a pure
row-local projection; the only shuffles are the hierarchical rollups,
which carry already-serialized child blocks (combinable strings).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_ESCAPES = (("&", "&amp;"), ("<", "&lt;"), (">", "&gt;"), ('"', "&quot;"))


def xml_escape(c: Column) -> Column:
    """Escape text for XML content/attribute position. `&` first so the
    later entities are not double-escaped. DuckDB twin: the same
    4-step replace() chain in the same order."""
    for raw, ent in _ESCAPES:
        c = F.replace(c, F.lit(raw), F.lit(ent))
    return c


def xml_escape_str(s: str) -> str:
    """Driver-side twin of xml_escape for document-envelope strings
    (Source/agency) that are interpolated outside any DataFrame."""
    for raw, ent in _ESCAPES:
        s = s.replace(raw, ent)
    return s


def xml_attr(name: str, value: Column) -> Column:
    """` name="escaped-value"` — empty string when value is NULL (the
    attribute is omitted entirely, matching optional XML attributes
    like Channel endDate for open epochs)."""
    return F.coalesce(
        F.concat(F.lit(f' {name}="'), xml_escape(value.cast("string")), F.lit('"')),
        F.lit(""),
    )


def xml_element(tag: str, content: Column, *attrs: Column) -> Column:
    """`<tag attrs>content</tag>`; NULL content yields an empty element
    body (`<tag attrs></tag>`), NULL never poisons the concat."""
    return F.concat(
        F.lit(f"<{tag}"),
        *attrs,
        F.lit(">"),
        F.coalesce(content.cast("string"), F.lit("")),
        F.lit(f"</{tag}>"),
    )


def xml_rollup(
    df: DataFrame,
    group_cols: list[str],
    order_col: Column,
    xml_col: Column,
    out_name: str = "xml",
) -> DataFrame:
    """Concatenate each group's child XML blocks in a deterministic
    order: collect_list(struct(order, xml)) → array_sort → join.

    DuckDB twin: ``string_agg(xml, '' ORDER BY order_col)``. The
    shuffle carries serialized child strings only; at scale the groups
    (stations per network, events per catalog page) are small relative
    to partitions, and the collect_list is bounded by group size — the
    same bound jane's per-document XML responses already imply.
    """
    packed = df.select(
        *group_cols, F.struct(order_col.alias("o"), xml_col.alias("x")).alias("__c")
    )
    return packed.groupBy(*group_cols).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list("__c")), lambda c: c["x"]
            ),
            "",
        ).alias(out_name)
    )
