"""SQL front door: the catalog as temp views or a persistent catalog.

Everything in this engine is declared through the DataFrame API, which
means it is equally reachable through ``spark.sql`` — jane's typed
index tables become queryable SQL relations with zero extra machinery.
This module makes that explicit: ``register_views`` publishes the ten
contract tables (normalized exactly as ``Catalog`` serves them — the
nanosecond-timestamp fix applies identically) as session temp views,
and analysts/BI tools get the full Catalyst surface (pushdown, AQE,
broadcast planning) on the same data the operators see.

``register_views(..., persistent=True)`` publishes through the session
catalog instead (SURVEY §1.3/§2.8 S1 "a metastore at cluster scale,
same query text"): each table becomes an EXTERNAL ``USING parquet
LOCATION`` table (metadata only — never a 100 TB copy) under
``<prefix><table>_src``, fronted by a ``CREATE OR REPLACE VIEW`` named
``<prefix><table>`` that applies the same normalization the DataFrame
catalog applies (the events ns→µs conversion as SQL text). The query
text and the physical plan are identical to the temp-view path; with a
shared Hive/Glue metastore the registration survives the session, and
on the default in-memory catalog it lives exactly as long — either
way re-registration is idempotent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from jane_spark.engine.catalog import TABLES, Catalog


def register_views(
    spark: SparkSession,
    sf_dir: str,
    prefix: str = "",
    persistent: bool = False,
) -> list[str]:
    """Publish every catalog table as ``<prefix><table>``; returns the
    view names. Re-registration replaces (idempotent).

    ``persistent=False``: session temp views (default). ``True``:
    external parquet tables + catalog views in the CURRENT database —
    same names, same query text, same physical plan.
    """
    cat = Catalog(spark, sf_dir)  # runs configure() (nanosAsLong etc.)
    names = []
    for t in TABLES:
        name = f"{prefix}{t}"
        if not persistent:
            cat.table(t).createOrReplaceTempView(name)
            names.append(name)
            continue
        src = f"{name}_src"
        loc = f"{cat.sf_dir}/{t}.parquet"
        # external table: metadata-only DDL over the existing parquet.
        # DROP+CREATE (not CREATE OR REPLACE, unsupported for v1
        # external sources) — dropping an EXTERNAL table never touches
        # the data files, so re-registering against a new sf_dir is
        # safe and idempotent.
        spark.sql(f"DROP TABLE IF EXISTS `{src}`")
        spark.sql(f"CREATE TABLE `{src}` USING parquet LOCATION '{loc}'")
        spark.sql(
            f"CREATE OR REPLACE VIEW `{name}` AS {_view_sql(spark, t, src)}"
        )
        names.append(name)
    return names


def _view_sql(spark: SparkSession, table: str, src: str) -> str:
    """SELECT text reproducing Catalog's normalization for ``table``
    (catalog.py::_normalize_events as SQL — ns LONG → µs
    TIMESTAMP_NTZ via integer division; see the 2^53 note there)."""
    if table != "events":
        return f"SELECT * FROM `{src}`"
    cols = []
    for c, dt in spark.table(src).dtypes:
        if c == "ts" and dt == "bigint":
            cols.append(
                "cast(timestamp_micros(ts div 1000) as timestamp_ntz) AS ts"
            )
        elif c == "ts" and dt.startswith("timestamp"):
            cols.append("cast(ts as timestamp_ntz) AS ts")
        else:
            cols.append(f"`{c}`")
    return f"SELECT {', '.join(cols)} FROM `{src}`"


def sql(
    spark: SparkSession, sf_dir: str, query: str, persistent: bool = False
) -> DataFrame:
    """One-call convenience: register views, run the SQL."""
    register_views(spark, sf_dir, persistent=persistent)
    return spark.sql(query)
