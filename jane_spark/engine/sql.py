"""SQL front door: the catalog as temp views.

Everything in this engine is declared through the DataFrame API, which
means it is equally reachable through ``spark.sql`` — jane's typed
index tables become queryable SQL relations with zero extra machinery.
This module makes that explicit: ``register_views`` publishes the ten
contract tables (normalized exactly as ``Catalog`` serves them — the
nanosecond-timestamp fix applies identically) as session temp views,
and analysts/BI tools get the full Catalyst surface (pushdown, AQE,
broadcast planning) on the same data the operators see. At cluster
scale the same call targets a shared metastore instead of session
temp views — the query text does not change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from jane_spark.engine.catalog import TABLES, Catalog


def register_views(
    spark: SparkSession, sf_dir: str, prefix: str = ""
) -> list[str]:
    """Publish every catalog table as ``<prefix><table>`` temp views;
    returns the view names. Re-registration replaces (idempotent)."""
    cat = Catalog(spark, sf_dir)
    names = []
    for t in TABLES:
        name = f"{prefix}{t}"
        cat.table(t).createOrReplaceTempView(name)
        names.append(name)
    return names


def sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """One-call convenience: register views, run the SQL."""
    register_views(spark, sf_dir)
    return spark.sql(query)
