"""Table catalog over the driver's Parquet testdata.

Maps the ten contract tables (TESTDATA.md / FIXTURES.md) to DataFrames with
normalized types. One special case: ``events.ts`` is INT64 TIMESTAMP(NANOS)
parquet, which PySpark 4.x cannot read natively — with
``spark.sql.legacy.parquet.nanosAsLong=true`` it arrives as a nanosecond
LONG which we convert to a microsecond TIMESTAMP_NTZ.

The conversion uses integer division (``ts div 1000``), NOT float division:
2024 epoch-nanos ≈ 1.7e18 > 2^53, so a double round-trip would corrupt the
low digits. DuckDB truncates ns→µs on read the same way, which is what
makes the value-hash comparison stable (SURVEY.md §7.4 risk 1).

All timestamps in the catalog are TIMESTAMP_NTZ (naive/UTC) to match the
DuckDB oracle exactly; the session timezone is pinned UTC regardless.
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jane_spark.engine.session import configure

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


class Catalog:
    """Lazy accessor for the contract tables under one sf directory.

    ``Catalog(spark, "/root/testdata/sf0.01").events`` returns the
    normalized events DataFrame. Table DataFrames are cached
    session-wide (keyed by session + dir): repeated queries reuse the
    resolved relation instead of re-reading parquet footers, and
    ``configure`` runs once per session. Plan reuse only — no data is
    persisted/pinned.
    """

    # session-scoped caches (a catalog IS session state). Keyed by
    # (applicationId, session token) — the token is a counter value
    # attached to the SparkSession's __dict__ on first touch, so it
    # dies with the session object and (unlike id()) can never be
    # reused by a new sibling session of the same SparkContext
    # (ADVICE r2); the applicationId changes with every new
    # SparkContext, making the composite key stable.
    _table_cache: dict[tuple[tuple[str, int], str], dict[str, DataFrame]] = {}
    _configured: set[tuple[str, int]] = set()
    _token_counter = itertools.count()

    @staticmethod
    def _session_key(spark: SparkSession) -> tuple[str, int]:
        try:
            app_id = spark.sparkContext.applicationId
        except Exception:  # stopped/degenerate session: never cache-hit
            return ("dead", id(spark))
        tok = spark.__dict__.get("_jane_catalog_token")
        if tok is None:
            tok = next(Catalog._token_counter)
            spark.__dict__["_jane_catalog_token"] = tok
        return (app_id, tok)

    def __init__(self, spark: SparkSession, sf_dir: str):
        key = Catalog._session_key(spark)
        if key[0] == "dead":
            # Degenerate/stopped session: do NOT run the eviction sweep
            # (a dead sentinel must not wipe live applications' cache —
            # ADVICE r2) and do not cache under the sentinel; configure
            # is still attempted so failures surface naturally.
            configure(spark)
            self.spark = spark
            self.sf_dir = sf_dir.rstrip("/")
            self._dfs = {}
            return
        # PySpark local mode runs one SparkContext per process: entries
        # under another applicationId belong to a stopped context —
        # evict them so dead sessions (and their JVM handles) can be
        # collected instead of accumulating for the process lifetime.
        stale = [k for k in Catalog._table_cache if k[0][0] != key[0]]
        for k in stale:
            del Catalog._table_cache[k]
        Catalog._configured = {c for c in Catalog._configured if c[0] == key[0]}
        if key not in Catalog._configured:
            configure(spark)
            Catalog._configured.add(key)
        self.spark = spark
        self.sf_dir = sf_dir.rstrip("/")
        self._dfs = Catalog._table_cache.setdefault((key, self.sf_dir), {})

    def table(self, name: str) -> DataFrame:
        if name not in self._dfs:
            if name not in TABLES:
                raise KeyError(f"unknown contract table: {name}")
            df = self.spark.read.parquet(f"{self.sf_dir}/{name}.parquet")
            if name == "events":
                df = _normalize_events(df)
            self._dfs[name] = df
        return self._dfs[name]

    def __getattr__(self, name: str) -> DataFrame:
        if name in TABLES:
            return self.table(name)
        raise AttributeError(name)

    def pin(
        self,
        name: str,
        cluster_by: str | None = None,
        partitions: int | None = None,
    ) -> DataFrame:
        """Pin a table in the in-memory columnar cache, optionally
        clustered (hash-repartitioned) on its primary access key.

        The Spark analogue of jane's hot PostgreSQL indices: windows,
        grouped-map UDFs, and joins keyed on ``cluster_by`` then run
        with NO exchange — the cached layout already satisfies their
        required distribution. Scale policy (SURVEY.md §4): pin index
        and dimension tables (bounded size); never pin the raw fact/
        waveform tables — those stay on Parquet where pushdown and
        partition pruning do the work.

        Idempotent per (session, sf_dir, name). The plain parquet plan
        stays the default — the vectorized parquet reader beats cached-
        batch decode for scan-bound partial aggregations; queries with
        key-clustered access (windows, grouped-map, co-located joins)
        opt in via ``clustered()``.
        """
        df = self.table(name)
        key = f"__pinned_{name}"
        if key in self._dfs:
            return self._dfs[key]
        if partitions is None:
            partitions = self.spark.sparkContext.defaultParallelism
        if cluster_by is not None:
            df = df.repartition(partitions, cluster_by)
        else:
            df = df.repartition(partitions)
        df = df.persist()
        df.count()  # materialize now, outside any timed region
        self._dfs[key] = df
        self._dfs[f"__pinkey_{name}"] = cluster_by  # type: ignore[assignment]
        return df

    def clustered(self, name: str, key: str) -> DataFrame:
        """Best available layout for ``key``-clustered access: the
        pinned copy when its clustering matches (no exchange needed),
        else the plain table (the downstream operator shuffles)."""
        pinned = self._dfs.get(f"__pinned_{name}")
        if pinned is not None and self._dfs.get(f"__pinkey_{name}") == key:
            return pinned
        return self.table(name)


def _normalize_events(df: DataFrame) -> DataFrame:
    """nanosecond LONG (legacy read) -> microsecond TIMESTAMP_NTZ."""
    ts_type = dict(df.dtypes)["ts"]
    if ts_type == "bigint":
        df = df.withColumn(
            "ts", F.expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)")
        )
    elif ts_type.startswith("timestamp"):
        df = df.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    return df
