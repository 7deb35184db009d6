"""Contract-query registry (SURVEY.md §2 — the correctness contract).

Every operator the engine claims is registered here as a named query:
a Spark callable ``(spark, sf_dir) -> DataFrame`` plus (where the
semantics are ANSI-SQL-expressible) its DuckDB oracle twin. The driver
runs both at sf0.01 and compares row-count + schema + order-insensitive
value-hash; queries without an oracle get a weaker rows-only check.

Determinism rules enforced by convention in every registered query
(FIXTURES.md): alias every computed column identically on both sides,
round() every float aggregate, sort_array() any collect_set, tie-break
every rank/limit by an id column, keep timestamps TIMESTAMP_NTZ/UTC.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass
class ContractQuery:
    name: str
    spark_fn: SparkQuery
    oracle: str | None  # DuckDB SQL twin; None => rows-only check
    survey_rows: str = ""  # §2 row ids this query exercises, e.g. "B3,H2"
    doc: str = ""


REGISTRY: dict[str, ContractQuery] = {}


def contract(name: str, oracle: str | None, survey_rows: str = "", doc: str = ""):
    """Register a contract query. Usage:

    @contract("q_b2_eq_filter", oracle="SELECT ...", survey_rows="B2")
    def q(spark, sf_dir): ...
    """

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in REGISTRY:
            raise ValueError(f"duplicate contract query: {name}")
        REGISTRY[name] = ContractQuery(name, fn, oracle, survey_rows, doc)
        return fn

    return deco
