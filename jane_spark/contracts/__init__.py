"""Contract-query registry assembly: importing this package registers
every contract query (SURVEY.md §2) into REGISTRY."""

from jane_spark.contracts.registry import REGISTRY, ContractQuery, contract

# registration side effects — order mirrors SURVEY.md §2 sections
from jane_spark.contracts import sources  # noqa: F401  (§2.1 A)
from jane_spark.contracts import filters  # noqa: F401  (§2.2 B)
from jane_spark.contracts import joins  # noqa: F401  (§2.3 C)
from jane_spark.contracts import aggregates  # noqa: F401  (§2.4 D)
from jane_spark.contracts import windows_sort  # noqa: F401  (§2.5 E, §2.6 F)
from jane_spark.contracts import sets_scalars  # noqa: F401  (§2.7 G, §2.8 H)
from jane_spark.contracts import streaming  # noqa: F401  (§2.9 I)
from jane_spark.contracts import udfs  # noqa: F401  (§2.10 J)
from jane_spark.contracts import northstar  # noqa: F401  (§2.11 K)
from jane_spark.contracts import pipeline  # noqa: F401  (§2.11 K pipeline ops)

__all__ = ["REGISTRY", "ContractQuery", "contract"]
