from jane_spark.engine.session import configure, get_spark
from jane_spark.engine.catalog import Catalog

__all__ = ["configure", "get_spark", "Catalog"]
