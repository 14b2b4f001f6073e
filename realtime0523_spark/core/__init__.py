from realtime0523_spark.core.session import get_spark, stop_spark
from realtime0523_spark.core.catalog import Catalog, TABLES

__all__ = ["get_spark", "stop_spark", "Catalog", "TABLES"]
