"""Batch sources & sinks — SURVEY §2.1 S4-S6 and §2.2 K4/K5.

The reference reads dimensions/offsets over hand-rolled JDBC
(Phoenix: reference scala/…/utils/HbaseUtils.scala:21-48; MySQL:
scala/…/utils/MySQLUtil.scala:29-59) and writes analytical results
over JDBC (ClickHouse: scala/…/dws/OrderWiderApp.scala:202-216;
transactional MySQL: scala/…/ads/TradeMarkAmountApp.scala:59-88).
Here each becomes a thin declarative wrapper over Spark's built-in
JDBC source/sink so Catalyst keeps predicate pushdown and the
parallel-read machinery. No database ships in this container, so the
wrappers are exercised by option-plumbing unit tests; the parquet
Catalog (core.catalog) is the storage used by every query.
"""

from realtime0523_spark.sources.config import load_properties
from realtime0523_spark.sources.jdbc import jdbc_scan, jdbc_write

__all__ = ["jdbc_scan", "jdbc_write", "load_properties"]
