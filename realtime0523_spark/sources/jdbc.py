"""JDBC scan/sink wrappers (SURVEY §2.1 S4/S5, §2.2 K4/K5).

Design notes for scale (vs the reference):

- The reference's lookup scans build one connection per partition (or
  per batch on the driver) and interpolate `WHERE id IN (...)` strings
  (reference scala/…/dwd/Ods_to_DWD_order_info.scala:83-104,
  scala/…/utils/HbaseUtils.scala:21-48). Spark's JDBC source instead
  pushes filters down (`PushedFilters` in the scan node) and
  parallelizes with `partitionColumn/lowerBound/upperBound/
  numPartitions` — the IN-list trick becomes an ordinary semi-join
  the planner handles.
- The reference's ClickHouse sink hand-picks batchsize=100 /
  numPartitions=4 (reference scala/…/dws/OrderWiderApp.scala:216);
  those are plain `df.write.jdbc` options here, defaulted to the same
  values for parity but overridable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, DataFrameReader, SparkSession


def jdbc_scan(
    spark: SparkSession,
    url: str,
    table: str,
    *,
    properties: dict[str, str] | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
) -> DataFrameReader:
    """Configured JDBC reader (S4 Phoenix-scan / S5 MySQL-scan
    equivalent). Returns the reader so callers (and tests) can inspect
    options; `.load()` executes. `table` may be a subquery alias —
    `"(SELECT ...) t"` — which is how the reference's ad-hoc SQL scans
    (HbaseUtils.query / MySQLUtil.query) are expressed declaratively.
    """
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    if partition_column is not None:
        if lower_bound is None or upper_bound is None or num_partitions is None:
            raise ValueError(
                "partition_column requires lower_bound, upper_bound and num_partitions"
            )
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    return reader


def jdbc_write(
    df: DataFrame,
    url: str,
    table: str,
    *,
    mode: str = "append",
    batchsize: int = 100,
    num_partitions: int = 4,
    isolation_level: str = "NONE",
    properties: dict[str, str] | None = None,
):
    """Configured JDBC writer (K4 ClickHouse-append equivalent;
    defaults mirror reference scala/…/dws/OrderWiderApp.scala:216).
    Returns the DataFrameWriter; `.save()` executes.

    Exactly-once ADS semantics (K5, reference
    scala/…/ads/TradeMarkAmountApp.scala:66-83: aggregates + offsets in
    one transaction) are provided by the streaming layer instead:
    foreachBatch + an idempotent-by-batch_id writer
    (streaming.sinks.idempotent_batch_writer) — the Structured
    Streaming contract for transactional sinks.
    """
    writer = (
        df.repartition(num_partitions)
        .write.format("jdbc")
        .mode(mode)
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
        .option("isolationLevel", isolation_level)
    )
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    return writer
