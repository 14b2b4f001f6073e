"""Streaming sources — SURVEY §2.1 S1-S3 re-expressed.

The reference consumes Kafka topics with hand-managed offsets in
Redis/MySQL (scala/…/utils/KafkaStreamUtils.scala:33-59,
OffsetManagerUtil.scala:22-59). Structured Streaming replaces all of
that: the source is declarative, offsets live in the checkpoint.

In this container there is no Kafka broker, so the test/bench path is
the FILE source (same incremental-execution machinery, same watermark
and state semantics). `kafka_stream` builds the production source and
is import-gated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from realtime0523_spark.core.catalog import TABLES, probe_ts_cols

# Maxwell-style CDC envelope (reference scala/…/ods/KafkaToODS_M.scala:38-52):
# `table`/`type` route the record, `data` is the row payload. `data` is
# kept as MapType — the router is schema-free by design; per-table
# schemas are applied downstream (P1 permissive-parse semantics).
CDC_ENVELOPE = T.StructType(
    [
        T.StructField("table", T.StringType()),
        T.StructField("type", T.StringType()),
        T.StructField("data", T.MapType(T.StringType(), T.StringType())),
        T.StructField("ts", T.LongType()),
    ]
)


def stream_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """readStream over a driver testdata table (file source; S1/S2
    stand-in). Applies the same footer-probed timestamp-unit handling
    as the batch Catalog — the unit is read from the parquet metadata,
    never assumed."""
    schema = TABLES[name]
    path = f"{sf_dir}/{name}.parquet"
    ts_cols = probe_ts_cols(path, schema, name)
    if ts_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        physical = T.StructType(
            [
                T.StructField(f.name, T.LongType() if f.name in ts_cols else f.dataType)
                for f in schema.fields
            ]
        )
    else:
        physical = schema
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # FileStreamSource requires a directory or glob; the testdata is one
    # parquet FILE per table, so wrap the name in a {}-glob (exact match,
    # basePath resolves to the parent directory).
    df = spark.readStream.schema(physical).parquet(f"{sf_dir}/{{{name}}}.parquet")
    for c in ts_cols:
        # integer `div` — see core.catalog: float division loses µs
        # precision on nano epochs.
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"{c} div 1000")))
    return df.select(*[f.name for f in schema.fields])


def cdc_json_stream(
    spark: SparkSession, input_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Maxwell-envelope JSON stream from a directory (the Kafka topic
    `gmall0523_db_m` stand-in). PERMISSIVE parse: absent fields → null,
    reproducing fastjson's lenient semantics (P1)."""
    reader = spark.readStream.schema(CDC_ENVELOPE)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.option("mode", "PERMISSIVE").json(input_dir)


# The Kafka wire schema the connector's load() produces — used by the
# decode projection and by tests that exercise the decode without a
# broker/connector on the classpath.
KAFKA_WIRE_SCHEMA = T.StructType(
    [
        T.StructField("key", T.BinaryType()),
        T.StructField("value", T.BinaryType()),
        T.StructField("topic", T.StringType()),
        T.StructField("partition", T.IntegerType()),
        T.StructField("offset", T.LongType()),
        T.StructField("timestamp", T.TimestampType()),
        T.StructField("timestampType", T.IntegerType()),
    ]
)


def kafka_source_options(
    topic: str,
    bootstrap_servers: str,
    starting_offsets: str = "latest",
) -> dict[str, str]:
    """Validated option map for the Kafka source — separated from the
    load() so construction logic is unit-testable in environments
    without the connector jar (this container). The connector accepts
    'earliest'/'latest' or a per-partition offset JSON."""
    if not topic:
        raise ValueError("topic must be non-empty")
    if not bootstrap_servers:
        raise ValueError("bootstrap_servers must be non-empty")
    if starting_offsets not in ("earliest", "latest") and not starting_offsets.startswith("{"):
        raise ValueError(
            f"startingOffsets must be 'earliest', 'latest', or an offset "
            f"JSON object, got {starting_offsets!r}"
        )
    return {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
    }


def decode_kafka_records(df: DataFrame) -> DataFrame:
    """The projection kafka_stream applies after load(): UTF-8 decode
    of the binary key/value plus the broker timestamp. Pure column
    logic — testable on any DataFrame with KAFKA_WIRE_SCHEMA."""
    return df.selectExpr(
        "CAST(key AS STRING) AS key",
        "CAST(value AS STRING) AS value",
        "timestamp",
    )


def kafka_stream(
    spark: SparkSession,
    topic: str,
    bootstrap_servers: str,
    starting_offsets: str = "latest",
) -> DataFrame:
    """Production Kafka source (S1): subscribe + engine-managed offsets
    (replacing Redis/MySQL offset hashes, S2/S3 — checkpointing covers
    restart-at-committed-offset). Requires the spark-sql-kafka package
    on the classpath; everything EXCEPT the connector load() itself
    (option assembly, record decode) is unit-tested without it."""
    reader = spark.readStream.format("kafka")
    for k, v in kafka_source_options(topic, bootstrap_servers, starting_offsets).items():
        reader = reader.option(k, v)
    return decode_kafka_records(reader.load())
