"""Sources layer (SURVEY §2.1 S4-S6, §2.2 K4): option plumbing and
the properties parser. No database ships in the container, so the
JDBC wrappers are verified up to the configured reader/writer."""

from __future__ import annotations

import pytest

from realtime0523_spark.sources import jdbc_scan, jdbc_write, load_properties


def test_load_properties(tmp_path):
    p = tmp_path / "config.properties"
    p.write_text(
        "# hosts\n"
        "kafka.broker.list = h102:9092,h103:9092\n"
        "redis.host=h102\n"
        "\n"
        "! another comment\n"
        "redis.port=6379\n"
    )
    props = load_properties(p)
    assert props == {
        "kafka.broker.list": "h102:9092,h103:9092",
        "redis.host": "h102",
        "redis.port": "6379",
    }


def test_load_properties_rejects_malformed(tmp_path):
    p = tmp_path / "bad.properties"
    p.write_text("not a pair\n")
    with pytest.raises(ValueError, match="malformed"):
        load_properties(p)


def test_jdbc_scan_partitioned_requires_bounds(spark):
    with pytest.raises(ValueError, match="partition_column requires"):
        jdbc_scan(
            spark,
            "jdbc:mysql://h102:3306/gmall",
            "trademark_amount_stat",
            partition_column="id",
        )


def test_jdbc_scan_builds_reader(spark):
    reader = jdbc_scan(
        spark,
        "jdbc:mysql://h102:3306/gmall",
        "(SELECT id, amount FROM trademark_amount_stat) t",
        properties={"user": "root"},
        partition_column="id",
        lower_bound=0,
        upper_bound=1000,
        num_partitions=4,
    )
    # Executing would need a driver; the contract here is that the
    # reader is configured (format+options) without touching a DB.
    assert reader._jreader is not None


def test_jdbc_write_builds_writer(spark):
    df = spark.range(10).toDF("id")
    writer = jdbc_write(df, "jdbc:clickhouse://h102:8123/default", "t_order_wide")
    assert writer._jwrite is not None
