from __future__ import annotations

import pytest

from realtime0523_spark.core.catalog import TABLES, Catalog
from tests.conftest import SF_SMOKE

EXPECTED_MIN_ROWS = {
    "region": 5,
    "nation": 25,
    "customer": 100,
    "supplier": 5,
    "part": 100,
    "orders": 1000,
    "lineitem": 5000,
    "events": 500,
    "documents": 100,
    "embeddings": 100,
}


def test_all_tables_load_with_registered_schema(spark):
    cat = Catalog(spark, SF_SMOKE)
    for name in TABLES:
        df = cat.table(name)
        assert df.count() >= EXPECTED_MIN_ROWS[name], name
        assert [f.name for f in df.schema.fields] == [
            f.name for f in TABLES[name].fields
        ], name


def test_timestamp_columns_are_timestamps(spark):
    cat = Catalog(spark, SF_SMOKE)
    assert dict(cat.table("events").dtypes)["ts"] == "timestamp"
    assert dict(cat.table("orders").dtypes)["o_orderdate"] == "timestamp"
    row = cat.table("events").selectExpr("min(year(ts)) y").first()
    assert row.y >= 2000  # nano→micro conversion didn't land in 1970


def test_unknown_table_raises(spark):
    with pytest.raises(KeyError):
        Catalog(spark, SF_SMOKE).table("nope")
