"""Golden-output gate: every inventory query vs its DuckDB oracle at
sf0.001 (the driver runs the same comparison at sf0.01)."""

from __future__ import annotations

import pytest

from realtime0523_spark.plans import REGISTRY
from tests.conftest import SF_SMOKE
from tools.check_oracle import compare, duckdb_con


@pytest.fixture(scope="module")
def con():
    return duckdb_con(SF_SMOKE)


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, con, name):
    spec = REGISTRY[name]
    sdf = spec.fn(spark, SF_SMOKE).toPandas()
    if spec.oracle is None:
        assert len(sdf) > 0
        return
    odf = con.execute(spec.oracle).df()
    issues = compare(sdf, odf)
    assert not issues, issues


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
