"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The actual inventory lives in realtime0523_spark/plans/inventory.py —
one (PySpark query, DuckDB oracle) pair per implemented operator from
SURVEY.md §2.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (brand revenue over the allocation spine —
    SURVEY §7.1) on /root/testdata/sf0.001."""
    from realtime0523_spark.plans.inventory import REGISTRY

    return REGISTRY["brand_amount"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from realtime0523_spark.plans import inventory

    return inventory.queries()


def oracle_sql() -> dict[str, str]:
    from realtime0523_spark.plans import inventory

    return inventory.oracle_sql()
