from realtime0523_spark.plans.inventory import REGISTRY, QuerySpec, queries, oracle_sql

__all__ = ["REGISTRY", "QuerySpec", "queries", "oracle_sql"]
