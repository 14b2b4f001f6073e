from realtime0523_spark.plans.inventory import REGISTRY, QuerySpec, queries, oracle_sql
import realtime0523_spark.plans.llm_inventory  # noqa: F401  (registers LLM queries)

__all__ = ["REGISTRY", "QuerySpec", "queries", "oracle_sql"]
