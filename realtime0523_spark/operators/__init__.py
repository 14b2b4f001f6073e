from realtime0523_spark.operators.allocation import allocate_order_amount
from realtime0523_spark.operators.windows import first_flag, running_sum, topk_per_group
from realtime0523_spark.operators.dedup import (
    dedup_first_by_key,
    distinct_daily_users,
    first_seen_members,
    never_seen_members,
)
from realtime0523_spark.operators.joins import order_wide_join, enrich_dims

__all__ = [
    "allocate_order_amount",
    "first_flag",
    "running_sum",
    "topk_per_group",
    "dedup_first_by_key",
    "distinct_daily_users",
    "first_seen_members",
    "never_seen_members",
    "order_wide_join",
    "enrich_dims",
]
