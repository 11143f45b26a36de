from firstamerican_etl_spark.operators.relational import (
    asymmetric_left_join,
    dedup_top1_per_group,
    is_empty,
    left_join,
    top_k_per_group,
)

__all__ = [
    "asymmetric_left_join",
    "dedup_top1_per_group",
    "is_empty",
    "left_join",
    "top_k_per_group",
]
