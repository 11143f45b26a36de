from firstamerican_etl_spark.plans.registry import REGISTRY, QuerySpec, register

__all__ = ["REGISTRY", "QuerySpec", "register"]
