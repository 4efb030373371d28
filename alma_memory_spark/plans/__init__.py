from alma_memory_spark.plans.registry import ORACLES, QUERIES  # noqa: F401
