# Import order = registration order = the order the driver's
# correctness harness sees queries(). Highest-value gates first (the
# e2e serving path and real-store write paths), so that any cap on the
# driver side truncates the cheap micro-gates, never the core ones.
# registry.py's own core gates always register first (every module
# imports it).
from alma_memory_spark.plans import store_queries  # noqa: F401  (registers queries)
from alma_memory_spark.plans import hybrid_queries  # noqa: F401  (registers queries)
from alma_memory_spark.plans import streaming_queries  # noqa: F401  (registers queries)
from alma_memory_spark.plans import ingest_queries  # noqa: F401  (registers queries)
from alma_memory_spark.plans import lifecycle_queries  # noqa: F401  (registers queries)
from alma_memory_spark.plans import media_queries  # noqa: F401  (registers queries)
from alma_memory_spark.plans import memory_queries  # noqa: F401  (registers queries)
from alma_memory_spark.plans import extended_queries  # noqa: F401  (registers queries)
from alma_memory_spark.plans import text_queries  # noqa: F401  (registers queries)
from alma_memory_spark.plans.registry import QUERIES  # noqa: F401


def oracles() -> dict[str, str]:
    return {n: s.oracle for n, s in QUERIES.items() if s.oracle is not None}
