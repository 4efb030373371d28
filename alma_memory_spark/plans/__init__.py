from alma_memory_spark.plans import extended_queries  # noqa: F401  (registers queries)
from alma_memory_spark.plans import hybrid_queries  # noqa: F401  (registers queries)
from alma_memory_spark.plans import ingest_queries  # noqa: F401  (registers queries)
from alma_memory_spark.plans import lifecycle_queries  # noqa: F401  (registers queries)
from alma_memory_spark.plans import media_queries  # noqa: F401  (registers queries)
from alma_memory_spark.plans import memory_queries  # noqa: F401  (registers queries)
from alma_memory_spark.plans import store_queries  # noqa: F401  (registers queries)
from alma_memory_spark.plans import streaming_queries  # noqa: F401  (registers queries)
from alma_memory_spark.plans import text_queries  # noqa: F401  (registers queries)
from alma_memory_spark.plans.registry import QUERIES  # noqa: F401


def oracles() -> dict[str, str]:
    return {n: s.oracle for n, s in QUERIES.items() if s.oracle is not None}
