from alma_memory_spark.sources.store import ParquetStore  # noqa: F401
