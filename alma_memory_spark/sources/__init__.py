from alma_memory_spark.sources.store import ParquetStore  # noqa: F401


def make_store(spark, root: str, backend: str = "parquet") -> ParquetStore:
    """Store factory behind the one ParquetStore API.

    - 'parquet' (default): directory-swap protocol + same-host flock —
      zero log overhead, single writer host (the reference's one-SQLite-
      connection shape).
    - 'txlog': commit-log protocol with optimistic concurrency
      (sources/txstore.py) — survives multiple writers without a shared
      lock; the 100 TB / multi-host choice. 'txlog-nolock' drops the
      same-host flock fast path too (pure optimistic retry — what a
      cross-host deployment exercises).
    """
    if backend == "parquet":
        return ParquetStore(spark, root)
    if backend in ("txlog", "txlog-nolock"):
        from alma_memory_spark.sources.txstore import TxLogStore

        return TxLogStore(spark, root, lock=(backend == "txlog"))
    raise ValueError(f"unknown store backend: {backend}")
