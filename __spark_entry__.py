"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Implementations live in ``alma_memory_spark.plans.registry``; this file
is just the adapter.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the retrieval hot path —
    exact vector top-k (cosine) over the embeddings table, candidate
    semi-join into documents with the similarity score carried through
    (reference: ALMA.retrieve, alma/retrieval/engine.py + FAISS stage
    sqlite_local.py:555-640, re-expressed as DataFrame ops)."""
    from alma_memory_spark.plans import QUERIES

    return QUERIES["ann_candidate_join"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from alma_memory_spark.plans import QUERIES

    return {name: spec.fn for name, spec in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each queries() entry (pre-registered
    views: region nation customer supplier part orders lineitem events
    documents embeddings)."""
    from alma_memory_spark.plans import oracles

    return oracles()
