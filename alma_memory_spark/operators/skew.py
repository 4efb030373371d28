"""Skew-safe aggregation helpers: salting for hot keys.

AQE's skew-join splitting handles JOIN skew automatically
(spark.sql.adaptive.skewJoin, on in session.py), but WINDOW ranking
over a hot key cannot be split by AQE: all rows of one key land on one
task (`row_number() OVER (PARTITION BY key ...)`). The classic fix is
two-phase salted top-k:

  phase 1: rank within (key, salt) — the hot key spreads over n_salts
           tasks, each keeping only its local top-k;
  phase 2: rank the surviving <= n_salts * k rows per key — the final
           single-task pass sees a bounded input no matter how hot the
           key was.

This is exactly the partial/final shape Catalyst already applies to
algebraic aggregates (map-side combine); salting extends it to the
non-algebraic top-k. The per-type top-k in retrieval
(operators/retrieval.py threshold_topk, reference engine.py:829-847)
uses the plain window because memory types are few and balanced; this
helper is the 100 TB escape hatch for per-key rankings over
user-supplied keys (quota enforcement per agent, per-question candidate
pools) where one tenant can be 1000x another.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def salted_topk(
    df: DataFrame,
    keys: list[str],
    order_by: list[Column],
    k: int,
    salt_from: str,
    n_salts: int = 16,
) -> DataFrame:
    """Top-k rows per key, skew-safe, result identical to the direct
    `row_number() OVER (PARTITION BY keys ORDER BY order_by) <= k`.

    `salt_from` is a column whose deterministic hash spreads each key's
    rows across `n_salts` sub-partitions (use a unique id — a low-
    cardinality column would defeat the spread). The ordering must be
    total (include a unique tiebreaker) for the equivalence to be
    exact, same as every top-k in this repo."""
    salt = F.pmod(F.xxhash64(F.col(salt_from)), F.lit(n_salts))
    w1 = W.partitionBy(*keys, "_salt").orderBy(*order_by)
    partial = (
        df.withColumn("_salt", salt)
        .withColumn("_rn", F.row_number().over(w1))
        .filter(F.col("_rn") <= k)
        .drop("_salt", "_rn")
    )
    w2 = W.partitionBy(*keys).orderBy(*order_by)
    return (
        partial.withColumn("_rn", F.row_number().over(w2))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )
