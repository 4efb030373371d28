"""Hybrid retrieval fusion: vector ranking + text ranking -> RRF.

Reference (alma/retrieval/hybrid.py:113-178): score =
sum over sources of weight * 1 / (rrf_k + rank), rrf_k = 60; items
missing from one ranking contribute only the other term. Implemented as
window rankings + full-outer join — both rankings are already top-k
small, so the join broadcasts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F
from alma_memory_spark.functions.window import bounded_rank_w

RRF_K = 60


def rrf_fuse(
    vector_ranked: DataFrame,
    text_ranked: DataFrame,
    id_col: str = "id",
    vector_order: str = "similarity",
    text_order: str = "text_score",
    vector_weight: float = 0.5,
    text_weight: float = 0.5,
    rrf_k: int = RRF_K,
    keep_scores: bool = False,
) -> DataFrame:
    """Fuse two ranked candidate sets; returns (id, rrf_score, vector
    rank, text rank) sorted desc with id tiebreak. With keep_scores the
    source scores ride through as vector_score/text_score (0.0 for the
    absent side), matching the reference's HybridResult provenance
    fields (hybrid.py:37-47)."""
    a_cols = [
        F.col(id_col),
        F.row_number()
        .over(bounded_rank_w(id_col, F.desc(vector_order), F.asc(id_col)))
        .alias("vector_rank"),
    ]
    b_cols = [
        F.col(id_col),
        F.row_number()
        .over(bounded_rank_w(id_col, F.desc(text_order), F.asc(id_col)))
        .alias("text_rank"),
    ]
    if keep_scores:
        a_cols.append(F.col(vector_order).alias("vector_score"))
        b_cols.append(F.col(text_order).alias("text_score"))
    a = vector_ranked.select(*a_cols)
    b = text_ranked.select(*b_cols)
    fused = a.join(b, id_col, "full_outer").withColumn(
        "rrf_score",
        F.coalesce(F.lit(vector_weight) / (F.lit(rrf_k) + F.col("vector_rank")), F.lit(0.0))
        + F.coalesce(F.lit(text_weight) / (F.lit(rrf_k) + F.col("text_rank")), F.lit(0.0)),
    )
    if keep_scores:
        fused = fused.withColumn(
            "vector_score", F.coalesce("vector_score", F.lit(0.0))
        ).withColumn("text_score", F.coalesce("text_score", F.lit(0.0)))
    return fused.orderBy(F.desc("rrf_score"), F.asc(id_col))
