"""Gate queries for the remaining SURVEY §2 rows that lacked a
driver-checked oracle entry: memory-health metrics, entity detection,
workflow state reducers, and MMR diversification (rows-only —
inherently sequential greedy selection)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from alma_memory_spark.plans.registry import (
    NOW,
    QUERY_VEC,
    _now,
    _r6,
    _t,
    register,
)

STALE_CUTOFF = "2024-01-01 00:00:00"
WEAK_VALUE = 10.0
ENTITY_RE = "[A-Z][a-z]+"


@register(
    "health_metrics",
    f"""
    SELECT user_id,
           count(*) AS total,
           count(*) FILTER (WHERE value < {WEAK_VALUE}) AS weak_count,
           count(*) FILTER (WHERE ts < TIMESTAMP '{STALE_CUTOFF}') AS stale_count,
           round(count(*) FILTER (WHERE value < {WEAK_VALUE}) * 1.0 / count(*), 6) AS weak_ratio,
           round(count(*) FILTER (WHERE ts < TIMESTAMP '{STALE_CUTOFF}') * 1.0 / count(*), 6) AS stale_ratio
    FROM events
    GROUP BY user_id
    """,
)
def health_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Memory-health metrics: per-scope totals plus weak/stale ratios
    compared against thresholds (reference: MemoryHealthMonitor,
    alma/learning/forgetting.py:873-1208 — weak = strength below
    threshold, stale = not accessed since cutoff). One map-side
    combinable pass with conditional counts; no second scan per metric."""
    ev = _t(spark, sf_dir, "events")
    weak = F.count(F.when(F.col("value") < WEAK_VALUE, 1))
    stale = F.count(F.when(F.col("ts") < F.to_timestamp(F.lit(STALE_CUTOFF)), 1))
    return ev.groupBy("user_id").agg(
        F.count("*").alias("total"),
        weak.alias("weak_count"),
        stale.alias("stale_count"),
        _r6(weak * F.lit(1.0) / F.count("*")).alias("weak_ratio"),
        _r6(stale * F.lit(1.0) / F.count("*")).alias("stale_ratio"),
    )


@register(
    "entity_candidates",
    f"""
    SELECT entity,
           count(*) AS freq,
           count(DISTINCT doc_id) AS n_docs
    FROM (
      SELECT doc_id, unnest(regexp_extract_all(text, '{ENTITY_RE}')) AS entity
      FROM documents
    )
    GROUP BY entity
    HAVING count(*) >= 3
    """,
)
def entity_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity detection, frequency stage: candidate capitalized tokens
    with corpus frequency >= min_frequency 3 (reference:
    alma/extraction/entity_detector.py:401-728 — frequency/casing/pattern
    scoring with min_frequency). regexp_extract_all + explode keeps the
    tokenization JVM-side (no Python row loop); the aggregate is
    map-side combinable on the entity key."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id",
            F.explode(
                F.regexp_extract_all(F.col("text"), F.lit(ENTITY_RE), 0)
            ).alias("entity"),
        )
        .groupBy("entity")
        .agg(
            F.count("*").alias("freq"),
            F.count_distinct("doc_id").alias("n_docs"),
        )
        .filter(F.col("freq") >= 3)
    )


@register(
    "state_reducers",
    """
    SELECT user_id,
           CAST(sum(value::DECIMAL(18,4)) AS DOUBLE) AS sum_value,
           max(value) AS max_value,
           min(value) AS min_value,
           count(DISTINCT event_type) AS union_size,
           count(*) AS append_length
    FROM events
    GROUP BY user_id
    """,
)
def state_reducers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Workflow state reducers as keyed aggregation: the sum / max /
    min / union / append merge strategies for parallel branch states
    (reference: alma/workflow/reducers.py:50-235 — per-field configurable
    reducers merging branch states). union -> distinct cardinality,
    append -> row count; DECIMAL sum keeps the distributed fold
    order-independent."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("sum_value"),
        F.max("value").alias("max_value"),
        F.min("value").alias("min_value"),
        F.count_distinct("event_type").alias("union_size"),
        F.count("*").alias("append_length"),
    )


@register("mmr_diversify", None)  # rows-only: greedy sequential selection
def mmr_diversify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR diversification end-to-end: distributed exact cosine top-50
    candidate stage, then the driver-side greedy re-order
    next = argmax(score - lambda * max_sim_to_selected) with pairwise
    sim estimated as sqrt(sim_a * sim_b) (reference:
    alma/retrieval/engine.py:639-715). Inherently sequential over <= 50
    collected rows — the one deliberately non-distributed operator,
    applied AFTER the distributed top-k; rows-only driver check."""
    from alma_memory_spark.functions.vector import cosine_similarity
    from alma_memory_spark.operators.mmr import mmr_rerank

    emb = _t(spark, sf_dir, "embeddings")
    qlit = F.array(*[F.lit(float(x)) for x in QUERY_VEC])
    cand = (
        emb.select(
            "vec_id", _r6(cosine_similarity("embedding", qlit)).alias("similarity")
        )
        .orderBy(F.desc("similarity"), F.asc("vec_id"))
        .limit(50)
    )
    rows = [r.asDict() for r in cand.collect()]
    for r in rows:
        r["score"] = r["similarity"]
    picked = mmr_rerank(rows, diversity_factor=0.3, top_k=10, sim_key="similarity")
    out = [
        (i + 1, r["vec_id"], float(r["similarity"])) for i, r in enumerate(picked)
    ]
    return spark.createDataFrame(out, "mmr_rank INT, vec_id BIGINT, similarity DOUBLE")
