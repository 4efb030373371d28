"""Second batch of oracle-paired queries: JSON extraction, feedback /
trust re-rank joins, multi-agent union, mode boosts, stats — the
remaining SURVEY §2 operator families expressible over the synthetic
tables."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from alma_memory_spark.plans.registry import (
    HALF_LIFE_DAYS,
    NOW,
    _QV_SQL,
    QUERY_VEC,
    _now,
    _r6,
    _t,
    register,
)
from alma_memory_spark.functions.vector import cosine_similarity


@register(
    "json_extraction",
    """
    SELECT event_type,
           count(*) AS n,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
    FROM events
    GROUP BY event_type
    """,
)
def json_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON metadata handling: the reference stores `metadata` as a JSON
    dict column and decodes per row (sqlite_local.py:1557). Spark:
    get_json_object stays JVM-side; at scale prefer from_json with an
    explicit schema once per pipeline (single parse, typed columns)."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").alias("sum_k"),
            F.max("k").alias("max_k"),
        )
    )


_BLEND_SQL = f"""
    WITH scores AS (
      SELECT event_id, user_id,
             0.4 * 1.0
             + 0.3 * pow(0.5, (epoch(TIMESTAMP '{NOW}') - epoch(ts)) / 86400.0 / {HALF_LIFE_DAYS})
             + 0.2 * (CASE WHEN event_type <> 'error' THEN 1.0 ELSE 0.3 END)
             + 0.1 * 1.0 AS score
      FROM events WHERE ts <= TIMESTAMP '{NOW}'
    ), fb AS (
      SELECT user_id,
             (count(*) FILTER (WHERE event_type = 'purchase')
              - count(*) FILTER (WHERE event_type = 'error')) * 1.0 / count(*) AS feedback_score
      FROM events GROUP BY user_id
    ), trust AS (
      SELECT user_id,
             least(0.4 * (count(*) FILTER (WHERE event_type = 'purchase') * 1.0 / count(*))
                   + 0.4 * (count(*) FILTER (WHERE event_type <> 'error') * 1.0 / count(*))
                   + 0.2 * 0.5, 1.0) AS trust
      FROM events GROUP BY user_id
    ), scored AS (
      SELECT event_id, user_id,
             pow(0.5, (epoch(TIMESTAMP '{NOW}') - epoch(ts)) / 86400.0 / {HALF_LIFE_DAYS}) AS recency
      FROM events WHERE ts <= TIMESTAMP '{NOW}'
    ), qv AS (SELECT {_QV_SQL} AS q),
    sims AS (
      SELECT vec_id,
        list_sum(list_transform(range(1, len(embedding)+1), i -> embedding[i]::DOUBLE * q[i]))
        / (sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE)))
           * sqrt(list_sum(list_transform(q, x -> x * x)))) AS sim
      FROM embeddings, qv
    )
    SELECT 'feedback' AS method, item_id, score FROM (
      SELECT s.event_id AS item_id,
             round(CASE WHEN f.feedback_score IS NOT NULL
                   THEN 0.85 * s.score + 0.15 * (f.feedback_score + 1.0) / 2.0
                   ELSE s.score END, 6) AS score
      FROM scores s LEFT JOIN fb f ON s.user_id = f.user_id
      ORDER BY score DESC, s.event_id ASC
      LIMIT 100
    )
    UNION ALL
    SELECT 'trust', item_id, score FROM (
      SELECT s.event_id AS item_id,
             round(0.35 * 1.0 + 0.25 * s.recency + 0.15 * 1.0 + 0.10 * 1.0
                   + 0.15 * coalesce(t.trust, 0.5), 6) AS score
      FROM scored s LEFT JOIN trust t ON s.user_id = t.user_id
      ORDER BY score DESC, s.event_id ASC
      LIMIT 100
    )
    UNION ALL
    SELECT 'mode_boost', item_id, score FROM (
      SELECT vec_id AS item_id,
             round(CASE WHEN sim > 0.35 THEN sim * 2.0
                        WHEN sim > 0.25 THEN sim * 1.5
                        ELSE sim END, 6) AS score
      FROM sims
      ORDER BY score DESC, vec_id ASC
      LIMIT 50
    )
    """


@register("blend_scoring", _BLEND_SQL)
def blend_scoring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite gate: the three score-blending joins in one checked
    frame (merged r3 from feedback_blend + trust_blend +
    mode_boost_scoring — all driver-green in r1 but absent from the r2
    driver run; merged per the r2 verdict to fit the 50-query cap).

    'feedback' rows — feedback re-rank join: scored items x feedback
    summaries, final = (1-w)*score + w*(fb+1)/2 with w=0.15; items
    without feedback keep their score (reference:
    alma/retrieval/feedback.py:170-230). The summary side aggregates
    small -> broadcast join.
    'trust' rows — trust-aware scoring: per-source trust
    (0.4*performance + 0.4*behavior + 0.2*0.5) joined into the 5-weight
    composite (.35/.25/.15/.10 + .15*trust) — reference:
    alma/retrieval/trust_scoring.py:63-170,245+; trust profiles are
    per-agent (tiny) -> broadcast.
    'mode_boost' rows — mode-dependent exact-match boosts: sim above
    the high threshold x B, above the mid threshold x (1+(B-1)/2)
    (reference: engine.py:754-802, thresholds scaled to this corpus).
    when/otherwise column multipliers — no extra pass."""
    ev = _t(spark, sf_dir, "events")
    past = ev.filter(F.col("ts") <= _now())
    age = (_now().cast("double") - F.col("ts").cast("double")) / 86400.0
    rec = F.pow(F.lit(0.5), age / HALF_LIFE_DAYS)
    succ = F.when(F.col("event_type") != "error", 1.0).otherwise(0.3)
    scores = past.select(
        "event_id",
        "user_id",
        (F.lit(0.4) + 0.3 * rec + 0.2 * succ + F.lit(0.1)).alias("score"),
    )
    pos = F.count(F.when(F.col("event_type") == "purchase", 1))
    neg = F.count(F.when(F.col("event_type") == "error", 1))
    fb = ev.groupBy("user_id").agg(
        ((pos - neg) * F.lit(1.0) / F.count("*")).alias("feedback_score")
    )
    blended = F.when(
        F.col("feedback_score").isNotNull(),
        0.85 * F.col("score") + 0.15 * (F.col("feedback_score") + 1.0) / 2.0,
    ).otherwise(F.col("score"))
    feedback = (
        scores.join(F.broadcast(fb), "user_id", "left")
        .select(F.col("event_id").alias("item_id"), _r6(blended).alias("score"))
        .orderBy(F.desc("score"), F.asc("item_id"))
        .limit(100)
    )

    perf = F.count(F.when(F.col("event_type") == "purchase", 1)) * F.lit(1.0) / F.count("*")
    behav = F.count(F.when(F.col("event_type") != "error", 1)) * F.lit(1.0) / F.count("*")
    trust = ev.groupBy("user_id").agg(
        F.least(0.4 * perf + 0.4 * behav + F.lit(0.2 * 0.5), F.lit(1.0)).alias("trust")
    )
    scored = past.select("event_id", "user_id", rec.alias("recency"))
    texpr = (
        F.lit(0.35)
        + 0.25 * F.col("recency")
        + F.lit(0.15)
        + F.lit(0.10)
        + 0.15 * F.coalesce(F.col("trust"), F.lit(0.5))
    )
    trusted = (
        scored.join(F.broadcast(trust), "user_id", "left")
        .select(F.col("event_id").alias("item_id"), _r6(texpr).alias("score"))
        .orderBy(F.desc("score"), F.asc("item_id"))
        .limit(100)
    )

    emb = _t(spark, sf_dir, "embeddings")
    qlit = F.array(*[F.lit(float(x)) for x in QUERY_VEC])
    sim = cosine_similarity("embedding", qlit)
    boosted_expr = (
        F.when(sim > 0.35, sim * 2.0).when(sim > 0.25, sim * 1.5).otherwise(sim)
    )
    boosted = (
        emb.select(F.col("vec_id").alias("item_id"), _r6(boosted_expr).alias("score"))
        .orderBy(F.desc("score"), F.asc("item_id"))
        .limit(50)
    )
    return (
        feedback.select(F.lit("feedback").alias("method"), "*")
        .unionByName(trusted.select(F.lit("trust").alias("method"), "*"))
        .unionByName(boosted.select(F.lit("mode_boost").alias("method"), "*"))
    )


@register(
    "multi_agent_union",
    """
    SELECT event_id, user_id, event_type,
           CASE WHEN user_id <> 3 THEN user_id END AS shared_from
    FROM events
    WHERE user_id IN (3, 7, 11) AND event_type = 'purchase'
    """,
)
def multi_agent_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-agent shared read: one query over agent IN (self UNION
    inherit_from), rows from other agents tagged shared_from (reference:
    sqlite_local.py:1169-1215, engine.py:180-272). An isin filter + tag
    column — no per-agent round trips."""
    ev = _t(spark, sf_dir, "events")
    me = 3
    return (
        ev.filter(F.col("user_id").isin(me, 7, 11) & (F.col("event_type") == "purchase"))
        .select(
            "event_id",
            "user_id",
            "event_type",
            F.when(F.col("user_id") != me, F.col("user_id")).alias("shared_from"),
        )
    )


@register(
    "table_stats",
    """
    SELECT 'orders' AS table_name, count(*) AS n FROM orders
    UNION ALL SELECT 'lineitem', count(*) FROM lineitem
    UNION ALL SELECT 'customer', count(*) FROM customer
    UNION ALL SELECT 'events', count(*) FROM events
    UNION ALL SELECT 'documents', count(*) FROM documents
    UNION ALL SELECT 'embeddings', count(*) FROM embeddings
    """,
)
def table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stats surface: per-table row counts (reference:
    sqlite_local.py:1486-1527). Parquet count() reads footer metadata
    only — no data scan."""
    parts = []
    for t in ["orders", "lineitem", "customer", "events", "documents", "embeddings"]:
        parts.append(
            _t(spark, sf_dir, t).agg(
                F.count("*").alias("n")
            ).select(F.lit(t).alias("table_name"), "n")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
