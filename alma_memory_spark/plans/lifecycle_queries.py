"""Third batch of oracle-paired queries: verification classification,
strength decay with access reinforcement, and graph-style multi-hop
reachability — lifecycle + graph operator families over the synthetic
tables."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from alma_memory_spark.plans.registry import NOW, _now, _r6, _t, register


@register(
    "verification_classify",
    """
    SELECT o_orderkey,
           round(least(o_totalprice / 434567.0, 1.0), 6) AS confidence,
           CASE WHEN least(o_totalprice / 434567.0, 1.0) >= 0.7 THEN 'verified'
                ELSE 'uncertain' END AS verification_status,
           CASE WHEN least(o_totalprice / 434567.0, 1.0) >= 0.7 THEN 'high'
                WHEN least(o_totalprice / 434567.0, 1.0) >= 0.35 THEN 'moderate'
                ELSE 'low' END AS confidence_band
    FROM orders
    """,
)
def verification_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confidence-fallback verification (reference:
    alma/retrieval/verification.py:690-729): confidence >= threshold
    (0.7) -> verified, >= threshold/2 -> uncertain/moderate, else
    uncertain/low. Normalized order value stands in for the stored
    confidence. Pure when/otherwise columns — classification at scan
    speed, then persisted as the verification_status column."""
    orders = _t(spark, sf_dir, "orders")
    conf = F.least(F.col("o_totalprice") / 434567.0, F.lit(1.0))
    status = F.when(conf >= 0.7, "verified").otherwise("uncertain")
    band = (
        F.when(conf >= 0.7, "high").when(conf >= 0.35, "moderate").otherwise("low")
    )
    return orders.select(
        "o_orderkey",
        _r6(conf).alias("confidence"),
        status.alias("verification_status"),
        band.alias("confidence_band"),
    )


@register(
    "strength_decay",
    f"""
    SELECT event_id,
           round(least(1.0, greatest(0.0,
             ( exp(-0.693 * ((epoch(TIMESTAMP '{NOW}') - epoch(ts)) / 86400.0) / 30.0)
               + least(0.4, 0.1 * ln(1.0 + coalesce(CAST(json_extract_string(props, '$.k') AS DOUBLE), 0.0)))
             ) * 0.75
           )), 6) AS strength
    FROM events
    WHERE ts <= TIMESTAMP '{NOW}'
    """,
)
def strength_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Memory-strength decay, reference-exact (alma/learning/decay.py:
    15-22, 76-126): (base_decay + min(0.4, 0.1*log1p(access))) *
    (0.5 + 0.5*importance), importance at the 0.5 default -> x0.75.
    The props.k counter stands in for access_count. Spark side calls the
    SAME strength_decay() column function the engine uses, so the gate
    pins the production expression. Decay-at-read: stateless column
    expression over event time — identical in batch and streaming."""
    from alma_memory_spark.functions.temporal import strength_decay as sd

    ev = _t(spark, sf_dir, "events").filter(F.col("ts") <= _now())
    k = F.get_json_object("props", "$.k").cast("double")
    s = sd("ts", _now(), 30.0, 1.0, k)
    return ev.select("event_id", _r6(s).alias("strength"))


@register(
    "graph_2hop_reach",
    """
    WITH hop1 AS (
      SELECT n_nationkey AS id, 'nation' AS kind, 1 AS hop
      FROM nation JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
    ), hop2 AS (
      SELECT c_custkey AS id, 'customer' AS kind, 2 AS hop
      FROM customer WHERE c_nationkey IN (SELECT id FROM hop1)
      UNION ALL
      SELECT s_suppkey AS id, 'supplier' AS kind, 2 AS hop
      FROM supplier WHERE s_nationkey IN (SELECT id FROM hop1)
    )
    SELECT * FROM hop1 UNION ALL SELECT * FROM hop2
    """,
)
def graph_2hop_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-hop graph reachability as iterative frontier joins (reference:
    var-length traversal, alma/graph/store.py:355-411): region ASIA ->
    hop-1 nations -> hop-2 customers and suppliers. Each hop is one
    semi-join against the (broadcast) frontier — the same shape
    operators/graph.py uses for arbitrary edges."""
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    customer = _t(spark, sf_dir, "customer")
    supplier = _t(spark, sf_dir, "supplier")
    hop1 = (
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select(
            F.col("n_nationkey").cast("long").alias("id"),
            F.lit("nation").alias("kind"),
            F.lit(1).alias("hop"),
        )
    )
    frontier = hop1.select(F.col("id").alias("nk"))
    h2c = customer.join(
        F.broadcast(frontier), customer.c_nationkey == F.col("nk"), "left_semi"
    ).select(
        F.col("c_custkey").cast("long").alias("id"),
        F.lit("customer").alias("kind"),
        F.lit(2).alias("hop"),
    )
    h2s = supplier.join(
        F.broadcast(frontier), supplier.s_nationkey == F.col("nk"), "left_semi"
    ).select(
        F.col("s_suppkey").cast("long").alias("id"),
        F.lit("supplier").alias("kind"),
        F.lit(2).alias("hop"),
    )
    return hop1.unionByName(h2c).unionByName(h2s)