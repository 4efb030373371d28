"""Lifecycle layer: decay states, forgetting (age / confidence / quota),
health metrics.

Reference semantics:
- MemoryStrength decay (alma/learning/decay.py:43-122): exponential
  half-life from last_accessed with access-count reinforcement and
  explicit importance; strength bands (active > 0.7, weak 0.3-0.7,
  stale 0.1-0.3, forgotten < 0.1) drive archive/forget decisions.
- Forgetting (alma/learning/forgetting.py): age cutoff (timestamp <
  now - max_age), confidence threshold (< min_confidence), per-agent
  quotas (keep top N heuristics by confidence / newest N outcomes by
  timestamp; forgetting.py:441-516). Every delete writes the audit sink
  FIRST (forgetting.py:306-330).
- Decay-at-read: strength is a column expression over timestamps —
  never stored stale, safe in batch and streaming.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from alma_memory_spark.functions.temporal import strength_decay

#: the prunable memory tables and their event-time column — THE single
#: source for every forget/retention consumer (engine.select_doomed_ids,
#: the maintenance scheduler's table loop and dry-run)
FORGET_TS_COLS = {
    "heuristics": "last_validated",
    "outcomes": "timestamp",
    "domain_knowledge": "last_verified",
    "anti_patterns": "last_seen",
}

QUOTA_METRIC = {
    "heuristics": ("confidence", "desc"),
    "outcomes": ("timestamp", "desc"),
    "domain_knowledge": ("confidence", "desc"),
    "anti_patterns": ("occurrence_count", "desc"),
}


def with_strength(
    strength_df: DataFrame, now: datetime, strength_col: str = "strength"
) -> DataFrame:
    """Attach current decayed strength + band to a memory_strength table.

    Recent-reinforcement count = events within the last 7 days
    (reference: decay.py:109-115); the array filter is a per-row map,
    no shuffle."""
    recent = F.lit(0)
    if "reinforcement_events" in strength_df.columns:
        cutoff = F.lit(now).cast("timestamp").cast("double") - 7 * 86400.0
        recent = F.size(
            F.filter(
                F.coalesce(F.col("reinforcement_events"), F.array()),
                lambda r: r.cast("double") > cutoff,
            )
        )
    s = strength_decay(
        "last_accessed",
        now,
        F.col("decay_half_life_days").cast("double"),
        F.col("initial_strength"),
        F.col("access_count"),
        F.col("explicit_importance"),
        recent,
    )
    band = (
        F.when(F.col(strength_col) > 0.7, "active")
        .when(F.col(strength_col) > 0.3, "weak")
        .when(F.col(strength_col) > 0.1, "stale")
        .otherwise("forgotten")
    )
    return strength_df.withColumn(strength_col, s).withColumn("band", band)


def select_expired(memories: DataFrame, ts_col: str, cutoff: datetime) -> DataFrame:
    """Age-based forget set: rows older than the cutoff
    (reference: DELETE WHERE timestamp < cutoff, sqlite_local.py:1438-1459)."""
    return memories.filter(F.col(ts_col) < F.lit(cutoff))


def select_low_confidence(memories: DataFrame, threshold: float) -> DataFrame:
    """Confidence-based forget set (sqlite_local.py:1461-1482)."""
    return memories.filter(F.col("confidence") < F.lit(threshold))


def select_over_quota(
    memories: DataFrame, memory_type: str, quota: int
) -> DataFrame:
    """Per-agent quota enforcement: rank by the type's retention metric,
    return rows beyond the quota (the delete set;
    forgetting.py:441-516). One window shuffle on (project, agent)."""
    metric, direction = QUOTA_METRIC[memory_type]
    order = [F.desc(metric) if direction == "desc" else F.asc(metric), F.asc("id")]
    w = W.partitionBy("project_id", "agent").orderBy(*order)
    return (
        memories.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") > quota)
        .drop("_rk")
    )


def health_metrics(
    tables: dict[str, DataFrame],
    now: datetime,
    weak_confidence: float = 0.3,
    stale_days: int = 90,
) -> dict[str, float]:
    """Memory health: totals, weak/stale ratios (reference:
    forgetting.py:873-1208). ONE Spark job: each table contributes a
    one-row aggregate branch (weak/stale padded with NULL where the
    table lacks the column), unioned and collected once — the same
    union-then-single-collect shape as engine.retrieve()."""
    out: dict[str, float] = {}
    ts_col = {
        "heuristics": "last_validated",
        "outcomes": "timestamp",
        "domain_knowledge": "last_verified",
        "anti_patterns": "last_seen",
        "preferences": "timestamp",
    }
    branches = []
    for name, df in tables.items():
        aggs = [F.count(F.lit(1)).alias("n")]
        if "confidence" in df.columns:
            aggs.append(
                F.sum(
                    F.when(F.col("confidence") < weak_confidence, 1).otherwise(0)
                ).alias("weak")
            )
        else:
            aggs.append(F.max(F.lit(None).cast("long")).alias("weak"))
        tc = ts_col.get(name)
        if tc and tc in df.columns:
            cutoff = F.lit(now).cast("timestamp").cast("double") - stale_days * 86400.0
            aggs.append(
                F.sum(
                    F.when(F.col(tc).cast("double") < cutoff, 1).otherwise(0)
                ).alias("stale")
            )
        else:
            aggs.append(F.max(F.lit(None).cast("long")).alias("stale"))
        branches.append(df.agg(*aggs).select(F.lit(name).alias("_table"), "*"))
    if not branches:
        return {"total": 0.0}
    unioned = branches[0]
    for b in branches[1:]:
        unioned = unioned.unionByName(b)
    total = 0
    for row in unioned.collect():
        r = row.asDict()
        name, n = r["_table"], r["n"] or 0
        total += n
        out[f"{name}_count"] = float(n)
        if r["weak"] is not None and n:
            out[f"{name}_weak_ratio"] = round(r["weak"] / n, 6)
        if r["stale"] is not None and n:
            out[f"{name}_stale_ratio"] = round(r["stale"] / n, 6)
    out["total"] = float(total)
    return out
