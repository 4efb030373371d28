"""Trust-aware scoring: per-agent trust profiles blended into retrieval.

Reference semantics (alma/retrieval/trust_scoring.py:63-170, 245+):
- trust = 0.4 * performance + 0.4 * mean(behavior dims) + 0.2 * 0.5,
  decayed by e^(-0.693 * days_since_update / 30) with floor 0.5,
  plus a success-streak bonus min(streak * 0.02, 0.1);
- trust-aware composite uses 5 weights (sim .35, recency .25,
  success .15, confidence .10, trust .15).
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from alma_memory_spark.functions.temporal import days_between

TRUST_WEIGHTS = {
    "similarity": 0.35,
    "recency": 0.25,
    "success_rate": 0.15,
    "confidence": 0.10,
    "trust": 0.15,
}
LN2 = 0.6931471805599453
TRUST_HALF_LIFE_DAYS = 30.0
TRUST_FLOOR = 0.5
STREAK_BONUS_PER = 0.02
STREAK_BONUS_CAP = 0.1


def trust_score_expr(now: datetime) -> Column:
    """Current trust from a trust-profile row."""
    behavior = F.aggregate(
        F.col("behavior_scores"), F.lit(0.0), lambda a, x: a + x
    ) / F.greatest(F.size("behavior_scores").cast("double"), F.lit(1.0))
    base = (
        F.lit(0.4) * F.col("performance_score")
        + F.lit(0.4) * behavior
        + F.lit(0.2) * F.lit(0.5)
    )
    age = F.greatest(days_between(F.lit(now), "last_updated"), F.lit(0.0))
    decay = F.greatest(
        F.exp(F.lit(-LN2) * age / F.lit(TRUST_HALF_LIFE_DAYS)), F.lit(TRUST_FLOOR)
    )
    streak = F.least(
        F.col("success_streak").cast("double") * F.lit(STREAK_BONUS_PER),
        F.lit(STREAK_BONUS_CAP),
    )
    return F.least(base * decay + streak, F.lit(1.0))


def with_trust(profiles: DataFrame, now: datetime) -> DataFrame:
    return profiles.select("agent", trust_score_expr(now).alias("trust"))


def trust_aware_score(
    scored: DataFrame,
    profiles: DataFrame,
    now: datetime,
    default_trust: float = 0.5,
) -> DataFrame:
    """Join candidate rows with their source agent's trust and compute
    the 5-weight composite. Profiles are per-agent (tiny) -> broadcast."""
    t = with_trust(profiles, now)
    out = scored.join(F.broadcast(t), "agent", "left").withColumn(
        "trust", F.coalesce(F.col("trust"), F.lit(default_trust))
    )
    w = TRUST_WEIGHTS
    return out.withColumn(
        "score",
        F.lit(w["similarity"]) * F.col("sim_score")
        + F.lit(w["recency"]) * F.col("recency_score")
        + F.lit(w["success_rate"]) * F.col("success_score")
        + F.lit(w["confidence"]) * F.col("confidence_score")
        + F.lit(w["trust"]) * F.col("trust"),
    )
