"""Retrieval feedback: summary aggregation + score re-rank blend.

Reference semantics:
- signals used | ignored | thumbs_up | thumbs_down per (memory_id,
  memory_type); feedback_score = (positive - negative) / total in
  [-1, 1] where positive = used + thumbs_up, negative = thumbs_down
  (alma/types.py:383-420; storage agg base.py:1147-1169).
- re-rank blend: final = (1 - w) * score + w * (feedback_score + 1) / 2,
  w = 0.15; items without feedback keep their score unchanged
  (alma/retrieval/feedback.py:170-230).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEEDBACK_WEIGHT = 0.15
POSITIVE_SIGNALS = ("used", "thumbs_up")
NEGATIVE_SIGNALS = ("thumbs_down",)


def feedback_summary(feedback: DataFrame) -> DataFrame:
    """Per (memory_id, memory_type): signal counts + feedback_score.
    Map-side combinable conditional counts (no pivot shuffle)."""
    pos = F.sum(F.when(F.col("signal").isin(*POSITIVE_SIGNALS), 1).otherwise(0))
    neg = F.sum(F.when(F.col("signal").isin(*NEGATIVE_SIGNALS), 1).otherwise(0))
    used = F.sum(F.when(F.col("signal") == "used", 1).otherwise(0))
    ignored = F.sum(F.when(F.col("signal") == "ignored", 1).otherwise(0))
    total = F.count("*")
    return feedback.groupBy("memory_id", "memory_type").agg(
        total.alias("total"),
        used.alias("used_count"),
        ignored.alias("ignored_count"),
        pos.alias("positive"),
        neg.alias("negative"),
        ((pos - neg).cast("double") / total).alias("feedback_score"),
    )


def apply_feedback_blend(
    scored: DataFrame,
    summary: DataFrame,
    weight: float = FEEDBACK_WEIGHT,
    memory_type: str | None = None,
    id_col: str = "id",
    score_col: str = "score",
    type_col: str | None = None,
) -> DataFrame:
    """Left-join scores with feedback summaries and blend; coalesce keeps
    the original score when no feedback exists. The summary side is tiny
    relative to candidates -> broadcast.

    Two ways to scope the summary to a memory type: `memory_type`
    filters the summary to ONE literal type (the per-branch form), or
    `type_col` names a column of `scored` to equi-join against the
    summary's memory_type (the post-union form — one broadcast join
    over all types instead of one join per type branch, r8)."""
    s = summary
    if memory_type is not None:
        s = s.filter(F.col("memory_type") == memory_type)
    if type_col is not None:
        s = s.select(
            F.col("memory_id"),
            F.col("memory_type").alias("_fb_type"),
            F.col("feedback_score"),
        )
        out = scored.join(
            F.broadcast(s),
            (scored[id_col] == s["memory_id"])
            & (scored[type_col] == s["_fb_type"]),
            "left",
        ).drop("memory_id", "_fb_type")
    else:
        s = s.select(F.col("memory_id"), F.col("feedback_score"))
        out = scored.join(
            F.broadcast(s), scored[id_col] == s.memory_id, "left"
        ).drop("memory_id")
    blended = F.when(
        F.col("feedback_score").isNotNull(),
        (1.0 - weight) * F.col(score_col)
        + weight * (F.col("feedback_score") + 1.0) / 2.0,
    ).otherwise(F.col(score_col))
    return out.withColumn(score_col, blended)
