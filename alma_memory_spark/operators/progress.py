"""Progress tracking queries: the reference's ProgressTracker
(alma/progress/tracker.py) re-expressed over a `work_items` DataFrame.

The reference keeps work items in a driver dict and loops; here every
query is a filter/agg/window over the store's work_items table, so a
project with millions of tracked items (the 100 TB pipeline case:
per-document processing units) answers from partition-pruned scans.

Semantics (tracker.py line refs):
- actionable (types.py:124-127): status in (pending, in_progress) AND
  blocked_by empty; agent filter matches the agent's items plus
  unassigned ones (tracker.py:262-270).
- next-item strategies (tracker.py:292-334): priority (priority DESC),
  blocked_unblock (count of other items whose blocked_by contains the
  candidate, DESC), quick_win (fewest acceptance_criteria),
  fifo (created_at ASC). The reference's Python sorts are stable on
  insertion order; the DataFrame form pins the deterministic tiebreak
  (created_at ASC, id ASC) explicitly.
- summary (tracker.py:338-395): per-status counts, completion_rate
  done/total, success_rate done/(done+failed), total/avg time,
  last_activity = max(updated_at).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ACTIONABLE_STATUSES = ("pending", "in_progress")
STRATEGIES = ("priority", "blocked_unblock", "quick_win", "fifo")


def for_agent(items: DataFrame, agent: str | None) -> DataFrame:
    """Agent scope: the agent's items plus unassigned ones."""
    if agent is None:
        return items
    return items.filter((F.col("agent") == agent) | F.col("agent").isNull())


def actionable_items(items: DataFrame, agent: str | None = None) -> DataFrame:
    return for_agent(items, agent).filter(
        F.col("status").isin(*ACTIONABLE_STATUSES)
        & (F.coalesce(F.size("blocked_by"), F.lit(0)) == 0)
    )


def next_item(
    items: DataFrame, agent: str | None = None, strategy: str = "priority"
) -> DataFrame:
    """Top-1 actionable item under the strategy (TakeOrderedAndProject)."""
    act = actionable_items(items, agent)
    tiebreak = [F.asc("created_at"), F.asc("id")]
    if strategy == "priority":
        ordered = act.orderBy(F.desc("priority"), *tiebreak)
    elif strategy == "blocked_unblock":
        # count, per candidate, how many OTHER items it blocks: explode
        # every item's blocked_by and aggregate on the blocker id —
        # one shuffle keyed by blocker, map-side combinable
        unblocks = (
            items.select(F.explode("blocked_by").alias("blocker_id"))
            .groupBy("blocker_id")
            .agg(F.count("*").alias("unblock_count"))
        )
        ordered = (
            act.join(F.broadcast(unblocks), act["id"] == unblocks["blocker_id"], "left")
            .drop("blocker_id")
            .withColumn("unblock_count", F.coalesce("unblock_count", F.lit(0)))
            .orderBy(F.desc("unblock_count"), *tiebreak)
        )
    elif strategy == "quick_win":
        ordered = act.orderBy(
            F.coalesce(F.size("acceptance_criteria"), F.lit(0)).asc(), *tiebreak
        )
    elif strategy == "fifo":
        ordered = act.orderBy(*tiebreak)
    else:
        raise ValueError(f"unknown strategy: {strategy} (one of {STRATEGIES})")
    return ordered.limit(1)


def progress_summary(items: DataFrame, agent: str | None = None) -> DataFrame:
    """One-row summary frame (the ProgressSummary counts/rates)."""
    scoped = for_agent(items, agent)

    def n(status: str) -> F.Column:
        return F.count(F.when(F.col("status") == status, 1))

    done, failed = n("done"), n("failed")
    total = F.count("*")
    return scoped.agg(
        total.alias("total"),
        n("done").alias("done"),
        n("in_progress").alias("in_progress"),
        n("blocked").alias("blocked"),
        n("pending").alias("pending"),
        n("failed").alias("failed"),
        F.when(total > 0, done / total).otherwise(F.lit(0.0)).alias("completion_rate"),
        F.when((done + failed) > 0, done / (done + failed))
        .otherwise(F.lit(0.0))
        .alias("success_rate"),
        F.coalesce(F.sum("time_spent_ms"), F.lit(0)).alias("total_time_ms"),
        F.when(done > 0, F.coalesce(F.sum("time_spent_ms"), F.lit(0)) / done)
        .otherwise(F.lit(0.0))
        .alias("avg_time_per_item_ms"),
        F.max("updated_at").alias("last_activity"),
    )
