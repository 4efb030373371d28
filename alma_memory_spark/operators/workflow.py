"""Workflow layer: checkpoints, session handoffs, state reducers.

Reference semantics:
- latest checkpoint per (run_id[, branch_id]) by sequence_number
  (sqlite_local.py:2041-2065) — window row_number desc = 1;
- `skip_if_unchanged` via state_hash comparison (core.py:545-598);
- state reducers merging parallel branch states per field:
  append / merge_dict / last_value / first_value / sum / max / min /
  union (alma/workflow/reducers.py:50-235). Branch states are a handful
  of dicts -> driver-side fold, exactly like the reference; a DataFrame
  variant is provided for when states are modeled as rows.
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def latest_checkpoints(checkpoints: DataFrame, per_branch: bool = True) -> DataFrame:
    keys = ["run_id"] + (["branch_id"] if per_branch else [])
    w = W.partitionBy(*keys).orderBy(F.desc("sequence_number"), F.desc("id"))
    return (
        checkpoints.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .drop("_rk")
    )


def latest_handoffs(handoffs: DataFrame) -> DataFrame:
    w = W.partitionBy("agent").orderBy(F.desc("created_at"), F.desc("id"))
    return (
        handoffs.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .drop("_rk")
    )


def is_unchanged(checkpoints: DataFrame, run_id: str, state_hash: str) -> bool:
    """skip_if_unchanged: does the latest checkpoint of the run carry the
    same state hash?"""
    latest = (
        latest_checkpoints(checkpoints.filter(F.col("run_id") == run_id), per_branch=False)
        .select("state_hash")
        .collect()
    )
    return bool(latest) and latest[0][0] == state_hash


REDUCERS = {
    "last_value": lambda vals: vals[-1],
    "first_value": lambda vals: vals[0],
    "append": lambda vals: [x for v in vals for x in (v if isinstance(v, list) else [v])],
    "merge_dict": lambda vals: {k: v for d in vals if isinstance(d, dict) for k, v in d.items()},
    "sum": lambda vals: sum(vals),
    "max": lambda vals: max(vals),
    "min": lambda vals: min(vals),
    "union": lambda vals: sorted(
        {x for v in vals for x in (v if isinstance(v, (list, set, tuple)) else [v])},
        key=repr,
    ),
}


def merge_states(
    states: list[dict[str, Any]],
    reducers: dict[str, str] | None = None,
    default: str = "last_value",
) -> dict[str, Any]:
    """Merge parallel branch states field-by-field (reducers.py:50-235).
    `reducers` maps field name -> reducer name; unlisted fields use
    `default` (reference default: last_value)."""
    reducers = reducers or {}
    keys: list[str] = []
    for s in states:
        for k in s:
            if k not in keys:
                keys.append(k)
    out: dict[str, Any] = {}
    for k in keys:
        vals = [s[k] for s in states if k in s]
        fn = REDUCERS[reducers.get(k, default)]
        out[k] = fn(vals)
    return out


def merge_checkpoint_states(
    checkpoints: DataFrame,
    run_ids: list[str],
    reducers: dict[str, str] | None = None,
) -> dict[str, Any]:
    """DataFrame variant: take the latest checkpoint state of each run
    (JSON column), parse, fold with merge_states. The collected set is
    one row per branch — tiny by construction."""
    latest = (
        latest_checkpoints(checkpoints.filter(F.col("run_id").isin(run_ids)))
        .orderBy("run_id", "branch_id")
        .select("state")
        .collect()
    )
    states = [json.loads(r[0]) for r in latest if r[0]]
    return merge_states(states, reducers)
