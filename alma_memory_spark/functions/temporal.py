"""Temporal column expressions: recency decay, strength decay, as-of predicates.

The reference computes decay lazily at read time from timestamps
(reference: alma/learning/decay.py:74-122, alma/retrieval/scoring.py:271-293)
— never storing stale values. That design is Spark-native: a stateless
column expression over event-time, safe in both batch and streaming.

Determinism note: callers pass an explicit `now` anchor instead of
current_timestamp() so the same query is reproducible (and oracle-
comparable) across engines and runs.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import Column
from pyspark.sql import functions as F

LN2 = 0.6931471805599453


def days_between(now: Column, ts: Column | str) -> Column:
    """Fractional days between two timestamps (seconds / 86400, double)."""
    t = F.col(ts) if isinstance(ts, str) else ts
    return (now.cast("double") - t.cast("double")) / F.lit(86400.0)


def recency_score(
    ts: Column | str, now: datetime | Column, half_life_days: float = 30.0
) -> Column:
    """Exponential half-life recency: 0.5 ** (age_days / half_life).

    Reference semantics: alma/retrieval/scoring.py:271-293 (whole-day
    datediff); we use fractional days which is strictly more precise and
    monotone-identical. Clamped to [0, 1] for future-dated rows.
    """
    now_c = F.lit(now) if isinstance(now, datetime) else now
    d = days_between(now_c, ts)
    return F.least(F.lit(1.0), F.pow(F.lit(0.5), F.greatest(d, F.lit(0.0)) / F.lit(half_life_days)))


def strength_decay(
    last_accessed: Column | str,
    now: datetime | Column,
    half_life_days: Column | float = 30.0,
    initial_strength: Column | float = 1.0,
    access_count: Column | int = 0,
    explicit_importance: Column | float = 0.0,
) -> Column:
    """Memory-strength decay with access reinforcement.

    strength = clamp( initial * exp(-ln2 * age/half_life)
                      * (1 + 0.1 * ln(1 + access_count))
                      + 0.2 * explicit_importance , 0, 1 )

    Mirrors the reference's MemoryStrength model (alma/learning/decay.py:
    43-122): exponential base decay, log1p access bonus, explicit
    importance floor.
    """
    now_c = F.lit(now) if isinstance(now, datetime) else now
    hl = F.lit(half_life_days) if isinstance(half_life_days, (int, float)) else half_life_days
    init = F.lit(initial_strength) if isinstance(initial_strength, (int, float)) else initial_strength
    acc = F.lit(access_count) if isinstance(access_count, int) else access_count
    imp = (
        F.lit(explicit_importance)
        if isinstance(explicit_importance, (int, float))
        else explicit_importance
    )
    age = F.greatest(days_between(now_c, last_accessed), F.lit(0.0))
    base = init * F.exp(F.lit(-LN2) * age / hl)
    bonus = F.lit(1.0) + F.lit(0.1) * F.log1p(acc.cast("double"))
    return F.least(F.lit(1.0), F.greatest(F.lit(0.0), base * bonus + F.lit(0.2) * imp))


def linear_decay(ts: Column | str, now: datetime | Column, lifetime_days: float) -> Column:
    """Linear decay to zero over `lifetime_days` (reference: forgetting.py
    custom decay functions — Linear variant)."""
    now_c = F.lit(now) if isinstance(now, datetime) else now
    d = F.greatest(days_between(now_c, ts), F.lit(0.0))
    return F.greatest(F.lit(0.0), F.lit(1.0) - d / F.lit(lifetime_days))


def step_decay(
    ts: Column | str, now: datetime | Column, step_days: float, step_value: float = 0.5
) -> Column:
    """Step decay: full strength until `step_days`, then `step_value`."""
    now_c = F.lit(now) if isinstance(now, datetime) else now
    d = days_between(now_c, ts)
    return F.when(d <= F.lit(step_days), F.lit(1.0)).otherwise(F.lit(step_value))


def valid_as_of(valid_from: Column | str, valid_to: Column | str, at: datetime | Column) -> Column:
    """Bitemporal as-of predicate: valid_from <= t AND (valid_to IS NULL
    OR valid_to >= t); NULL valid_from means 'since forever'.
    Reference: alma/graph/store.py:535-559."""
    at_c = F.lit(at) if isinstance(at, datetime) else at
    vf = F.col(valid_from) if isinstance(valid_from, str) else valid_from
    vt = F.col(valid_to) if isinstance(valid_to, str) else valid_to
    return (vf.isNull() | (vf <= at_c)) & (vt.isNull() | (vt >= at_c))
