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
    explicit_importance: Column | float = 0.5,
    recent_reinforcements: Column | int = 0,
) -> Column:
    """Memory-strength decay with access + reinforcement bonuses.

    Reference-exact MemoryStrength (alma/learning/decay.py:15-22, 76-126):

        base_decay     = exp(-0.693 * age_days / half_life)   (1.0 if half_life <= 0)
        access_bonus   = min(0.4, 0.1 * log1p(access_count))
        reinf_bonus    = min(0.3, 0.1 * recent_reinforcements)   (events < 7 days old)
        importance_f   = 0.5 + 0.5 * explicit_importance         (default 0.5)
        strength       = clamp((base + access + reinf) * importance_f, 0, 1)

    All nullable inputs are coalesced to the reference dataclass defaults
    (importance 0.5, counts 0, half-life 30, initial 1.0) so a NULL never
    poisons the arithmetic into NULL-then-0.0. `initial_strength` scales
    the base-decay term; the reference default 1.0 makes it a no-op.
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
    reinf = (
        F.lit(recent_reinforcements)
        if isinstance(recent_reinforcements, int)
        else recent_reinforcements
    )
    hl = F.coalesce(hl.cast("double"), F.lit(30.0))
    init = F.coalesce(init.cast("double"), F.lit(1.0))
    acc = F.coalesce(acc.cast("double"), F.lit(0.0))
    imp = F.coalesce(imp.cast("double"), F.lit(0.5))
    reinf = F.coalesce(reinf.cast("double"), F.lit(0.0))
    age = F.greatest(days_between(now_c, last_accessed), F.lit(0.0))
    # literal 0.693 (not full-precision ln 2) to match decay.py:103 exactly
    base = init * F.when(hl > 0, F.exp(F.lit(-0.693) * age / hl)).otherwise(F.lit(1.0))
    access_bonus = F.least(F.lit(0.4), F.lit(0.1) * F.log1p(acc))
    reinf_bonus = F.least(F.lit(0.3), F.lit(0.1) * reinf)
    importance_factor = F.lit(0.5) + F.lit(0.5) * imp
    s = (base + access_bonus + reinf_bonus) * importance_factor
    return F.least(F.lit(1.0), F.greatest(F.lit(0.0), s))


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
