"""Deterministic hash-based sampling and corpus mixing.

The sampling a training-data pipeline actually needs is NOT
`df.sample()` (seeded per-partition RNG — the kept set changes with
partitioning, retries, and engine version): it is CONTENT-keyed
sampling, where keep/drop is a pure function of a row's key and a
salt. That makes samples reproducible across runs and engines,
stable under repartition/retry, consistent between a pipeline and its
audit queries, and composable (a 10% sample of a 50% sample with the
same salt is the 10% sample; disjoint salts give independent
samples). Every major corpus pipeline (C4, The Pile, RefinedWeb
reproductions) downsamples this way.

Built on the engine's portable 32-bit md5 hash (functions/text.hash32,
bit-identical in DuckDB via sql_hash32), so every sampling decision is
SQL-auditable — the driver gate replays the exact kept-set in DuckDB.

Scale shape: a narrow map + filter per row — no shuffle, no RNG state,
embarrassingly parallel; stratified rates ride a literal CASE chain
(config-sized), and mixing is per-source filtered unions that
Catalyst pushes straight into each source scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from alma_memory_spark.functions.text import hash32, sql_hash32

#: hash buckets for the keep decision: rate is quantized to 1e-6,
#: plenty for corpus work and exact in integer arithmetic on both
#: engines (no float-rounding drift between Spark and DuckDB)
_DENOM = 1_000_000

__all__ = [
    "hash_bucket",
    "hash_sample",
    "mix_rates_for_token_budget",
    "split_corpus",
    "stratified_sample",
    "weighted_mix",
    "sql_hash_keep",
]


def _thresh(rate: float) -> int:
    """Keep-threshold in buckets. round(), not truncate: float products
    like 0.29 * 1e6 land one ulp under the integer and int() would put
    the cut a bucket below both the documented rate and an oracle that
    hard-codes the round number (ADVICE r6)."""
    return int(round(rate * _DENOM))


def hash_bucket(key: Column | str, salt: str = "") -> Column:
    """Deterministic bucket in [0, 1e6) from (key, salt) — the salt
    namespaces independent sampling decisions over the same keys."""
    k = F.col(key) if isinstance(key, str) else key
    return F.pmod(
        hash32(F.concat(k.cast("string"), F.lit(":" + salt))), F.lit(_DENOM)
    )


def sql_hash_keep(key_expr: str, rate: float, salt: str = "") -> str:
    """DuckDB predicate equivalent to hash_sample's keep decision."""
    h = sql_hash32(f"CAST({key_expr} AS VARCHAR) || ':{salt}'")
    return f"(({h}) % {_DENOM} + {_DENOM}) % {_DENOM} < {_thresh(rate)}"


def hash_sample(
    df: DataFrame, rate: float, key_col: str, salt: str = ""
) -> DataFrame:
    """Keep ~rate of rows, decided purely by hash(key, salt): stable
    under repartition/retry, reproducible across engines."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1] (got {rate!r})")
    return df.filter(hash_bucket(key_col, salt) < _thresh(rate))


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    rates: dict[str, float],
    key_col: str,
    default_rate: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum keep rates (e.g. per-language downsampling: en 10%,
    low-resource languages 100%). Strata absent from `rates` keep
    `default_rate`. One narrow filter — the rate table is config-sized
    and rides a literal CASE chain."""
    for s, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for stratum {s!r} must be in [0, 1]")
    thresh: Column = F.lit(_thresh(default_rate))
    for s, r in rates.items():
        thresh = (
            F.when(F.col(stratum_col) == s, F.lit(_thresh(r)))
            .otherwise(thresh)
        )
    return df.filter(hash_bucket(key_col, salt) < thresh)


def weighted_mix(
    frames: dict[str, DataFrame],
    weights: dict[str, float],
    key_col: str,
    salt: str = "",
    source_col: str = "source_name",
) -> DataFrame:
    """Corpus mixing: sample each source at its weight and union, with
    a provenance column. This is the rate-based (epoch-less) form of
    training-mixture construction: weights are KEEP RATES per source,
    chosen upstream from the desired token proportions. Schemas must
    be union-compatible; each source's filter pushes into its own
    scan."""
    missing = set(frames) - set(weights)
    if missing:
        raise ValueError(f"no weight for sources: {sorted(missing)}")
    out = None
    for name in sorted(frames):
        part = hash_sample(frames[name], weights[name], key_col, salt).withColumn(
            source_col, F.lit(name)
        )
        out = part if out is None else out.unionByName(part)
    if out is None:
        raise ValueError("weighted_mix needs at least one source frame")
    return out


def mix_rates_for_token_budget(
    frames: dict,
    proportions: dict[str, float],
    total_tokens: int,
    token_col: str,
) -> dict[str, float]:
    """Keep rates that realize a TOKEN-proportioned training mixture:
    rate[s] = (proportions[s] * total_tokens) / tokens_in(s), capped at
    1.0 (a source cannot over-contribute without epoch repetition —
    callers wanting repetition union the frame k times upstream).
    One count-agg per source (map-side combinable); feed the result to
    weighted_mix. Deterministic: rates derive from exact token sums."""
    if abs(sum(proportions.values()) - 1.0) > 1e-9:
        raise ValueError(f"proportions must sum to 1 (got {proportions})")
    missing = set(frames) - set(proportions)
    if missing:
        raise ValueError(f"no proportion for sources: {sorted(missing)}")
    orphaned = set(proportions) - set(frames)
    if orphaned:
        # a proportion with no frame silently under-delivers the token
        # budget while the sum-to-1 check still passes
        raise ValueError(f"no frame for proportioned sources: {sorted(orphaned)}")
    rates = {}
    for name, df in frames.items():
        have = df.agg(
            F.coalesce(F.sum(F.col(token_col).cast("long")), F.lit(0))
        ).collect()[0][0]
        want = proportions[name] * total_tokens
        if have <= 0:
            if want > 0:
                raise ValueError(f"source {name!r} has no tokens but wants {want}")
            rates[name] = 0.0
        else:
            rates[name] = min(1.0, want / have)
    return rates


def split_corpus(
    df: DataFrame,
    weights: dict[str, float],
    key_col: str,
    salt: str = "split",
) -> DataFrame:
    """df + a `split` column assigning every row to exactly one named
    split (train/val/test and friends) by cumulative hash-bucket
    thresholds over hash(key, salt) — the standard held-out carve-up,
    with the same guarantees as hash_sample: deterministic under
    repartition/retry, content-keyed (a re-ingested duplicate lands in
    the same split, so val never leaks into train via a second copy),
    and namespaced by `salt` so independent splits of the same corpus
    don't correlate. Weights must sum to 1 (±1 bucket of float slack;
    the LAST split in insertion order absorbs the rounding remainder).
    One narrow projection — no shuffle, no sort, no count."""
    if not weights:
        raise ValueError("weights must name at least one split")
    for name, w in weights.items():
        if not 0.0 <= w <= 1.0:
            raise ValueError(f"weight for {name!r} must be in [0, 1]")
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1, got {total!r}")
    b = hash_bucket(key_col, salt)
    names = list(weights)
    expr = None
    cum = 0.0
    for name in names[:-1]:
        cum += weights[name]
        cond = b < F.lit(_thresh(cum))
        expr = (
            F.when(cond, F.lit(name))
            if expr is None
            else expr.when(cond, F.lit(name))
        )
    last = F.lit(names[-1])
    out = last if expr is None else expr.otherwise(last)
    return df.withColumn("split", out)
