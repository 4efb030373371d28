"""Forward-looking strategy confidence: the reference's
ConfidenceEngine (alma/confidence/engine.py + types.py) re-expressed as
a BATCH operator — every candidate strategy is assessed in ONE Spark
plan instead of the reference's per-strategy driver loop, so ranking
10k candidate strategies costs one job, not 10k retrieves.

Signals and constants are the reference's exactly:

- is_similar(a, b) (engine.py:474-500): exact match OR substring OR
  token-set Jaccard >= 0.5.
- historical rate (engine.py:97-103): success_count/occurrence_count of
  the best-matching heuristic (batch form: the is_similar heuristic
  with the highest occurrence_count, id-tiebroken).
- context_similarity tiers (engine.py:372-416): 0.8 if a retrieved
  outcome's strategy_used is_similar, else 0.7 if a retrieved heuristic
  matches, else 0.5 if anything was retrieved, else 0.3.
- predicted_success (engine.py:419-444): sim*base + (1-sim)*0.5,
  base = historical rate if > 0 else 0.5.
- uncertainty (engine.py:446-472): data tier (0.1/0.3/0.5/0.8 at
  >=10/>=5/>=2/else occurrences) averaged with (1 - similarity),
  capped at 1.
- risks (engine.py:184-276): anti-pattern is_similar among the top-3
  retrieved anti-patterns (severity 0.7); >=2 complexity keywords
  (0.4); risky substrings sleep/force/'delete all'/production
  (0.6/0.5/0.8/0.7). total_risk = MAX severity.
- opportunities (engine.py:277-371): proven pattern among the top-3
  retrieved heuristics with occurrences >= 3 and rate >= 0.8
  (strength min(0.9, rate)); any retrieved successful outcome (0.6);
  best-practice substrings incremental/'test first'/validate/'small
  steps' (0.5/0.6/0.5/0.4). total_opportunity = MAX strength.
- confidence_score (types.py:220-256): clamp01(0.3*hist + 0.4*pred
  + 0.15*sim + 0.15*(1-unc) - 0.2*risk + 0.2*opp).
- recommendation (types.py:258-276): risk >= 0.8 -> avoid, >= 0.6 ->
  caution, else score >= 0.8 strong_yes / >= 0.6 yes / >= 0.4 neutral
  / >= 0.2 caution / else avoid.

Candidate stage: the reference routes each strategy through
ALMA.retrieve(strategy + ' ' + context); the batch form uses the same
query text per strategy and a cosine top-k window per (strategy,
table) — one broadcast of the (small) strategy list against each
memory table, ranked per strategy. Scale shape: narrow scan per table,
one window shuffle keyed by strategy id, every signal a column
expression.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from alma_memory_spark.functions.text import ws_tokens
from alma_memory_spark.functions.vector import cosine_similarity

SIM_JACCARD = 0.5
MIN_OCC_FOR_CONFIDENCE = 3
PROVEN_RATE = 0.8
COMPLEXITY_KEYWORDS = ["complex", "multiple", "all", "every", "entire", "complete"]
RISKY_PATTERNS = [
    ("sleep", 0.6),
    ("force", 0.5),
    ("delete all", 0.8),
    ("production", 0.7),
]
BEST_PRACTICES = [
    ("incremental", 0.5),
    ("test first", 0.6),
    ("validate", 0.5),
    ("small steps", 0.4),
]


def is_similar_expr(a: F.Column, b: F.Column) -> F.Column:
    """Column form of engine.py:474-500 — exact | substring | Jaccard>=0.5.
    Empty/null on either side is NOT similar."""
    a_n = F.trim(F.lower(a))
    b_n = F.trim(F.lower(b))
    ta, tb = ws_tokens(a_n), ws_tokens(b_n)
    inter = F.size(F.array_intersect(ta, tb)).cast("double")
    union = F.size(F.array_union(ta, tb)).cast("double")
    jac = F.when(union > 0, inter / union).otherwise(F.lit(0.0))
    return (
        a_n.isNotNull()
        & b_n.isNotNull()
        & (F.length(a_n) > 0)
        & (F.length(b_n) > 0)
        & (
            (a_n == b_n)
            | a_n.contains(b_n)
            | b_n.contains(a_n)
            | (jac >= SIM_JACCARD)
        )
    )


def _pattern_score(col: F.Column, patterns: list[tuple[str, float]]) -> F.Column:
    """MAX severity/strength among matching substrings (0.0 if none)."""
    out = F.lit(0.0)
    for pat, sev in patterns:
        out = F.when(F.lower(col).contains(pat) & (F.lit(sev) > out), F.lit(sev)).otherwise(out)
    return out


def _complexity_flag(col: F.Column) -> F.Column:
    """>= 2 complexity keywords present -> the 0.4 high_complexity risk."""
    hits = sum(
        F.when(F.lower(col).contains(kw), 1).otherwise(0)
        for kw in COMPLEXITY_KEYWORDS
    )
    return F.when(hits >= 2, F.lit(0.4)).otherwise(F.lit(0.0))


def _sim_ranks(table: DataFrame, strategies: DataFrame) -> DataFrame:
    """One crossJoin of a memory table against the broadcast strategy
    list, with BOTH retrieval rankings attached: `rq` ranks by cosine to
    the strategy+context query vector, `rc` by cosine to the context
    vector. The two row_numbers share the `sid` partition key, so this
    is ONE shuffle per table no matter how many signals read the ranks.
    Null-embedding rows sort last, so `r* <= k AND sim_* IS NOT NULL`
    selects exactly the top-k embedded rows (the reference retrieves
    per strategy; this is the batch equivalent)."""
    j = table.crossJoin(F.broadcast(strategies)).select(
        "*",
        F.when(
            F.col("embedding").isNotNull(),
            cosine_similarity("embedding", F.col("qvec")),
        ).alias("_sq"),
        F.when(
            F.col("embedding").isNotNull(),
            cosine_similarity("embedding", F.col("cvec")),
        ).alias("_sc"),
    )
    wq = W.partitionBy("sid").orderBy(F.desc_nulls_last("_sq"), F.asc("id"))
    wc = W.partitionBy("sid").orderBy(F.desc_nulls_last("_sc"), F.asc("id"))
    return j.withColumn("rq", F.row_number().over(wq)).withColumn(
        "rc", F.row_number().over(wc)
    )


def assess_strategies(
    spark: SparkSession,
    strategies: list[str],
    context: str,
    heuristics: DataFrame,
    anti_patterns: DataFrame,
    outcomes: DataFrame,
    embedder,
    top_k: int = 10,
) -> DataFrame:
    """One-plan batch assessment. Inputs are already agent/project-scoped
    frames (the facade applies the scope filters). Returns one row per
    strategy: every component signal plus confidence_score and
    recommendation, all 6dp-rounded."""
    rows = [
        (i, s, embedder.encode(f"{s} {context}"), embedder.encode(context))
        for i, s in enumerate(strategies)
    ]
    from alma_memory_spark.session import tiny_df

    sdf = tiny_df(
        spark, rows, "sid int, strategy string, qvec array<float>, cvec array<float>"
    )

    # ONE pass per memory table: each crossJoin carries both retrieval
    # rankings (shared sid shuffle) and every signal that table feeds
    # comes out of a single groupBy — 3 sub-plans instead of 6, and the
    # per-strategy aggregates (bounded by the driver-provided strategy
    # list at ANY corpus scale) broadcast into the assembly.

    # --- heuristics: historical best-match + context match + proven ---
    h = heuristics.withColumnRenamed("strategy", "h_strategy")
    hj = _sim_ranks(h, sdf)
    hm = is_similar_expr(F.col("strategy"), F.col("h_strategy"))
    # best is_similar heuristic by occurrence_count, id-asc tiebreak
    wb = W.partitionBy("sid").orderBy(
        F.desc(hm.cast("int")), F.desc("occurrence_count"), F.asc("id")
    )
    hj = hj.withColumn("rb", F.row_number().over(wb))
    rate = F.col("success_count") / F.col("occurrence_count")
    h_sig = hj.groupBy("sid").agg(
        F.max(
            F.when(hm & (F.col("rb") == 1), F.col("occurrence_count"))
        ).alias("occurrences"),
        F.max(
            F.when(
                hm & (F.col("rb") == 1) & (F.col("occurrence_count") > 0), rate
            )
        ).alias("historical_rate"),
        F.max(
            F.when((F.col("rc") <= 5) & F.col("_sc").isNotNull() & hm, 1).otherwise(0)
        ).alias("h_match"),
        F.count(
            F.when((F.col("rc") <= 5) & F.col("_sc").isNotNull(), 1)
        ).alias("h_n"),
        F.max(
            F.when(
                (F.col("rq") <= 3)
                & F.col("_sq").isNotNull()
                & (F.col("occurrence_count") >= MIN_OCC_FOR_CONFIDENCE)
                & (rate >= PROVEN_RATE),
                F.least(F.lit(0.9), rate),
            ).otherwise(0.0)
        ).alias("proven_opp"),
    )

    # --- outcomes: context match + recent successes -------------------
    oj = _sim_ranks(outcomes.withColumnRenamed("strategy_used", "o_strategy"), sdf)
    om = is_similar_expr(F.col("strategy"), F.col("o_strategy"))
    o_sig = oj.groupBy("sid").agg(
        F.max(
            F.when((F.col("rc") <= 5) & F.col("_sc").isNotNull() & om, 1).otherwise(0)
        ).alias("o_match"),
        F.count(
            F.when((F.col("rc") <= 5) & F.col("_sc").isNotNull(), 1)
        ).alias("o_n"),
        F.max(
            F.when(
                (F.col("rq") <= top_k) & F.col("_sq").isNotNull() & F.col("success"),
                0.6,
            ).otherwise(0.0)
        ).alias("recent_opp"),
    )

    # --- anti-patterns: similar-failure risk --------------------------
    aj = _sim_ranks(anti_patterns, sdf)
    a_sig = aj.groupBy("sid").agg(
        F.max(
            F.when(
                (F.col("rq") <= 3)
                & F.col("_sq").isNotNull()
                & is_similar_expr(F.col("strategy"), F.col("pattern")),
                0.7,
            ).otherwise(0.0)
        ).alias("ap_risk")
    )

    base = (
        sdf.select("sid", "strategy")
        .join(F.broadcast(h_sig), "sid", "left")
        .join(F.broadcast(o_sig), "sid", "left")
        .join(F.broadcast(a_sig), "sid", "left")
        .fillna(
            {
                "occurrences": 0,
                "historical_rate": 0.0,
                "o_match": 0,
                "o_n": 0,
                "h_match": 0,
                "h_n": 0,
                "ap_risk": 0.0,
                "proven_opp": 0.0,
                "recent_opp": 0.0,
            }
        )
    )
    sim = (
        F.when(F.col("o_match") == 1, 0.8)
        .when(F.col("h_match") == 1, 0.7)
        .when((F.col("o_n") + F.col("h_n")) > 0, 0.5)
        .otherwise(0.3)
    )
    hist_base = F.when(
        F.col("historical_rate") > 0, F.col("historical_rate")
    ).otherwise(F.lit(0.5))
    pred = sim * hist_base + (F.lit(1.0) - sim) * 0.5
    data_unc = (
        F.when(F.col("occurrences") >= 10, 0.1)
        .when(F.col("occurrences") >= 5, 0.3)
        .when(F.col("occurrences") >= 2, 0.5)
        .otherwise(0.8)
    )
    unc = F.least(F.lit(1.0), (data_unc + (F.lit(1.0) - sim)) / 2.0)
    risk = F.greatest(
        F.col("ap_risk"),
        _complexity_flag(F.col("strategy")),
        _pattern_score(F.col("strategy"), RISKY_PATTERNS),
    )
    opp = F.greatest(
        F.col("proven_opp"),
        F.col("recent_opp"),
        _pattern_score(F.col("strategy"), BEST_PRACTICES),
    )
    score = F.greatest(
        F.lit(0.0),
        F.least(
            F.lit(1.0),
            0.3 * F.col("historical_rate")
            + 0.4 * pred
            + 0.15 * sim
            + 0.15 * (F.lit(1.0) - unc)
            - 0.2 * risk
            + 0.2 * opp,
        ),
    )
    scored = base.select(
        "sid",
        "strategy",
        "occurrences",
        F.round(F.col("historical_rate"), 6).alias("historical_rate"),
        F.round(sim, 6).alias("context_similarity"),
        F.round(pred, 6).alias("predicted_success"),
        F.round(unc, 6).alias("uncertainty"),
        F.round(risk, 6).alias("total_risk"),
        F.round(opp, 6).alias("total_opportunity"),
        F.round(score, 6).alias("confidence_score"),
    )
    rec = (
        F.when(F.col("total_risk") >= 0.8, "avoid")
        .when(F.col("total_risk") >= 0.6, "caution")
        .when(F.col("confidence_score") >= 0.8, "strong_yes")
        .when(F.col("confidence_score") >= 0.6, "yes")
        .when(F.col("confidence_score") >= 0.4, "neutral")
        .when(F.col("confidence_score") >= 0.2, "caution")
        .otherwise("avoid")
    )
    return scored.withColumn("recommendation", rec)
