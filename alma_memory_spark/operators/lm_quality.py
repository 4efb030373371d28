"""Statistical language-model quality scoring (CCNet shape).

CCNet (Wenzek et al. 2020, "CCNet: Extracting High Quality Monolingual
Datasets from Web Crawl Data") scores each document by its perplexity
under a KenLM model trained on a trusted corpus and filters by
percentile — the standard statistical quality gate in LLM data
pipelines alongside the rule-based C4/Gopher filters. The heavy n-gram
model is a library call; the SHAPE — mean token log-probability under
a corpus-trained LM, outliers flagged — is expressible exactly in
DataFrame ops with a unigram model, which is what ships here (a real
KenLM scorer would slot in as an Arrow-batched kernel at the same
call site, like the embedding/cross-encoder env boundaries).

Scale shape: training is one map-side-combinable token count shuffle;
scoring is explode -> broadcast-join the (bounded, vocabulary-sized)
log-prob table -> one per-doc aggregation. The corpus is never joined
to itself and the model table broadcasts — the same discipline as the
BM25/TF-IDF plans in operators/text_search.py.

Determinism: probabilities derive from exact integer counts; the only
float steps are one IEEE division, ln() (engine libm, agrees to ~1
ulp — rounded to 10 dp before use, the codebase's standard float
boundary), and the per-doc mean, whose sum runs in DECIMAL so it is
order-independent under any partitioning. The 'lmq' gate rows
hash-match a full DuckDB replay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from alma_memory_spark.functions import text as X

__all__ = ["lm_quality_scores", "lm_tail_ids", "unigram_lm"]


def unigram_lm(docs: DataFrame, text_col: str = "text"):
    """(lm, stats): add-one-smoothed unigram log-probabilities over the
    corpus tokens — lm = (token, logp) with
    logp = round(ln((count + 1) / (total + vocab)), 10) — plus the
    one-row stats frame (total, vocab) the OOV floor derives from.
    One count shuffle; both outputs are vocabulary-bounded."""
    toks = docs.select(F.explode(X.ws_tokens(text_col)).alias("token"))
    counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    stats = counts.agg(
        F.sum("cnt").alias("total"), F.count(F.lit(1)).alias("vocab")
    )
    lm = counts.crossJoin(F.broadcast(stats)).select(
        "token",
        F.round(
            F.log(
                (F.col("cnt") + 1).cast("double")
                / (F.col("total") + F.col("vocab")).cast("double")
            ),
            10,
        ).alias("logp"),
    )
    return lm, stats


def lm_quality_scores(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lm: DataFrame | None = None,
    stats: DataFrame | None = None,
) -> DataFrame:
    """(id, n_tokens, score): mean token log-probability per document —
    higher = more typical of the training corpus (the CCNet quality
    axis; perplexity = exp(-score)). Defaults to self-training on
    `docs` (CCNet trains on the target-domain corpus); pass a
    prebuilt (lm, stats) to score against a trusted reference corpus.
    Unseen tokens take the smoothing floor ln(1 / (total + vocab)).
    The per-doc sum runs in DECIMAL(28,10) so the mean is bit-stable
    under any partitioning."""
    if lm is None:
        lm, stats = unigram_lm(docs, text_col)
    floor = F.round(
        F.log(1.0 / (F.col("total") + F.col("vocab")).cast("double")), 10
    )
    toks = docs.select(
        F.col(id_col), F.explode(X.ws_tokens(text_col)).alias("token")
    )
    scored = (
        toks.join(F.broadcast(lm), "token", "left")
        .crossJoin(F.broadcast(stats))
        .select(id_col, F.coalesce("logp", floor).alias("lp"))
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.round(
            F.sum(F.col("lp").cast("decimal(28,10)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("score"),
    )


def lm_tail_ids(
    scores: DataFrame,
    frac: float = 0.1,
    id_col: str = "doc_id",
    score_col: str = "score",
) -> DataFrame:
    """Ids of the lowest-`frac` fraction of documents by LM score —
    CCNet's tail bucket (candidates to drop or down-weight).

    Scale shape: a global percent_rank window would funnel the whole
    corpus through one task's sort; instead the cutoff is the max
    score among the bottom-k rows (k = floor(frac * n)) found with a
    TakeOrdered top-k heap, then a broadcast threshold filter — no
    global sort at any scale. Boundary ties are INCLUDED (score <=
    cutoff), which keeps the result deterministic under any partition
    layout in both engines."""
    n = scores.count()
    k = int(frac * n)
    if k <= 0:
        return scores.select(id_col).limit(0)
    cutoff = (
        scores.select(score_col)
        .orderBy(F.asc(score_col))
        .limit(k)
        .agg(F.max(score_col).alias("cut"))
    )
    return (
        scores.crossJoin(F.broadcast(cutoff))
        .filter(F.col(score_col) <= F.col("cut"))
        .select(id_col)
    )
