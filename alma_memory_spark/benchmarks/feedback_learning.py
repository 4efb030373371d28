"""Feedback-learning benchmark: does recording retrieval feedback
improve recall over rounds?

Reference (benchmarks/feedback_learning/{runner,simulator}.py +
results-flb-realistic-v1.0-phase1.json): a simulator marks retrieved
items used/thumbs_up when they are gold (with configurable accuracy,
80% realistic) and thumbs_down/ignored otherwise; after each round the
feedback blend (w=0.15) re-ranks; headline = delta R@5 across 3 rounds
(+0.132 at w=0.15 in the reference).

Here the same loop runs against the Spark engine: rank (pure similarity
on a deliberately NOISY embedder so there is headroom), simulate
feedback, aggregate with feedback_summary, blend with w, re-rank, score.

Reference-exact simulator regime (simulator.py:94-117, runner config):
feedback is judged on ALL top_k retrieved items (top_k=50 — so gold
items stranded at ranks 6..50 accumulate positive signal and get
promoted into the scored top-5; that promotion IS the uplift
mechanism), gold items are marked USED with p=0.8, and non-gold items
are false-positive USED with p=0.1. fb = (used - ignored)/total per
item (types.py:399-420), blended as (1-w)*sim + w*(fb+1)/2.
"""

from __future__ import annotations

import random
from dataclasses import dataclass

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from alma_memory_spark.benchmarks.ir_metrics import (
    QuestionResult,
    compute_metrics,
)
from alma_memory_spark.benchmarks.longmem import SessionCorpus
from alma_memory_spark.functions.vector import cosine_similarity


@dataclass
class RoundResult:
    round_idx: int
    recall_at_5: float
    mrr: float


def run_feedback_learning(
    spark: SparkSession,
    corpus: SessionCorpus,
    rounds: int = 3,
    feedback_weight: float = 0.15,
    feedback_accuracy: float = 0.8,
    false_positive_rate: float = 0.1,
    top_k: int = 50,
    noise_dim_keep: int | None = None,
    signal_scale: float = 0.5,
    noise_sigma: float = 0.14,
    seed: int = 42,
) -> list[RoundResult]:
    """Run `rounds` of retrieve -> simulate feedback -> re-rank.

    The retriever is deliberately weakened so feedback has headroom (the
    reference's FLB operates at 0.258 base R@5). The default weakener
    ranks by `signal_scale*cosine + noise_sigma*G(q,s)` where G is a
    DETERMINISTIC per-pair Gaussian (Box-Muller over two xxhash64
    uniforms). Three properties make this the right noise model (each
    was measured to matter — see COVERAGE.md FLB section):

    - Gaussian, not uniform: the top-50 of a large corpus is then an
      extreme-value tail with thinning spacing, like a real embedder's
      score distribution — a feedback-promoted item lands in a sparse
      region and stays, instead of trading places with a dense queue of
      near-identical noise scores.
    - Noise on the SCORE, not the vector: R@50 stays high while R@5
      drops ("right neighborhood, imperfect ordering"), so promotion
      from ranks 6..50 has a ceiling to reach. Truncating embedding
      dimensions (`noise_dim_keep`, the legacy knob) collapses R@50
      with R@5 and caps any possible uplift.
    - Scores live in the 0.2-0.6 band real embedder cosines occupy: the
      blend's (fb+1)/2 term competes with the absolute score level, so
      near-1.0 hash-embed cosines would mute feedback in a way real
      cosines don't.

    Feedback accumulates in a (memory_id -> net-signal) table; ranking
    = (1-w)*rank_score + w*(fb+1)/2 exactly like the production blend."""
    rng = random.Random(seed)
    from alma_memory_spark.embedding import hash_embed

    dim_keep = noise_dim_keep if noise_dim_keep is not None else 64
    qvecs = spark.createDataFrame(
        [
            (q["question_id"], hash_embed(q["question"], 64)[:dim_keep])
            for q in corpus.questions
        ],
        "question_id string, qvec array<float>",
    )
    sessions = corpus.sessions.select(
        "session_id", F.slice("embedding", 1, dim_keep).alias("emb")
    )
    sim = cosine_similarity("emb", "qvec")
    if noise_dim_keep is None and noise_sigma > 0:
        u1 = (
            F.pmod(F.xxhash64("question_id", "session_id", F.lit(seed)), F.lit(100000))
            + 1.0
        ) / 100001.0
        u2 = (
            F.pmod(
                F.xxhash64("session_id", "question_id", F.lit(seed + 1)), F.lit(100000)
            )
            / 100000.0
        )
        gauss = F.sqrt(-2.0 * F.log(u1)) * F.cos(2.0 * 3.141592653589793 * u2)
        sim = sim * signal_scale + F.lit(noise_sigma) * gauss
    from pyspark.sql import Window as W

    # Reference-exact candidate pool: the engine fetches top_k*2 FAISS
    # candidates per query (engine.py:275-304) and the feedback blend
    # reorders only that pool — an item outside a question's similarity
    # top-100 is invisible to it no matter how much feedback it has.
    # Blending over the whole corpus instead lets one lucky false
    # positive invade every question's ranking from arbitrary depth,
    # which real candidate-pool geometry forbids.
    pool_w = W.partitionBy("question_id").orderBy(F.desc("sim"), F.asc("session_id"))
    base = (
        sessions.crossJoin(F.broadcast(qvecs))
        .withColumn("sim", sim)
        .select("question_id", "session_id", "sim")
        .withColumn("sim_rank", F.row_number().over(pool_w))
        .filter(F.col("sim_rank") <= 2 * top_k)
        .drop("sim_rank")
        .cache()
    )
    base.count()

    gold = {q["question_id"]: set(q["gold_session_ids"]) for q in corpus.questions}
    counts: dict[str, list[int]] = {}  # session_id -> [judged_gold, total]

    out: list[RoundResult] = []
    for rnd in range(rounds + 1):
        fb_rows = [
            (sid, (c[0] - (c[1] - c[0])) / c[1]) for sid, c in counts.items() if c[1]
        ]
        if fb_rows:
            fb_df = spark.createDataFrame(fb_rows, "session_id string, fb double")
            scored = base.join(F.broadcast(fb_df), "session_id", "left").withColumn(
                "score",
                F.when(
                    F.col("fb").isNotNull(),
                    (1.0 - feedback_weight) * F.col("sim")
                    + feedback_weight * (F.col("fb") + 1.0) / 2.0,
                ).otherwise(F.col("sim")),
            )
        else:
            scored = base.withColumn("score", F.col("sim"))
        w = W.partitionBy("question_id").orderBy(F.desc("score"), F.asc("session_id"))
        ranked = (
            scored.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= top_k)
            .collect()
        )
        by_q: dict[str, list[tuple[int, str]]] = {}
        for r in ranked:
            by_q.setdefault(r["question_id"], []).append((r["rk"], r["session_id"]))
        results = [
            QuestionResult(
                qid, "all", gold[qid], [s for _, s in sorted(by_q.get(qid, []))]
            )
            for qid in gold
        ]
        m = compute_metrics(results, ks=(5,))
        out.append(RoundResult(rnd, m.recall_at_k[5], m.mrr))

        # simulate feedback on ALL top_k retrievals (reference
        # simulator.py:94-117): gold -> USED with p=accuracy; non-gold
        # -> false-positive USED with p=false_positive_rate
        for qid, items in by_q.items():
            for _rk, sid in items:
                is_gold = sid in gold[qid]
                p = feedback_accuracy if is_gold else false_positive_rate
                used = rng.random() < p
                c = counts.setdefault(sid, [0, 0])
                c[1] += 1
                if used:
                    c[0] += 1
    return out
