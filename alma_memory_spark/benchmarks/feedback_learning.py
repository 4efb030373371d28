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
    top_k: int = 10,
    noise_dim_keep: int = 8,
    seed: int = 42,
) -> list[RoundResult]:
    """Run `rounds` of retrieve -> simulate feedback -> re-rank.

    The base ranking uses only the first `noise_dim_keep` embedding
    dimensions (a deliberately weakened retriever — the reference's FLB
    also operates in a low-recall regime, 0.258 base R@5), so feedback
    has headroom to help. Feedback accumulates in a (memory_id ->
    net-signal) table; ranking = (1-w)*sim_rank_score + w*(fb+1)/2
    exactly like the production blend."""
    rng = random.Random(seed)
    from alma_memory_spark.embedding import hash_embed

    qvecs = spark.createDataFrame(
        [
            (q["question_id"], hash_embed(q["question"], 64)[:noise_dim_keep])
            for q in corpus.questions
        ],
        "question_id string, qvec array<float>",
    )
    sessions = corpus.sessions.select(
        "session_id", F.slice("embedding", 1, noise_dim_keep).alias("emb")
    )
    base = (
        sessions.crossJoin(F.broadcast(qvecs))
        .withColumn("sim", cosine_similarity("emb", "qvec"))
        .select("question_id", "session_id", "sim")
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
        from pyspark.sql import Window as W

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

        # simulate feedback on this round's retrievals (accuracy p)
        for qid, items in by_q.items():
            for rk, sid in items:
                if rk > 5:
                    continue
                is_gold = sid in gold[qid]
                judged_gold = is_gold if rng.random() < feedback_accuracy else not is_gold
                c = counts.setdefault(sid, [0, 0])
                c[1] += 1
                if judged_gold:
                    c[0] += 1
    return out
