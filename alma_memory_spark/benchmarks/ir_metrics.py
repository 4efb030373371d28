"""IR retrieval-quality metrics: R@K, Recall-All@K, P@K, NDCG@K, MRR,
per-question-type breakdown.

Semantics match the reference's benchmark harness
(benchmarks/longmemeval/metrics.py:20-120): R@K = fraction of questions
with ANY gold id in the top K; NDCG uses rel/log2(i+2) with binary
relevance against the ideal DCG; MRR = mean of 1/rank of the first hit
(0 when no hit). These are the correctness oracle for the retrieval
pipeline — the reference's headline claim (LongMemEval R@5 = 0.964) is
this metric over 500 questions.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field


@dataclass
class QuestionResult:
    question_id: str
    question_type: str
    correct_ids: set[str]
    ranked_ids: list[str]
    retrieval_time_ms: float = 0.0


@dataclass
class BenchmarkMetrics:
    recall_at_k: dict[int, float] = field(default_factory=dict)
    recall_all_at_k: dict[int, float] = field(default_factory=dict)
    ndcg_at_k: dict[int, float] = field(default_factory=dict)
    precision_at_k: dict[int, float] = field(default_factory=dict)
    mrr: float = 0.0
    per_type: dict[str, "BenchmarkMetrics"] = field(default_factory=dict)
    total_questions: int = 0


def recall_at_k(results: list[QuestionResult], k: int) -> float:
    if not results:
        return 0.0
    return sum(
        1 for r in results if set(r.ranked_ids[:k]) & r.correct_ids
    ) / len(results)


def recall_all_at_k(results: list[QuestionResult], k: int) -> float:
    if not results:
        return 0.0
    return sum(
        1 for r in results if r.correct_ids <= set(r.ranked_ids[:k])
    ) / len(results)


def precision_at_k(results: list[QuestionResult], k: int) -> float:
    if not results:
        return 0.0
    total = 0.0
    for r in results:
        top = r.ranked_ids[:k]
        if top:
            total += sum(1 for i in top if i in r.correct_ids) / len(top)
    return total / len(results)


def _dcg(relevances: list[float], k: int) -> float:
    return sum(rel / math.log2(i + 2) for i, rel in enumerate(relevances[:k]))


def ndcg_at_k(results: list[QuestionResult], k: int) -> float:
    if not results:
        return 0.0
    total = 0.0
    for r in results:
        rels = [1.0 if i in r.correct_ids else 0.0 for i in r.ranked_ids]
        ideal = [1.0] * min(len(r.correct_ids), k)
        idcg = _dcg(ideal, k)
        total += (_dcg(rels, k) / idcg) if idcg > 0 else 0.0
    return total / len(results)


def mrr(results: list[QuestionResult]) -> float:
    if not results:
        return 0.0
    total = 0.0
    for r in results:
        for rank, i in enumerate(r.ranked_ids, start=1):
            if i in r.correct_ids:
                total += 1.0 / rank
                break
    return total / len(results)


def compute_metrics(
    results: list[QuestionResult], ks: tuple[int, ...] = (1, 3, 5, 10, 30, 50)
) -> BenchmarkMetrics:
    m = BenchmarkMetrics(total_questions=len(results))
    for k in ks:
        m.recall_at_k[k] = recall_at_k(results, k)
        m.recall_all_at_k[k] = recall_all_at_k(results, k)
        m.ndcg_at_k[k] = ndcg_at_k(results, k)
        m.precision_at_k[k] = precision_at_k(results, k)
    m.mrr = mrr(results)
    types = sorted({r.question_type for r in results})
    for t in types:
        sub = [r for r in results if r.question_type == t]
        sm = BenchmarkMetrics(total_questions=len(sub))
        for k in ks:
            sm.recall_at_k[k] = recall_at_k(sub, k)
            sm.ndcg_at_k[k] = ndcg_at_k(sub, k)
        sm.mrr = mrr(sub)
        m.per_type[t] = sm
    return m
