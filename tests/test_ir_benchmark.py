"""IR-metric harness tests: metric formulas with literal values, and the
LongMemEval-style end-to-end benchmark (score-propagation oracle)."""

import math

from alma_memory_spark.benchmarks.ir_metrics import (
    QuestionResult,
    compute_metrics,
    mrr,
    ndcg_at_k,
    precision_at_k,
    recall_all_at_k,
    recall_at_k,
)
from alma_memory_spark.benchmarks.longmem import generate_corpus, run_benchmark


def _r(qid, gold, ranked, qtype="multi-session"):
    return QuestionResult(qid, qtype, set(gold), list(ranked))


def test_metric_literals():
    results = [
        _r("q1", ["a"], ["a", "x", "y"]),          # hit at rank 1
        _r("q2", ["b"], ["x", "b", "y"]),          # hit at rank 2
        _r("q3", ["c"], ["x", "y", "z"]),          # miss
        _r("q4", ["d", "e"], ["d", "x", "e"]),     # both gold in top 3
    ]
    assert recall_at_k(results, 1) == 0.5  # q1, q4
    assert recall_at_k(results, 3) == 0.75
    assert recall_all_at_k(results, 3) == 0.75  # q3 misses; q4 has both
    assert recall_all_at_k(results, 1) == 0.25  # only q1 (q4 needs both)
    assert abs(mrr(results) - (1.0 + 0.5 + 0.0 + 1.0) / 4) < 1e-9
    # precision@3: q1 1/3, q2 1/3, q3 0, q4 2/3
    assert abs(precision_at_k(results, 3) - (1 / 3 + 1 / 3 + 0 + 2 / 3) / 4) < 1e-9
    # ndcg@3 for q2: dcg = 1/log2(3), idcg = 1 -> 0.6309...
    nd = ndcg_at_k([results[1]], 3)
    assert abs(nd - 1.0 / math.log2(3)) < 1e-9
    m = compute_metrics(results, ks=(1, 3))
    assert m.total_questions == 4
    assert m.per_type["multi-session"].total_questions == 4


def test_longmem_benchmark_pipeline(spark):
    corpus = generate_corpus(spark, n_questions=24, sessions_per_question=10)
    metrics, results = run_benchmark(spark, corpus, top_k=10)
    # a correct score-propagation pipeline on this corpus retrieves gold
    # sessions near-perfectly; a broken hand-off collapses toward chance
    assert metrics.recall_at_k[5] >= 0.95
    assert metrics.mrr >= 0.8
    assert metrics.recall_at_k[1] >= 0.7
    # per-type breakdown exists for all four types
    assert len(metrics.per_type) == 4
    # every question produced a full ranking
    assert all(len(r.ranked_ids) == 10 for r in results)


def test_longmem_detects_broken_propagation(spark):
    """If ranking ignores similarity (the bug class the reference fought:
    BENCHMARK-REPORT.md:112-196), recall collapses — the harness must
    catch it. Simulate by shuffling ranked ids."""
    import random

    corpus = generate_corpus(spark, n_questions=12, sessions_per_question=10)
    metrics, results = run_benchmark(spark, corpus, top_k=10)
    rng = random.Random(0)
    broken = []
    all_ids = [r2 for res in results for r2 in res.ranked_ids]
    for r in results:
        fake = rng.sample(all_ids, min(10, len(all_ids)))
        broken.append(QuestionResult(r.question_id, r.question_type, r.correct_ids, fake))
    bm = compute_metrics(broken, ks=(5,))
    assert bm.recall_at_k[5] < metrics.recall_at_k[5]


def test_load_longmemeval_real_format(spark, tmp_path):
    """The loader must accept the published longmemeval_s_cleaned.json
    schema (JSON array of entries with parallel haystack lists) so the
    harness runs on the real dataset whenever the file is present."""
    import json

    from alma_memory_spark.benchmarks.longmem import load_longmemeval, run_benchmark

    entries = [
        {
            "question_id": "q1",
            "question": "what database did I migrate to",
            "question_type": "single-session-user",
            "question_date": "2023/05/20 (Sat) 02:21",
            "answer": "postgres",
            "answer_session_ids": ["s_a"],
            "haystack_session_ids": ["s_a", "s_b"],
            "haystack_dates": ["2023/05/01 (Mon) 10:00", "2023/05/02 (Tue) 11:00"],
            "haystack_sessions": [
                [
                    {"role": "user", "content": "I migrated the app database to postgres"},
                    {"role": "assistant", "content": "Noted: postgres migration."},
                ],
                [{"role": "user", "content": "the weather is nice today"}],
            ],
        },
        {
            "question_id": "q2",
            "question": "weather chat",
            "question_type": "temporal-reasoning",
            "answer_session_ids": ["s_b"],
            "haystack_session_ids": ["s_b", "s_c"],
            "haystack_sessions": [
                [{"role": "user", "content": "the weather is nice today"}],
                [{"role": "user", "content": "let us talk about deployment pipelines"}],
            ],
        },
    ]
    p = tmp_path / "longmemeval_s_cleaned.json"
    p.write_text(json.dumps(entries))
    corpus = load_longmemeval(spark, str(p))
    assert corpus.sessions.count() == 3  # s_b deduplicated across haystacks
    assert [q["question_id"] for q in corpus.questions] == ["q1", "q2"]
    assert corpus.questions[0]["gold_session_ids"] == ["s_a"]
    metrics, results = run_benchmark(spark, corpus)
    assert metrics.total_questions == 2
    # q1's gold shares vocabulary with the question -> must rank top-5
    r1 = [r for r in results if r.question_id == "q1"][0]
    assert "s_a" in r1.ranked_ids[:5]
    # JSONL form parses identically
    p2 = tmp_path / "lme.jsonl"
    p2.write_text("\n".join(json.dumps(e) for e in entries))
    corpus2 = load_longmemeval(spark, str(p2), limit=1)
    assert len(corpus2.questions) == 1


def test_load_locomo_real_format(spark, tmp_path):
    """Loader must accept the public locomo10.json schema (session_{N}
    turn lists with dia_id evidence pointers) at both granularities."""
    import json

    from alma_memory_spark.benchmarks.longmem import load_locomo, run_benchmark

    sample = [
        {
            "sample_id": "conv1",
            "conversation": {
                "session_1": [
                    {"speaker": "Caroline", "dia_id": "D1:1",
                     "text": "I adopted a golden retriever named Max"},
                    {"speaker": "Mel", "dia_id": "D1:2", "text": "congrats!"},
                ],
                "session_1_date_time": "1:56 pm on 8 May, 2023",
                "session_2": [
                    {"speaker": "Caroline", "dia_id": "D2:1",
                     "text": "the weather is nice"},
                ],
                "session_2_date_time": "2:00 pm on 9 May, 2023",
            },
            "qa": [
                {"question": "what dog did Caroline adopt golden retriever",
                 "answer": "a golden retriever named Max",
                 "evidence": ["D1:1"], "category": 1},
                {"question": "unanswerable", "answer": "", "evidence": [],
                 "category": 5},
            ],
        }
    ]
    p = tmp_path / "locomo10.json"
    p.write_text(json.dumps(sample))
    corpus = load_locomo(spark, str(p))
    assert corpus.sessions.count() == 2
    assert len(corpus.questions) == 1  # evidence-less QA dropped
    assert corpus.questions[0]["gold_session_ids"] == ["conv1/D1"]
    metrics, results = run_benchmark(spark, corpus)
    assert "conv1/D1" in results[0].ranked_ids[:1]  # token overlap wins
    turns = load_locomo(spark, str(p), granularity="turn")
    assert turns.sessions.count() == 3
    assert turns.questions[0]["gold_session_ids"] == ["conv1/D1:1"]
