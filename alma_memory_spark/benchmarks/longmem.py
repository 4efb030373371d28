"""LongMemEval-style session-retrieval benchmark over the Spark engine.

Method parity with the reference harness (benchmarks/longmemeval/runner.py,
docs/benchmarks/BENCHMARK-REPORT.md:42-78): sessions are ingested as
domain_knowledge rows carrying metadata.session_id; each question runs in
BENCHMARK mode (pure-similarity weights, top-50, no threshold); ranked
session ids are scored with R@K / NDCG@K / MRR against gold ids.

This harness exists to pin the score-propagation property that cost the
reference its 0.236 -> 0.964 R@5 climb (BENCHMARK-REPORT.md:112-196):
similarity MUST flow from the vector stage into the ranking. The
synthetic corpus generator makes gold sessions token-overlap with their
questions, so a correct pipeline scores near 1.0 and a broken hand-off
collapses toward chance.

Spark shape: ONE job ranks ALL questions — a broadcast of the question
embeddings against the session corpus, window top-k per question — not a
per-question loop (that is the 1000-executor formulation; the reference
loops questions against a fresh FAISS DB each time).
"""

from __future__ import annotations

import random
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from alma_memory_spark.benchmarks.ir_metrics import (
    BenchmarkMetrics,
    QuestionResult,
    compute_metrics,
)
from alma_memory_spark.embedding import hash_embed
from alma_memory_spark.functions.vector import cosine_similarity

TOPIC_WORDS = {
    "deploy": "deploy release rollout pipeline blue green switchover canary",
    "auth": "login oauth token refresh session cookie password identity",
    "billing": "invoice payment charge subscription refund credit card",
    "search": "index query ranking relevance retrieval recall precision",
    "infra": "cluster node executor shuffle partition memory spill disk",
    "ui": "button form modal layout render component state props",
}
QUESTION_TYPES = [
    "multi-session",
    "single-session-user",
    "knowledge-update",
    "temporal-reasoning",
]


@dataclass
class SessionCorpus:
    sessions: DataFrame  # (session_id, session_text, embedding)
    questions: list[dict]  # question_id, question_type, question, gold_session_ids


def generate_corpus(
    spark: SparkSession,
    n_questions: int = 40,
    sessions_per_question: int = 12,
    dim: int = 64,
    seed: int = 42,
    n_salt: int = 0,
    multi_gold: int = 2,
) -> SessionCorpus:
    """Synthetic LongMemEval-shaped corpus: each question's gold sessions
    share topic vocabulary with it; distractor sessions draw from other
    topics (FIXTURES.md sessions-corpus shape).

    `n_salt` > 0 swaps part of the shared topic vocabulary for
    per-question unique tokens. Real LongMemEval sessions are unique
    conversations — a question's gold is similar to ITS question, not to
    every same-topic sibling. With only 6 shared topics, gold sessions
    otherwise flood the top-k of ~n_questions/6 sibling questions, which
    matters for feedback benchmarks (siblings mark foreign gold IGNORED,
    poisoning its net signal in a way the real corpus geometry doesn't)."""
    rng = random.Random(seed)
    topics = list(TOPIC_WORDS)
    sessions: list[tuple[str, str]] = []
    questions: list[dict] = []
    sid = 0
    for qi in range(n_questions):
        topic = topics[qi % len(topics)]
        words = TOPIC_WORDS[topic].split()
        qtype = QUESTION_TYPES[qi % len(QUESTION_TYPES)]
        # real LongMemEval multi-session questions have several relevant
        # sessions (3-6); `multi_gold` parameterizes that
        n_gold = multi_gold if qtype == "multi-session" else 1
        gold_ids = []
        if n_salt > 0:
            qwords = rng.sample(words, max(1, 4 - n_salt)) + [
                f"q{qi}salt{j}" for j in range(n_salt)
            ]
        else:
            qwords = rng.sample(words, 4)
        for g in range(n_gold):
            gold_ids.append(f"sess_{sid:05d}")
            body = " ".join(
                qwords + rng.sample(words, 3) + [f"detail{qi}g{g}", f"answer{qi}"]
            )
            sessions.append((f"sess_{sid:05d}", body))
            sid += 1
        for _ in range(sessions_per_question - n_gold):
            other = rng.choice([t for t in topics if t != topic])
            body = " ".join(
                rng.sample(TOPIC_WORDS[other].split(), 5) + [f"noise{sid}"]
            )
            sessions.append((f"sess_{sid:05d}", body))
            sid += 1
        questions.append(
            {
                "question_id": f"q_{qi:04d}",
                "question_type": qtype,
                "question": " ".join(qwords) + f" answer{qi}",
                "gold_session_ids": gold_ids,
            }
        )
    sess_df = spark.createDataFrame(
        [(s, t, hash_embed(t, dim)) for s, t in sessions],
        "session_id string, session_text string, embedding array<float>",
    )
    return SessionCorpus(sessions=sess_df, questions=questions)


def _open_maybe_gz(path: str):
    """Text handle over a plain or gzipped dataset file — the published
    LongMemEval downloads ship both .json and .jsonl.gz forms."""
    if path.endswith(".gz"):
        import gzip

        return gzip.open(path, "rt")
    return open(path)


def load_longmemeval(
    spark: SparkSession, path: str, dim: int = 64, limit: int | None = None
) -> SessionCorpus:
    """Load the REAL LongMemEval dataset (S or M variant) into a
    SessionCorpus, so `run_benchmark` / `run_feedback_learning` can score
    against the actual benchmark whenever the file is present.

    Accepts both the published JSON-array file
    (longmemeval_s_cleaned.json) and JSONL. Per-entry schema (reference:
    benchmarks/longmemeval/dataset.py:1-21): question_id, question,
    question_type, answer_session_ids, and parallel haystack_sessions
    (list of {role, content} turn lists) / haystack_session_ids.
    Sessions recur across questions' haystacks and are deduplicated by
    session_id; session text = all turns joined (dataset.py full_text).
    """
    import json as _json

    with _open_maybe_gz(path) as f:
        head = f.read(1)
        f.seek(0)
        if head == "[":
            items = _json.load(f)
        else:
            items = [_json.loads(line) for line in f if line.strip()]
    if limit is not None:
        items = items[:limit]
    sessions: dict[str, str] = {}
    questions: list[dict] = []
    for it in items:
        sids = it.get("haystack_session_ids") or []
        for sid, turns in zip(sids, it.get("haystack_sessions") or []):
            sid = str(sid)
            if sid not in sessions:
                sessions[sid] = "\n".join(
                    t.get("content", "") for t in turns if isinstance(t, dict)
                )
        questions.append(
            {
                "question_id": str(it.get("question_id")),
                "question_type": it.get("question_type", "unknown"),
                "question": it.get("question", ""),
                "gold_session_ids": [
                    str(s) for s in (it.get("answer_session_ids") or [])
                ],
            }
        )
    sess_df = spark.createDataFrame(
        [(sid, txt, hash_embed(txt, dim)) for sid, txt in sessions.items()],
        "session_id string, session_text string, embedding array<float>",
    )
    return SessionCorpus(sessions=sess_df, questions=questions)


def load_locomo(
    spark: SparkSession,
    path: str,
    dim: int = 64,
    granularity: str = "session",
    limit: int | None = None,
) -> SessionCorpus:
    """Load the REAL LoCoMo dataset (locomo10.json, public snap-research
    format; reference: benchmarks/locomo/dataset.py:1-25) into a
    SessionCorpus for the same Spark ranking harness.

    Per-conversation schema: conversation.session_{N} = list of
    {speaker, dia_id, text} turns, qa = list of {question, answer,
    category, evidence: ["D{session}:{turn}", ...]}.

    granularity='session' (default): each session becomes one corpus
    item with id "{conv}/D{N}"; a question's gold = the distinct
    sessions its evidence turns live in. granularity='turn': each turn
    is an item keyed by "{conv}/{dia_id}" and gold = the evidence turn
    ids — the reference sweeps both regimes."""
    import json as _json
    import re as _re

    with _open_maybe_gz(path) as f:
        items = _json.load(f)
    if limit is not None:
        items = items[:limit]
    sessions: dict[str, str] = {}
    questions: list[dict] = []
    for conv_i, it in enumerate(items):
        conv = str(it.get("sample_id") or it.get("conv_id") or f"conv{conv_i}")
        conversation = it.get("conversation") or {}
        turn_texts: dict[str, str] = {}
        for key, value in conversation.items():
            m = _re.fullmatch(r"session_(\d+)", key)
            if not m or not isinstance(value, list):
                continue
            snum = int(m.group(1))
            parts = []
            for idx, t in enumerate(value):
                if not isinstance(t, dict):
                    continue
                text = str(t.get("text") or "")
                dia = str(t.get("dia_id") or f"D{snum}:{idx}")
                turn_texts[dia] = f"{t.get('speaker', '')}: {text}"
                parts.append(f"{t.get('speaker', '')}: {text}")
            if granularity == "session":
                sessions[f"{conv}/D{snum}"] = "\n".join(parts)
        if granularity == "turn":
            for dia, text in turn_texts.items():
                sessions[f"{conv}/{dia}"] = text
        for qi, qa in enumerate(it.get("qa") or []):
            evidence = [str(e) for e in (qa.get("evidence") or [])]
            if granularity == "session":
                gold = sorted(
                    {f"{conv}/D{e.split(':')[0].lstrip('D')}" for e in evidence if ":" in e}
                )
            else:
                gold = sorted({f"{conv}/{e}" for e in evidence})
            if not gold:
                continue  # unanswerable/adversarial rows have no evidence
            questions.append(
                {
                    "question_id": f"{conv}/q{qi}",
                    "question_type": str(qa.get("category", "")),
                    "question": str(qa.get("question") or ""),
                    "gold_session_ids": gold,
                }
            )
    sess_df = spark.createDataFrame(
        [(sid, txt, hash_embed(txt, dim)) for sid, txt in sessions.items()],
        "session_id string, session_text string, embedding array<float>",
    )
    return SessionCorpus(sessions=sess_df, questions=questions)


def run_benchmark(
    spark: SparkSession,
    corpus: SessionCorpus,
    top_k: int = 50,
    dim: int = 64,
) -> tuple[BenchmarkMetrics, list[QuestionResult]]:
    """Rank all questions against the session corpus in one Spark job
    (BENCHMARK mode: pure similarity, no threshold) and score."""
    qdf = spark.createDataFrame(
        [
            (q["question_id"], hash_embed(q["question"], dim))
            for q in corpus.questions
        ],
        "question_id string, qvec array<float>",
    )
    # broadcast questions x sessions -> similarity -> top-k per question.
    joined = corpus.sessions.crossJoin(F.broadcast(qdf))
    sim = cosine_similarity("embedding", "qvec")
    w = W.partitionBy("question_id").orderBy(F.desc("sim"), F.asc("session_id"))
    ranked = (
        joined.withColumn("sim", sim)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= top_k)
        .select("question_id", "session_id", "rk")
    )
    by_q: dict[str, list[tuple[int, str]]] = {}
    for r in ranked.collect():
        by_q.setdefault(r["question_id"], []).append((r["rk"], r["session_id"]))
    results = []
    for q in corpus.questions:
        ids = [s for _, s in sorted(by_q.get(q["question_id"], []))]
        results.append(
            QuestionResult(
                question_id=q["question_id"],
                question_type=q["question_type"],
                correct_ids=set(q["gold_session_ids"]),
                ranked_ids=ids,
            )
        )
    return compute_metrics(results), results


def run_benchmark_via_engine(
    engine,
    corpus: SessionCorpus,
    top_k: int = 50,
    project_id: str = "longmem",
    agent: str = "bench",
) -> tuple[BenchmarkMetrics, list[QuestionResult]]:
    """METHOD-parity run: sessions ingested as domain_knowledge rows with
    metadata.session_id, each question answered through the engine's
    public `retrieve(..., mode='benchmark')` (pure-similarity weights,
    no threshold) — exactly the reference's LongMemEval procedure
    (docs/benchmarks/BENCHMARK-REPORT.md:42-78). Slower than the one-job
    `run_benchmark` (per-question API calls); use it to certify the
    engine end-to-end, the one-job form for scale."""
    from pyspark.sql import functions as F

    rows = corpus.sessions.select(
        F.concat(F.lit("dk_"), F.col("session_id")).alias("id"),
        F.lit(agent).alias("agent"),
        F.lit(project_id).alias("project_id"),
        F.lit("session").alias("domain"),
        F.col("session_text").alias("fact"),
        F.lit("benchmark").alias("source"),
        F.lit(1.0).alias("confidence"),
        F.current_timestamp().alias("last_verified"),
        F.lit(None).cast("string").alias("verification_status"),
        F.col("embedding"),
        F.create_map(F.lit("session_id"), F.col("session_id")).alias("metadata"),
    )
    engine.store.append("domain_knowledge", rows)
    results = []
    for q in corpus.questions:
        sl = engine.retrieve(
            q["question"], agent=agent, project_id=project_id,
            top_k=top_k, mode="benchmark",
        )
        ranked = [
            (r.get("metadata") or {}).get("session_id")
            for r in sl.domain_knowledge
        ]
        results.append(
            QuestionResult(
                question_id=q["question_id"],
                question_type=q["question_type"],
                correct_ids=set(q["gold_session_ids"]),
                ranked_ids=[s for s in ranked if s],
            )
        )
    return compute_metrics(results), results
