"""Deterministic seed corpus mirroring the reference's test fixtures
(tests/fixtures/seed_memories.py shape, FIXTURES.md schemas): known
heuristics / outcomes / preferences / domain knowledge / anti-patterns
with hash-embedder embeddings, plus feedback, strength, checkpoint,
workflow, and graph tables. Seeded random -> stable goldens."""

from __future__ import annotations

import random
from datetime import datetime, timedelta, timezone

from pyspark.sql import DataFrame, SparkSession

from alma_memory_spark import schemas
from alma_memory_spark.embedding import hash_embed

NOW = datetime(2024, 6, 1, tzinfo=timezone.utc)
AGENTS = ["helena", "victor", "senior_dev"]
PROJECTS = ["proj-a", "proj-b"]
TASK_TYPES = ["testing", "api_testing", "form_testing", "database_validation"]
STRATEGIES = [
    "fill required fields first then submit",
    "mock the api layer and assert contracts",
    "validate schema before writing rows",
    "retry with exponential backoff on timeout",
    "use explicit waits instead of sleeps",
]
ERRORS = [
    "timeout waiting for selector",
    "connection refused by database",
    "schema mismatch on insert",
]


def _dt(days_ago: float) -> datetime:
    return NOW - timedelta(days=days_ago)


def seed_outcomes(spark: SparkSession, n_per_combo: int = 5) -> DataFrame:
    rng = random.Random(42)
    rows = []
    i = 0
    for project in PROJECTS:
        for agent in AGENTS:
            for tt in TASK_TYPES[:2]:
                strategy = STRATEGIES[i % len(STRATEGIES)]
                for j in range(n_per_combo):
                    success = rng.random() < 0.7
                    err = None if success else ERRORS[j % len(ERRORS)]
                    task = f"{tt} task {j} for {project}"
                    rows.append(
                        {
                            "id": f"out_{i:06d}{j:02d}",
                            "agent": agent,
                            "project_id": project,
                            "task_type": tt,
                            "task_description": task,
                            "success": success,
                            "strategy_used": strategy,
                            "duration_ms": rng.randint(50, 60000),
                            "error_message": err,
                            "user_feedback": None,
                            "timestamp": _dt(rng.uniform(0, 180)),
                            "verification_status": None,
                            "embedding": hash_embed(f"{task} {strategy}", 16),
                            "metadata": {},
                        }
                    )
                i += 1
    return spark.createDataFrame(rows, schemas.OUTCOMES)


def seed_heuristics(spark: SparkSession) -> DataFrame:
    rng = random.Random(43)
    rows = []
    for i, (project, agent) in enumerate(
        [(p, a) for p in PROJECTS for a in AGENTS]
    ):
        for j in range(6):
            occ = rng.randint(1, 30)
            succ = rng.randint(0, occ)
            conf = rng.random()
            cond = f"task type: {TASK_TYPES[j % len(TASK_TYPES)]}"
            strat = STRATEGIES[(i + j) % len(STRATEGIES)]
            rows.append(
                {
                    "id": f"heur_{i:04d}{j:02d}",
                    "agent": agent,
                    "project_id": project,
                    "condition": cond,
                    "strategy": strat,
                    "confidence": conf,
                    "occurrence_count": occ,
                    "success_count": succ,
                    "last_validated": _dt(rng.uniform(0, 120)),
                    "created_at": _dt(rng.uniform(120, 200)),
                    "verification_status": rng.choice(
                        ["verified", "uncertain", None, None]
                    ),
                    "embedding": hash_embed(f"{cond} {strat}", 16),
                    "metadata": {},
                }
            )
    return spark.createDataFrame(rows, schemas.HEURISTICS)


def seed_knowledge(spark: SparkSession) -> DataFrame:
    rng = random.Random(44)
    facts = [
        ("authentication", "auth service uses oauth2 with refresh tokens"),
        ("database_schema", "orders table is partitioned by order date"),
        ("deployment", "deploys roll out via blue green switchover"),
        ("ui", "settings page uses optimistic updates"),
    ]
    rows = []
    for i, (project, agent) in enumerate([(p, a) for p in PROJECTS for a in AGENTS]):
        for j, (domain, fact) in enumerate(facts):
            rows.append(
                {
                    "id": f"dk_{i:04d}{j:02d}",
                    "agent": agent,
                    "project_id": project,
                    "domain": domain,
                    "fact": fact,
                    "source": rng.choice(["code_analysis", "documentation", "user_stated"]),
                    "confidence": 0.8 + 0.2 * rng.random(),
                    "last_verified": _dt(rng.uniform(0, 120)),
                    "verification_status": None,
                    "embedding": hash_embed(fact, 16),
                    "metadata": {"session_id": f"sess_{j}"},
                }
            )
    return spark.createDataFrame(rows, schemas.DOMAIN_KNOWLEDGE)


def seed_anti_patterns(spark: SparkSession) -> DataFrame:
    pats = [
        (
            "using fixed sleep for async waits",
            "flaky under load",
            "use explicit waits on conditions",
        ),
        (
            "querying database in a loop",
            "n plus one performance collapse",
            "batch the lookups into one query",
        ),
    ]
    rng = random.Random(45)
    rows = []
    for i, (project, agent) in enumerate([(p, a) for p in PROJECTS for a in AGENTS]):
        for j, (pat, why, better) in enumerate(pats):
            rows.append(
                {
                    "id": f"anti_{i:04d}{j:02d}",
                    "agent": agent,
                    "project_id": project,
                    "pattern": pat,
                    "why_bad": why,
                    "better_alternative": better,
                    "occurrence_count": rng.randint(1, 12),
                    "last_seen": _dt(rng.uniform(0, 60)),
                    "created_at": _dt(rng.uniform(60, 120)),
                    "verification_status": None,
                    "embedding": hash_embed(f"{pat} {why}", 16),
                    "metadata": {},
                }
            )
    return spark.createDataFrame(rows, schemas.ANTI_PATTERNS)


def seed_feedback(spark: SparkSession) -> DataFrame:
    rng = random.Random(46)
    rows = []
    signals = ["used", "used", "thumbs_up", "ignored", "thumbs_down"]
    for j in range(40):
        mem = f"heur_{0:04d}{j % 6:02d}"
        rows.append(
            {
                "id": f"fb_{j:04d}",
                "memory_id": mem,
                "memory_type": "heuristics",
                "query": "how to test forms",
                "agent": rng.choice(AGENTS),
                "project_id": "proj-a",
                "signal": signals[j % len(signals)] if j % 3 else rng.choice(signals),
                "timestamp": _dt(rng.uniform(0, 30)),
            }
        )
    return spark.createDataFrame(rows, schemas.RETRIEVAL_FEEDBACK)


def seed_checkpoints(spark: SparkSession) -> DataFrame:
    rows = []
    for run, branches in [("run-1", [None]), ("run-2", ["b1", "b2"])]:
        for b in branches:
            for seq in range(1, 6):
                rows.append(
                    {
                        "id": f"ckpt_{run}_{b}_{seq}",
                        "run_id": run,
                        "node_id": f"node-{seq}",
                        "state": f'{{"step": {seq}, "items": ["i{seq}"], "n": {seq * 10}}}',
                        "sequence_number": seq,
                        "branch_id": b,
                        "parent_checkpoint_id": None,
                        "state_hash": f"hash-{run}-{b}-{seq}",
                        "created_at": _dt(10 - seq),
                    }
                )
    return spark.createDataFrame(rows, schemas.CHECKPOINTS)


def seed_graph(spark: SparkSession) -> tuple[DataFrame, DataFrame]:
    ents = [
        {"id": f"e{i}", "name": f"entity-{i}", "entity_type": t, "properties": {}, "created_at": _dt(30)}
        for i, t in enumerate(
            ["person", "person", "organization", "tool", "concept", "tool", "person", "organization"]
        )
    ]
    # chain e0-e1-e2-e3-e4 plus extra edges; bitemporal variety on (e0,e5)
    def edge(i, s, t, rt, vf=None, vt=None):
        return {
            "id": f"r{i}",
            "source_id": s,
            "target_id": t,
            "relation_type": rt,
            "properties": {},
            "confidence": 0.9,
            "created_at": _dt(30),
            "valid_from": vf,
            "valid_to": vt,
        }

    rels = [
        edge(0, "e0", "e1", "KNOWS"),
        edge(1, "e1", "e2", "WORKS_AT"),
        edge(2, "e2", "e3", "USES"),
        edge(3, "e3", "e4", "CREATED_BY"),
        edge(4, "e4", "e5", "USES"),
        edge(5, "e0", "e5", "USES", _dt(100), _dt(50)),  # expired interval
        edge(6, "e0", "e5", "USES", _dt(20), None),  # open interval
        edge(7, "e6", "e7", "WORKS_AT", None, _dt(40)),  # closed in past
    ]
    return (
        spark.createDataFrame(ents, schemas.GRAPH_ENTITIES),
        spark.createDataFrame(rels, schemas.GRAPH_RELATIONSHIPS),
    )


def seed_trust(spark: SparkSession) -> DataFrame:
    rows = [
        {
            "agent": "helena",
            "performance_score": 0.9,
            "behavior_scores": [0.8, 0.9, 0.7, 1.0, 0.6],
            "success_streak": 7,
            "last_updated": NOW,
        },
        {
            "agent": "victor",
            "performance_score": 0.4,
            "behavior_scores": [0.5, 0.5, 0.5, 0.5, 0.5],
            "success_streak": 0,
            "last_updated": _dt(60),
        },
    ]
    return spark.createDataFrame(rows, schemas.AGENT_TRUST)
