"""Learning-layer parity tests: heuristic extraction thresholds,
anti-pattern creation, write guard (mirrors reference
tests/unit/test_heuristic_extractor.py and write-guard tests)."""

from datetime import datetime, timedelta, timezone

from pyspark.sql import functions as F

from alma_memory_spark import schemas
from alma_memory_spark.embedding import hash_embed
from alma_memory_spark.operators.learning import (
    extract_anti_patterns,
    extract_heuristics,
    write_guard_filter,
)

NOW = datetime(2024, 6, 1, tzinfo=timezone.utc)


def _outcome(i, agent="a", project="p", tt="testing", strategy="use explicit waits",
             success=True, error=None, days_ago=10):
    return {
        "id": f"out_{i:04d}",
        "agent": agent,
        "project_id": project,
        "task_type": tt,
        "task_description": f"task {i}",
        "success": success,
        "strategy_used": strategy,
        "duration_ms": 100,
        "error_message": error,
        "user_feedback": None,
        "timestamp": NOW - timedelta(days=days_ago),
        "verification_status": None,
        "embedding": hash_embed(f"task {strategy}", 16),
        "metadata": {},
    }


def test_heuristic_extraction_thresholds(spark):
    # 4 successes + 1 failure with same strategy -> n=5, rate=0.8,
    # conf = 0.8 * (0.5 + 0.5*min(5/20,1)) = 0.8 * 0.625 = 0.5 -> emitted
    rows = [
        _outcome(0), _outcome(1), _outcome(2), _outcome(3),
        _outcome(4, success=False, error="boom"),
        # a different (agent) group with only 2 occurrences -> below min
        _outcome(10, agent="b"), _outcome(11, agent="b"),
    ]
    df = spark.createDataFrame(rows, schemas.OUTCOMES)
    out = extract_heuristics(df).collect()
    assert len(out) == 1
    h = out[0]
    assert h["agent"] == "a"
    assert h["occurrence_count"] == 5
    assert h["success_count"] == 4
    assert abs(h["success_rate"] - 0.8) < 1e-9
    assert abs(h["confidence"] - 0.5) < 1e-9
    assert h["id"].startswith("heur_")
    assert h["condition"] == "task type: testing"


def test_heuristic_extraction_fails_below_success_rate(spark):
    rows = [
        _outcome(0), _outcome(1, success=False, error="x"),
        _outcome(2, success=False, error="y"), _outcome(3, success=False, error="z"),
    ]
    df = spark.createDataFrame(rows, schemas.OUTCOMES)
    assert extract_heuristics(df).count() == 0  # rate 0.25 <= 0.5


def test_heuristic_clusters_similar_strategies(spark):
    # same tokens, different order -> identical hash-embedding bag -> one cluster
    rows = [
        _outcome(0, strategy="use explicit waits always"),
        _outcome(1, strategy="always use explicit waits"),
        _outcome(2, strategy="use explicit waits always"),
        _outcome(3, strategy="completely different plan entirely now"),
    ]
    df = spark.createDataFrame(rows, schemas.OUTCOMES)
    out = extract_heuristics(df).collect()
    assert len(out) == 1
    assert out[0]["occurrence_count"] == 3


def test_anti_pattern_creation(spark):
    rows = [
        _outcome(0, success=False, error="Timeout waiting for selector #a"),
        _outcome(1, success=False, error="timeout waiting for selector"),
        _outcome(2, success=False, error="timeout waiting for selector #b"),
        _outcome(3, success=False, error="totally unrelated failure"),
        _outcome(4),
    ]
    df = spark.createDataFrame(rows, schemas.OUTCOMES)
    out = extract_anti_patterns(df, min_failures=2).collect()
    assert len(out) == 1
    ap = out[0]
    assert ap["id"].startswith("anti_")
    assert ap["occurrence_count"] >= 2
    assert "timeout" in ap["why_bad"]


def test_write_guard_blocks_matching(spark):
    cand_rows = [
        _outcome(0, strategy="use fixed sleep for async waits"),
        _outcome(1, strategy="use condition polling"),
    ]
    cands = spark.createDataFrame(cand_rows, schemas.OUTCOMES)
    aps = spark.createDataFrame(
        [
            {
                "id": "anti_1", "agent": "a", "project_id": "p",
                "pattern": "fixed sleep for async waits",
                "why_bad": "flaky", "better_alternative": None,
                "occurrence_count": 3, "last_seen": NOW, "created_at": NOW,
                "verification_status": None, "embedding": hash_embed("x", 16),
                "metadata": {},
            }
        ],
        schemas.ANTI_PATTERNS,
    )
    allowed, blocked = write_guard_filter(
        cands, aps, ["task_description", "strategy_used", "error_message"]
    )
    assert [r["id"] for r in blocked.select("id").collect()] == ["out_0000"]
    assert [r["id"] for r in allowed.select("id").collect()] == ["out_0001"]


def test_write_guard_passes_all_when_no_patterns(spark):
    cands = spark.createDataFrame([_outcome(0)], schemas.OUTCOMES)
    aps = spark.createDataFrame([], schemas.ANTI_PATTERNS)
    allowed, blocked = write_guard_filter(cands, aps, ["task_description"])
    assert allowed.count() == 1 and blocked.count() == 0
