"""AutoLearner parity (reference alma/extraction/auto_learner.py +
extractor.py RuleBasedExtractor + types.py MemoryScope): pattern
families, domain inference order, scope filtering, commit routing."""

from datetime import datetime, timezone

import pytest

from alma_memory_spark.engine import AlmaSpark
from alma_memory_spark.operators.auto_learn import (
    MemoryScope,
    extract_facts,
    filter_by_scope,
)


@pytest.fixture()
def eng(spark, tmp_path):
    return AlmaSpark(
        spark,
        str(tmp_path / "s"),
        clock=lambda: datetime(2024, 2, 15, tzinfo=timezone.utc),
    )


def test_pattern_families_and_multi_family_messages(spark):
    msgs = spark.createDataFrame(
        [
            (0, "the retry worked by using exponential backoff"),  # heuristic
            (1, "never use sleep in tests"),  # anti-pattern
            (2, "i prefer dark mode"),  # preference
            (3, "this failed because the token expired and you should always use refresh"),  # anti + heur
            (4, "plain statement with no signal"),
        ],
        "msg_idx int, content string",
    )
    facts = extract_facts(msgs).select("msg_idx", "fact_type", "confidence").collect()
    got = sorted((r["msg_idx"], r["fact_type"]) for r in facts)
    assert got == [
        (0, "heuristic"),
        (1, "anti_pattern"),
        (2, "preference"),
        (3, "anti_pattern"),
        (3, "heuristic"),
    ]
    assert all(r["confidence"] == 0.5 for r in facts)


def test_domain_inference_first_family_wins(spark):
    msgs = spark.createDataFrame(
        [
            (0, "always use assert on the api response"),  # testing beats backend
            (1, "never use slow css selectors"),  # frontend beats performance
            (2, "you should always use refresh tokens"),  # security
            (3, "recommend to use plain words"),  # no domain
        ],
        "msg_idx int, content string",
    )
    doms = {
        r["msg_idx"]: r["inferred_domain"]
        for r in extract_facts(msgs).select("msg_idx", "inferred_domain").collect()
    }
    assert doms == {0: "testing", 1: "frontend", 2: "security", 3: None}


def test_scope_filtering(spark):
    msgs = spark.createDataFrame(
        [
            (0, "the fix worked by using an api retry"),  # heuristic, backend
            (1, "never use slow css animations"),  # anti-pattern, frontend
            (2, "i prefer tabs over spaces"),  # preference — scope-exempt
        ],
        "msg_idx int, content string",
    )
    facts = extract_facts(msgs)
    scope = MemoryScope(agent="a", can_learn=["backend"], cannot_learn=["frontend"])
    valid, rejected = filter_by_scope(facts, scope)
    assert sorted(r["fact_type"] for r in valid.collect()) == [
        "heuristic", "preference",
    ]
    rej = rejected.collect()
    assert len(rej) == 1 and rej[0]["reject_reason"] == "outside_scope"

    # confidence floor
    v2, r2 = filter_by_scope(facts, None, min_confidence=0.9)
    assert v2.count() == 0 and all(
        r["reject_reason"] == "low_confidence" for r in r2.collect()
    )

    assert MemoryScope(agent="a").is_allowed("anything")
    assert not MemoryScope(agent="a", cannot_learn=["x"]).is_allowed("x")
    assert not MemoryScope(agent="a", can_learn=["y"]).is_allowed("z")


def test_engine_commit_routing(eng):
    msgs = [
        {"role": "assistant", "content": "the retry worked by using backoff on the api"},
        {"role": "user", "content": "i prefer short answers"},
        {"role": "assistant", "content": "never use sleep in tests"},
    ]
    out = eng.learn_from_conversation(msgs, agent="a1", project_id="p1", user_id="u1")
    assert out["extracted_count"] == 3
    assert out["valid_count"] == 3
    assert out["committed_count"] == 3
    assert eng.store.read("heuristics").count() == 1
    assert eng.store.read("anti_patterns").count() == 1
    prefs = eng.store.read("preferences").collect()
    assert len(prefs) == 1 and prefs[0]["source"] == "auto_extraction"

    # no user_id -> the preference fact is valid but not committed
    out2 = eng.learn_from_conversation(
        [{"role": "user", "content": "i prefer tabs"}], agent="a1", project_id="p1"
    )
    assert out2["valid_count"] == 1 and out2["committed_count"] == 0

    # commit=False extracts only
    before = eng.store.read("heuristics").count()
    out3 = eng.learn_from_conversation(
        [{"role": "a", "content": "validation helped by using schemas"}],
        agent="a1", project_id="p1", commit=False,
    )
    assert out3["valid_count"] == 1 and out3["committed_count"] == 0
    assert eng.store.read("heuristics").count() == before


def test_auto_learn_tool(eng):
    from alma_memory_spark.api import AlmaToolSurface

    tools = AlmaToolSurface(eng)
    out = tools.call(
        "alma_learn_from_conversation",
        messages=[{"role": "u", "content": "i prefer yaml configs"}],
        agent="a1", project_id="p", user_id="u9",
    )
    assert out["committed_count"] == 1 and len(out["committed_ids"]) == 1
