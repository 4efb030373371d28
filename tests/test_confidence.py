"""ConfidenceEngine parity (reference alma/confidence/engine.py +
types.py): formula literals, signal tiers, is_similar semantics, and
the batch ranking through the engine facade."""

from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from alma_memory_spark.engine import AlmaSpark


@pytest.fixture()
def engine(spark, tmp_path):
    return AlmaSpark(
        spark,
        str(tmp_path / "store"),
        clock=lambda: datetime(2024, 2, 15, tzinfo=timezone.utc),
    )


def test_is_similar_tiers(spark):
    from alma_memory_spark.operators.confidence import is_similar_expr

    df = spark.createDataFrame(
        [
            ("use binary search", "use binary search", True),  # exact
            ("binary search", "use binary search always", True),  # substring
            ("fill required fields first", "required fields fill first", True),  # jaccard 1.0
            ("alpha beta gamma delta", "alpha beta zeta eta", False),  # jaccard 2/6
            ("alpha beta gamma", "alpha beta zeta", True),  # jaccard 2/4 = 0.5
            ("", "anything", False),
            (None, "anything", False),
        ],
        "a string, b string, want boolean",
    )
    got = df.select("want", is_similar_expr(F.col("a"), F.col("b")).alias("got")).collect()
    for r in got:
        assert r["got"] == r["want"]


def test_novel_strategy_literal_score(engine):
    """Empty store: occurrences=0, rate=0, sim=0.3, pred=0.5*0.3+0.5*0.7
    =0.5, unc=min(1,(0.8+0.7)/2)=0.75, risk=opp=0 ->
    score = 0.3*0 + 0.4*0.5 + 0.15*0.3 + 0.15*0.25 = 0.2825, neutral
    is wrong — 0.2825 < 0.4 -> caution (types.py:258-276)."""
    sig = engine.assess_strategy("try the new approach", "novel task", agent="a1")
    assert sig["occurrences"] == 0
    assert sig["historical_rate"] == 0.0
    assert sig["context_similarity"] == 0.3
    assert sig["predicted_success"] == 0.5
    assert sig["uncertainty"] == 0.75
    assert sig["total_risk"] == 0.0
    assert sig["total_opportunity"] == 0.0
    assert sig["confidence_score"] == pytest.approx(0.2825, abs=1e-6)
    assert sig["recommendation"] == "caution"


def test_risky_pattern_overrides_to_avoid(engine):
    """'delete all' -> risk 0.8 -> recommendation 'avoid' regardless of
    score (engine.py:257-263, types.py:260-262)."""
    sig = engine.assess_strategy(
        "delete all rows and retry", "cleanup task", agent="a1"
    )
    assert sig["total_risk"] == 0.8
    assert sig["recommendation"] == "avoid"
    sig2 = engine.assess_strategy("force the lock", "cleanup", agent="a1")
    assert sig2["total_risk"] == 0.5  # force -> 0.5, under the caution tier


def test_complexity_and_best_practice_signals(engine):
    sig = engine.assess_strategy(
        "complete rewrite of every module", "big refactor", agent="a1"
    )
    assert sig["total_risk"] == pytest.approx(0.4)  # 2 complexity keywords
    sig2 = engine.assess_strategy(
        "test first then implement", "feature work", agent="a1"
    )
    assert sig2["total_opportunity"] == pytest.approx(0.6)  # best practice


def test_proven_strategy_ranks_first(engine):
    """A heuristic with 12/12 successes on the matching strategy makes
    it proven (opp min(0.9, 1.0)=0.9), historically 1.0, low
    uncertainty — it must outrank a novel and a risky alternative, with
    the exact literal score."""
    for i in range(12):
        engine.learn(
            agent="a1",
            task=f"form testing task {i}",
            outcome=True,
            project_id="p",
            strategy_used="fill required fields first",
            task_type="form_testing",
        )
    ranked = engine.rank_strategies(
        ["fill required fields first", "try something new", "delete all and restart"],
        context="form testing task",
        agent="a1",
        project_id="p",
    )
    assert [r["strategy"] for r in ranked][0] == "fill required fields first"
    top = ranked[0]
    assert top["occurrences"] == 12
    assert top["historical_rate"] == 1.0
    # outcomes retrieved for the context match the strategy -> sim 0.8
    assert top["context_similarity"] == 0.8
    # pred = 0.8*1.0 + 0.2*0.5 = 0.9 ; unc = (0.1 + 0.2)/2 = 0.15
    assert top["predicted_success"] == pytest.approx(0.9)
    assert top["uncertainty"] == pytest.approx(0.15)
    assert top["total_opportunity"] == pytest.approx(0.9)
    # 0.3*1 + 0.4*0.9 + 0.15*0.8 + 0.15*0.85 - 0 + 0.2*0.9 = 1.0875 -> 1.0
    assert top["confidence_score"] == 1.0
    assert top["recommendation"] == "strong_yes"
    assert ranked[-1]["strategy"] == "delete all and restart"
    assert ranked[-1]["recommendation"] == "avoid"


def test_confidence_tools(engine):
    from alma_memory_spark.api import AlmaToolSurface

    tools = AlmaToolSurface(engine)
    assert "alma_assess_strategy" in tools.tools()
    out = tools.call(
        "alma_rank_strategies",
        strategies=["validate inputs early", "force push"],
        context="ci pipeline",
        agent="a1",
    )
    assert [r["strategy"] for r in out["ranked"]][0] == "validate inputs early"
