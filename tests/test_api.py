"""Tool-surface adapter + reranker + budget/progressive retrieval tests."""

import pytest

from alma_memory_spark.api import AlmaToolSurface
from alma_memory_spark.engine import AlmaSpark
from alma_memory_spark.operators.reranking import get_reranker


@pytest.fixture()
def surface(spark, tmp_path):
    return AlmaToolSurface(AlmaSpark(spark, str(tmp_path / "store")))


def test_tool_roundtrip(surface):
    r = surface.call(
        "alma_learn", agent="helena", task="test the form", outcome=True,
        project_id="p", strategy_used="fill fields first",
    )
    assert "outcome_id" in r
    k = surface.call(
        "alma_add_knowledge", agent="helena", project_id="p",
        domain="ui", fact="the form has two fields",
    )
    assert k["id"].startswith("dk_")
    out = surface.call("alma_retrieve", task="form fields", agent="helena", project_id="p")
    assert out["counts"]["domain_knowledge"] == 1
    assert out["counts"]["outcomes"] == 1

    fb = surface.call(
        "alma_record_feedback", memory_id=k["id"], memory_type="domain_knowledge",
        signal="thumbs_up", agent="helena",
    )
    assert fb == {"recorded": True}

    b = surface.call(
        "alma_retrieve_with_budget", task="form", agent="helena",
        max_tokens=100, project_id="p",
    )
    assert "prompt" in b

    p = surface.call("alma_retrieve_progressive", task="form", agent="helena", project_id="p")
    assert p["items"] and {"id", "memory_type", "headline", "score"} <= set(p["items"][0])

    cp = surface.call(
        "alma_checkpoint", run_id="r1", node_id="n1", state={"a": 1},
        sequence_number=1, state_hash="h",
    )
    assert cp["checkpoint_id"]
    res = surface.call("alma_resume", run_id="r1")
    assert res["checkpoint"]["node_id"] == "n1"

    st = surface.call("alma_stats", project_id="p")
    assert st["total"] >= 2

    bad = surface.call("alma_nope")
    assert "error" in bad and "alma_retrieve" in bad["available"]


def test_reranker_kinds():
    rows = [
        {"id": "a", "text": "spark joins shuffle", "score": 0.9},
        {"id": "b", "text": "broadcast joins avoid shuffle cost", "score": 0.8},
    ]
    noop = get_reranker("noop").rerank("shuffle cost", rows, "text")
    assert [r["id"] for r in noop] == ["a", "b"]
    ov = get_reranker("overlap").rerank("shuffle cost", rows, "text")
    assert [r["id"] for r in ov] == ["b", "a"]  # b overlaps 2 tokens
    with pytest.raises(NotImplementedError):
        get_reranker("cross_encoder")
    with pytest.raises(ValueError):
        get_reranker("bogus")


def test_embedding_dim_validation(spark, tmp_path):
    eng = AlmaSpark(spark, str(tmp_path / "s"))
    good = spark.createDataFrame(
        [("a", [0.0] * eng.embedder.dim)], "id string, embedding array<float>"
    )
    assert eng.validate_embedding_dim(good) == eng.embedder.dim
    bad = spark.createDataFrame(
        [("a", [0.0] * 3)], "id string, embedding array<float>"
    )
    with pytest.raises(ValueError, match="dimension mismatch"):
        eng.validate_embedding_dim(bad)
