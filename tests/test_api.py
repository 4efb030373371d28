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


def test_extended_tool_surface(surface):
    """The remaining reference MCP tools (mcp/tools/__init__.py:98-135):
    verified/trust/mode retrieval, reinforce + weak memories, artifacts,
    compress-and-learn, batch heuristic extraction, workflow learn,
    checkpoint cleanup, trust patterns, verification listing."""
    k = surface.call(
        "alma_add_knowledge", agent="helena", project_id="p",
        domain="deploy", fact="blue green deploys must drain connections first",
    )

    full = surface.call(
        "alma_get_memory_full", memory_type="domain_knowledge", memory_id=k["id"]
    )
    assert full["found"] and full["memory"]["fact"].startswith("blue green")

    v = surface.call("alma_retrieve_verified", task="deploys", agent="helena", project_id="p")
    dk = v["domain_knowledge"][0]
    assert dk["verification_status"] == "verified"  # confidence 0.9 >= 0.7
    assert dk["verification_method"] == "confidence"

    m = surface.call(
        "alma_retrieve_for_mode", task="deploys", agent="helena",
        mode="precise", project_id="p",
    )
    assert m["mode"] == "precise"

    surface.call(
        "alma_store_trust_pattern", agent="helena", performance_score=0.9,
        success_streak=3,
    )
    surface.call("alma_store_trust_pattern", agent="shady", performance_score=0.1)
    warn = surface.call("alma_get_trust_warnings", threshold=0.5)
    assert [w["agent"] for w in warn["items"]] == ["shady"]

    t = surface.call(
        "alma_retrieve_with_trust", task="deploys", agent="helena", project_id="p"
    )
    assert "trust" in t["domain_knowledge"][0]

    r1 = surface.call(
        "alma_reinforce", memory_type="domain_knowledge", memory_id=k["id"]
    )
    r2 = surface.call(
        "alma_reinforce", memory_type="domain_knowledge", memory_id=k["id"],
        importance=0.05,
    )
    assert (r1["access_count"], r2["access_count"]) == (1, 2)
    # importance 0.05 drags decayed strength below the 0.3 band
    weak = surface.call("alma_get_weak_memories", threshold=1.1)
    assert any(w["memory_id"] == k["id"] for w in weak["items"])

    a = surface.call(
        "alma_link_artifact", memory_type="domain_knowledge", memory_id=k["id"],
        storage_url="s3://bucket/diagram.png", mime_type="image/png",
    )
    arts = surface.call(
        "alma_get_artifacts", memory_type="domain_knowledge", memory_id=k["id"]
    )
    assert [x["id"] for x in arts["items"]] == [a["id"]]
    assert arts["items"][0]["storage_url"] == "s3://bucket/diagram.png"

    c = surface.call(
        "alma_compress_and_learn", agent="helena", project_id="p",
        content=(
            "The deploy pipeline has three stages. It works because the "
            "canary fails fast. You must drain connections before cutover. "
            "Rollbacks should never skip the smoke tests. " * 2
        ),
    )
    assert c["id"].startswith("dk_") and c["compression_ratio"] > 1.0

    for i in range(3):
        surface.call(
            "alma_learn", agent="helena", task=f"ship release {i}", outcome=True,
            project_id="p", strategy_used="canary then full rollout",
            task_type="deployment",
        )
    ex = surface.call("alma_extract_heuristic", project_id="p")
    assert ex["extracted"] >= 1

    w = surface.call(
        "alma_workflow_learn", workflow_id="wf1", run_id="r9", agent="helena",
        project_id="p", result="success", strategies_used=["canary"],
    )
    assert w["id"].startswith("wf_")

    surface.call(
        "alma_checkpoint", run_id="r9", node_id="n1", state={"x": 1},
        sequence_number=1,
    )
    gone = surface.call("alma_cleanup_checkpoints", run_id="r9")
    assert gone["deleted"] == 1

    lv = surface.call(
        "alma_list_verification", table="domain_knowledge", project_id="p",
        status="verified",
    )
    assert isinstance(lv["items"], list)

    opt = surface.call("alma_optimize", tables=["domain_knowledge"])
    assert "compacted" in opt  # may be {} on an already-compact store

    assert len(surface.tools()) >= 33


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


def test_reference_facade_parity_aliases(spark, tmp_path):
    """A reference user's core.py call sites work verbatim: quickstart /
    from_config constructors, name aliases, record_usage batch marking,
    retrieve_with_scope metadata annotation (core.py:93-1368)."""
    from datetime import datetime, timezone

    from alma_memory_spark.engine import AlmaSpark

    eng = AlmaSpark.quickstart(
        project_id="proj-q", storage_dir=str(tmp_path / "qs"), spark=spark
    )
    kid = eng.add_domain_knowledge("a1", "perf", "caching helps latency")
    assert kid and eng.default_project_id == "proj-q"
    # default_project_id flows into the alias
    assert eng.store.read("domain_knowledge").collect()[0]["project_id"] == "proj-q"
    pid = eng.add_user_preference("u1", "style", "be terse")
    assert pid
    assert eng.get_stats()["domain_knowledge"] == 1

    cfg = tmp_path / "config.yaml"
    cfg.write_text(
        "project_id: proj-c\n"
        f"storage:\n  path: {tmp_path / 'cfg_store'}\n"
        "retrieval:\n  feedback_weight: 0.25\n"
    )
    eng2 = AlmaSpark.from_config(str(cfg), spark=spark)
    assert eng2.feedback_weight == 0.25
    assert eng2.default_project_id == "proj-c"

    # record_usage: one batch append, used/ignored split
    ids = eng.record_usage(
        ["m1", "m2", "m3"], ["m2"], memory_type="heuristics", agent="a1",
        query="q", project_id="proj-q",
    )
    assert len(ids) == 3
    fb = {r["memory_id"]: r["signal"] for r in eng.store.read("retrieval_feedback").collect()}
    assert fb == {"m1": "ignored", "m2": "used", "m3": "ignored"}

    # checkpoint alias
    eng.checkpoint("r1", "n1", '{"x": 1}', sequence_number=1)
    assert eng.get_resume_point("r1")["node_id"] == "n1"

    # workflow alias
    wid = eng.learn_from_workflow("wf1", "r1", "a1", "proj-q", "success")
    assert wid

    # scoped retrieval carries the cascade metadata
    ctx = {"tenant_id": "t1", "workflow_id": "wf1", "run_id": "r1", "node_id": "n1"}
    sl = eng.retrieve_with_scope("caching question", "a1", ctx, scope="run")
    assert sl.metadata["scope"] == "run"
    assert sl.metadata["scope_filter"] == {
        "tenant_id": "t1", "workflow_id": "wf1", "run_id": "r1",
    }
    assert eng.retrieve_with_scope("q", "a1", ctx, scope="global").metadata[
        "scope_filter"] == {}


def test_from_config_honors_embedding_section(spark, tmp_path):
    """from_config wires the configured embedding provider (reference:
    ALMA.from_config -> RetrievalEngine(embedding_provider=...),
    core.py:164-190): 'hash'/'mock' resolve to the deterministic
    HashEmbedder with the configured dim; 'local' and 'azure' raise the
    declared env/import boundary; unknown providers are rejected."""
    import pytest as _pytest

    from alma_memory_spark.embedding import HashEmbedder, resolve_provider
    from alma_memory_spark.engine import AlmaSpark

    cfg = tmp_path / "config.yaml"
    cfg.write_text(
        "project_id: proj-e\n"
        f"storage:\n  path: {tmp_path / 'emb_store'}\n"
        "embedding:\n  provider: hash\n  dim: 32\n"
    )
    eng = AlmaSpark.from_config(str(cfg), spark=spark)
    assert isinstance(eng.embedder, HashEmbedder) and eng.embedder.dim == 32
    assert len(eng.embedder.encode("x")) == 32

    # top-level reference-loader shape works too
    cfg2 = tmp_path / "config2.yaml"
    cfg2.write_text(
        "project_id: proj-e2\n"
        f"storage:\n  path: {tmp_path / 'emb_store2'}\n"
        "embedding_provider: mock\n"
    )
    eng2 = AlmaSpark.from_config(str(cfg2), spark=spark)
    assert isinstance(eng2.embedder, HashEmbedder)

    # env/import-gated providers raise their declared boundary
    with _pytest.raises(NotImplementedError):
        resolve_provider("local")
    with _pytest.raises(NotImplementedError):
        resolve_provider("azure")
    with _pytest.raises(ValueError):
        resolve_provider("nonsense")


def test_tool_retrieve_batch(spark, tmp_path):
    """alma_retrieve_batch: bulk entry point returns one slice-dict per
    task, consistent with alma_retrieve."""
    from alma_memory_spark.api import AlmaToolSurface
    from alma_memory_spark.engine import AlmaSpark

    eng = AlmaSpark(spark, str(tmp_path / "tb"))
    for i in range(8):
        eng.add_knowledge("a1", "p1", "d", f"bulk tool fact {i}")
    tools = AlmaToolSurface(eng)
    out = tools.call(
        "alma_retrieve_batch",
        tasks=["bulk tool fact 2", "bulk tool fact 5"],
        agent="a1", project_id="p1", top_k=3,
    )
    assert set(out) == {"bulk tool fact 2", "bulk tool fact 5"}
    single = tools.call(
        "alma_retrieve", task="bulk tool fact 2", agent="a1",
        project_id="p1", top_k=3,
    )
    assert [r["id"] for r in out["bulk tool fact 2"]["domain_knowledge"]] == [
        r["id"] for r in single["domain_knowledge"]
    ]
