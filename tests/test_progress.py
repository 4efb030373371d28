"""ProgressTracker parity (reference alma/progress/tracker.py +
types.py): transition side effects, actionable semantics, the four
next-item strategies, the summary aggregation, and progress logs."""

from datetime import datetime, timedelta, timezone

import pytest

from alma_memory_spark.engine import AlmaSpark


@pytest.fixture()
def eng(spark, tmp_path):
    now = [datetime(2024, 2, 15, tzinfo=timezone.utc)]
    e = AlmaSpark(spark, str(tmp_path / "store"), clock=lambda: now[0])
    e._test_now = now  # let tests advance the clock
    return e


def test_transitions_and_time_accounting(eng):
    it = eng.create_work_item("p1", "implement parser", agent="a1", priority=80)
    assert it["status"] == "pending" and it["attempt_count"] == 0

    got = eng.update_work_item_status(it["id"], "in_progress")
    assert got["attempt_count"] == 1 and got["started_at"] is not None
    # repeated in_progress does NOT re-bump (types.py start() fires on
    # transition only, tracker.py:164)
    got = eng.update_work_item_status(it["id"], "in_progress")
    assert got["attempt_count"] == 1

    eng._test_now[0] += timedelta(seconds=90)
    got = eng.update_work_item_status(it["id"], "done", tests_passing=True)
    assert got["status"] == "done"
    assert got["time_spent_ms"] == 90_000
    assert got["tests_passing"] is True
    assert got["completed_at"] is not None

    assert eng.update_work_item_status("nope", "done") is None


def test_block_unblock_and_actionable(eng):
    a = eng.create_work_item("p1", "a", agent="a1")
    b = eng.create_work_item("p1", "b", agent="a1")
    eng.update_work_item_status(b["id"], "blocked", notes="waiting on a",
                                blocked_by=a["id"])
    items = {i["title"]: i for i in eng.get_work_items(project_id="p1")}
    assert items["b"]["status"] == "blocked"
    assert items["b"]["blocked_by"] == [a["id"]]
    assert items["b"]["metadata"]["block_reason"] == "waiting on a"

    # actionable excludes blocked (types.py:124-127)
    nxt = eng.get_next_work_item(agent="a1")
    assert nxt["id"] == a["id"]

    assert eng.unblock_work_item(b["id"])["status"] == "pending"
    assert eng.unblock_work_item(a["id"]) is None  # only blocked items


def test_next_item_strategies(eng):
    lo = eng.create_work_item("p1", "low", priority=10)
    eng._test_now[0] += timedelta(seconds=1)
    hi = eng.create_work_item("p1", "high", priority=90,
                              acceptance_criteria=["x", "y", "z"])
    eng._test_now[0] += timedelta(seconds=1)
    quick = eng.create_work_item("p1", "quick", priority=50)
    # 'low' blocks two other items -> wins blocked_unblock
    eng.create_work_item("p1", "dep1", blocked_by=[lo["id"]])
    eng.create_work_item("p1", "dep2", blocked_by=[lo["id"]])

    assert eng.get_next_work_item(strategy="priority")["id"] == hi["id"]
    assert eng.get_next_work_item(strategy="fifo")["id"] == lo["id"]
    assert eng.get_next_work_item(strategy="blocked_unblock")["id"] == lo["id"]
    # quick_win: fewest acceptance criteria, created_at tiebreak -> 'low'
    assert eng.get_next_work_item(strategy="quick_win")["id"] == lo["id"]
    with pytest.raises(ValueError, match="unknown strategy"):
        eng.get_next_work_item(strategy="bogus")


def test_summary_and_logs(eng):
    a = eng.create_work_item("p1", "t1", agent="a1")
    b = eng.create_work_item("p1", "t2", agent="a1")
    c = eng.create_work_item("p1", "t3", agent="a1")
    eng.create_work_item("p1", "other-agent", agent="zz")
    eng.update_work_item_status(a["id"], "in_progress")
    eng._test_now[0] += timedelta(seconds=10)
    eng.update_work_item_status(a["id"], "done")
    eng.update_work_item_status(b["id"], "failed", notes="flaky env")
    eng.update_work_item_status(c["id"], "blocked", notes="infra")

    s = eng.get_progress_summary(agent="a1")
    assert (s["total"], s["done"], s["failed"], s["blocked"], s["pending"]) == (
        3, 1, 1, 1, 0,
    )
    assert s["completion_rate"] == pytest.approx(1 / 3)
    assert s["success_rate"] == pytest.approx(0.5)  # done/(done+failed)
    assert s["total_time_ms"] == 10_000
    assert s["avg_time_per_item_ms"] == pytest.approx(10_000.0)
    assert s["current_item"] is None  # 'a' moved past in_progress
    assert len(s["blockers"]) == 1 and s["blockers"][0]["id"] == c["id"]

    log = eng.log_progress("a1", "sess-1", current_action="reviewing")
    hist = eng.get_progress_history(agent="a1", session_id="sess-1")
    assert len(hist) == 1
    assert hist[0]["items_total"] == 3 and hist[0]["items_done"] == 1
    assert log["current_action"] == "reviewing"


def test_progress_tools(eng):
    from alma_memory_spark.api import AlmaToolSurface

    tools = AlmaToolSurface(eng)
    it = tools.call("alma_create_work_item", project_id="p", title="w1",
                    priority=70)
    tools.call("alma_update_work_item", item_id=it["id"], status="in_progress")
    out = tools.call("alma_get_next_work_item")
    assert out["next"]["id"] == it["id"]
    s = tools.call("alma_progress_summary")
    assert s["in_progress"] == 1
    assert "error" in tools.call("alma_update_work_item", item_id="x", status="done")


def test_session_lifecycle(eng):
    """SessionManager parity (session/manager.py:74-273): start loads
    the previous handoff, carries blockers, snapshots progress and
    recent memories; end persists a handoff + progress log."""
    # session 1: do work, end with a handoff carrying a blocker
    it = eng.create_work_item("p1", "migration", agent="a1")
    eng.update_work_item_status(it["id"], "in_progress")
    eng.learn(agent="a1", task="run migration", outcome=True, project_id="p1",
              strategy_used="run in batches", task_type="migration")
    hid = eng.end_session(
        "a1", "p1", last_action="paused migration", session_id="s1",
        blockers=["waiting on dba approval"], next_steps=["resume batch 3"],
    )
    assert hid

    # session 2: orientation context
    ctx = eng.start_session("a1", "p1", session_id="s2")
    assert ctx["previous_handoff"]["id"] == hid
    assert ctx["carried_blockers"] == ["waiting on dba approval"]
    assert ctx["current_goal"] == "paused migration"  # goal defaults to last action
    assert ctx["progress"]["in_progress"] == 1
    assert len(ctx["recent_outcomes"]) == 1
    assert ctx["recent_outcomes"][0]["strategy_used"] == "run in batches"
    # explicit goal wins
    assert eng.start_session("a1", "p1", goal="finish it")["current_goal"] == "finish it"
    # progress log was snapshotted at end_session
    assert len(eng.get_progress_history(agent="a1", session_id="s1")) == 1


def test_session_tools(eng):
    from alma_memory_spark.api import AlmaToolSurface

    tools = AlmaToolSurface(eng)
    out = tools.call("alma_end_session", agent="a1", project_id="p",
                     last_action="done for today")
    assert out["handoff_id"]
    ctx = tools.call("alma_start_session", agent="a1", project_id="p")
    assert ctx["previous_handoff"]["last_action"] == "done for today"


def test_memory_stack_layers(eng, tmp_path):
    """MemoryStack parity (context/memory_stack.py): wake_up = L0+L1,
    recall auto-selection, budget-ordered to_prompt, token usage."""
    from alma_memory_spark.context import MemoryStack

    for i in range(3):
        eng.add_knowledge("a1", "p1", "spark", f"broadcast joins beat shuffles {i}")
    eng.add_preference("u1", "style", "prefer concise answers")

    ident = tmp_path / "identity.txt"
    ident.write_text("I am Helena, a careful QA agent.")
    stack = MemoryStack(eng, agent="a1", project_id="p1",
                        identity_path=str(ident))

    out = stack.wake_up(domain="broadcast joins")
    assert "## Identity" in out and "Helena" in out
    assert "## Essential Story" in out
    assert "[Domain Knowledge]" in out
    assert "broadcast joins beat shuffles" in out

    # default identity when no file
    assert "No identity configured" in MemoryStack(eng, agent="a1").identity

    # auto-selection: short query -> L2 on-demand header; long -> L3
    l2 = stack.recall("broadcast joins", top_k=3)
    assert l2.startswith("## On-Demand")
    l3 = stack.recall(
        "how should very large fact to fact joins be planned for skew", top_k=3
    )
    assert not l3.startswith("## On-Demand")

    prompt = stack.to_prompt(max_tokens=2000)
    assert prompt.index("## Identity") < prompt.index("## Essential Story")
    assert "## On-Demand" in prompt

    usage = stack.token_usage
    assert usage["L0_identity"] > 0 and usage["L1_essential_story"] > 0
    assert usage["total"] >= usage["L0_identity"] + usage["active_recalls"]

    # tight budget: L0 always survives
    tight = stack.to_prompt(max_tokens=usage["L0_identity"] + 5)
    assert "## Identity" in tight and "## Essential Story" not in tight


def test_repeated_done_does_not_reaccumulate_time(eng):
    it = eng.create_work_item("p1", "w", agent="a1")
    eng.update_work_item_status(it["id"], "in_progress")
    eng._test_now[0] += timedelta(seconds=30)
    got = eng.update_work_item_status(it["id"], "done")
    assert got["time_spent_ms"] == 30_000
    eng._test_now[0] += timedelta(seconds=500)
    # idempotent retry / flipping tests_passing must not re-add
    got = eng.update_work_item_status(it["id"], "done", tests_passing=False)
    assert got["time_spent_ms"] == 30_000
    assert got["tests_passing"] is False


def test_concurrent_status_updates_no_lost_update(eng):
    """Two concurrent blocked-updates on the SAME item must both land
    (the read-modify-write is lock-covered; an unlocked interleaving
    loses one blocked_by append)."""
    from concurrent.futures import ThreadPoolExecutor

    item = eng.create_work_item("p1", "racy item")
    with ThreadPoolExecutor(max_workers=2) as pool:
        f1 = pool.submit(
            eng.update_work_item_status, item["id"], "blocked", blocked_by="dep-a"
        )
        f2 = pool.submit(
            eng.update_work_item_status, item["id"], "blocked", blocked_by="dep-b"
        )
        f1.result(), f2.result()
    final = eng.get_work_items(project_id="p1")[0]
    assert sorted(final["blocked_by"]) == ["dep-a", "dep-b"]
