"""Memory event system parity (reference alma/events/): emitter
semantics, engine write-path emissions, webhook payload + signature."""

import hashlib
import hmac
import json
from datetime import datetime, timezone

import pytest

from alma_memory_spark.engine import AlmaSpark
from alma_memory_spark.events import (
    EventEmitter,
    MemoryEvent,
    MemoryEventType,
    WebhookFormatter,
)


def _ev(t=MemoryEventType.CREATED):
    return MemoryEvent(event_type=t, agent="a", project_id="p")


def test_emitter_subscribe_unsubscribe_and_errors():
    em = EventEmitter()
    got, all_got = [], []
    cb = got.append
    em.subscribe(MemoryEventType.CREATED, cb)
    em.subscribe_all(all_got.append)
    assert em.has_subscribers(MemoryEventType.CREATED)
    assert em.has_subscribers(MemoryEventType.DELETED)  # catch-all counts

    assert em.emit(_ev()) == 2
    assert len(got) == 1 and len(all_got) == 1
    assert em.emit(_ev(MemoryEventType.DELETED)) == 1  # catch-all only
    assert len(all_got) == 2

    # a raising subscriber is recorded, not propagated, others still run
    def boom(e):
        raise RuntimeError("subscriber bug")

    em.subscribe(MemoryEventType.CREATED, boom)
    assert em.emit(_ev()) == 2  # cb + all; boom failed
    assert em.errors and "subscriber bug" in em.errors[0][1]

    assert em.unsubscribe(MemoryEventType.CREATED, cb)
    assert not em.unsubscribe(MemoryEventType.CREATED, cb)
    assert em.unsubscribe_all(all_got.append)
    assert not em.unsubscribe_all(all_got.append)  # already removed


def test_engine_write_paths_emit(spark, tmp_path):
    eng = AlmaSpark(
        spark,
        str(tmp_path / "s"),
        clock=lambda: datetime(2024, 2, 15, tzinfo=timezone.utc),
    )
    events = []
    eng.events.subscribe_all(events.append)

    kid = eng.add_knowledge("a1", "p1", "d", "facts are good")
    pid = eng.add_preference("u1", "style", "short answers")
    for i in range(3):
        eng.learn(agent="a1", task=f"t {i}", outcome=True, project_id="p1",
                  strategy_used="steady strategy", task_type="tt")

    kinds = [e.event_type for e in events]
    assert kinds.count(MemoryEventType.KNOWLEDGE_ADDED) == 1
    assert kinds.count(MemoryEventType.PREFERENCE_ADDED) == 1
    assert kinds.count(MemoryEventType.OUTCOME_RECORDED) == 3
    assert MemoryEventType.HEURISTIC_FORMED in kinds  # 3rd learn forms one
    ka = next(e for e in events if e.event_type == MemoryEventType.KNOWLEDGE_ADDED)
    assert (ka.memory_type, ka.memory_id, ka.payload["domain"]) == (
        "domain_knowledge", kid, "d",
    )
    assert pid  # preference event carried the id
    pa = next(e for e in events if e.event_type == MemoryEventType.PREFERENCE_ADDED)
    assert pa.memory_id == pid

    # forget emits DELETED with the count
    n = eng.forget("domain_knowledge", "p1", max_age_days=-1)
    de = next(e for e in events if e.event_type == MemoryEventType.DELETED)
    assert de.payload["count"] == n == 1


def test_webhook_payload_and_signature():
    ev = MemoryEvent(
        event_type=MemoryEventType.HEURISTIC_FORMED,
        agent="a",
        project_id="p",
        memory_type="heuristics",
        memory_id="h1",
        timestamp=datetime(2024, 2, 15, tzinfo=timezone.utc),
    )
    body, headers = WebhookFormatter(secret="s3cret").format(ev)
    parsed = json.loads(body)
    assert parsed["event_type"] == "heuristic.formed"
    assert parsed["memory_id"] == "h1"
    want = hmac.new(b"s3cret", body.encode(), hashlib.sha256).hexdigest()
    assert headers["X-ALMA-Signature"] == f"sha256={want}"
    body2, headers2 = WebhookFormatter().format(ev)
    assert body2 == body and "X-ALMA-Signature" not in headers2


def test_heuristic_formed_fires_once_per_heuristic(spark, tmp_path):
    """extract_heuristics returns every qualifying cluster on every
    learn(); FORMED must fire only when the heuristic first appears."""
    eng = AlmaSpark(
        spark, str(tmp_path / "s"),
        clock=lambda: datetime(2024, 2, 15, tzinfo=timezone.utc),
    )
    formed = []
    eng.events.subscribe(MemoryEventType.HEURISTIC_FORMED, formed.append)
    for i in range(5):
        eng.learn(agent="a1", task=f"t {i}", outcome=True, project_id="p1",
                  strategy_used="same steady strategy", task_type="tt")
    assert len(formed) == 1  # formed at the 3rd learn, silent after
