"""Memory event system: typed events emitted on engine writes so
external systems can react — the reference's events package
(alma/events/types.py, emitter.py, storage_mixin.py) on the Spark
engine.

Event types mirror types.py:13-36 verbatim; the emitter mirrors
emitter.py (subscribe per-type or catch-all, unsubscribe, emit guarded
by has_subscribers so the zero-subscriber path costs one dict lookup).
Callbacks run synchronously on the driver — the reference's worker
thread-pool and the async webhook transport (webhook.py) are
serving-layer concerns; `WebhookFormatter` below produces the exact
delivery payload + HMAC signature so any HTTP layer can deliver it.

The engine emits from its write paths (AlmaSpark wires `events`):
learn -> OUTCOME_RECORDED (+ HEURISTIC_FORMED / ANTIPATTERN_DETECTED
when the inline checks create one), add_knowledge -> KNOWLEDGE_ADDED,
add_preference -> PREFERENCE_ADDED, forget -> DELETED, consolidate ->
CONSOLIDATED — matching the storage mixin's emit sites
(storage_mixin.py:23-40).
"""

from __future__ import annotations

import hashlib
import hmac
import json
from dataclasses import dataclass, field
from datetime import datetime, timezone
from enum import Enum
from typing import Any, Callable


class MemoryEventType(Enum):
    CREATED = "memory.created"
    UPDATED = "memory.updated"
    DELETED = "memory.deleted"
    CONSOLIDATED = "memory.consolidated"
    HEURISTIC_FORMED = "heuristic.formed"
    ANTIPATTERN_DETECTED = "antipattern.detected"
    PREFERENCE_ADDED = "preference.added"
    KNOWLEDGE_ADDED = "knowledge.added"
    OUTCOME_RECORDED = "outcome.recorded"
    CONFIDENCE_UPDATED = "confidence.updated"
    CONFIDENCE_DECAYED = "confidence.decayed"


@dataclass
class MemoryEvent:
    """types.py:39-95."""

    event_type: MemoryEventType
    agent: str
    project_id: str
    memory_type: str | None = None
    memory_id: str | None = None
    timestamp: datetime = field(
        default_factory=lambda: datetime.now(timezone.utc)
    )
    payload: dict[str, Any] = field(default_factory=dict)
    metadata: dict[str, Any] = field(default_factory=dict)

    def to_dict(self) -> dict[str, Any]:
        return {
            "event_type": self.event_type.value,
            "agent": self.agent,
            "project_id": self.project_id,
            "memory_type": self.memory_type,
            "memory_id": self.memory_id,
            "timestamp": self.timestamp.isoformat(),
            "payload": self.payload,
            "metadata": self.metadata,
        }


EventCallback = Callable[[MemoryEvent], None]


class EventEmitter:
    """emitter.py: per-type + catch-all subscriptions; emit() never
    raises out of a callback (a failing subscriber must not break the
    write that triggered it)."""

    def __init__(self):
        self._subs: dict[MemoryEventType, list[EventCallback]] = {}
        self._all: list[EventCallback] = []
        self.errors: list[tuple[MemoryEventType, str]] = []

    def subscribe(self, event_type: MemoryEventType, cb: EventCallback) -> None:
        self._subs.setdefault(event_type, []).append(cb)

    def subscribe_all(self, cb: EventCallback) -> None:
        self._all.append(cb)

    def unsubscribe(self, event_type: MemoryEventType, cb: EventCallback) -> bool:
        cbs = self._subs.get(event_type, [])
        if cb in cbs:
            cbs.remove(cb)
            return True
        return False

    def unsubscribe_all(self, cb: EventCallback) -> bool:
        if cb in self._all:
            self._all.remove(cb)
            return True
        return False

    def has_subscribers(self, event_type: MemoryEventType | None = None) -> bool:
        if self._all:
            return True
        if event_type is None:
            return any(self._subs.values())
        return bool(self._subs.get(event_type))

    def emit(self, event: MemoryEvent) -> int:
        """Deliver to type + catch-all subscribers; returns delivery
        count. Exceptions are recorded, never propagated."""
        delivered = 0
        for cb in list(self._subs.get(event.event_type, [])) + list(self._all):
            try:
                cb(event)
                delivered += 1
            except Exception as e:  # subscriber bugs must not break writes
                self.errors.append((event.event_type, str(e)))
        return delivered


class WebhookFormatter:
    """The delivery payload + signature of the reference's webhook
    transport (webhook.py:165-203) without the HTTP call: body is the
    event dict as compact JSON, `X-ALMA-Signature` is
    sha256=<hex hmac> over the body with the endpoint secret. Any HTTP
    client (or a foreachBatch sink) can deliver the result."""

    def __init__(self, secret: str | None = None):
        self.secret = secret

    def format(self, event: MemoryEvent) -> tuple[str, dict[str, str]]:
        body = json.dumps(event.to_dict(), separators=(",", ":"), sort_keys=True)
        headers = {"Content-Type": "application/json"}
        if self.secret:
            sig = hmac.new(
                self.secret.encode("utf-8"), body.encode("utf-8"), hashlib.sha256
            ).hexdigest()
            headers["X-ALMA-Signature"] = f"sha256={sig}"
        return body, headers
