"""MemorySlice: the retrieval result object + prompt rendering under a
token budget + query sanitization.

Reference semantics:
- MemorySlice holds per-type lists + retrieval metadata; to_prompt
  renders confidence-prioritized sections under a token budget
  (alma/types.py:255-349);
- token estimation: len(text) / 4 heuristic (budget.py:131-195), greedy
  packing drops whole items once the budget is exhausted;
- query sanitizer strips prepended system prompts before embedding
  (alma/retrieval/query_sanitizer.py:30-202): passthrough when short,
  else extract the trailing question, else the last sentence, else the
  tail truncated to 250 chars.

All driver-side: these operate on one query string / <= a few hundred
collected rows after the distributed stages.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Any

SHORT_QUERY_CHARS = 200
TAIL_TRUNCATE_CHARS = 250


def estimate_tokens(text: str) -> int:
    return len(text) // 4


def sanitize_for_prompt(text: str) -> str:
    """Escape curly braces before .format() templating (reference:
    alma/utils/sanitize.py:8-21) — user-controlled text must never be
    interpreted as format specifiers by the LLM prompt templates
    (compression / verification / graph extraction)."""
    return text.replace("{", "{{").replace("}", "}}")


def sanitize_query(query: str) -> str:
    """Strip prepended system-prompt noise from an over-long query."""
    q = (query or "").strip()
    if len(q) <= SHORT_QUERY_CHARS:
        return q
    questions = re.findall(r"[^.!?\n]*\?", q)
    if questions:
        return questions[-1].strip()
    sentences = [s.strip() for s in re.split(r"(?<=[.!])\s+|\n+", q) if s.strip()]
    if sentences:
        last = sentences[-1]
        if len(last) <= TAIL_TRUNCATE_CHARS:
            return last
    return q[-TAIL_TRUNCATE_CHARS:].strip()


@dataclass
class MemorySlice:
    """Query result: per-type row dicts + retrieval metadata."""

    heuristics: list[dict[str, Any]] = field(default_factory=list)
    outcomes: list[dict[str, Any]] = field(default_factory=list)
    preferences: list[dict[str, Any]] = field(default_factory=list)
    domain_knowledge: list[dict[str, Any]] = field(default_factory=list)
    anti_patterns: list[dict[str, Any]] = field(default_factory=list)
    query: str = ""
    agent: str = ""
    retrieval_time_ms: float = 0.0
    mode: str | None = None
    metadata: dict[str, Any] | None = None  # scope annotations etc.

    def total(self) -> int:
        return (
            len(self.heuristics)
            + len(self.outcomes)
            + len(self.preferences)
            + len(self.domain_knowledge)
            + len(self.anti_patterns)
        )

    def _sections(self) -> list[tuple[str, list[dict[str, Any]], Any]]:
        return [
            (
                "Learned heuristics",
                self.heuristics,
                lambda r: f"- When {r.get('condition')}: {r.get('strategy')}"
                f" (confidence {round(r.get('confidence') or 0, 2)})",
            ),
            (
                "User preferences",
                self.preferences,
                lambda r: f"- [{r.get('category')}] {r.get('preference')}",
            ),
            (
                "Domain knowledge",
                self.domain_knowledge,
                lambda r: f"- [{r.get('domain')}] {r.get('fact')}",
            ),
            (
                "Avoid these anti-patterns",
                self.anti_patterns,
                lambda r: f"- {r.get('pattern')} — {r.get('why_bad')}"
                + (
                    f" Better: {r.get('better_alternative')}"
                    if r.get("better_alternative")
                    else ""
                ),
            ),
            (
                "Recent outcomes",
                self.outcomes,
                lambda r: f"- [{'ok' if r.get('success') else 'FAILED'}] "
                f"{r.get('task_description')}: {r.get('strategy_used')}",
            ),
        ]

    def to_prompt(self, max_tokens: int = 2000) -> str:
        """Render confidence-prioritized sections, greedily packing whole
        lines under the len/4 token budget."""
        budget = max_tokens
        parts: list[str] = []
        for title, rows, render in self._sections():
            if not rows:
                continue
            header = f"## {title}"
            lines = [header]
            used = estimate_tokens(header)
            for r in rows:
                line = render(r)
                t = estimate_tokens(line)
                if used + t > budget:
                    break
                lines.append(line)
                used += t
            if len(lines) > 1:
                parts.append("\n".join(lines))
                budget -= used
            if budget <= 0:
                break
        return "\n\n".join(parts)
