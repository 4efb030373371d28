"""4-layer memory stack: token-efficient context assembly over the
engine's retrieval — the reference's MemoryStack + IdentityManager
(alma/context/memory_stack.py, identity.py) on the Spark engine.

Layers (memory_stack.py:104-142):
- L0 Identity: plain text from a file (or the reference's default
  placeholder text when none is configured).
- L1 Essential Story: always loaded — top memories by confidence,
  grouped by type, truncated to an 800-token budget.
- L2 On-Demand: topic/domain recalls.
- L3 Deep Search: full semantic retrieve, slice.to_prompt output.

recall() auto-selects L2 for short (<30 char) or domain queries, L3
otherwise (memory_stack.py:206-240); to_prompt() packs L0, L1, then
active recalls in order until the token budget runs out, truncating
the first overflowing section (memory_stack.py:253-308). Token math is
the shared len/4 estimator (slice.py, reference budget.py:131-195) so
layer budgets agree with the engine's packer.

All Spark work happens inside engine.retrieve(); this module is
driver-side composition by design, mirroring the reference (its stack
wraps retrieval the same way).
"""

from __future__ import annotations

import os
from typing import Any

from alma_memory_spark.slice import MemorySlice, estimate_tokens

LAYER_IDENTITY = 0
LAYER_ESSENTIAL = 1
LAYER_ON_DEMAND = 2
LAYER_DEEP_SEARCH = 3

DEFAULT_L1_MAX_TOKENS = 800
DEFAULT_L2_MAX_TOKENS = 1200
DEFAULT_IDENTITY_TEXT = (
    "No identity configured. "
    "Provide an identity file with your agent's identity description."
)


class ContextLayer:
    """One loaded layer (memory_stack.py:57-101)."""

    def __init__(self, level: int, name: str):
        self.level = level
        self.name = name
        self.content = ""
        self.is_loaded = False

    def set_content(self, text: str) -> None:
        self.content = text
        self.is_loaded = True

    @property
    def token_count(self) -> int:
        return estimate_tokens(self.content) if self.is_loaded else 0


class MemoryStack:
    def __init__(
        self,
        engine,
        agent: str = "default",
        project_id: str | None = None,
        identity_path: str | None = None,
        l1_max_tokens: int = DEFAULT_L1_MAX_TOKENS,
    ):
        self.engine = engine
        self.agent = agent
        self.project_id = project_id
        self.identity_path = identity_path
        self.l1_max_tokens = l1_max_tokens
        self._layers: dict[int, ContextLayer] = {
            LAYER_IDENTITY: ContextLayer(LAYER_IDENTITY, "Identity"),
            LAYER_ESSENTIAL: ContextLayer(LAYER_ESSENTIAL, "Essential Story"),
            LAYER_ON_DEMAND: ContextLayer(LAYER_ON_DEMAND, "On-Demand"),
            LAYER_DEEP_SEARCH: ContextLayer(LAYER_DEEP_SEARCH, "Deep Search"),
        }
        self._active_recalls: list[ContextLayer] = []

    # -- L0 ------------------------------------------------------------

    @property
    def identity(self) -> str:
        if self.identity_path and os.path.isfile(self.identity_path):
            with open(self.identity_path, encoding="utf-8") as f:
                text = f.read().strip()
            if text:
                return text
        return DEFAULT_IDENTITY_TEXT

    # -- public API ----------------------------------------------------

    def wake_up(self, domain: str | None = None, user_id: str | None = None) -> str:
        """L0 + L1 (memory_stack.py:151-205): identity plus the
        essential story retrieved for the domain (or the generic
        overview query)."""
        l0 = self._layers[LAYER_IDENTITY]
        l0.set_content(f"## Identity\n{self.identity}")

        l1 = self._layers[LAYER_ESSENTIAL]
        sl = self.engine.retrieve(
            task=domain or "essential context overview",
            agent=self.agent,
            project_id=self.project_id,
            user_id=user_id,
            top_k=10,
        )
        l1.set_content(self._format_essential_story(sl))
        return "\n".join([l0.content, "", l1.content])

    def recall(
        self,
        query: str,
        layer: int | None = None,
        top_k: int = 5,
        domain: str | None = None,
        user_id: str | None = None,
    ) -> str:
        """Layer recall with the reference's auto-selection: short or
        domain-scoped queries go on-demand (L2), complex queries go to
        deep search (L3) (memory_stack.py:206-252)."""
        if layer is None:
            layer = LAYER_ON_DEMAND if (domain or len(query) < 30) else LAYER_DEEP_SEARCH
        if layer == LAYER_IDENTITY:
            return self.identity
        if layer == LAYER_ESSENTIAL:
            if not self._layers[LAYER_ESSENTIAL].is_loaded:
                self.wake_up()
            return self._layers[LAYER_ESSENTIAL].content
        sl = self.engine.retrieve(
            task=query,
            agent=self.agent,
            project_id=self.project_id,
            user_id=user_id,
            top_k=top_k,
        )
        if layer == LAYER_ON_DEMAND:
            total = sl.total()
            if total == 0:
                return f"No on-demand results for: {query}"
            body = sl.to_prompt(max_tokens=DEFAULT_L2_MAX_TOKENS)
            text = f"## On-Demand ({total} items) — {query[:40]}"
            if body.strip():
                text = f"{text}\n{body}"
            base_name = "On-Demand"
        else:
            text = sl.to_prompt(max_tokens=DEFAULT_L2_MAX_TOKENS)
            if not text.strip():
                text = f'No deep search results for: "{query}"'
            base_name = "Deep Search"
        # static base name (reading _layers[layer].name would compound
        # 'On-Demand: q1: q2' across recalls); the layer lives ONLY in
        # _active_recalls so token_usage counts it once
        rl = ContextLayer(layer, f"{base_name}: {query[:40]}")
        rl.set_content(text)
        self._active_recalls.append(rl)
        return text

    def to_prompt(self, max_tokens: int = 2000) -> str:
        """Budget-ordered packing: L0 always, L1 if it fits, then
        active recalls in order; the first overflow is truncated to the
        remaining budget (memory_stack.py:253-308)."""
        sections: list[str] = []
        used = 0
        l0 = self._layers[LAYER_IDENTITY]
        if l0.is_loaded:
            used += l0.token_count
            sections.append(l0.content)
        l1 = self._layers[LAYER_ESSENTIAL]
        if l1.is_loaded and used + l1.token_count <= max_tokens:
            used += l1.token_count
            sections.append(l1.content)
        for rl in self._active_recalls:
            if used + rl.token_count <= max_tokens:
                used += rl.token_count
                sections.append(rl.content)
            else:
                remaining = max_tokens - used
                if remaining > 50:
                    sections.append(
                        rl.content[: remaining * 4]
                        + "\n[truncated — token budget reached]"
                    )
                break
        return "\n\n".join(sections)

    @property
    def token_usage(self) -> dict[str, int]:
        """Per-layer counts; L2/L3 recalls are counted ONCE (under
        active_recalls — the reference counts them in both maps,
        overstating the budget; we don't inherit that)."""
        usage: dict[str, int] = {}
        total = 0
        for level, layer in self._layers.items():
            key = f"L{level}_{layer.name.lower().replace(' ', '_').split(':')[0]}"
            count = layer.token_count if level in (LAYER_IDENTITY, LAYER_ESSENTIAL) else 0
            usage[key] = count
            total += count
        recalls = sum(r.token_count for r in self._active_recalls)
        usage["active_recalls"] = recalls
        usage["total"] = total + recalls
        return usage

    # -- formatting ----------------------------------------------------

    def _format_essential_story(self, sl: MemorySlice) -> str:
        """memory_stack.py:428-474: grouped snippets, 200-char caps,
        L1 token budget with the 4-chars/token truncation."""
        lines = ["## Essential Story"]
        if sl.heuristics:
            lines.append("\n[Strategies]")
            ranked = sorted(sl.heuristics, key=lambda r: -(r.get("confidence") or 0))
            for h in ranked[:5]:
                snip = (h.get("strategy") or "").strip().replace("\n", " ")
                if len(snip) > 200:
                    snip = snip[:197] + "..."
                conf = h.get("confidence") or 0
                lines.append(f"  - {snip} (confidence: {conf:.0%})")
        if sl.domain_knowledge:
            lines.append("\n[Domain Knowledge]")
            for dk in sl.domain_knowledge[:5]:
                snip = (dk.get("fact") or "").strip().replace("\n", " ")
                if len(snip) > 200:
                    snip = snip[:197] + "..."
                lines.append(f"  - {snip}")
        if sl.anti_patterns:
            lines.append("\n[Anti-Patterns]")
            for ap in sl.anti_patterns[:3]:
                lines.append(f"  - Avoid: {ap.get('pattern')}")
        if sl.preferences:
            lines.append("\n[User Preferences]")
            for p in sl.preferences[:3]:
                lines.append(f"  - {p.get('preference')}")
        text = "\n".join(lines)
        if estimate_tokens(text) > self.l1_max_tokens:
            text = text[: self.l1_max_tokens * 4] + "\n  ... (more in L3 search)"
        return text
