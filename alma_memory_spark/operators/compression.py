"""Compression: verbose content -> structured compressed memories.

Reference (alma/compression/pipeline.py): MemoryCompressor with an
optional LLMClient and a rule-based fallback; levels none/light/medium/
heavy; output = summary + key_facts + constraints + patterns with a
compression ratio; content below min_length (200 chars) passes through.

The deterministic rule-based path is the default (it defines the
testable semantics); an LLM path plugs in behind the same protocol via
mapInPandas. The batch form compresses a whole DataFrame column in one
pass — pure column expressions for the rule path.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Optional, Protocol

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MIN_LENGTH_FOR_COMPRESSION = 200
MAX_KEY_FACTS = 5
LEVEL_SENTENCES = {"none": 10**9, "light": 5, "medium": 3, "heavy": 1}

_FACT_MARKERS = ("because", "due to", "so that", "works", "fails", "must", "should")
_CONSTRAINT_MARKERS = ("must", "cannot", "only", "require", "never", "always")


class LLMClient(Protocol):
    """Protocol for LLM completion (reference: pipeline.py:180-186)."""

    def complete(self, prompt: str, timeout: Optional[float] = None) -> str: ...


@dataclass
class CompressionResult:
    summary: str
    key_facts: list[str] = field(default_factory=list)
    constraints: list[str] = field(default_factory=list)
    original_length: int = 0
    compressed_length: int = 0

    @property
    def compression_ratio(self) -> float:
        return self.original_length / max(self.compressed_length, 1)


def _sentences(text: str) -> list[str]:
    return [s.strip() for s in re.split(r"(?<=[.!?])\s+|\n+", text) if s.strip()]


def compress_text(
    content: str,
    level: str = "medium",
    llm_client: LLMClient | None = None,
) -> CompressionResult:
    """Rule-based compression (deterministic default): keep the first
    sentence + the highest-marker-density sentences up to the level's
    budget; extract fact/constraint sentences by marker match. An
    LLMClient, when provided, replaces only the summary step."""
    n = len(content)
    if n < MIN_LENGTH_FOR_COMPRESSION or level == "none":
        return CompressionResult(content, original_length=n, compressed_length=n)
    sents = _sentences(content)
    budget = LEVEL_SENTENCES.get(level, 3)

    def marker_score(s: str) -> int:
        low = s.lower()
        return sum(1 for m in _FACT_MARKERS if m in low)

    keep = [sents[0]] if sents else []
    ranked = sorted(sents[1:], key=lambda s: (-marker_score(s), sents.index(s)))
    for s in ranked:
        if len(keep) >= budget:
            break
        keep.append(s)
    keep.sort(key=sents.index)  # restore narrative order
    summary = " ".join(keep)
    if llm_client is not None:
        summary = llm_client.complete(
            f"Summarize in {budget} sentences:\n{content}"
        )
    facts = [s for s in sents if marker_score(s) > 0][:MAX_KEY_FACTS]
    constraints = [
        s for s in sents if any(m in s.lower() for m in _CONSTRAINT_MARKERS)
    ][:3]
    return CompressionResult(
        summary=summary,
        key_facts=facts,
        constraints=constraints,
        original_length=n,
        compressed_length=len(summary),
    )


def compress_column(
    df: DataFrame, text_col: str, level: str = "medium"
) -> DataFrame:
    """Batch rule-based compression as column expressions: short rows
    pass through; long rows keep their first `budget` sentences. (The
    marker-ranked variant needs per-row list work -> use compress_text
    via mapInPandas when fidelity matters; this column form is the
    scan-speed approximation for 100 TB passes.)"""
    budget = LEVEL_SENTENCES.get(level, 3)
    # explicit whitespace class: Java's \s includes \x0B, RE2's (the
    # oracle) does not — see functions/text.py WS_RE
    from alma_memory_spark.functions.text import WS_RE

    sents = F.split(F.col(text_col), r"(?<=[.!?])" + WS_RE)
    head = F.array_join(F.slice(sents, 1, budget), " ")
    compressed = F.when(
        F.length(text_col) < MIN_LENGTH_FOR_COMPRESSION, F.col(text_col)
    ).otherwise(head)
    return df.withColumn("compressed", compressed).withColumn(
        "compression_ratio",
        F.round(
            F.length(text_col).cast("double")
            / F.greatest(F.length("compressed").cast("double"), F.lit(1.0)),
            6,
        ),
    )
