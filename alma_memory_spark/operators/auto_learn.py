"""Automatic learning from conversations: the reference's AutoLearner
+ RuleBasedExtractor + MemoryScope (alma/extraction/auto_learner.py,
extractor.py:303-392, types.py:26-85) as a batch DataFrame pipeline.

The reference extracts facts one conversation at a time (LLM provider,
or the rule-based fallback when offline); here the RULE path is the
batch default — every pattern family is a `rlike` column expression, so
a corpus of millions of conversation messages classifies in one narrow
scan (the 100 TB chat-mining case), and the LLM extractor remains an
env-gated provider like every other LLM stage.

Semantics (extractor.py:303-392, verbatim pattern tables):
- per message, each fact family (heuristic / anti-pattern / preference)
  fires AT MOST once — the reference breaks after the first matching
  pattern in a family, but families are independent, so one message can
  yield up to three facts;
- extracted content is the message truncated to 200 chars, confidence
  0.5 (the rule-based discount).

Domain inference (auto_learner.py:236-253): first matching keyword
family in table order. Scope filtering (auto_learner.py:131-143 +
types.py:46-52): heuristic and anti-pattern facts whose inferred domain
is disallowed by the agent's MemoryScope are rejected.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HEURISTIC_PATTERNS = [
    r"(?:worked|succeeded|fixed|solved|helped).*(?:by|using|with)",
    r"(?:better|best|good)\s+(?:to|approach|way|strategy)",
    r"(?:should|always|recommend).*(?:use|try|do)",
]
ANTI_PATTERN_PATTERNS = [
    r"(?:don't|do not|never|avoid).*(?:use|do|try)",
    r"(?:failed|broke|caused|error).*(?:because|when|due)",
    r"(?:bad|wrong|incorrect)\s+(?:to|approach|way)",
]
PREFERENCE_PATTERNS = [
    r"(?:i|user)\s+(?:prefer|like|want|need)",
    r"(?:always|never).*(?:for me|i want)",
]
RULE_CONFIDENCE = 0.5
CONTENT_CAP = 200

DOMAIN_KEYWORDS = {
    "testing": ["test", "assert", "selenium", "playwright", "cypress"],
    "frontend": ["css", "html", "react", "vue", "ui", "button", "form"],
    "backend": ["api", "database", "sql", "server", "endpoint"],
    "security": ["auth", "token", "password", "encrypt", "csrf"],
    "performance": ["latency", "cache", "optimize", "slow", "fast"],
}


@dataclass
class MemoryScope:
    """types.py:26-85: per-agent learn/share ACL."""

    agent: str
    can_learn: list[str] = field(default_factory=list)
    cannot_learn: list[str] = field(default_factory=list)
    share_with: list[str] = field(default_factory=list)
    inherit_from: list[str] = field(default_factory=list)

    def is_allowed(self, domain: str) -> bool:
        if domain in self.cannot_learn:
            return False
        if not self.can_learn:  # empty = everything not forbidden
            return True
        return domain in self.can_learn


def _family_match(low: F.Column, patterns: list[str]) -> F.Column:
    out = F.lit(False)
    for p in patterns:
        out = out | low.rlike(p)
    return out


def infer_domain_expr(content: F.Column) -> F.Column:
    """First matching keyword family in table order, else NULL
    (auto_learner.py:236-253)."""
    low = F.lower(content)
    expr = F.lit(None).cast("string")
    # build the CASE from the LAST family backward so the FIRST match
    # wins, matching the reference's dict-order loop
    for domain, kws in reversed(list(DOMAIN_KEYWORDS.items())):
        hit = F.lit(False)
        for kw in kws:
            hit = hit | low.contains(kw)
        expr = F.when(hit, F.lit(domain)).otherwise(expr)
    return expr


def extract_facts(messages: DataFrame, content_col: str = "content") -> DataFrame:
    """Rule-based fact extraction over a message frame. Input keeps its
    columns; output has one row per (message, fired family) with
    (fact_type, fact_content, confidence, inferred_domain) appended —
    a narrow map (rlike + substring), no shuffle."""
    low = F.lower(F.col(content_col))
    fact = F.substring(F.col(content_col), 1, CONTENT_CAP)
    families = F.array(
        F.when(
            _family_match(low, HEURISTIC_PATTERNS), F.lit("heuristic")
        ),
        F.when(
            _family_match(low, ANTI_PATTERN_PATTERNS), F.lit("anti_pattern")
        ),
        F.when(
            _family_match(low, PREFERENCE_PATTERNS), F.lit("preference")
        ),
    )
    return (
        messages.withColumn(
            "fact_type",
            F.explode(F.filter(families, lambda x: x.isNotNull())),
        )
        .withColumn("fact_content", fact)
        .withColumn("confidence", F.lit(RULE_CONFIDENCE))
        .withColumn("inferred_domain", infer_domain_expr(F.col(content_col)))
    )


def filter_by_scope(
    facts: DataFrame, scope: MemoryScope | None, min_confidence: float = RULE_CONFIDENCE
) -> tuple[DataFrame, DataFrame]:
    """(valid, rejected) split: confidence floor for every fact; scope
    check on the inferred domain for heuristic/anti-pattern facts
    (auto_learner.py:116-143). The rejected frame carries a reason."""
    conf_ok = F.col("confidence") >= min_confidence
    scoped_types = F.col("fact_type").isin("heuristic", "anti_pattern")
    if scope is None:
        scope_ok = F.lit(True)
    else:
        dom = F.col("inferred_domain")
        allowed = dom.isNull() | ~scoped_types
        if scope.cannot_learn:
            not_forbidden = ~dom.isin(scope.cannot_learn)
        else:
            not_forbidden = F.lit(True)
        if scope.can_learn:
            in_allowed = dom.isin(scope.can_learn)
        else:
            in_allowed = F.lit(True)
        scope_ok = allowed | (not_forbidden & in_allowed)
    valid = facts.filter(conf_ok & scope_ok)
    rejected = facts.filter(~(conf_ok & scope_ok)).withColumn(
        "reject_reason",
        F.when(~conf_ok, F.lit("low_confidence")).otherwise(F.lit("outside_scope")),
    )
    return valid, rejected
