"""Reranking stage: NoOp default, cross-encoder behind an import-try.

Reference (alma/retrieval/reranking.py:16-128): a Reranker ABC with an
optional `rerankers`-lib cross-encoder pass and a NoOpReranker fallback
that preserves order. The model libraries are not in this container, so
the cross-encoder path raises NotImplementedError at the import
boundary; the deterministic overlap reranker provides a dependency-free
middle option (token-overlap with the query as the rerank key).
"""

from __future__ import annotations

from typing import Any


class NoOpReranker:
    """Preserves the incoming order (the reference's default)."""

    def rerank(self, query: str, rows: list[dict[str, Any]], text_key: str) -> list[dict[str, Any]]:
        return rows


class OverlapReranker:
    """Deterministic lexical reranker: stable-sort by query-token overlap
    (descending); equal-overlap rows keep their incoming (score) order."""

    def rerank(self, query: str, rows: list[dict[str, Any]], text_key: str) -> list[dict[str, Any]]:
        qtoks = set(query.lower().split())

        def overlap(r: dict[str, Any]) -> int:
            return len(qtoks & set(str(r.get(text_key) or "").lower().split()))

        return sorted(rows, key=overlap, reverse=True)  # stable


class CrossEncoderReranker:
    """Real model pass — requires the `rerankers` / sentence-transformers
    stack, absent here; the class marks the integration point."""

    def __init__(self, model_name: str = "cross-encoder/ms-marco-MiniLM-L-6-v2"):
        try:
            import sentence_transformers  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "cross-encoder reranking requires sentence-transformers, "
                "not available in this environment; use NoOpReranker or "
                "OverlapReranker"
            ) from e


def get_reranker(kind: str = "noop"):
    if kind == "noop":
        return NoOpReranker()
    if kind == "overlap":
        return OverlapReranker()
    if kind == "cross_encoder":
        return CrossEncoderReranker()
    raise ValueError(f"unknown reranker: {kind}")
