"""MMR diversification — greedy, driver-side.

Reference (alma/retrieval/engine.py:639-715): re-order scored candidates
by next = argmax(score - lambda * max_sim_to_selected); pairwise
similarity between two candidates is estimated as sqrt(sim_a * sim_b)
of their query-similarities (the reference avoids pairwise embedding
math the same way). Inherently sequential and k is tiny (<= a few
hundred), so this runs on collected rows — the one deliberately
non-distributed operator, applied AFTER the distributed top-k stage.
"""

from __future__ import annotations

import math
from typing import Any


def mmr_rerank(
    rows: list[dict[str, Any]],
    diversity_factor: float,
    top_k: int,
    score_key: str = "score",
    sim_key: str = "sim_score",
) -> list[dict[str, Any]]:
    if not rows or diversity_factor <= 0.0:
        return rows[:top_k]
    remaining = list(rows)
    selected: list[dict[str, Any]] = []
    while remaining and len(selected) < top_k:
        best_idx, best_val = 0, -float("inf")
        for i, cand in enumerate(remaining):
            if selected:
                max_sim = max(
                    math.sqrt(
                        max(cand.get(sim_key) or 0.0, 0.0)
                        * max(s.get(sim_key) or 0.0, 0.0)
                    )
                    for s in selected
                )
            else:
                max_sim = 0.0
            val = (cand.get(score_key) or 0.0) - diversity_factor * max_sim
            if val > best_val:
                best_idx, best_val = i, val
        selected.append(remaining.pop(best_idx))
    return selected
