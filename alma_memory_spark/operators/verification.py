"""Verification layer: classify memories as verified / uncertain /
contradicted / unverifiable and persist the status columns.

Reference (alma/retrieval/verification.py):
- confidence fallback (no LLM, the deterministic default,
  verification.py:690-729): confidence >= threshold (0.7) -> verified;
  otherwise uncertain (moderate/low reason); method = 'confidence';
- cross-verification compares each candidate against the others
  (LLM-backed in the reference; here the deterministic analog flags a
  candidate `contradicted` when a same-domain candidate with strictly
  higher confidence has a conflicting embedding: cosine < the
  contradiction threshold, i.e. it talks about the same key but
  disagrees);
- combined score = retrieval_score * (1 - w) + verification_confidence
  * w, w = 0.5 (verification.py:136-151);
- persisted columns verification_status / _confidence / _reason /
  verified_at on all memory tables; list_by_verification_status
  (sqlite_local.py:1857-1887).

Everything is a column expression or a blocked self-join — no LLM
required; an LLM-backed verifier can slot behind the same DataFrame
contract via mapInPandas.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CONFIDENCE_THRESHOLD = 0.7
VERIFICATION_WEIGHT = 0.5
CONTRADICTION_COSINE = -0.2


def confidence_fallback(
    df: DataFrame,
    now: datetime,
    threshold: float = CONFIDENCE_THRESHOLD,
    confidence_col: str = "confidence",
) -> DataFrame:
    """Deterministic confidence-based verification (the reference's
    non-LLM default). Adds verification_status / _confidence / _reason /
    verified_at columns."""
    conf = (
        F.coalesce(F.col(confidence_col), F.lit(0.5))
        if confidence_col in df.columns
        else F.lit(0.5)
    )
    status = F.when(conf >= threshold, F.lit("verified")).otherwise(F.lit("uncertain"))
    reason = (
        F.when(
            conf >= threshold,
            F.concat(F.lit("High confidence score ("), F.round(conf, 2), F.lit(")")),
        )
        .when(
            conf >= threshold * 0.5,
            F.concat(F.lit("Moderate confidence score ("), F.round(conf, 2), F.lit(")")),
        )
        .otherwise(
            F.concat(F.lit("Low confidence score ("), F.round(conf, 2), F.lit(")"))
        )
    )
    return (
        df.withColumn("verification_status", status)
        .withColumn("verification_confidence", conf.cast("double"))
        .withColumn("verification_reason", reason)
        .withColumn("verification_method", F.lit("confidence"))
        .withColumn("verified_at", F.lit(now))
    )


def cross_verify(
    df: DataFrame,
    now: datetime,
    key_cols: tuple[str, ...] = ("project_id", "domain"),
    threshold: float = CONFIDENCE_THRESHOLD,
) -> DataFrame:
    """Deterministic cross-verification: within a (project, domain)
    block, a candidate is `contradicted` when a strictly
    higher-confidence peer's embedding points the opposite way
    (6dp-rounded cosine < CONTRADICTION_COSINE — rounding makes the
    boundary stable across engines/summation orders); otherwise falls
    back to the confidence rule. The min peer id is recorded as
    contradicting_source.

    The pairwise stage runs as one numpy matmul per block inside
    groupBy(keys).applyInPandas — one shuffle, the block is the
    parallelism unit (a declarative pair self-join with an interpreted
    cosine fold per pair measured ~25x slower at sf0.1; same finding as
    consolidation/near-dup)."""
    import numpy as np
    import pandas as pd

    id_type = dict(df.dtypes)["id"]

    def pairs_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["id"].to_numpy()
        order = np.argsort(ids)  # asc -> first match below = min peer id
        ids = ids[order]
        conf = pdf["confidence"].to_numpy()[order]
        V = np.array(pdf["embedding"].to_numpy()[order].tolist(), dtype=np.float64)
        nrm = np.sqrt((V * V).sum(axis=1))
        C = np.round((V @ V.T) / np.outer(nrm, nrm), 6)
        mask = (C < CONTRADICTION_COSINE) & (conf[None, :] > conf[:, None])
        np.fill_diagonal(mask, False)
        has = mask.any(axis=1)
        first = mask.argmax(axis=1)
        return pd.DataFrame(
            {"id": ids[has], "contradicting_source": ids[first[has]]}
        )

    pairs = (
        df.select(*key_cols, "id", "confidence", "embedding")
        .groupby(*key_cols)
        .applyInPandas(pairs_fn, f"id {id_type}, contradicting_source {id_type}")
    )
    base = confidence_fallback(df, now, threshold)
    out = base.join(pairs, "id", "left")
    return out.withColumn(
        "verification_status",
        F.when(F.col("contradicting_source").isNotNull(), F.lit("contradicted")).otherwise(
            F.col("verification_status")
        ),
    ).withColumn(
        "verification_method",
        F.when(F.col("contradicting_source").isNotNull(), F.lit("cross_verify")).otherwise(
            F.col("verification_method")
        ),
    )


def combined_score(
    df: DataFrame,
    score_col: str = "score",
    weight: float = VERIFICATION_WEIGHT,
) -> DataFrame:
    """retrieval score blended with verification confidence
    (verification.py:136-151)."""
    return df.withColumn(
        "combined_score",
        F.col(score_col) * (1.0 - weight)
        + F.coalesce(F.col("verification_confidence"), F.lit(0.5)) * weight,
    )


def list_by_status(df: DataFrame, project_id: str, status: str, limit: int = 100) -> DataFrame:
    """WHERE project_id = ? AND verification_status = ? LIMIT ?
    (sqlite_local.py:1857-1887) with deterministic ordering."""
    order = (
        [F.desc_nulls_last("verification_confidence")]
        if "verification_confidence" in df.columns
        else []
    )
    return (
        df.filter(
            (F.col("project_id") == project_id)
            & (F.col("verification_status") == status)
        )
        .orderBy(*order, F.asc("id"))
        .limit(limit)
    )
