"""Sequence packing: assign documents to fixed-token-budget training
blocks.

The standard LLM dataloader shape (GPT/T5 style): concatenate the
token stream in a deterministic document order and cut fixed-size
blocks; a document may straddle a block boundary. That streaming cut
is exactly expressible as a running token sum: with cum_prev = tokens
of all earlier docs in the order,

    pack_id     = floor(cum_prev / budget)   (block the doc STARTS in)
    pack_offset = cum_prev % budget          (position within it)

— one window cumulative sum, no driver state, and (unlike greedy
no-straddle packing) no sequential reset that a window function cannot
express.

Scale shape: a global ORDER BY is a single-partition window — the
100 TB killer. Production packing therefore shards first: the window
partitions by (strata..., shard) where shard is a deterministic hash
bucket of the doc key, giving `n_shards x |strata|` independent
bounded windows; each shard emits its own block sequence (block ids
are per-shard, the way dataloader workers each own a shard of the
corpus). Shard count is the parallelism knob: pick it so a shard's
token stream fits one task comfortably.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

from alma_memory_spark.operators.sampling import hash_bucket

__all__ = ["pack_documents"]


def pack_documents(
    df: DataFrame,
    budget: int,
    token_col: str,
    key_col: str,
    n_shards: int = 1,
    stratum_cols: list[str] | None = None,
    salt: str = "pack",
) -> DataFrame:
    """Adds (shard, pack_id, pack_offset) to df: the block each doc
    starts in when the corpus token stream is concatenated in
    ascending `key_col` order within (stratum_cols..., shard) and cut
    into `budget`-token blocks. Deterministic: the same rows produce
    the same packing regardless of partitioning (order and shard both
    derive from content)."""
    if budget <= 0:
        raise ValueError(f"budget must be positive (got {budget!r})")
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1 (got {n_shards!r})")
    strata = list(stratum_cols or [])
    shard = (
        F.pmod(hash_bucket(key_col, salt), F.lit(n_shards))
        if n_shards > 1
        else F.lit(0)
    )
    out = df.withColumn("shard", shard.cast("int"))
    w = (
        W.partitionBy(*strata, "shard")
        .orderBy(F.asc(key_col))
        .rowsBetween(W.unboundedPreceding, -1)
    )
    cum_prev = F.coalesce(
        F.sum(F.col(token_col).cast("long")).over(w), F.lit(0)
    )
    return out.withColumn(
        "pack_id", F.floor(cum_prev / F.lit(budget)).cast("long")
    ).withColumn("pack_offset", F.pmod(cum_prev, F.lit(budget)).cast("long"))
