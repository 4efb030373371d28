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

__all__ = ["pack_documents", "pack_documents_nostraddle"]


def pack_documents(
    df: DataFrame,
    budget: int,
    token_col: str,
    key_col: str,
    n_shards: int = 1,
    stratum_cols: list[str] | None = None,
    salt: str = "pack",
    order_salt: str | None = None,
) -> DataFrame:
    """Adds (shard, pack_id, pack_offset) to df: the block each doc
    starts in when the corpus token stream is concatenated in
    ascending `key_col` order within (stratum_cols..., shard) and cut
    into `budget`-token blocks. Deterministic: the same rows produce
    the same packing regardless of partitioning (order and shard both
    derive from content).

    `order_salt` enables deterministic CORPUS SHUFFLING (standard
    training-order randomization): the stream order within each shard
    becomes ascending (hash(key, order_salt), key) instead of plain
    key order — a seeded permutation that is reproducible under
    repartition/retry (no RNG state) and changes wholesale with the
    salt, while the packing stays shard-local (never a global sort)."""
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
    order = (
        [F.asc(hash_bucket(key_col, order_salt)), F.asc(key_col)]
        if order_salt is not None
        else [F.asc(key_col)]
    )
    w = (
        W.partitionBy(*strata, "shard")
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, -1)
    )
    cum_prev = F.coalesce(
        F.sum(F.col(token_col).cast("long")).over(w), F.lit(0)
    )
    return out.withColumn(
        "pack_id", F.floor(cum_prev / F.lit(budget)).cast("long")
    ).withColumn("pack_offset", F.pmod(cum_prev, F.lit(budget)).cast("long"))


def _shard_col(key_col: str, n_shards: int, salt: str):
    return (
        F.pmod(hash_bucket(key_col, salt), F.lit(n_shards))
        if n_shards > 1
        else F.lit(0)
    )


def pack_documents_nostraddle(
    df: DataFrame,
    budget: int,
    token_col: str,
    key_col: str,
    n_shards: int = 1,
    stratum_cols: list[str] | None = None,
    salt: str = "pack",
    strategy: str = "next_fit",
    order_salt: str | None = None,
) -> DataFrame:
    """No-straddle packing (SFT style): a document may NOT cross a
    block boundary, so blocks are cut greedily instead of by running
    sum (reference analog: the greedy token-budget fold,
    alma/retrieval/budget.py:131-195 — items accumulate while they
    fit). Adds (shard, pack_id, pack_offset); docs larger than the
    budget get a block of their own (the downstream truncation case).

    strategy='next_fit' (default): one open block per stream — a doc
    that does not fit CLOSES the block and opens the next. This is the
    dataloader-faithful shape (blocks finalize in stream order, no
    block reopens after it stops being the newest) and is exactly
    replayable in SQL as a sequential fold, which the oracle gate does
    with a recursive CTE.
    strategy='first_fit': classic bin-packing first-fit — a doc lands
    in the EARLIEST open block with room, trading stream order for
    less padding. Deterministic but stateful across all open blocks
    (unit-tested against a driver-side reference, not SQL-replayable).

    Scale shape: same sharding contract as `pack_documents` — the
    greedy fold is inherently sequential PER STREAM, so the stream is
    (stratum_cols..., shard) and each runs as one applyInPandas group;
    shard count is the parallelism knob. The per-group kernel is a
    single O(docs) pass (next-fit) or O(docs * open-blocks)
    (first-fit).

    `order_salt` enables the same deterministic corpus shuffling as
    pack_documents: the per-shard stream order becomes ascending
    (hash(key, order_salt), key)."""
    import pandas as pd

    if budget <= 0:
        raise ValueError(f"budget must be positive (got {budget!r})")
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1 (got {n_shards!r})")
    if strategy not in ("next_fit", "first_fit"):
        raise ValueError(f"unknown strategy {strategy!r}")
    strata = list(stratum_cols or [])
    out = df.withColumn(
        "shard", _shard_col(key_col, n_shards, salt).cast("int")
    )
    sort_cols = [key_col]
    if order_salt is not None:
        # the hash is computed JVM-side so the kernel's sort agrees
        # bit-for-bit with pack_documents' window order
        out = out.withColumn("_ord", hash_bucket(key_col, order_salt))
        sort_cols = ["_ord", key_col]
    first_fit = strategy == "first_fit"

    def pack_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(sort_cols, kind="mergesort").reset_index(drop=True)
        toks = pdf[token_col].astype("int64").tolist()
        pack_ids, offsets = [], []
        if first_fit:
            remaining: list[int] = []  # remaining capacity per block
            fills: list[int] = []
            for t in toks:
                placed = None
                for b, rem in enumerate(remaining):
                    if t <= rem:
                        placed = b
                        break
                if placed is None:
                    placed = len(remaining)
                    remaining.append(budget)
                    fills.append(0)
                pack_ids.append(placed)
                offsets.append(fills[placed])
                fills[placed] += t
                remaining[placed] -= t
        else:
            block, fill = 0, 0
            for i, t in enumerate(toks):
                if i > 0 and fill + t > budget:
                    block += 1
                    fill = 0
                pack_ids.append(block)
                offsets.append(fill)
                fill += t
        pdf["pack_id"] = pd.Series(pack_ids, dtype="int64")
        pdf["pack_offset"] = pd.Series(offsets, dtype="int64")
        return pdf

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in out.schema.fields
    ) + ", pack_id long, pack_offset long"
    packed = out.groupby(*strata, "shard").applyInPandas(pack_group, schema)
    return packed.drop("_ord") if order_salt is not None else packed
