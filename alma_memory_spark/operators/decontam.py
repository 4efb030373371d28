"""Benchmark decontamination: drop training documents that share long
token n-grams with an evaluation/benchmark corpus.

The standard LLM pipeline stage (GPT-3 appendix-C shape: 13-gram
overlap against every benchmark): any training doc containing an
n-gram that also appears in the held-out set is contaminated and gets
dropped (or flagged for review). The reference has no corpus-scale
analog — this generalizes its exact-duplicate hygiene
(alma/consolidation/deduplication.py) to cross-corpus membership.

Spark shape (100 TB):
- n-grams are a narrow map (token array -> slice windows) + explode;
  the only shuffle is the distinct/join on the gram key.
- the benchmark side is SMALL by definition (eval sets are thousands
  of docs) -> its distinct gram set broadcasts; the training side
  never shuffles at all in the common case.
- grams can be md5-hashed before the join (functions/text.hash32) to
  cut the broadcast bytes; kept verbatim here so the oracle compares
  strings exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from alma_memory_spark.functions.text import ngrams_of_tokens, ws_tokens

__all__ = ["contamination_report", "decontaminate", "doc_ngrams"]


def doc_ngrams(
    df: DataFrame, id_col: str, text_col: str, n: int, distinct: bool = True
) -> DataFrame:
    """(id, gram) pairs; per-doc distinct by default (membership is the
    question — within-doc repeats add nothing but shuffle bytes). The
    tokenizer projects into its own column first (the ngrams_of_tokens
    PERF contract: a tokenizer captured in the gram lambda would re-run
    per position)."""
    toked = df.select(
        F.col(id_col).alias("id"), ws_tokens(text_col).alias("_ts")
    )
    grams = ngrams_of_tokens(F.col("_ts"), n)
    if distinct:
        grams = F.array_distinct(grams)
    return toked.select("id", F.explode(grams).alias("gram"))


def contamination_report(
    train: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 13,
) -> DataFrame:
    """(doc_id, n_shared) for every CONTAMINATED training doc: the
    count of distinct n-grams it shares with the benchmark corpus.
    Clean docs emit no row. n=13 is the published default; corpora of
    short docs use a smaller n (the gate uses 6 on the synthetic
    bag-of-words tables)."""
    tg = doc_ngrams(train, id_col, text_col, n)
    bg = doc_ngrams(bench, id_col, text_col, n).select("gram").distinct()
    return (
        tg.join(F.broadcast(bg), "gram")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .select(F.col("id").alias(id_col), "n_shared")
    )


def decontaminate(
    train: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 13,
) -> DataFrame:
    """Training frame minus contaminated docs (left anti-join on the
    report ids)."""
    bad = contamination_report(train, bench, id_col, text_col, n).select(id_col)
    return train.join(bad, id_col, "left_anti")
