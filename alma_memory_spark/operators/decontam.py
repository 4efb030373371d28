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

__all__ = [
    "contamination_report",
    "decontaminate",
    "decontaminate_spans",
    "doc_ngrams",
]


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


def decontaminate_spans(
    train: DataFrame,
    bench: DataFrame,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, text_clean, n_units, n_kept): EXCISION-mode
    decontamination — instead of dropping a contaminated document
    wholesale (decontaminate), remove every n-token window that
    appears verbatim in the benchmark corpus and re-splice the
    remainder byte-faithfully. The open-data-pipeline middle ground:
    a long, mostly-clean document that quotes one benchmark item
    keeps everything but the quote.

    Composition of two oracle-gated kernels: the window
    fingerprinting + byte-faithful excision machinery of
    dedup_token_windows ('subdedup' gates) and the
    small-side-broadcast membership of decontaminate ('contam' gate).
    Both corpora fingerprint through the SAME normalization
    (operators/substring.token_units), so membership is exact.
    Scale shape: the benchmark fp set broadcasts (eval corpora are
    small by definition); the train side is a narrow map + one
    per-doc aggregation — the training corpus never shuffles on the
    gram key. Docs shorter than n tokens carry no windows and come
    back unchanged."""
    from alma_memory_spark.operators.substring import (
        _excise,
        explode_token_windows,
        token_units,
    )

    base = train.select(F.col(id_col), token_units(text_col).alias("units"))
    wins = explode_token_windows(train, n, id_col, text_col)
    bench_fps = (
        explode_token_windows(bench, n, id_col, text_col)
        .select("fp")
        .distinct()
    )
    dropped = (
        wins.join(F.broadcast(bench_fps), "fp", "left_semi")
        .groupBy(id_col)
        .agg(F.sort_array(F.collect_list("start")).alias("starts"))
    )
    return _excise(base, dropped, id_col, n).withColumnRenamed(
        "text_dedup", "text_clean"
    )
