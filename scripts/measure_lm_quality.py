"""LM-quality scale + separation measurements (SCALE.md r10).

Two claims under test:

1. VERDICT r9 #1 — the percentile_approx tail cutoff is FLAT at 16x
   corpus scale-up, while the exact TakeOrdered path's heap k grows
   linearly (k = frac·n). Measure the cutoff-side wall (scoring is a
   shared cost) on 1x / 4x / 16x replicated corpora for both methods.

2. VERDICT r9 #6 — bigram scores SEPARATE real text from degenerate
   text better than unigram: a shuffled-token document keeps its exact
   unigram score (the model is order-blind) but craters under the
   bigram model. Measured as the score delta on token-shuffled
   variants of the corpus.

Run:  python scripts/measure_lm_quality.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from alma_memory_spark.operators.lm_quality import (  # noqa: E402
    bigram_quality_scores,
    lm_quality_scores,
    lm_tail_ids,
)
from alma_memory_spark.session import get_spark, load_table  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def replicated(docs, reps: int):
    parts = [
        docs.select(
            (F.col("doc_id") + r * 1_000_000).alias("doc_id"), "text"
        )
        for r in range(reps)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def main() -> None:
    spark = get_spark()
    docs = load_table(spark, SF, "documents").select("doc_id", "text")

    # ---- 1) tail-cutoff scale-up ------------------------------------
    rows = []
    for reps in (1, 4, 16):
        corpus = replicated(docs, reps)
        scores = lm_quality_scores(corpus).localCheckpoint(eager=True)
        n = scores.count()
        for method in ("approx", "exact"):
            t0 = time.perf_counter()
            got = lm_tail_ids(scores, frac=0.1, method=method).count()
            wall = time.perf_counter() - t0
            rows.append(
                {
                    "reps": reps,
                    "n": n,
                    "method": method,
                    "tail_rows": got,
                    "wall_s": round(wall, 3),
                }
            )
            print(json.dumps(rows[-1]), flush=True)
        spark.catalog.clearCache()

    # ---- 2) unigram vs bigram separation ----------------------------
    # shuffle each doc's tokens deterministically (sort by token hash):
    # unigram counts are identical, word ORDER is destroyed
    shuffled = docs.select(
        (F.col("doc_id") + 5_000_000).alias("doc_id"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.transform(
                        F.filter(
                            F.split(F.lower("text"), "[ \\t\\n\\x0b\\f\\r]+"),
                            lambda t: t != "",
                        ),
                        lambda t: F.struct(
                            F.xxhash64(t).alias("h"), t.alias("t")
                        ),
                    )
                ),
                lambda s: s["t"],
            ),
            " ",
        ).alias("text"),
    )
    # train BOTH models on the REAL corpus only (the CCNet shape: a
    # trusted reference corpus scores candidate text) — a union
    # self-train would let the shuffled docs teach the model their own
    # sorted-adjacency bigrams and invert the comparison
    from alma_memory_spark.operators.lm_quality import bigram_lm, unigram_lm

    lm, stats = unigram_lm(docs)
    lm2, ctx, bstats = bigram_lm(docs)
    both = docs.unionByName(shuffled).localCheckpoint(eager=True)
    uni = lm_quality_scores(both, lm=lm, stats=stats).withColumnRenamed(
        "score", "uni"
    )
    bi = bigram_quality_scores(
        both, lm2=lm2, ctx=ctx, stats=bstats
    ).withColumnRenamed("score", "bi")
    j = uni.join(bi, "doc_id").withColumn(
        "kind",
        F.when(F.col("doc_id") >= 5_000_000, "shuffled").otherwise("real"),
    )
    agg = (
        j.groupBy("kind")
        .agg(
            F.round(F.avg("uni"), 4).alias("mean_unigram"),
            F.round(F.avg("bi"), 4).alias("mean_bigram"),
        )
        .orderBy("kind")
        .collect()
    )
    sep = {r["kind"]: (r["mean_unigram"], r["mean_bigram"]) for r in agg}

    # ---- 3) natural-text probe --------------------------------------
    # the synthetic corpus is bag-of-words (no order structure), so the
    # real/shuffled bigram delta there is noise by construction; this
    # small natural-English corpus shows the delta the operator exists
    # for: unigram identical, bigram craters on destroyed word order
    SENTS = [
        "the quick brown fox jumps over the lazy dog",
        "a data pipeline reads raw text and writes clean shards",
        "the model trains on the clean corpus for many steps",
        "every document passes through the quality filters first",
        "the spark engine shuffles data between the worker nodes",
        "a broadcast join avoids the shuffle for the small table",
        "the driver collects only the final top rows",
        "each partition sorts its rows before the write",
        "the parquet files keep statistics for every row group",
        "a window of fifty tokens slides over the document text",
        "the tokenizer splits the text on whitespace runs",
        "the scheduler assigns one task to each core",
    ] * 4
    nat = spark.createDataFrame(
        [(i, s) for i, s in enumerate(SENTS)], "doc_id long, text string"
    )
    nlm, nstats = unigram_lm(nat)
    nlm2, nctx, nbstats = bigram_lm(nat)
    nshuf = nat.select(
        (F.col("doc_id") + 10_000).alias("doc_id"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.transform(
                        F.split("text", " "),
                        lambda t: F.struct(
                            F.xxhash64(t).alias("h"), t.alias("t")
                        ),
                    )
                ),
                lambda s: s["t"],
            ),
            " ",
        ).alias("text"),
    )
    nboth = nat.unionByName(nshuf)
    nuni = lm_quality_scores(nboth, lm=nlm, stats=nstats).withColumnRenamed(
        "score", "uni"
    )
    nbi = bigram_quality_scores(
        nboth, lm2=nlm2, ctx=nctx, stats=nbstats
    ).withColumnRenamed("score", "bi")
    nagg = (
        nuni.join(nbi, "doc_id")
        .withColumn(
            "kind",
            F.when(F.col("doc_id") >= 10_000, "shuffled").otherwise("real"),
        )
        .groupBy("kind")
        .agg(
            F.round(F.avg("uni"), 4).alias("mean_unigram"),
            F.round(F.avg("bi"), 4).alias("mean_bigram"),
        )
        .orderBy("kind")
        .collect()
    )
    nat_sep = {
        r["kind"]: {"unigram": r["mean_unigram"], "bigram": r["mean_bigram"]}
        for r in nagg
    }

    # ---- 4) order ladder: wall vs corpus scale at orders 3 and 5 ----
    # the one-pass count emission means higher order = wider gram
    # stream (~order x tokens), NOT more passes; wall should scale
    # linearly in corpus size per order, with a constant factor
    # between orders
    from alma_memory_spark.operators.lm_quality import (
        ngram_backoff_lm,
        ngram_backoff_scores,
    )

    ladder = []
    for reps in (1, 4, 16):
        corpus = replicated(docs, reps).localCheckpoint(eager=True)
        half = corpus.filter(F.col("doc_id") % 2 == 0)
        for order in (3, 5):
            t0 = time.perf_counter()
            models, mstats = ngram_backoff_lm(half, order=order)
            scored = ngram_backoff_scores(
                corpus, models=models, stats=mstats
            )
            n_scored = scored.filter(F.col("score").isNotNull()).count()
            wall = time.perf_counter() - t0
            ladder.append(
                {
                    "reps": reps,
                    "order": order,
                    "scored": n_scored,
                    "wall_s": round(wall, 3),
                }
            )
            print(json.dumps(ladder[-1]), flush=True)
        spark.catalog.clearCache()

    # ---- 5) order-5 separation on the natural corpus ----------------
    n5m, n5s = ngram_backoff_lm(nat, order=5)
    n5 = ngram_backoff_scores(
        nboth, models=n5m, stats=n5s
    ).withColumnRenamed("score", "five")
    n5agg = (
        n5.withColumn(
            "kind",
            F.when(F.col("doc_id") >= 10_000, "shuffled").otherwise("real"),
        )
        .groupBy("kind")
        .agg(F.round(F.avg("five"), 4).alias("mean_5gram"))
        .orderBy("kind")
        .collect()
    )
    for r in n5agg:
        nat_sep[r["kind"]]["fivegram"] = r["mean_5gram"]

    # ---- 6) per-language structure: wall vs corpus scale ------------
    # group_col adds the language to the count-shuffle key; wall
    # should track corpus size exactly like the global model (one
    # shuffle either way), with no per-language pass multiplication
    from alma_memory_spark.functions.text import lang_id

    perlang = []
    for reps in (1, 16):
        corpus = (
            replicated(docs, reps)
            .select("doc_id", "text", lang_id("text").alias("lang"))
            .localCheckpoint(eager=True)
        )
        t0 = time.perf_counter()
        n = (
            lm_quality_scores(corpus, group_col="lang")
            .filter(F.col("score").isNotNull())
            .count()
        )
        wall = time.perf_counter() - t0
        perlang.append(
            {"reps": reps, "scored": n, "wall_s": round(wall, 3)}
        )
        print(json.dumps(perlang[-1]), flush=True)
        spark.catalog.clearCache()

    out = {
        "tail_scaleup": rows,
        "separation_synthetic": {
            k: {"unigram": v[0], "bigram": v[1]} for k, v in sep.items()
        },
        "separation_natural": nat_sep,
        "order_ladder": ladder,
        "per_language_ladder": perlang,
    }
    print(json.dumps(out, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
