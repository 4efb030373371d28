"""Adversarial-skew stress for the dedup family's caps (VERDICT r13 #5).

Corpus (built from sf0.1 documents): 50% of docs collapse into ONE
template family (identical body, one varying tail token) and the rest
append a power-law-distributed hot phrase (phrase j is shared by
~n/j^2 docs) — the worst realistic shapes for key-grouped dedup:
one colossal band bucket / posting / window fingerprint plus a heavy
tail of merely-hot keys.

For each guarded stage the script reports:
- the CAPPED pipeline's wall (the shipped default),
- the would-be candidate-pair mass sum n*(n-1)/2 over key groups with
  and without the cap — the avoided quadratic work, computed from
  group sizes WITHOUT running the uncapped join (the r12 chain proof
  already timed an uncapped run at 7x the capped wall on a milder
  corpus; re-suffering it per stage adds nothing),
- for substring dedup (no cap by design): the wall plus the executed
  plan's join strategy — boundedness there comes from AQE skew-split
  + the r14 dup-only winners build side, not from dropping keys.

Usage: python scripts/measure_skew_stress.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import Window as W  # noqa: E402

from alma_memory_spark.session import get_spark, load_table  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
TEMPLATE = (
    "from the desk of the automated newsletter system this message is "
    "generated for you and contains the exact same body every time it "
    "is sent out to a subscriber of the service"
)


def adversarial(docs):
    """50% one-template family + power-law hot phrases on the rest."""
    half = F.col("doc_id") % 2 == 0
    # power-law: doc i draws hot phrase j = floor(sqrt(i)) -> phrase j
    # shared by ~2*sqrt spacing => frequency ~ 1/j^2 tail
    j = F.floor(F.sqrt(F.col("doc_id").cast("double"))).cast("long")
    hot = F.concat(F.lit(" shared hot phrase number "), j, F.lit(" end"))
    return docs.select(
        "doc_id",
        F.when(
            half,
            F.concat(F.lit(TEMPLATE + " tail "), F.col("doc_id").cast("string")),
        )
        .otherwise(F.concat(F.col("text"), hot, hot, hot))
        .alias("text"),
    )


def pair_mass(df, key):
    """sum n*(n-1)/2 over groups of `key` — the candidate-pair count a
    self-join on that key would produce."""
    return (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.sum(F.col("n") * (F.col("n") - 1) / 2).alias("m"))
        .collect()[0]["m"]
        or 0
    )


def main() -> None:
    spark = get_spark("skew-stress", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "16")))
    spark.sparkContext.setLogLevel("ERROR")
    docs = adversarial(load_table(spark, SF, "documents")).cache()
    n_docs = docs.count()
    print(f"adversarial corpus: {n_docs} docs")

    from alma_memory_spark.functions.text import hash32, minhash_signature
    from alma_memory_spark.plans.text_queries import (
        LSH_BUCKET_CAP,
        WINNOW_POST_CAP,
    )

    # ---- MinHash-LSH band buckets (cap: LSH_BUCKET_CAP) ----------------
    toks = docs.select(
        "doc_id",
        F.transform(
            F.array_distinct(F.split(F.lower("text"), r"\s+")), hash32
        ).alias("hs"),
    ).filter(F.size("hs") > 0)
    bands = toks.select(
        "doc_id", minhash_signature(F.col("hs"), k=8, hashed=True).alias("sig")
    ).select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.concat_ws(":", F.lit(b), F.slice("sig", b * 4 + 1, 4).cast("string"))
                    for b in range(2)
                ]
            )
        ).alias("bkey"),
    )
    t0 = time.perf_counter()
    sized = bands.withColumn("bn", F.count("*").over(W.partitionBy("bkey")))
    capped = sized.filter(F.col("bn") <= LSH_BUCKET_CAP)
    m_capped = pair_mass(capped, "bkey")
    wall = time.perf_counter() - t0
    m_all = pair_mass(bands, "bkey")
    print(
        f"lsh_bands: capped pair mass={int(m_capped)} vs uncapped="
        f"{int(m_all)} (x{m_all / max(m_capped, 1):.0f} avoided), "
        f"capped-pipeline wall={wall:.1f}s"
    )

    # ---- Winnow postings (cap: WINNOW_POST_CAP) ------------------------
    from pyspark.sql.functions import pandas_udf

    from alma_memory_spark.plans.text_queries import X

    @pandas_udf("array<long>")
    def winnow_set(nm: pd.Series) -> pd.Series:
        from numpy.lib.stride_tricks import sliding_window_view

        w = X.WINNOW_W
        out = []
        for s in nm:
            a = X.rolling_shingle_hashes(s.encode("ascii"))
            mins = (
                sliding_window_view(a, w).min(axis=1)
                if len(a) >= w
                else a.min(keepdims=True)
            )
            out.append(np.unique(mins))
        return pd.Series(out)

    posts = (
        docs.select("doc_id", X.winnow_norm("text").alias("nm"))
        .select("doc_id", winnow_set(F.col("nm")).alias("wm"))
        .select("doc_id", F.explode("wm").alias("fp"))
    )
    t0 = time.perf_counter()
    psized = posts.withColumn("nd", F.count("*").over(W.partitionBy("fp")))
    pcapped = psized.filter(F.col("nd") <= WINNOW_POST_CAP)
    pm_capped = pair_mass(pcapped, "fp")
    wall = time.perf_counter() - t0
    pm_all = pair_mass(posts, "fp")
    print(
        f"winnow_posts: capped pair mass={int(pm_capped)} vs uncapped="
        f"{int(pm_all)} (x{pm_all / max(pm_capped, 1):.0f} avoided), "
        f"capped-pipeline wall={wall:.1f}s"
    )

    # ---- Substring dedup (no cap: AQE skew split + dup-only winners) ---
    from alma_memory_spark.operators.substring import dedup_token_windows

    t0 = time.perf_counter()
    out = dedup_token_windows(docs, w=12, fp_hash="xxhash64")
    out.write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    plan = out._jdf.queryExecution().executedPlan().toString()
    kept = out.agg(F.sum("n_kept"), F.sum("n_units")).collect()[0]
    print(
        f"substring_dedup: wall={wall:.1f}s kept={kept[0]}/{kept[1]} "
        f"units, SMJ={plan.count('SortMergeJoin')} "
        f"skew-split AQEShuffleRead={plan.count('AQEShuffleRead')}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
