"""Measured scale-up for substring (token-window) dedup (SCALE.md r10).

Claim under test: dedup_token_windows is LINEAR in corpus size — the
exploded window rows are ~1 per corpus token, the keep-first argmin is
a map-side-combinable aggregate, and the excision is an array
expression per doc. Evidence: wall over 1x / 4x / 16x replicated
corpora (replicas get disjoint token vocabularies via a per-replica
suffix, so the window-dup structure per replica matches the base
corpus instead of exploding across replicas).

Run:  python scripts/measure_substring.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from alma_memory_spark.operators.substring import (  # noqa: E402
    dedup_token_windows,
)
from alma_memory_spark.session import get_spark, load_table  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
W = int(os.environ.get("SUB_W", "6"))
BOILER = "shared boilerplate token span repeated across every document here"


def replicated(docs, reps: int):
    parts = []
    for r in range(reps):
        parts.append(
            docs.select(
                (F.col("doc_id") + r * 1_000_000).alias("doc_id"),
                F.concat_ws(
                    " ",
                    F.array_join(
                        F.transform(
                            F.split(F.col("text"), r"\s+"),
                            lambda t: F.concat(t, F.lit(f"_r{r}")),
                        ),
                        " ",
                    ),
                    F.lit(BOILER + f" tag{r}"),
                    F.lit("tail marker"),
                ).alias("text"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def main() -> None:
    spark = get_spark()
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    rows = []
    for reps in (1, 4, 16):
        corpus = replicated(docs, reps).localCheckpoint(eager=True)
        n = corpus.count()
        t0 = time.perf_counter()
        out = dedup_token_windows(corpus, w=W)
        agg = out.agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum("n_units").alias("units"),
            F.sum(F.col("n_units") - F.col("n_kept")).alias("excised"),
        ).collect()[0]
        wall = time.perf_counter() - t0
        rows.append(
            {
                "reps": reps,
                "docs": n,
                "units": agg["units"],
                "excised_units": agg["excised"],
                "wall_s": round(wall, 2),
                "s_per_1k_docs": round(wall / (n / 1000.0), 3),
            }
        )
        print(json.dumps(rows[-1]), flush=True)
        spark.catalog.clearCache()
    print(json.dumps({"substring_scaleup": rows}, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
