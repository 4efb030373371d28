"""Measured scale-up for benchmark decontamination (SCALE.md r7).

Claim: the training side never shuffles — grams explode in place and
probe the BROADCAST benchmark gram set — so wall time is linear in the
training corpus at a fixed benchmark (per-doc cost flat). A shuffle
join would instead re-partition the full training gram stream.

Run:  python scripts/measure_decontam.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from alma_memory_spark.operators.decontam import contamination_report  # noqa: E402
from alma_memory_spark.session import get_spark, load_table  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    spark = get_spark(cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    base = load_table(spark, SF, "documents").select("doc_id", "text")
    bench = base.filter(F.col("doc_id") % 5 == 0).localCheckpoint(eager=True)
    n_base = base.count()
    # warm-up
    contamination_report(base.limit(200), bench, n=6).count()
    results = []
    for mult in (1, 4, 16):
        # replicate with shifted ids so near-dup structure scales
        train = None
        for r in range(mult):
            part = base.filter(F.col("doc_id") % 5 != 0).select(
                (F.col("doc_id") + F.lit(r * 10_000_000)).alias("doc_id"), "text"
            )
            train = part if train is None else train.unionByName(part)
        train = train.localCheckpoint(eager=True)
        n = train.count()
        t0 = time.time()
        rep = contamination_report(train, bench, n=6)
        flagged = rep.count()
        wall = time.time() - t0
        rec = {
            "train_docs": n,
            "flagged": int(flagged),
            "wall_s": round(wall, 2),
            "ms_per_1k_docs": round(1000 * wall / (n / 1000.0), 1),
        }
        results.append(rec)
        print(json.dumps(rec), flush=True)
        train.unpersist()
    print(
        json.dumps(
            {
                "claim": "train side never shuffles; per-doc cost flat at fixed bench",
                "ratio_16x_vs_1x_per_doc": round(
                    results[-1]["ms_per_1k_docs"] / results[0]["ms_per_1k_docs"], 2
                ),
            }
        )
    )
    # plan check: the only join must be a broadcast
    plan = contamination_report(base, bench, n=6)._jdf.queryExecution().executedPlan().toString()
    print(json.dumps({
        "broadcast_join": "BroadcastHashJoin" in plan,
        "sort_merge_join": "SortMergeJoin" in plan,
    }))


if __name__ == "__main__":
    main()
