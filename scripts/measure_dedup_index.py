"""Measured scale-up for the persisted near-dup index (SCALE.md r6).

Claim under test: NearDupIndex.add(batch) is O(batch + collisions),
not O(corpus) — the candidate join reads only the new docs' band
buckets and the verify join only the named existing docs. Evidence:
build the index over 1x / 5x / 20x corpora (replicas get DISJOINT
token vocabularies — every token suffixed per replica — so the
near-dup structure per replica matches the base corpus instead of
exploding quadratically with replication), then time the SAME
fixed-size add batch against each. Flat add time across a 20x corpus
is the claim; a full rebuild at each size is the contrast.

Run:  python scripts/measure_dedup_index.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from alma_memory_spark.operators.dedup_index import NearDupIndex  # noqa: E402
from alma_memory_spark.session import get_spark, load_table  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def replicated(docs, reps: int):
    """reps copies with shifted ids and per-replica disjoint token
    vocabularies (suffix every token), so replicas never near-dup
    across each other and pair volume grows linearly with reps."""
    parts = []
    n = 1_000_000
    for r in range(reps):
        part = docs.select(
            (F.col("doc_id") + r * n).alias("doc_id"),
            F.array_join(
                F.transform(
                    F.split(F.col("text"), r"\s+"),
                    lambda t: F.concat(t, F.lit(f"_r{r}")),
                ),
                " ",
            ).alias("text"),
        )
        parts.append(part)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def main() -> None:
    spark = get_spark(
        "measure-neardup", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    # the fixed add batch: 200 fresh docs with their own vocabulary
    batch = docs.limit(200).select(
        (F.col("doc_id") + 50_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" addbatchmarker")).alias("text"),
    ).localCheckpoint(eager=True)

    results = []
    root = tempfile.mkdtemp(prefix="neardup_scale_")
    try:
        for reps in (1, 5, 20):
            corpus = replicated(docs, reps)
            path = os.path.join(root, f"x{reps}")
            t0 = time.time()
            idx = NearDupIndex.build(
                spark, corpus, path, n_buckets=32, band_cap=200
            )
            t_build = time.time() - t0
            t0 = time.time()
            n_new = idx.add(batch)
            t_add = time.time() - t0
            results.append(
                {
                    "reps": reps,
                    "n_docs": idx.n_docs,
                    "build_sec": round(t_build, 2),
                    "add_sec": round(t_add, 2),
                    "add_pairs": n_new,
                }
            )
            print(json.dumps(results[-1]))
        print(json.dumps({"neardup_scaleup": results}))
    finally:
        shutil.rmtree(root, ignore_errors=True)


def measure_pairs_history() -> None:
    """Third claim (VERDICT r7 #1): add() wall stays FLAT while the
    ACCUMULATED PAIRS HISTORY grows ~100x. Corpora built with per-text
    duplicate factor d hold d*(d-1)/2 pairs per text group — pair
    volume grows quadratically in d while the corpus grows only
    linearly — and the fixed disjoint-vocabulary add batch must cost
    the same against the 100x-pairs index: the replay guard reads
    batch-adjacent history only (adjacency-bucketed pairs layout),
    never the full pairs table."""
    spark = get_spark(
        "measure-neardup-pairs",
        cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
    )
    base = (
        load_table(spark, SF, "documents")
        .select("doc_id", "text")
        .filter("doc_id < 1500")
        .localCheckpoint(eager=True)
    )
    batch = base.limit(200).select(
        (F.col("doc_id") + 50_000_000).alias("doc_id"),
        F.array_join(
            F.transform(
                F.split(F.col("text"), r"\s+"),
                lambda t: F.concat(t, F.lit("_addb")),
            ),
            " ",
        ).alias("text"),
    ).localCheckpoint(eager=True)
    results = []
    root = tempfile.mkdtemp(prefix="neardup_pairs_")
    try:
        for dup in (2, 6, 20):
            corpus = base.select(
                F.explode(
                    F.sequence(F.lit(0), F.lit(dup - 1))
                ).alias("_r"),
                "doc_id",
                "text",
            ).select(
                (F.col("doc_id") * 100 + F.col("_r")).alias("doc_id"),
                "text",
            )
            path = os.path.join(root, f"d{dup}")
            idx = NearDupIndex.build(spark, corpus, path, n_buckets=32)
            n_hist = idx.pairs().count()
            t0 = time.time()
            n_new = idx.add(batch)
            t_add = time.time() - t0
            results.append(
                {
                    "dup_factor": dup,
                    "pairs_history": int(n_hist),
                    "add_sec": round(t_add, 2),
                    "add_pairs": int(n_new),
                }
            )
            print(json.dumps(results[-1]), flush=True)
        growth = (
            results[-1]["pairs_history"] / max(1, results[0]["pairs_history"])
        )
        print(
            json.dumps(
                {
                    "claim": "add wall flat under growing pairs history",
                    "pairs_growth": round(growth, 1),
                    "add_sec_smallest": results[0]["add_sec"],
                    "add_sec_largest": results[-1]["add_sec"],
                }
            )
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
    measure_pairs_history()
