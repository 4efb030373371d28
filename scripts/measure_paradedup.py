"""Measured scale-up for paragraph-granularity dedup (SCALE.md r8).

Claim under test: dedup_paragraphs survives the exact pathology the
operator exists for — a boilerplate paragraph shared by EVERY document
(one fingerprint group as large as the corpus). The keep-first
decision is a map-side-combinable min(struct) aggregate rejoined on
the near-unique (fp, doc, idx) triple, so the mega-group partial-
aggregates on the map side instead of funneling through one task's
window sort; wall time grows ~linearly with the corpus.

Method: per-doc-distinct bodies + one universal footer paragraph +
one half-corpus footer, corpus scaled x1/x4/x16; flat ms-per-1k-docs
is the claim.

Run:  python scripts/measure_paradedup.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from alma_memory_spark.operators.paragraphs import dedup_paragraphs  # noqa: E402
from alma_memory_spark.session import get_spark  # noqa: E402

FOOTER = "universal boilerplate footer shared by every single document"
HALF = "secondary boilerplate present in half of the corpus"


def corpus(spark, n: int, offset: int = 0):
    """`offset` shifts BOTH the ids and the generated text content —
    corpora at different offsets share only the footer paragraphs."""
    return spark.range(offset, offset + n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            "\n\n",
            F.concat(F.lit("unique body "), F.col("id").cast("string"),
                     F.lit(" with its own words repeated a few times")),
            F.lit(FOOTER),
            F.when(F.col("id") % 2 == 0, F.lit(HALF)).otherwise(
                F.concat(F.lit("tail "), (F.col("id") * 7).cast("string"))
            ),
        ).alias("text"),
    )


def main() -> None:
    spark = get_spark(cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    dedup_paragraphs(corpus(spark, 2_000)).count()  # warm-up, unmeasured
    results = []
    for n in (10_000, 40_000, 160_000):
        df = corpus(spark, n).localCheckpoint(eager=True)
        t0 = time.time()
        out = dedup_paragraphs(df)
        kept = out.agg(F.sum("n_kept")).collect()[0][0]
        wall = time.time() - t0
        rec = {
            "n_docs": n,
            "kept_paragraphs": int(kept),
            # the universal footer survives once; half-footer once;
            # everything else is unique: kept ~= 2n/2-ish + n + 2
            "wall_s": round(wall, 2),
            "ms_per_1k_docs": round(1000 * wall / (n / 1000.0), 1),
        }
        results.append(rec)
        print(json.dumps(rec), flush=True)
        df.unpersist()
    # compare the two largest sizes: the smallest run absorbs one-time
    # plan/codegen warm-up that the tiny warm-up pass does not cover
    print(
        json.dumps(
            {
                "claim": "paradedup wall flat under a corpus-wide duplicate paragraph",
                "wall_s_40k": results[1]["wall_s"],
                "wall_s_160k": results[2]["wall_s"],
                "ratio_4x_data": round(
                    results[2]["wall_s"] / max(0.001, results[1]["wall_s"]), 2
                ),
            }
        )
    )


def measure_incremental() -> None:
    """Second claim: ParagraphDedupIndex.add(batch) stays FLAT as the
    accumulated owner state grows 16x — the owner read prunes to the
    batch fingerprints' fbucket partitions and broadcast-semi-joins
    the batch fp set, so per-add cost is O(batch-adjacent state)."""
    import shutil
    import tempfile

    from alma_memory_spark.operators.paragraphs import ParagraphDedupIndex

    spark = get_spark(cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    # fresh content at a disjoint offset: bodies/tails are NEW (kept),
    # footers duplicate indexed state (dropped) — the realistic mix
    batch = corpus(spark, 1_000, offset=50_000_000).localCheckpoint(
        eager=True
    )
    results = []
    for n in (10_000, 40_000, 160_000):
        root = tempfile.mkdtemp(prefix="paradedup_inc_")
        try:
            idx = ParagraphDedupIndex.build(
                spark, corpus(spark, n), root + "/idx", n_buckets=32
            )
            n_owners = idx.owners().count()
            t0 = time.time()
            out = idx.add(batch)
            n_kept = out.agg(F.sum("n_kept")).collect()[0][0]
            wall = time.time() - t0
            rec = {
                "indexed_docs": n,
                "owners": int(n_owners),
                "add_wall_s": round(wall, 2),
                "batch_kept_paragraphs": int(n_kept),
            }
            results.append(rec)
            print(json.dumps(rec), flush=True)
        finally:
            shutil.rmtree(root, ignore_errors=True)
    print(
        json.dumps(
            {
                "claim": "paragraph-index add flat as owner state grows 16x",
                "add_s_smallest": results[0]["add_wall_s"],
                "add_s_largest": results[-1]["add_wall_s"],
            }
        )
    )


def measure_compaction() -> None:
    """r9 (VERDICT r8 #2): N micro-adds accumulate one parquet file per
    touched fbucket per add; compact() folds them to one per partition.
    Record owner file count before/after, add wall early vs late vs
    post-compact (flat), and the compact cost itself."""
    import shutil
    import tempfile

    from alma_memory_spark.operators.paragraphs import ParagraphDedupIndex

    spark = get_spark(cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    n_adds, batch = 100, 200
    root = tempfile.mkdtemp(prefix="alma_pdidx_compact_")
    try:
        idx = ParagraphDedupIndex.build(
            spark, corpus(spark, batch), root, n_buckets=16
        )
        walls = []
        for i in range(1, n_adds + 1):
            t0 = time.time()
            idx.add(corpus(spark, batch, offset=i * batch)).count()
            walls.append(time.time() - t0)

        def owner_files(vroot):
            total = 0
            for r, _d, files in os.walk(os.path.join(vroot, "owners")):
                total += sum(1 for f in files if f.endswith(".parquet"))
            return total

        files_before = owner_files(idx.vroot)
        t0 = time.time()
        out = idx.compact()
        compact_s = time.time() - t0
        files_after = owner_files(out.vroot)
        t0 = time.time()
        out.add(corpus(spark, batch, offset=(n_adds + 1) * batch)).count()
        post_wall = time.time() - t0
        print(
            json.dumps(
                {
                    "claim": "compact folds micro-add file debris; add wall flat",
                    "n_micro_adds": n_adds,
                    "owner_files_before": files_before,
                    "owner_files_after": files_after,
                    "add_s_first10_mean": round(sum(walls[:10]) / 10, 3),
                    "add_s_last10_mean": round(sum(walls[-10:]) / 10, 3),
                    "add_s_post_compact": round(post_wall, 3),
                    "compact_s": round(compact_s, 2),
                }
            ),
            flush=True,
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
    measure_incremental()
    measure_compaction()
