"""Persisted-index leg of the chain scale proof (r13, VERDICT r12 #5).

measure_chain.py proves the BATCH operators compose sublinearly; the
production maintenance story instead runs the five persisted indexes'
add/compact cycle via the real streaming sink
(streaming/ingest.stream_documents_into_indexes). This script runs the
SAME 8x replicated chain corpus through that sink — text/IVF/near-dup/
semantic/paragraph/token-window maintenance with in-stream compaction —
recording, per window of micro-batches:

  - per-INDEX cumulative add/compact wall (class-level instrumentation,
    so the sink's handle re-binds across compaction keep counting),
  - parquet file count under each index root (the listing the next add
    pays for),
  - rows processed.

Flat per-window add wall = maintenance cost is O(batch), not
O(history); a wall that grows with processed history flags the index
for the adjacency-pruning treatment its family already has.

Run:  python scripts/measure_chain_indexes.py [copies] [windows]
Env:  SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
      SPARK_GRAFT_CPUS   (default 32)
      CHAIN_IDX_COMPACT_EVERY (default 10)
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

from alma_memory_spark.embedding import DEFAULT_DIM, hash_embed  # noqa: E402
from alma_memory_spark.operators.ann_index import IVFIndex  # noqa: E402
from alma_memory_spark.operators.dedup_index import NearDupIndex  # noqa: E402
from alma_memory_spark.operators.paragraphs import (  # noqa: E402
    ParagraphDedupIndex,
)
from alma_memory_spark.operators.semdedup import SemDedupIndex  # noqa: E402
from alma_memory_spark.operators.substring import (  # noqa: E402
    TokenWindowDedupIndex,
)
from alma_memory_spark.session import get_spark  # noqa: E402
from alma_memory_spark.streaming.ingest import (  # noqa: E402
    stream_documents_into_indexes,
)
from scripts.measure_chain import replicate_docs  # noqa: E402
from scripts.measure_soak import count_files  # noqa: E402

COMPACT_EVERY = int(os.environ.get("CHAIN_IDX_COMPACT_EVERY", "10"))


def _instrument(walls: dict):
    """Patch each index class's mutation methods to accumulate wall
    into `walls` keyed by (index_kind, op). Class-level so the sink's
    compaction handle re-binds keep counting. Returns an undo fn."""
    targets = [
        ("ivf", IVFIndex, ["add_epoch", "compact_to"]),
        ("neardup", NearDupIndex, ["add", "compact"]),
        ("semdedup", SemDedupIndex, ["add", "compact"]),
        ("paragraph", ParagraphDedupIndex, ["add", "compact"]),
        ("window", TokenWindowDedupIndex, ["add", "compact"]),
    ]
    originals = []

    def wrap(kind, cls, name):
        orig = getattr(cls, name)

        def timed(self, *a, **kw):
            t0 = time.perf_counter()
            try:
                return orig(self, *a, **kw)
            finally:
                walls[kind] = walls.get(kind, 0.0) + time.perf_counter() - t0

        setattr(cls, name, timed)
        originals.append((cls, name, orig))

    for kind, cls, names in targets:
        for n in names:
            wrap(kind, cls, n)

    def undo():
        for cls, name, orig in originals:
            setattr(cls, name, orig)

    return undo


def main() -> None:
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    windows = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    spark = get_spark(cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="alma_chain_idx_")
    try:
        src = os.path.join(work, "docs.parquet")
        replicate_docs(src, copies)

        dim = DEFAULT_DIM

        @F.pandas_udf("array<float>")
        def embed(texts):
            return texts.map(lambda t: hash_embed(t or "", dim))

        full = (
            spark.read.parquet(src)
            .select("doc_id", "text")
            .withColumn("embedding", embed("text"))
        )
        n_total = full.count()
        # seed slice builds the indexes; the stream maintains the rest
        seed = full.filter(F.col("doc_id") % windows == 0).localCheckpoint(
            eager=True
        )
        rest = full.filter(F.col("doc_id") % windows != 0)
        # one parquet file per window -> maxFilesPerTrigger=1 gives one
        # micro-batch per window through the REAL streaming sink
        feed = os.path.join(work, "feed")
        rest.repartition(windows).write.parquet(feed)
        print(
            json.dumps(
                {
                    "corpus_docs": n_total,
                    "seed_docs": seed.count(),
                    "windows": windows,
                    "compact_every": COMPACT_EVERY,
                }
            ),
            flush=True,
        )

        roots = {
            k: os.path.join(work, k)
            for k in ("ivf", "neardup", "semdedup", "paragraph", "window")
        }
        refs = {
            "ivf": IVFIndex.build(
                spark, seed, roots["ivf"], id_col="doc_id",
                vec_col="embedding", cent_every=50,
            ),
            "neardup": NearDupIndex.build(
                spark, seed.select("doc_id", "text"), roots["neardup"],
                id_col="doc_id", text_col="text", n_buckets=16,
                band_cap=500,
            ),
            "semdedup": SemDedupIndex.build(
                spark, seed.select("doc_id", "embedding"), roots["semdedup"],
                id_col="doc_id", vec_col="embedding", threshold=0.97,
                cent_every=50,
            ),
            "paragraph": ParagraphDedupIndex.build(
                spark, seed.select("doc_id", "text"), roots["paragraph"],
                id_col="doc_id", text_col="text", n_buckets=16,
            ),
            "window": TokenWindowDedupIndex.build(
                spark, seed.select("doc_id", "text"), roots["window"],
                id_col="doc_id", text_col="text", w=8, n_buckets=16,
            ),
        }

        walls: dict = {}
        undo = _instrument(walls)
        report = []
        state = {"last": {}, "batches": 0, "t_last": time.perf_counter()}

        def on_batch(epoch_id):
            state["batches"] += 1
            now = time.perf_counter()
            row = {
                "window": state["batches"],
                "batch_wall_s": round(now - state["t_last"], 2),
                "index_wall_s": {
                    k: round(walls.get(k, 0.0) - state["last"].get(k, 0.0), 2)
                    for k in roots
                },
                "files": {k: count_files(r) for k, r in roots.items()},
            }
            state["last"] = dict(walls)
            state["t_last"] = now
            report.append(row)
            print(json.dumps(row), flush=True)

        stream = spark.readStream.schema(
            "doc_id long, text string, embedding array<float>"
        ).option("maxFilesPerTrigger", 1).parquet(feed)
        q = stream_documents_into_indexes(
            stream,
            ivf_index=refs["ivf"],
            neardup_index=refs["neardup"],
            semdedup_index=refs["semdedup"],
            paragraph_index=refs["paragraph"],
            window_index=refs["window"],
            checkpoint=os.path.join(work, "ckpt"),
            compact_every=COMPACT_EVERY,
            on_batch=on_batch,
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
            undo()

        halves = max(1, len(report) // 2)
        first = report[:halves]
        second = report[halves:]

        def mean_wall(rows, k):
            vals = [r["index_wall_s"][k] for r in rows]
            return round(sum(vals) / max(1, len(vals)), 2)

        summary = {
            "claim": "per-window add wall flat as indexed history grows",
            "windows": len(report),
            "per_index_mean_wall_first_half": {
                k: mean_wall(first, k) for k in roots
            },
            "per_index_mean_wall_second_half": {
                k: mean_wall(second, k) for k in roots
            },
            "files_final": report[-1]["files"] if report else {},
            "total_index_wall_s": {
                k: round(walls.get(k, 0.0), 1) for k in roots
            },
        }
        print(json.dumps(summary, indent=2), flush=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
