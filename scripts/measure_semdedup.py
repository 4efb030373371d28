"""Measured scale-up for SemDeDup-shape semantic dedup (SCALE.md r7).

The claim to prove: with the stride quantizer, cell occupancy is
~cent_every REGARDLESS of corpus size (cells ∝ n), so the within-cell
pair stage costs O(n · occupancy) total — wall time grows LINEARLY with
the corpus (more cells, same work per cell), never quadratically. A
blocked all-pairs compare over the same corpus without cells would grow
O(n²).

Method: synthetic unit vectors around k drifting anchor directions
(clustered, like real embedding spaces), corpus scaled ×4 and ×16 at
fixed cent_every; record wall time, cells, max/mean occupancy, pairs.
Flat time-per-1k-docs across scales = the claim holds.

Run:  python scripts/measure_semdedup.py
"""

from __future__ import annotations

import json
import math
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from alma_memory_spark.operators.semdedup import semantic_dedup_pairs  # noqa: E402
from alma_memory_spark.session import get_spark  # noqa: E402

DIM = 64
CENT_EVERY = 50


def make_corpus(spark, n: int, seed: int = 7):
    rng = np.random.default_rng(seed)
    n_anchor = max(8, n // 200)
    anchors = rng.normal(size=(n_anchor, DIM))
    anchors /= np.linalg.norm(anchors, axis=1, keepdims=True)
    base = anchors[rng.integers(0, n_anchor, size=n)]
    noise = rng.normal(scale=0.045, size=(n, DIM))
    V = base + noise
    V /= np.linalg.norm(V, axis=1, keepdims=True)
    rows = [(int(i), [float(x) for x in V[i]]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def main() -> None:
    spark = get_spark(cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    # warm-up: session, Arrow serializers, BLAS threads — unmeasured
    semantic_dedup_pairs(
        make_corpus(spark, 1_000), threshold=0.85, cent_every=CENT_EVERY
    ).count()
    results = []
    for n in (4_000, 16_000, 64_000):
        emb = make_corpus(spark, n).localCheckpoint(eager=True)
        t0 = time.time()
        pairs = semantic_dedup_pairs(
            emb, threshold=0.85, cent_every=CENT_EVERY
        )
        n_pairs = pairs.count()
        wall = time.time() - t0
        # occupancy profile from the same quantizer (cheap recount)
        from alma_memory_spark.operators.semdedup import (
            _assign_cells,
            stride_centroids,
        )

        cells, C, cnrm = stride_centroids(emb, "vec_id", "embedding", CENT_EVERY)
        occ = (
            _assign_cells(emb, "vec_id", "embedding", cells, C, cnrm)
            .groupBy("cell")
            .count()
            .agg(
                {"count": "max"}
            )
            .collect()[0][0]
        )
        rec = {
            "n_docs": n,
            "cells": len(cells),
            "max_occupancy": int(occ),
            "pairs": int(n_pairs),
            "wall_s": round(wall, 2),
            "ms_per_1k_docs": round(1000 * wall / (n / 1000.0), 1),
        }
        results.append(rec)
        print(json.dumps(rec), flush=True)
        emb.unpersist()
    base = results[0]["ms_per_1k_docs"]
    tail = results[-1]["ms_per_1k_docs"]
    print(
        json.dumps(
            {
                "claim": "per-doc cost flat as corpus grows (cells scale, occupancy fixed)",
                "ms_per_1k_docs_4k": base,
                "ms_per_1k_docs_64k": tail,
                "ratio_16x_corpus": round(tail / base, 2) if base else None,
            }
        )
    )




def measure_incremental() -> None:
    """Second claim: incremental batch cost is FLAT as the indexed
    corpus grows (O(batch x occupancy), partition-pruned cell reads)."""
    import shutil
    import tempfile

    from alma_memory_spark.operators.ann_index import IVFIndex
    from alma_memory_spark.operators.semdedup import (
        semantic_dedup_pairs_incremental,
    )

    spark = get_spark(cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    batch = make_corpus(spark, 1_000, seed=99).withColumn(
        "vec_id", F.col("vec_id") + F.lit(50_000_000)
    ).localCheckpoint(eager=True)
    from pyspark.sql import functions as F2  # noqa: F401

    for n in (4_000, 16_000, 64_000):
        root = tempfile.mkdtemp(prefix="semdedup_inc_")
        try:
            corpus = make_corpus(spark, n).localCheckpoint(eager=True)
            idx = IVFIndex.build(
                spark, corpus, root + "/ivf", cent_every=CENT_EVERY
            )
            t0 = time.time()
            n_pairs = semantic_dedup_pairs_incremental(
                idx, batch, threshold=0.85
            ).count()
            wall = time.time() - t0
            print(
                json.dumps(
                    {
                        "indexed_corpus": n,
                        "batch": 1000,
                        "inc_pairs": int(n_pairs),
                        "inc_wall_s": round(wall, 2),
                    }
                ),
                flush=True,
            )
            corpus.unpersist()
        finally:
            shutil.rmtree(root, ignore_errors=True)


def measure_pairs_history() -> None:
    """Third claim (VERDICT r7 #1): SemDedupIndex.add() wall stays FLAT
    while the accumulated pairs history grows ~100x. Each base vector
    is duplicated d times at tiny noise (cos > threshold inside the
    group), so pairs grow ~d^2 while the corpus grows linearly; the
    fixed fresh-anchor add batch must cost the same against the
    100x-pairs index — the replay guard reads only batch-adjacent
    partitions of the adjacency-bucketed pairs layout."""
    import shutil
    import tempfile

    from alma_memory_spark.operators.semdedup import SemDedupIndex

    spark = get_spark(cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    rng = np.random.default_rng(11)
    n_base = 1_000

    def dup_corpus(d: int):
        A = rng.normal(size=(n_base, DIM))
        A /= np.linalg.norm(A, axis=1, keepdims=True)
        V = np.repeat(A, d, axis=0) + rng.normal(
            scale=0.01, size=(n_base * d, DIM)
        )
        V /= np.linalg.norm(V, axis=1, keepdims=True)
        rows = [(int(i), [float(x) for x in V[i]]) for i in range(len(V))]
        return spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    batch = make_corpus(spark, 500, seed=123).withColumn(
        "vec_id", F.col("vec_id") + F.lit(50_000_000)
    ).localCheckpoint(eager=True)
    results = []
    for d in (2, 6, 20):
        root = tempfile.mkdtemp(prefix="semdedup_pairs_")
        try:
            corpus = dup_corpus(d).localCheckpoint(eager=True)
            idx = SemDedupIndex.build(
                spark, corpus, root + "/idx", threshold=0.85,
                cent_every=CENT_EVERY,
            )
            n_hist = idx.pairs().count()
            t0 = time.time()
            n_new = idx.add(batch)
            wall = time.time() - t0
            rec = {
                "dup_factor": d,
                "pairs_history": int(n_hist),
                "add_sec": round(wall, 2),
                "add_pairs": int(n_new),
            }
            results.append(rec)
            print(json.dumps(rec), flush=True)
            corpus.unpersist()
        finally:
            shutil.rmtree(root, ignore_errors=True)
    growth = results[-1]["pairs_history"] / max(1, results[0]["pairs_history"])
    print(
        json.dumps(
            {
                "claim": "semdedup add wall flat under growing pairs history",
                "pairs_growth": round(growth, 1),
                "add_sec_smallest": results[0]["add_sec"],
                "add_sec_largest": results[-1]["add_sec"],
            }
        )
    )


def measure_multiprobe() -> None:
    """Recall of the cell-blocked pair stage vs EXACT all-pairs cosine
    (driver numpy ground truth) at n_assign = 1 vs 2: multi-probe
    assignment recovers boundary-straddling pairs — the documented
    SemDeDup approximation — at ~n_assign x per-cell cost."""
    spark = get_spark(cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    n = 4_000
    emb = make_corpus(spark, n).localCheckpoint(eager=True)
    V = np.array(
        [r["embedding"] for r in emb.orderBy("vec_id").collect()],
        dtype=np.float64,
    )
    nrm = np.maximum(np.linalg.norm(V, axis=1), 1e-300)
    S = np.round((V @ V.T) / np.outer(nrm, nrm), 6)
    ia, ib = np.triu_indices(n, k=1)
    mask = S[ia, ib] >= 0.85
    exact = set(zip(ia[mask].tolist(), ib[mask].tolist()))
    out = {"exact_pairs": len(exact)}
    for k in (1, 2):
        t0 = time.time()
        got = {
            (r["id_a"], r["id_b"])
            for r in semantic_dedup_pairs(
                emb, threshold=0.85, cent_every=CENT_EVERY, n_assign=k
            ).collect()
        }
        out[f"n_assign_{k}"] = {
            "pairs": len(got),
            "recall": round(len(got & exact) / max(1, len(exact)), 4),
            "wall_s": round(time.time() - t0, 2),
        }
    print(json.dumps(out), flush=True)


def measure_index_multiprobe() -> None:
    """r9 (VERDICT r8 #1): recall of the PERSISTED SemDedupIndex
    (build 70% + add 30%) vs exact all-pairs ground truth at
    n_assign = 1 vs 2 — the streaming path's accumulated pairs must
    reach ~the batch operator's multi-probe recall, not stay pinned at
    the single-probe boundary-miss rate."""
    import shutil
    import tempfile

    from alma_memory_spark.operators.semdedup import SemDedupIndex

    spark = get_spark(cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    n = 4_000
    emb = make_corpus(spark, n).localCheckpoint(eager=True)
    V = np.array(
        [r["embedding"] for r in emb.orderBy("vec_id").collect()],
        dtype=np.float64,
    )
    nrm = np.maximum(np.linalg.norm(V, axis=1), 1e-300)
    S = np.round((V @ V.T) / np.outer(nrm, nrm), 6)
    ia, ib = np.triu_indices(n, k=1)
    mask = S[ia, ib] >= 0.85
    exact = set(zip(ia[mask].tolist(), ib[mask].tolist()))
    a = emb.filter((F.col("vec_id") % 10 < 7) | (F.col("vec_id") % CENT_EVERY == 0))
    b = emb.filter((F.col("vec_id") % 10 >= 7) & (F.col("vec_id") % CENT_EVERY != 0))
    out = {"exact_pairs": len(exact)}
    for k in (1, 2):
        root = tempfile.mkdtemp(prefix=f"alma_sdidx_mp{k}_")
        try:
            t0 = time.time()
            idx = SemDedupIndex.build(
                spark, a, root, threshold=0.85, cent_every=CENT_EVERY,
                n_assign=k,
            )
            idx.add(b)
            got = {(r["id_a"], r["id_b"]) for r in idx.pairs().collect()}
            out[f"index_n_assign_{k}"] = {
                "pairs": len(got),
                "recall": round(len(got & exact) / max(1, len(exact)), 4),
                "wall_s": round(time.time() - t0, 2),
            }
        finally:
            shutil.rmtree(root, ignore_errors=True)
    print(json.dumps(out), flush=True)


def measure_compaction() -> None:
    """r9 (VERDICT r8 #2): N micro-adds accumulate one parquet file per
    touched pairs-bucket/ivf-cell per add; compact() folds them to one
    per partition with zero recompute. Record file counts before/after
    and add wall early vs late vs post-compact (flat)."""
    import shutil
    import tempfile

    from alma_memory_spark.operators.semdedup import SemDedupIndex

    spark = get_spark(cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    n_adds, batch = 100, 100
    base = make_corpus(spark, 2_000).localCheckpoint(eager=True)
    root = tempfile.mkdtemp(prefix="alma_sdidx_compact_")
    try:
        idx = SemDedupIndex.build(
            spark, base, root, threshold=0.85, cent_every=CENT_EVERY,
            n_buckets=16, n_assign=2,
        )

        def files_under(d):
            total = 0
            for _r, _dd, files in os.walk(d):
                total += sum(1 for f in files if f.endswith(".parquet"))
            return total

        walls = []
        for i in range(n_adds):
            b = make_corpus(spark, batch, seed=100 + i).withColumn(
                "vec_id", F.col("vec_id") + F.lit(2_000 + i * batch)
            ).localCheckpoint(eager=True)
            t0 = time.time()
            idx.add(b)
            walls.append(time.time() - t0)
        before = {
            "pairs": files_under(os.path.join(idx.vroot, "pairs")),
            "lists": files_under(os.path.join(idx.ivf.vroot, "lists")),
        }
        t0 = time.time()
        out = idx.compact()
        compact_s = time.time() - t0
        after = {
            "pairs": files_under(os.path.join(out.vroot, "pairs")),
            "lists": files_under(os.path.join(out.ivf.vroot, "lists")),
        }
        b = make_corpus(spark, batch, seed=999).withColumn(
            "vec_id", F.col("vec_id") + F.lit(500_000)
        ).localCheckpoint(eager=True)
        t0 = time.time()
        out.add(b)
        post_wall = time.time() - t0
        print(
            json.dumps(
                {
                    "claim": "compact folds micro-add file debris; add wall flat",
                    "n_micro_adds": n_adds,
                    "files_before": before,
                    "files_after": after,
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




def measure_cell_sweep() -> None:
    """r13 (VERDICT r12 #1): cent_every sweep at the 32x-chain-like
    scale — wall + pairs + RECALL vs exact all-pairs ground truth.

    The r12 chain's 32x leg had semdedup at 57% of chain wall with the
    default cent_every=50 on ~141k vectors; the auto_cent_every
    analysis says assignment (n x n_cells x dim) dominated there and
    balances against the pair stage at occupancy = sqrt(n). This sweep
    verifies both claims empirically: wall should bottom out near
    sqrt(n), and recall should be monotone-ish INCREASING with
    occupancy (larger cells catch more boundary pairs). Ground truth
    is the driver-side exact threshold all-pairs (blocked numpy
    matmul) — feasible at 64k (2e9 pair sims)."""
    n = int(os.environ.get("SEMDEDUP_SWEEP_N", "64000"))
    thr = 0.85
    spark = get_spark(cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    emb = make_corpus(spark, n).localCheckpoint(eager=True)

    # exact ground truth, blocked driver-side
    rows = emb.orderBy("vec_id").collect()
    V = np.array([r["embedding"] for r in rows], dtype=np.float64)
    V /= np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-300)
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    exact = set()
    B = 4096
    t0 = time.time()
    for i0 in range(0, n, B):
        S = V[i0 : i0 + B] @ V.T
        S = np.round(S, 6)
        ai, bi = np.nonzero(S >= thr)
        for a, b in zip(ai, bi):
            ga, gb = ids[i0 + a], ids[b]
            if ga < gb:
                exact.add((int(ga), int(gb)))
    gt_wall = time.time() - t0
    print(json.dumps({"sweep_n": n, "exact_pairs": len(exact),
                      "ground_truth_wall_s": round(gt_wall, 1)}), flush=True)

    from alma_memory_spark.operators.semdedup import auto_cent_every

    auto = auto_cent_every(n)
    for ce in sorted({25, 50, 100, auto, 500, 1000}):
        t0 = time.time()
        got = {
            (min(r["id_a"], r["id_b"]), max(r["id_a"], r["id_b"]))
            for r in semantic_dedup_pairs(
                emb, threshold=thr, cent_every=ce
            ).collect()
        }
        wall = time.time() - t0
        print(
            json.dumps(
                {
                    "cent_every": ce,
                    "auto": ce == auto,
                    "wall_s": round(wall, 2),
                    "pairs": len(got),
                    "recall": round(len(got & exact) / max(1, len(exact)), 4),
                    "false_pairs": len(got - exact),
                }
            ),
            flush=True,
        )
    emb.unpersist()




if __name__ == "__main__":
    main()
    measure_incremental()
    measure_pairs_history()
    measure_multiprobe()
    measure_index_multiprobe()
    measure_compaction()
    measure_cell_sweep()
