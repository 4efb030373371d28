"""Measured scale-up for the round-3/4 index serve paths (SCALE.md).

Builds the persisted text + IVF indexes over 1x / 10x / 100x
replications of sf0.1 documents/embeddings (ids shifted so keys stay
unique) and measures the SERVE path warm (best-of-2): indexed BM25
top-20, IVF top-10 at nprobe=3, with the executed scan's numFiles
metric recorded to prove partition pruning held at each scale. Also
times winnow_neardup_pairs and blend_scoring on a 10x sf dir.

Run:  python scripts/measure_scaleup.py [--skip-gates]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from alma_memory_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def replicate(src: str, dst: str, table: str, copies: int, id_col: str,
              text_col: str | None = None, vec_col: str | None = None) -> None:
    """Write `copies` id-shifted copies of a table. Text and embedding
    columns are lightly varied per copy — exact clones would collapse
    the IVF quantizer's stride-sampled seeds into duplicate centroids
    and make dedup candidate sets unrealistically degenerate."""
    os.makedirs(dst, exist_ok=True)
    shift = duckdb.sql(
        f"select max({id_col}) + 1 from read_parquet('{src}/{table}.parquet')"
    ).fetchone()[0]
    text_sel = (
        f", {text_col} || ' c' || c AS {text_col}" if text_col else ""
    )
    vec_sel = (
        f", list_transform({vec_col}, x -> x + 0.0013 * c * "
        f"sin(x * 37.0)) AS {vec_col}"
        if vec_col
        else ""
    )
    text_sel += vec_sel
    other = duckdb.sql(
        f"select * from read_parquet('{src}/{table}.parquet') limit 0"
    ).columns
    keep = [c for c in other if c not in (id_col, text_col, vec_col)]
    keep_sel = (", " + ", ".join(keep)) if keep else ""
    duckdb.sql(
        f"""
        COPY (
          SELECT {id_col} + c * {shift} AS {id_col}{text_sel}{keep_sel}
          FROM read_parquet('{src}/{table}.parquet'),
               (SELECT unnest(range({copies})) AS c)
        ) TO '{dst}/{table}.parquet' (FORMAT PARQUET)
        """
    )


def scan_num_files(df) -> int | None:
    """AQE-aware executed-scan numFiles sum (run the job first)."""
    acc = {"total": 0, "found": False}

    def walk(node):
        name = node.nodeName()
        if "Scan" in name:
            m = node.metrics()
            if m.contains("numFiles"):
                acc["total"] += m.apply("numFiles").value()
                acc["found"] = True
        if name == "AdaptiveSparkPlan":
            walk(node.executedPlan())
            return
        if "QueryStage" in name:
            walk(node.plan())
            return
        ch = node.children()
        for i in range(ch.size()):
            walk(ch.apply(i))

    walk(df._jdf.queryExecution().executedPlan())
    return acc["total"] if acc["found"] else None


def best2(fn) -> float:
    ts = []
    for _ in range(2):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main() -> None:
    from pyspark.sql import functions as F

    from alma_memory_spark.operators.ann_index import IVFIndex
    from alma_memory_spark.operators.text_index import InvertedTextIndex
    from alma_memory_spark.plans.registry import QUERIES, QUERY_TEXT, QUERY_VEC

    spark = get_spark("scaleup", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    work = tempfile.mkdtemp(prefix="scaleup_")
    out: dict = {}
    try:
        for scale in (1, 10, 100):
            sdir = os.path.join(work, f"x{scale}")
            replicate(SF, sdir, "documents", scale, "doc_id", text_col="text")
            replicate(SF, sdir, "embeddings", scale, "vec_id", vec_col="embedding")
            docs = spark.read.parquet(f"{sdir}/documents.parquet")
            emb = spark.read.parquet(f"{sdir}/embeddings.parquet")
            n_docs, n_vecs = docs.count(), emb.count()

            t0 = time.perf_counter()
            tix = InvertedTextIndex.build(
                spark, docs, os.path.join(sdir, "tix"), id_col="doc_id",
                n_buckets=64,
            )
            t_build_tix = time.perf_counter() - t0
            t_bm25 = best2(lambda: tix.search_bm25(QUERY_TEXT, k=20).collect())
            q = tix.search_bm25(QUERY_TEXT, k=20)  # fresh plan for metrics
            q.collect()
            files_hit = scan_num_files(q)
            total_files = sum(
                1
                for _r, _d, fs in os.walk(os.path.join(tix.vroot, "postings"))
                for f in fs
                if f.endswith(".parquet")
            )

            t0 = time.perf_counter()
            ivf = IVFIndex.build(
                spark, emb, os.path.join(sdir, "ivf"),
                cent_every=max(50, n_vecs // 200),
            )
            t_build_ivf = time.perf_counter() - t0
            t_ivf = best2(lambda: ivf.search(QUERY_VEC, k=10, nprobe=3).collect())
            s = ivf.search(QUERY_VEC, k=10, nprobe=3)  # fresh plan for metrics
            s.collect()
            ivf_files_hit = scan_num_files(s)
            ivf_total = sum(
                1
                for _r, _d, fs in os.walk(os.path.join(ivf.vroot, "lists"))
                for f in fs
                if f.endswith(".parquet")
            )
            out[f"x{scale}"] = {
                "n_docs": n_docs,
                "n_vecs": n_vecs,
                "text_build_s": round(t_build_tix, 2),
                "bm25_serve_s": round(t_bm25, 3),
                "bm25_files": f"{files_hit}/{total_files}",
                "ivf_build_s": round(t_build_ivf, 2),
                "ivf_cells": int(len(ivf.cells)),
                "ivf_serve_s": round(t_ivf, 3),
                "ivf_files": f"{ivf_files_hit}/{ivf_total}",
            }
            print(f"x{scale}: {out[f'x{scale}']}", flush=True)
            spark.catalog.clearCache()

        if "--skip-gates" not in sys.argv:
            # winnow + blend at 10x via the registry (needs the full
            # table set: link the untouched tables in)
            sdir = os.path.join(work, "x10")
            for t in (
                "region nation customer supplier part orders lineitem events"
            ).split():
                os.symlink(f"{SF}/{t}.parquet", f"{sdir}/{t}.parquet")
            for name in ("winnow_neardup_pairs", "blend_scoring"):
                fn = QUERIES[name].fn
                t1 = best2(lambda: fn(spark, SF).collect())
                spark.catalog.clearCache()
                t10 = best2(lambda: fn(spark, sdir).collect())
                spark.catalog.clearCache()
                out[name] = {"sf0.1_s": round(t1, 2), "x10_s": round(t10, 2)}
                print(f"{name}: {out[name]}", flush=True)
        print(json.dumps(out))
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
