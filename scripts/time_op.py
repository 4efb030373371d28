"""Isolation timer for single operators/gates (guide §1: noop sink,
median of N runs, cache cleared between runs).

Usage: python scripts/time_op.py <what> [runs]

<what> names a timing target registered in TARGETS below (small
lambdas over the sf dir from $SPARK_GRAFT_SF_DIR) or a registry gate
name prefixed with 'gate:'.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from alma_memory_spark.session import get_spark, load_table  # noqa: E402

_CLK = os.sysconf("SC_CLK_TCK")


def pgroup_cpu_seconds() -> float:
    """Total user+sys CPU seconds consumed so far by every live process
    in this session's process group (driver python, the local-mode JVM,
    reused Python workers). Neighbor-VM contention inflates WALL by
    3-10x on this host but leaves consumed-CPU nearly untouched, so
    optimization A/Bs compare CPU deltas first and walls second."""
    me = os.getpid()
    try:
        pgid = os.getpgid(me)
    except OSError:
        return 0.0
    total = 0.0
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/stat") as fh:
                parts = fh.read().rsplit(")", 1)[1].split()
            # fields after comm: state(0) ppid(1) pgrp(2) ... utime(11)
            # stime(12) cutime(13) cstime(14)
            if int(parts[2]) != pgid:
                continue
            total += (int(parts[11]) + int(parts[12])) / _CLK
        except (OSError, IndexError, ValueError):
            continue
    return total


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def _sub(spark, sf_dir):
    from alma_memory_spark.operators.substring import dedup_token_windows

    d = _docs(spark, sf_dir)
    aug = F.concat_ws(
        " ", F.substring("text", 1, 50),
        F.lit("the quick brown fox jumps over the lazy dog again and again"),
        F.substring("text", 8, 40),
    )
    return dedup_token_windows(d.select("doc_id", aug.alias("text")), w=12)


def _contamx(spark, sf_dir):
    from alma_memory_spark.operators.decontam import decontaminate_spans

    d = _docs(spark, sf_dir)
    return decontaminate_spans(
        d.filter(F.col("doc_id") % 5 != 0),
        d.filter(F.col("doc_id") % 5 == 0),
        n=13,
    )


def _sub16(spark, sf_dir):
    """dedup_token_windows at w=12 over a 16x replicated corpus with a
    shared boilerplate span (the measure_substring.py geometry) — the
    scale-shaped A/B target for the winners/losers join work."""
    from alma_memory_spark.operators.substring import dedup_token_windows

    d = _docs(spark, sf_dir)
    boiler = "shared boilerplate token span repeated across every document here"
    parts = []
    for r in range(16):
        parts.append(
            d.select(
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
                    F.lit(boiler + f" tag{r}"),
                    F.substring("text", 1, 60),
                ).alias("text"),
            )
        )
    rep = parts[0]
    for p in parts[1:]:
        rep = rep.unionByName(p)
    return dedup_token_windows(rep, w=12, fp_hash="xxhash64")


def _para16(spark, sf_dir):
    """dedup_paragraphs over a 16x replicated corpus where every doc
    shares one boilerplate paragraph and repeats part of itself — the
    scale-shaped A/B target for the keep-first join geometry."""
    from alma_memory_spark.operators.paragraphs import dedup_paragraphs

    d = _docs(spark, sf_dir)
    boiler = "Standard footer paragraph shared by every page in the corpus."
    parts = []
    for r in range(16):
        parts.append(
            d.select(
                (F.col("doc_id") + r * 1_000_000).alias("doc_id"),
                F.concat_ws(
                    "\n\n",
                    F.concat(F.col("text"), F.lit(f" v{r}")),
                    F.lit(boiler),
                    F.substring("text", 1, 40),
                    F.concat(F.substring("text", 1, 40), F.lit(f" u{r}")),
                ).alias("text"),
            )
        )
    rep = parts[0]
    for p in parts[1:]:
        rep = rep.unionByName(p)
    return dedup_paragraphs(rep)


def _exact16(spark, sf_dir):
    """drop_exact_duplicates over a 16x replicated corpus where 4 of
    every 16 replicas are byte-identical (one 4-copy family per doc)
    and the rest unique — the scale-shaped A/B target for the keep
    join geometry (dup mass ~25%, realistic for a raw web crawl)."""
    from alma_memory_spark import pipeline as P

    d = _docs(spark, sf_dir)
    parts = []
    for r in range(16):
        tag = "" if r < 4 else f" v{r}"
        parts.append(
            d.select(
                (F.col("doc_id") + r * 1_000_000).alias("doc_id"),
                F.concat(F.col("text"), F.lit(tag)).alias("text"),
            )
        )
    rep = parts[0]
    for p in parts[1:]:
        rep = rep.unionByName(p)
    return P.drop_exact_duplicates(rep)


def _tfidf(spark, sf_dir):
    """The gate's full TF-IDF score table, constructed FRESH per call
    (the registry gate is memo=True so env toggles can't reach it
    through ab_op) — the r15 A/B target for the narrow idf share
    (ALMA_TFIDF_SHARE)."""
    from alma_memory_spark.plans.text_queries import tfidf_scores_df

    return tfidf_scores_df(spark, sf_dir)


def _tfidf16(spark, sf_dir):
    """Operator-library tfidf_scores over a 16x replicated corpus with
    per-copy token salting — the scale-shaped arm of the idf-share A/B
    (vocab grows 16x, the exploded stream 16x)."""
    from alma_memory_spark.operators.text_search import tfidf_scores

    d = _docs(spark, sf_dir)
    parts = []
    for r in range(16):
        parts.append(
            d.select(
                (F.col("doc_id") + r * 1_000_000).alias("doc_id"),
                F.concat(F.col("text"), F.lit(f" salt{r} copyvar {r}")).alias(
                    "text"
                ),
            )
        )
    rep = parts[0]
    for p in parts[1:]:
        rep = rep.unionByName(p)
    return tfidf_scores(rep, "spark query engine fast join", id_col="doc_id")


TARGETS = {
    "sub": _sub,
    "sub16": _sub16,
    "para16": _para16,
    "exact16": _exact16,
    "contamx": _contamx,
    "tfidf": _tfidf,
    "tfidf16": _tfidf16,
}


def main() -> None:
    what = sys.argv[1]
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("alma-timeop", cpus=cpus)
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    try:
        spark.range(cpus * 4).repartition(cpus).mapInPandas(
            lambda it: (pdf for pdf in it), "id long"
        ).count()
    except Exception:
        pass

    if what.startswith("gate:"):
        from alma_memory_spark.plans.registry import QUERIES

        fn = QUERIES[what[5:]].fn
    else:
        fn = TARGETS[what]

    walls, cpus_used = [], []
    for i in range(runs):
        spark.sparkContext.setJobDescription(f"{what} run {i}")
        c0 = pgroup_cpu_seconds()
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        walls.append(round(time.perf_counter() - t0, 4))
        cpus_used.append(round(pgroup_cpu_seconds() - c0, 2))
        spark.catalog.clearCache()
        import gc

        gc.collect()
    print(
        f"{what}: wall_median={statistics.median(walls)} min={min(walls)} "
        f"runs={walls}\n"
        f"{what}: cpu_median={statistics.median(cpus_used)} "
        f"cpu_runs={cpus_used}",
        file=sys.stderr,
    )
    spark.stop()


if __name__ == "__main__":
    main()
