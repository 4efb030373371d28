"""Interleaved A/B timing for one operator under an env toggle, in ONE
Spark session — controls for the host's multi-x contention drift
(guide §1: measure, isolate, repeat).

Usage: python scripts/ab_op.py <target> <ENV_VAR> [rounds]

Runs (A, B) pairs `rounds` times, alternating the toggle, reporting
per-arm medians. The toggle env var is read by the operator at plan
construction, so each run rebuilds the plan.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from alma_memory_spark.session import get_spark  # noqa: E402


def main() -> None:
    target = sys.argv[1]
    env_var = sys.argv[2]
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("alma-ab", cpus=cpus)
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    try:
        spark.range(cpus * 4).repartition(cpus).mapInPandas(
            lambda it: (pdf for pdf in it), "id long"
        ).count()
    except Exception:
        pass

    if target.startswith("gate:"):
        from alma_memory_spark.plans.registry import QUERIES

        fn = QUERIES[target[5:]].fn
    else:
        from scripts.time_op import TARGETS  # type: ignore

        fn = TARGETS[target]

    def once(flag: str) -> float:
        os.environ[env_var] = flag
        spark.sparkContext.setJobDescription(f"{target} {env_var}={flag}")
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        spark.catalog.clearCache()
        import gc

        gc.collect()
        return round(dt, 4)

    once("0")  # warm the shape once, uncounted
    a, b = [], []
    for _ in range(rounds):
        a.append(once("0"))
        b.append(once("1"))
    print(
        f"A({env_var}=0): median={statistics.median(a)} runs={a}\n"
        f"B({env_var}=1): median={statistics.median(b)} runs={b}",
        file=sys.stderr,
    )
    spark.stop()


if __name__ == "__main__":
    main()
