"""Benchmark runner: executes the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec",
 "queries": {name: sec, ...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from alma_memory_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").split("sf")[-1]

    spark = get_spark("alma-bench", cpus=cpus)

    from alma_memory_spark.plans.registry import QUERIES

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    # Warm the JVM + parquet footers once with a trivial action, and the
    # Python-worker pool + Arrow serialization path (several queries use
    # pandas_udf/mapInPandas; without this the FIRST such query absorbs
    # the whole pool's cold start and the per-query numbers mislead).
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    try:
        spark.range(cpus * 4).repartition(cpus).mapInPandas(
            lambda it: (pdf for pdf in it), "id long"
        ).count()
    except Exception:
        pass  # warmup must never cost the round

    for name, spec in QUERIES.items():
        t0 = time.perf_counter()
        try:
            spec.fn(spark, sf_dir).count()  # force full execution
            timings[name] = round(time.perf_counter() - t0, 4)
        except Exception as e:  # one broken query must not cost the round
            errors[name] = str(e)[:200]

    total = round(sum(timings.values()), 4)
    payload = {
        "metric": "alma_memory_spark_bench_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    if errors:
        payload["errors"] = errors
    print(json.dumps(payload))
    spark.stop()


if __name__ == "__main__":
    main()
