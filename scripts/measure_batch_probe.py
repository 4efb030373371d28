"""Profile IVF search_batch: plan-CONSTRUCTION vs EXECUTION cost per
kernel and batch size (VERDICT r13 #3 — is py4j frame construction the
batch floor, as it was for single-query serving in r13?).

For each (kernel, batch size): build a fresh batch of distinct query
vectors, time (a) the search_batch()/SQL-probe call itself — pure
driver-side plan construction, zero jobs — and (b) the noop-sink
execution of the returned frame. Medians over N repeats, process-group
CPU seconds alongside walls (host contention inflates walls only).

Usage: python scripts/measure_batch_probe.py [repeats]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from alma_memory_spark.session import get_spark  # noqa: E402
from scripts.time_op import pgroup_cpu_seconds  # noqa: E402


def main() -> None:
    n_rep = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    import tempfile

    from alma_memory_spark.embedding import hash_embed
    from alma_memory_spark.operators.ann_index import IVFIndex

    spark = get_spark("measure-batch-probe", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="alma_batch_probe_")

    dim = 64
    n_vec = 4000
    rows = [(i, hash_embed(f"corpus doc {i}", dim)) for i in range(n_vec)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    IVFIndex.build(spark, df, root, cent_every=125)  # ~32 cells
    idx = IVFIndex.load(spark, root)

    # warm both kernels' shapes once
    for kern in ("arrow", "jvm"):
        idx.search_batch(
            [(f"w{i}", hash_embed(f"warm {i}", dim)) for i in range(4)],
            k=10, nprobe=3, kernel=kern,
        ).write.format("noop").mode("overwrite").save()

    # warm the sql-text shape too
    sub = idx.search_batch_sql_subquery(
        [(f"ws{i}", hash_embed(f"warmsql {i}", dim)) for i in range(4)],
        k=10, nprobe=3,
    )
    spark.sql(f"SELECT * FROM {sub} AS c").write.format("noop").mode(
        "overwrite"
    ).save()

    print("kernel batch construct_ms exec_ms total_ms ms_per_task cpu_s")
    for kern in ("arrow", "jvm", "sql"):
        for bs in (4, 8, 32):
            cons, execs, cpus = [], [], []
            for r in range(n_rep):
                qs = [
                    (f"q{r}_{i}", hash_embed(f"probe {kern} {bs} {r} {i}", dim))
                    for i in range(bs)
                ]
                c0 = pgroup_cpu_seconds()
                t0 = time.perf_counter()
                if kern == "sql":
                    sub = idx.search_batch_sql_subquery(qs, k=10, nprobe=3)
                    frame = spark.sql(f"SELECT * FROM {sub} AS c")
                else:
                    frame = idx.search_batch(qs, k=10, nprobe=3, kernel=kern)
                t1 = time.perf_counter()
                frame.write.format("noop").mode("overwrite").save()
                t2 = time.perf_counter()
                cons.append((t1 - t0) * 1000)
                execs.append((t2 - t1) * 1000)
                cpus.append(pgroup_cpu_seconds() - c0)
            cm = statistics.median(cons)
            em = statistics.median(execs)
            print(
                f"{kern} {bs} {cm:.1f} {em:.1f} {cm+em:.1f} "
                f"{(cm+em)/bs:.2f} {statistics.median(cpus):.2f}"
            )
    spark.stop()


if __name__ == "__main__":
    main()
