"""Capture .explain("formatted") for every registry query.

Usage: python scripts/capture_plans.py <outdir> <suffix> [name ...]

Writes <outdir>/<query>_<suffix>.txt for each declared query (or only
the named ones). The r14 optimization round commits before/after pairs
under plans/r14/ so plan-shape claims in OPTIMIZATION_r14.md are
checkable without running Spark.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from alma_memory_spark.session import get_spark  # noqa: E402


def main() -> None:
    outdir = sys.argv[1]
    suffix = sys.argv[2]
    only = set(sys.argv[3:])
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("alma-plans", cpus=cpus)

    from alma_memory_spark.plans import registry
    from alma_memory_spark.plans.registry import QUERIES

    def _explain_to(df, path: str) -> None:
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {path}", file=sys.stderr)

    # r15 (VERDICT r14 #8): gates that run their pipeline against a
    # per-call temp store materialize before returning, so the DECLARED
    # frame is a LocalTableScan and its explain is vacuous. Those gates
    # call registry.probe_plan(gate, stage, df) right before the
    # materializing collect; installing this probe captures the REAL
    # pre-materialization plan as <gate>__<stage>_<suffix>.txt.
    def _probe(gate: str, stage: str, df) -> None:
        if only and gate not in only:
            return
        _explain_to(df, os.path.join(outdir, f"{gate}__{stage}_{suffix}.txt"))

    registry.PLAN_PROBE = _probe
    try:
        for name, spec in QUERIES.items():
            if only and name not in only:
                continue
            path = os.path.join(outdir, f"{name}_{suffix}.txt")
            try:
                df = spec.fn(spark, sf_dir)
                _explain_to(df, path)
            except Exception as e:  # capture must never abort the sweep
                with open(path, "w") as fh:
                    fh.write(f"ERROR: {e}\n")
                print(f"ERROR {name}: {e}", file=sys.stderr)
            try:
                spark.catalog.clearCache()
            except Exception:
                pass
    finally:
        registry.PLAN_PROBE = None
    spark.stop()


if __name__ == "__main__":
    main()
