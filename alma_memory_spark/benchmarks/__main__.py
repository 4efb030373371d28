"""Real-dataset benchmark CLI — the dry-run hook for the day an actual
LongMemEval / LoCoMo file lands in the environment.

Usage:
    python -m alma_memory_spark.benchmarks --dataset /path/longmemeval_s.json
    python -m alma_memory_spark.benchmarks --dataset /path/locomo10.json \
        --format locomo --granularity turn
    python -m alma_memory_spark.benchmarks --dataset d.json --flb --rounds 3

Prints ONE JSON line with R@K / MRR / NDCG (and per-round feedback-
learning numbers with --flb), mirroring the reference runners
(reference: benchmarks/longmemeval/runner.py, benchmarks/
feedback_learning/runner.py). The loaders themselves are fixture-pinned
in tests/test_ir_benchmark.py; `pytest -m realdata` exercises them on a
real file when ALMA_REALDATA_LONGMEM / ALMA_REALDATA_LOCOMO point at
one, and skips otherwise.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="python -m alma_memory_spark.benchmarks")
    p.add_argument("--dataset", required=True, help="path to the dataset JSON")
    p.add_argument(
        "--format",
        choices=["longmemeval", "locomo"],
        default=None,
        help="dataset format (default: inferred from filename, else longmemeval)",
    )
    p.add_argument(
        "--granularity",
        choices=["session", "turn"],
        default="session",
        help="LoCoMo corpus granularity",
    )
    p.add_argument("--top-k", type=int, default=50)
    p.add_argument("--limit", type=int, default=None, help="cap questions/convs")
    p.add_argument("--flb", action="store_true", help="also run feedback learning")

    def _positive(v: str) -> int:
        n = int(v)
        if n < 1:
            raise argparse.ArgumentTypeError("rounds must be >= 1")
        return n

    p.add_argument(
        "--rounds", type=_positive, default=3, help="feedback-learning rounds (>= 1)"
    )
    p.add_argument("--weight", type=float, default=0.15, help="feedback weight")
    p.add_argument("--cpus", type=int, default=None)
    args = p.parse_args(argv)

    from alma_memory_spark.benchmarks.longmem import (
        load_locomo,
        load_longmemeval,
        run_benchmark,
    )
    from alma_memory_spark.session import get_spark

    fmt = args.format
    if fmt is None:
        fmt = "locomo" if "locomo" in args.dataset.lower() else "longmemeval"
    spark = get_spark("alma_realdata_bench", cpus=args.cpus)
    if fmt == "locomo":
        corpus = load_locomo(
            spark, args.dataset, granularity=args.granularity, limit=args.limit
        )
    else:
        corpus = load_longmemeval(spark, args.dataset, limit=args.limit)

    metrics, _ = run_benchmark(spark, corpus, top_k=args.top_k)
    out = {
        "dataset": args.dataset,
        "format": fmt,
        "n_questions": len(corpus.questions),
        "n_sessions": corpus.sessions.count(),
        "recall_at_k": {str(k): round(v, 4) for k, v in metrics.recall_at_k.items()},
        "mrr": round(metrics.mrr, 4),
        "ndcg_at_k": {str(k): round(v, 4) for k, v in metrics.ndcg_at_k.items()},
    }
    if args.flb:
        from alma_memory_spark.benchmarks.feedback_learning import (
            run_feedback_learning,
        )

        rounds = run_feedback_learning(
            spark,
            corpus,
            rounds=args.rounds,
            feedback_weight=args.weight,
            top_k=args.top_k,
        )
        out["flb"] = {
            "rounds": [
                {"round": r.round_idx, "recall_at_5": round(r.recall_at_5, 4)}
                for r in rounds
            ],
            "delta_r5": round(rounds[-1].recall_at_5 - rounds[0].recall_at_5, 4),
        }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
