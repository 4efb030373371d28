"""Real-dataset dry-run tests: `pytest -m realdata` runs the actual
LongMemEval / LoCoMo loaders end-to-end whenever the environment points
at a real file, and SKIPS otherwise — the hook that makes parity
runnable the day a dataset lands (the fixture-pinned format tests in
test_ir_benchmark.py cover the parsers continuously either way).

Point at the files with:
    ALMA_REALDATA_LONGMEM=/path/longmemeval_s.json pytest -m realdata
    ALMA_REALDATA_LOCOMO=/path/locomo10.json pytest -m realdata
"""

import os

import pytest

LONGMEM = os.environ.get("ALMA_REALDATA_LONGMEM")
LOCOMO = os.environ.get("ALMA_REALDATA_LOCOMO")


@pytest.mark.realdata
@pytest.mark.skipif(
    not (LONGMEM and os.path.isfile(LONGMEM)),
    reason="set ALMA_REALDATA_LONGMEM to a real longmemeval json",
)
def test_longmemeval_real_file(spark):
    from alma_memory_spark.benchmarks.longmem import load_longmemeval, run_benchmark

    corpus = load_longmemeval(spark, LONGMEM, limit=50)
    assert corpus.questions, "no questions parsed"
    assert corpus.sessions.count() > 0
    for q in corpus.questions:
        assert q["question_id"] and q["gold_session_ids"]
    metrics, _ = run_benchmark(spark, corpus, top_k=50)
    assert 0.0 <= metrics.recall_at_k[5] <= 1.0
    assert 0.0 <= metrics.mrr <= 1.0


@pytest.mark.realdata
@pytest.mark.skipif(
    not (LOCOMO and os.path.isfile(LOCOMO)),
    reason="set ALMA_REALDATA_LOCOMO to a real locomo json",
)
@pytest.mark.parametrize("granularity", ["session", "turn"])
def test_locomo_real_file(spark, granularity):
    from alma_memory_spark.benchmarks.longmem import load_locomo, run_benchmark

    corpus = load_locomo(spark, LOCOMO, granularity=granularity, limit=3)
    assert corpus.questions, "no questions parsed"
    assert corpus.sessions.count() > 0
    metrics, _ = run_benchmark(spark, corpus, top_k=50)
    assert 0.0 <= metrics.recall_at_k[5] <= 1.0


@pytest.mark.realdata
@pytest.mark.skipif(
    not (LONGMEM and os.path.isfile(LONGMEM)),
    reason="set ALMA_REALDATA_LONGMEM to a real longmemeval json",
)
def test_realdata_cli_prints_one_json_line(capsys):
    import json

    from alma_memory_spark.benchmarks.__main__ import main

    assert main(["--dataset", LONGMEM, "--limit", "20"]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    payload = json.loads(out[-1])
    assert payload["n_questions"] > 0
