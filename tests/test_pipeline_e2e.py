"""End-to-end pipelines: directory ingestion -> distributed encode ->
store -> retrieve; LongMemEval method-parity through the engine API."""

import json

from pyspark.sql import functions as F

from alma_memory_spark.benchmarks.longmem import (
    generate_corpus,
    run_benchmark_via_engine,
)
from alma_memory_spark.engine import AlmaSpark
from alma_memory_spark.sources.ingestion import ingest_directory_to_store


def test_ingest_directory_to_store_and_retrieve(spark, tmp_path):
    src = tmp_path / "exports"
    src.mkdir()
    (src / "notes.txt").write_text(
        "Always use explicit waits when testing async pages; this strategy "
        "works best. " * 6
    )
    (src / "warning.txt").write_text(
        "Never hardcode credentials. Avoid storing secrets in code; it fails "
        "review. " * 6
    )
    (src / "facts.json").write_text(
        json.dumps(
            {
                "mapping": {
                    "a": {
                        "message": {
                            "author": {"role": "user"},
                            "content": {
                                "parts": [
                                    "The system architecture consists of a gateway "
                                    "that uses the auth service. " * 6
                                ]
                            },
                            "create_time": 1.0,
                        }
                    }
                }
            }
        )
    )
    eng = AlmaSpark(spark, str(tmp_path / "store"))
    written = ingest_directory_to_store(spark, str(src), eng.store)
    assert written["heuristics"] >= 1
    assert written["anti_patterns"] >= 1
    assert written["domain_knowledge"] >= 1
    # embeddings were computed by the distributed encode UDF
    dk = eng.store.read("domain_knowledge").collect()
    assert all(len(r["embedding"]) == eng.embedder.dim for r in dk)
    # and the mined memories are retrievable through the engine
    sl = eng.retrieve("gateway auth architecture", agent="miner", project_id="ingested")
    assert sl.domain_knowledge


def test_longmem_via_engine_api(spark, tmp_path):
    eng = AlmaSpark(spark, str(tmp_path / "bench_store"))
    corpus = generate_corpus(spark, n_questions=8, sessions_per_question=8)
    metrics, results = run_benchmark_via_engine(eng, corpus, top_k=10)
    # the engine path must propagate similarity end-to-end (the
    # reference's 0.236->0.964 bug class): near-perfect on this corpus
    assert metrics.recall_at_k[5] >= 0.9
    assert metrics.mrr >= 0.7
    assert all(r.ranked_ids for r in results)
