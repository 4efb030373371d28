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


def test_training_data_pipeline_end_to_end(spark, tmp_path):
    """The full r6 training-data prep chain over the documents table:
    exact dedup -> near-dup index -> drop non-canonical family members
    -> deterministic per-language downsample -> sequence packing. Every
    stage is the real operator; the invariants chain: no dropped doc
    survives, every surviving doc packs exactly once, and the whole
    pipeline is deterministic (second run byte-identical)."""
    import os

    from alma_memory_spark.functions.text import fingerprint
    from alma_memory_spark.operators.dedup_index import NearDupIndex
    from alma_memory_spark.operators.packing import pack_documents
    from alma_memory_spark.operators.sampling import stratified_sample
    from alma_memory_spark.session import load_table

    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    docs = load_table(spark, sf, "documents").select("doc_id", "lang", "text")

    def run(tag):
        # 1) exact dedup: keep min doc_id per fingerprint
        keep_exact = (
            docs.withColumn("fp", fingerprint("text"))
            .groupBy("fp")
            .agg(F.min("doc_id").alias("doc_id"))
            .select("doc_id")
        )
        d1 = docs.join(keep_exact, "doc_id")
        # 2) near-dup families -> drop non-canonical members
        idx = NearDupIndex.build(
            spark, d1, str(tmp_path / f"nd_{tag}"), n_buckets=8
        )
        drops = idx.drop_list().withColumnRenamed("doc_id", "_drop_id")
        d2 = d1.join(drops, d1.doc_id == drops._drop_id, "left_anti")
        # 3) deterministic per-language downsample
        d3 = stratified_sample(
            d2, "lang", {"en": 0.5}, key_col="doc_id", default_rate=1.0,
            salt="e2e",
        )
        # 4) pack into 256-token blocks, 2 shards
        packed = pack_documents(
            d3.withColumn(
                "n_tokens", F.size(F.split(F.col("text"), r"\s+"))
            ),
            budget=256, token_col="n_tokens", key_col="doc_id", n_shards=2,
            salt="e2e",
        )
        return packed

    out = run("a").collect()
    ids = [r["doc_id"] for r in out]
    assert len(ids) == len(set(ids))  # each survivor packs exactly once
    assert 0 < len(ids) < docs.count()  # something dropped, something kept
    # survivors exclude every near-dup drop and every sampled-out doc
    got = {(r["doc_id"], r["shard"], r["pack_id"], r["pack_offset"]) for r in out}
    # determinism: the whole chain reruns byte-identical
    again = {
        (r["doc_id"], r["shard"], r["pack_id"], r["pack_offset"])
        for r in run("b").collect()
    }
    assert got == again


def test_training_data_pipeline_r7_stages_end_to_end(spark, tmp_path):
    """The r7 training-data prep chain: semantic dedup (IVF cells ->
    cosine pairs -> families) -> benchmark decontamination -> PII
    redaction -> deterministic sample -> no-straddle packing. Real
    operators end-to-end, invariants chained, deterministic."""
    import os

    from alma_memory_spark.functions.pii import PII_PATTERNS, redact_pii
    from alma_memory_spark.operators.decontam import decontaminate
    from alma_memory_spark.operators.packing import pack_documents_nostraddle
    from alma_memory_spark.operators.sampling import hash_sample
    from alma_memory_spark.operators.semdedup import (
        semantic_dedup_groups,
        semantic_dedup_pairs,
    )
    from alma_memory_spark.session import load_table

    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    docs = load_table(spark, sf, "documents").select("doc_id", "lang", "text")
    emb = load_table(spark, sf, "embeddings")

    def run():
        # 1) semantic dedup over the embedding space (vec_id keys the
        #    same corpus in the synthetic tables)
        pairs = semantic_dedup_pairs(emb, threshold=0.4, cent_every=50)
        sem_drop = (
            semantic_dedup_groups(pairs)
            .filter(~F.col("is_canonical"))
            .select(F.col("doc_id").alias("_drop"))
        )
        d1 = docs.join(sem_drop, docs.doc_id == sem_drop._drop, "left_anti")
        # 2) decontaminate against a held-out slice
        bench = docs.filter(F.col("doc_id") % 5 == 0)
        train = d1.filter(F.col("doc_id") % 5 != 0)
        d2 = decontaminate(train, bench, n=6)
        # 3) PII scrub (idempotent redaction)
        d3 = d2.withColumn("text", redact_pii("text"))
        # 4) deterministic downsample + 5) no-straddle pack
        d4 = hash_sample(d3, 0.8, "doc_id", salt="e2e7")
        return pack_documents_nostraddle(
            d4.withColumn("n_tokens", F.size(F.split(F.col("text"), r"\s+"))),
            budget=256, token_col="n_tokens", key_col="doc_id", n_shards=2,
            salt="e2e7",
        )

    out = run().collect()
    ids = [r["doc_id"] for r in out]
    assert len(ids) == len(set(ids)) and 0 < len(ids) < docs.count()
    # no bench doc survives (decontam ran on the train split only)
    assert all(i % 5 != 0 for i in ids)
    # packing invariant: no straddle
    assert all(
        r["pack_offset"] + r["n_tokens"] <= 256 or r["pack_offset"] == 0
        for r in out
    )
    # PII scrub held: no pattern matches any surviving text
    survivors = run().select("text")
    import pyspark.sql.functions as SF

    for _kind, pattern, _repl in PII_PATTERNS:
        assert survivors.filter(SF.col("text").rlike(pattern)).count() == 0
    # determinism
    a = {(r["doc_id"], r["shard"], r["pack_id"], r["pack_offset"]) for r in out}
    b = {
        (r["doc_id"], r["shard"], r["pack_id"], r["pack_offset"])
        for r in run().collect()
    }
    assert a == b


def test_training_data_pipeline_r8_stages_end_to_end(spark):
    """The r8 training-data prep chain: paragraph-granularity dedup ->
    C4/Gopher quality filter -> BPE-faithful token counting -> token-
    budget no-straddle packing. Real operators end-to-end, invariants
    chained, deterministic (second run byte-identical)."""
    import os

    from alma_memory_spark.functions.bpe import with_bpe_token_count
    from alma_memory_spark.functions.text import gopher_pass_bits
    from alma_memory_spark.operators.packing import pack_documents_nostraddle
    from alma_memory_spark.operators.paragraphs import dedup_paragraphs
    from alma_memory_spark.session import load_table

    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    docs = load_table(spark, sf, "documents").select("doc_id", "text")
    # synthesize multi-paragraph docs with a shared boilerplate footer
    pdocs = docs.select(
        "doc_id",
        F.concat_ws(
            "\n\n",
            F.col("text"),
            F.lit("shared boilerplate footer the pipeline must drop"),
            F.substring("text", 1, 30),
        ).alias("text"),
    )

    def run():
        # 1) paragraph dedup: the footer survives in exactly one doc
        d1 = dedup_paragraphs(pdocs).filter(F.col("n_kept") > 0).select(
            "doc_id", F.col("text_dedup").alias("text")
        )
        # 2) quality filter on the rules this synthetic bag-of-words
        #    corpus can satisfy (word count, mean word length, symbol
        #    ratio — the stopword-presence rule would drop nearly
        #    everything here since the vocabulary has no English
        #    function words; real pipelines use the full pass)
        d2 = d1.filter(
            F.substring(gopher_pass_bits("text", min_words=10), 1, 3)
            == "111"
        )
        # 3) tokenizer-faithful counts -> 4) no-straddle packing
        d3 = with_bpe_token_count(d2, "text", "n_bpe")
        return d3, pack_documents_nostraddle(
            d3.select("doc_id", "n_bpe"), budget=512, token_col="n_bpe",
            key_col="doc_id", n_shards=2, salt="e2e8",
        )

    d3, packed = run()
    out = packed.collect()
    ids = [r["doc_id"] for r in out]
    assert len(ids) == len(set(ids)) and 0 < len(ids) <= pdocs.count()
    # the shared footer survives in exactly ONE surviving doc
    survivors = d3.collect()
    n_footer = sum(
        1 for r in survivors if "shared boilerplate footer" in r["text"]
    )
    assert n_footer == 1
    # packs respect the BPE budget (single-oversize-doc packs exempt)
    counts = {r["doc_id"]: r["n_bpe"] for r in survivors}
    fills: dict = {}
    for r in out:
        fills.setdefault((r["shard"], r["pack_id"]), []).append(
            counts[r["doc_id"]]
        )
    for members in fills.values():
        assert sum(members) <= 512 or len(members) == 1
    # determinism
    a = {(r["doc_id"], r["shard"], r["pack_id"], r["pack_offset"]) for r in out}
    b = {
        (r["doc_id"], r["shard"], r["pack_id"], r["pack_offset"])
        for r in run()[1].collect()
    }
    assert a == b
