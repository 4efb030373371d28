"""Feedback-learning benchmark + store migration / JSON round-trip."""

from pyspark.sql import functions as F

from alma_memory_spark import schemas
from alma_memory_spark.benchmarks.feedback_learning import run_feedback_learning
from alma_memory_spark.benchmarks.longmem import generate_corpus
from alma_memory_spark.sources.store import ParquetStore
from alma_memory_spark.testing import fixtures as FX


def test_feedback_learning_uplift(spark):
    # the COVERAGE.md regime (LongMemEval-shaped geometry: salted
    # per-question vocabulary, multi-gold multi-session questions)
    corpus = generate_corpus(
        spark, n_questions=96, sessions_per_question=24, n_salt=3, multi_gold=4
    )
    rounds = run_feedback_learning(spark, corpus, rounds=3)
    assert len(rounds) == 4
    base, final = rounds[0].recall_at_5, rounds[-1].recall_at_5
    # weakened retriever leaves headroom; accurate-ish feedback must help
    assert base < 0.6
    assert final - base >= 0.05  # well below the measured +0.084..+0.146


def test_store_migrate_adds_missing_columns(spark, tmp_path):
    store = ParquetStore(spark, str(tmp_path / "s"))
    # write heuristics WITHOUT the verification column (pre-migration shape)
    old = FX.seed_heuristics(spark).drop("verification_status")
    old.write.mode("append").partitionBy("project_id", "agent").parquet(
        str(tmp_path / "s" / "heuristics")
    )
    added = store.migrate("heuristics")
    assert added == ["verification_status"]
    df = store.read("heuristics")
    assert "verification_status" in df.columns
    assert df.filter(F.col("verification_status").isNull()).count() == df.count()
    # idempotent
    assert store.migrate("heuristics") == []


def test_store_json_roundtrip(spark, tmp_path):
    store = ParquetStore(spark, str(tmp_path / "s2"))
    store.append("heuristics", FX.seed_heuristics(spark))
    n = store.read("heuristics").count()
    store.export_json("heuristics", str(tmp_path / "export"))
    store2 = ParquetStore(spark, str(tmp_path / "s3"))
    store2.import_json("heuristics", str(tmp_path / "export"))
    df2 = store2.read("heuristics")
    assert df2.count() == n
    assert dict(df2.dtypes) == dict(
        spark.createDataFrame([], schemas.HEURISTICS).dtypes
    )


def test_overwrite_atomic_no_staging_leak(spark, tmp_path):
    import os

    root = str(tmp_path / "s3")
    store = ParquetStore(spark, root)
    store.append("heuristics", FX.seed_heuristics(spark))
    n = store.read("heuristics").count()
    # upsert triggers overwrite (read-modify-write of the same path)
    store.upsert("heuristics", FX.seed_heuristics(spark).limit(2))
    assert store.read("heuristics").count() == n
    # no staging/old copies accumulate per rewrite
    assert not os.path.isdir(os.path.join(root, "heuristics.staging"))
    assert not os.path.isdir(os.path.join(root, "heuristics.old"))


def test_overwrite_crash_recovery(spark, tmp_path):
    import os

    root = str(tmp_path / "s4")
    store = ParquetStore(spark, root)
    store.append("heuristics", FX.seed_heuristics(spark))
    n = store.read("heuristics").count()
    live = os.path.join(root, "heuristics")
    # simulate a crash between the two swap renames: live dir moved
    # aside, staging never renamed in
    os.rename(live, live + ".old")
    assert store.read("heuristics").count() == n  # _recover() healed it
    assert os.path.isdir(live) and not os.path.isdir(live + ".old")


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """Two tables bucketed on the same key/count must sort-merge join
    with NO Exchange on either side — the co-located-join contract that
    makes id-keyed joins shuffle-free at scale."""
    from pyspark.sql import functions as F

    store = ParquetStore(spark, str(tmp_path / "sb"))
    left = spark.range(1000).select(
        F.col("id").cast("string").alias("id"), (F.col("id") * 2).alias("v")
    )
    right = spark.range(1000).select(
        F.col("id").cast("string").alias("id"), (F.col("id") * 3).alias("w")
    )
    tl = store.write_bucketed("left_t", left, buckets=8)
    tr = store.write_bucketed("right_t", right, buckets=8)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table(tl).join(spark.table(tr), "id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert joined.count() == 1000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql(f"DROP TABLE IF EXISTS {tl}")
        spark.sql(f"DROP TABLE IF EXISTS {tr}")
