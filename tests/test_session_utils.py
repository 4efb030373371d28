"""Session-level utilities: DDL schema-name parsing, the tiny_df Arrow
fast path, and the concurrent table-cache guard (ADVICE r5)."""

import threading

from alma_memory_spark import session as S


def test_schema_field_names_nesting():
    assert S._schema_field_names("a long, b array<double>") == ["a", "b"]
    # '(' must nest like '<': decimal(10,2)'s comma is NOT a separator
    assert S._schema_field_names("a decimal(10,2), b string") == ["a", "b"]
    assert S._schema_field_names(
        "m map<string,decimal(10,2)>, s struct<x:int,y:decimal(3,1)>, z int"
    ) == ["m", "s", "z"]
    assert S._schema_field_names("only decimal(38,18)") == ["only"]


def test_tiny_df_decimal_schema_fast_path(spark):
    """With parenthesized type args the column list used to mis-split,
    always tripping tiny_df's silent fallback to the slow Python-RDD
    path; the names must now parse so dict rows map correctly and the
    plan stays a JVM-side local scan."""
    from decimal import Decimal

    rows = [
        {"amt": Decimal("1.25"), "tag": "x"},
        {"amt": Decimal("3.5"), "tag": "y"},
    ]
    df = S.tiny_df(spark, rows, "amt decimal(10,2), tag string")
    got = {(str(r["amt"]), r["tag"]) for r in df.collect()}
    assert got == {("1.25", "x"), ("3.50", "y")}
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "LocalRelation" in plan or "LocalTableScan" in plan, plan


def test_tiny_df_tuple_rows_still_work(spark):
    df = S.tiny_df(spark, [(1, [0.5, 0.5])], "id long, v array<double>")
    r = df.collect()[0]
    assert r["id"] == 1 and r["v"] == [0.5, 0.5]


def test_table_cache_eviction_is_thread_safe(spark, sf_dir):
    """Pre-fill the cache past the app cap with fake app entries, then
    hammer load_table from threads: every call must return a usable
    plan and no eviction may raise (the unlocked pop(next(iter(..)))
    raced into KeyError)."""
    for i in range(6):
        S._TABLE_CACHE[f"fake-app-{i}"] = {("d", "t"): object()}
    errs = []

    def worker():
        try:
            for _ in range(5):
                df = S.load_table(spark, sf_dir, "region")
                assert df.count() >= 1
        except Exception as e:  # pragma: no cover - failure path
            errs.append(e)

    threads = [threading.Thread(target=worker) for _ in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs, errs
    # the LIVE app's entry survived the evictions
    app = spark.sparkContext.applicationId
    assert (sf_dir, "region") in S._TABLE_CACHE.get(app, {})
