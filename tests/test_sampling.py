"""Deterministic hash sampling: stability, composability, mixing."""

import os

import pytest

from pyspark.sql import functions as F

from alma_memory_spark.operators.sampling import (
    hash_sample,
    stratified_sample,
    weighted_mix,
)
from alma_memory_spark.session import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _ids(df):
    return {r["doc_id"] for r in df.select("doc_id").collect()}


def test_hash_sample_is_deterministic_and_partition_stable(spark):
    docs = load_table(spark, SF_DIR, "documents")
    a = _ids(hash_sample(docs, 0.3, "doc_id", salt="s1"))
    b = _ids(hash_sample(docs, 0.3, "doc_id", salt="s1"))
    assert a == b
    # stable under repartition — the property df.sample() lacks
    c = _ids(hash_sample(docs.repartition(13), 0.3, "doc_id", salt="s1"))
    assert a == c
    # roughly the requested rate
    n = docs.count()
    assert 0.15 * n < len(a) < 0.45 * n


def test_hash_sample_nests_and_salts_namespace(spark):
    docs = load_table(spark, SF_DIR, "documents")
    half = hash_sample(docs, 0.5, "doc_id", salt="s1")
    tenth = hash_sample(docs, 0.1, "doc_id", salt="s1")
    # same salt: a 10% sample IS a subset of the 50% sample (thresholds
    # nest), so re-sampling a sample never double-randomizes
    assert _ids(tenth) <= _ids(half)
    assert _ids(hash_sample(half, 0.1, "doc_id", salt="s1")) == _ids(tenth)
    # different salt: an independent draw
    other = _ids(hash_sample(docs, 0.5, "doc_id", salt="s2"))
    assert other != _ids(half)
    # rate bounds enforced
    with pytest.raises(ValueError, match="rate"):
        hash_sample(docs, 1.5, "doc_id")


def test_stratified_rates_apply_per_stratum(spark):
    docs = load_table(spark, SF_DIR, "documents")
    out = stratified_sample(
        docs, "lang", {"en": 1.0, "zh": 0.0}, key_col="doc_id",
        default_rate=0.5, salt="t",
    )
    by_lang = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    totals = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert by_lang["en"] == totals["en"]  # rate 1.0 keeps everything
    assert "zh" not in by_lang  # rate 0.0 keeps nothing
    for lang in set(totals) - {"en", "zh"}:  # default 0.5 in between
        assert 0 < by_lang.get(lang, 0) < totals[lang]


def test_weighted_mix_provenance_and_pushdown(spark):
    docs = load_table(spark, SF_DIR, "documents")
    src_num = F.substring("source", 4, 10).cast("long")
    frames = {
        "web": docs.filter(src_num < 10),
        "code": docs.filter(src_num >= 10),
    }
    out = weighted_mix(frames, {"web": 1.0, "code": 0.0}, key_col="doc_id")
    rows = out.collect()
    assert {r["source_name"] for r in rows} == {"web"}
    assert len(rows) == frames["web"].count()
    with pytest.raises(ValueError, match="no weight"):
        weighted_mix(frames, {"web": 1.0}, key_col="doc_id")
    # the per-source keep filter reaches each scan (pushed, not a
    # post-union filter): the optimized plan has a Filter below each
    # union child, and no filter above the Union
    mixed = weighted_mix(frames, {"web": 0.5, "code": 0.5}, key_col="doc_id")
    plan = mixed._jdf.queryExecution().optimizedPlan().toString()
    assert plan.index("Union") < plan.index("Filter")


def test_pack_documents_block_semantics(spark):
    """Deterministic single-shard packing: blocks cut at exact running
    token offsets, docs may straddle a boundary (the GPT-dataloader
    contract), and the assignment is partition-stable."""
    from alma_memory_spark.operators.packing import pack_documents
    from alma_memory_spark.session import tiny_df

    rows = [(1, 300), (2, 300), (3, 100), (4, 500)]
    df = tiny_df(spark, rows, "doc_id long, n_tokens long")
    out = {
        r["doc_id"]: (r["shard"], r["pack_id"], r["pack_offset"])
        for r in pack_documents(
            df, budget=512, token_col="n_tokens", key_col="doc_id"
        ).collect()
    }
    # cum_prev: 0, 300, 600, 700
    assert out == {
        1: (0, 0, 0),
        2: (0, 0, 300),   # straddles the 512 boundary
        3: (0, 1, 88),    # 600 -> block 1, offset 88
        4: (0, 1, 188),
    }
    # partition-stable (content-derived order + shard)
    out2 = {
        r["doc_id"]: (r["shard"], r["pack_id"], r["pack_offset"])
        for r in pack_documents(
            df.repartition(7), budget=512, token_col="n_tokens",
            key_col="doc_id",
        ).collect()
    }
    assert out2 == out

    import pytest as _pytest

    with _pytest.raises(ValueError, match="budget"):
        pack_documents(df, budget=0, token_col="n_tokens", key_col="doc_id")


def test_pack_documents_shards_bound_the_window(spark):
    """n_shards > 1: each shard owns an independent token stream (block
    ids restart per shard), and the plan's window partitions by shard —
    no single-partition global sort."""
    from alma_memory_spark.operators.packing import pack_documents
    from alma_memory_spark.session import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", F.length("text").alias("n_tokens")
    )
    out = pack_documents(
        docs, budget=1000, token_col="n_tokens", key_col="doc_id",
        n_shards=4,
    )
    rows = out.collect()
    assert {r["shard"] for r in rows} == {0, 1, 2, 3}
    # every shard starts its own stream at block 0 / offset 0
    for s in range(4):
        first = min(
            (r for r in rows if r["shard"] == s), key=lambda r: r["doc_id"]
        )
        assert (first["pack_id"], first["pack_offset"]) == (0, 0)
    # the window partitions by shard (per-shard bounded sort, not the
    # single-partition global-window shape WindowExec warns about)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan and "shard" in plan


def test_threshold_rounds_instead_of_truncating(spark):
    """Pinned (ADVICE r6): 0.29 * 1e6 lands one ulp under 290000;
    int() truncation would cut the keep set one bucket below both the
    documented rate and the DuckDB oracle's hard-coded round number."""
    from alma_memory_spark.operators.sampling import _thresh, sql_hash_keep

    for rate, want in [(0.29, 290000), (0.57, 570000), (0.1, 100000), (1.0, 1000000)]:
        assert _thresh(rate) == want
        assert f"< {want}" in sql_hash_keep("doc_id", rate)
    # Spark side and SQL predicate agree for a truncation-prone rate
    import duckdb

    docs = load_table(spark, SF_DIR, "documents").select("doc_id")
    kept = _ids(hash_sample(docs, 0.29, "doc_id"))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF_DIR}/documents.parquet')"
    )
    oracle = {
        r[0]
        for r in con.execute(
            f"SELECT doc_id FROM documents WHERE {sql_hash_keep('doc_id', 0.29)}"
        ).fetchall()
    }
    assert kept == oracle


def test_nostraddle_packing_invariants(spark):
    """Next-fit no-straddle: no block exceeds the budget, no doc
    straddles (offset + tokens <= budget unless the doc alone is
    oversize), block ids are dense per shard, and the assignment is
    partition-stable."""
    from alma_memory_spark.operators.packing import pack_documents_nostraddle

    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", F.length("text").alias("n_tokens")
    )
    out = pack_documents_nostraddle(
        docs, budget=1000, token_col="n_tokens", key_col="doc_id", n_shards=4
    )
    rows = out.collect()
    assert {r["shard"] for r in rows} == {0, 1, 2, 3}
    fills: dict = {}
    for r in rows:
        key = (r["shard"], r["pack_id"])
        fills[key] = fills.get(key, 0) + r["n_tokens"]
        # no straddle: a doc fits entirely, or owns an oversize block
        assert r["pack_offset"] + r["n_tokens"] <= 1000 or r["pack_offset"] == 0
    for (s, b), tot in fills.items():
        assert tot <= 1000 or sum(1 for r in rows if (r["shard"], r["pack_id"]) == (s, b)) == 1
    # dense per-shard block ids starting at 0
    for s in range(4):
        blocks = sorted({r["pack_id"] for r in rows if r["shard"] == s})
        assert blocks == list(range(len(blocks)))
    again = pack_documents_nostraddle(
        docs.repartition(11), budget=1000, token_col="n_tokens",
        key_col="doc_id", n_shards=4,
    ).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_first_fit_packing_matches_reference_fold(spark):
    """first_fit places each doc in the EARLIEST open block with room;
    checked against an independent driver-side fold, and it never uses
    more blocks than next-fit."""
    from alma_memory_spark.operators.packing import pack_documents_nostraddle

    rows = [(i, t) for i, t in enumerate([600, 500, 300, 450, 90, 950, 20, 1200, 10])]
    docs = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    out = {
        r["doc_id"]: (r["pack_id"], r["pack_offset"])
        for r in pack_documents_nostraddle(
            docs, budget=1000, token_col="n_tokens", key_col="doc_id",
            strategy="first_fit",
        ).collect()
    }
    # driver reference fold
    remaining, fills, want = [], [], {}
    for i, t in rows:
        b = next((j for j, rem in enumerate(remaining) if t <= rem), None)
        if b is None:
            b = len(remaining); remaining.append(1000); fills.append(0)
        want[i] = (b, fills[b])
        fills[b] += t; remaining[b] -= t
    assert out == want
    nf = pack_documents_nostraddle(
        docs, budget=1000, token_col="n_tokens", key_col="doc_id"
    ).collect()
    assert len({v[0] for v in out.values()}) <= len({r["pack_id"] for r in nf})


def test_mix_rates_for_token_budget(spark):
    from alma_memory_spark.operators.sampling import (
        mix_rates_for_token_budget,
        weighted_mix,
    )

    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "source", F.length("text").alias("n_tokens")
    )
    src_num = F.substring("source", 4, 10).cast("long")
    frames = {
        "web": docs.filter(src_num < 10),
        "code": docs.filter(src_num >= 10),
    }
    rates = mix_rates_for_token_budget(
        frames, {"web": 0.3, "code": 0.7}, total_tokens=20_000,
        token_col="n_tokens",
    )
    assert set(rates) == {"web", "code"} and all(0 < r <= 1.0 for r in rates.values())
    mixed = weighted_mix(frames, rates, key_col="doc_id", salt="tokmix")
    got = (
        mixed.groupBy("source_name")
        .agg(F.sum("n_tokens").alias("t"))
        .collect()
    )
    tokens = {r["source_name"]: r["t"] for r in got}
    # hash sampling realizes the requested token budget approximately
    # (each doc is an independent keep at the exact rate)
    assert 0.5 * 0.3 * 20_000 < tokens["web"] < 1.5 * 0.3 * 20_000
    assert 0.5 * 0.7 * 20_000 < tokens["code"] < 1.5 * 0.7 * 20_000
    # rates are deterministic: recompute identical
    assert rates == mix_rates_for_token_budget(
        frames, {"web": 0.3, "code": 0.7}, 20_000, "n_tokens"
    )
    with pytest.raises(ValueError, match="sum to 1"):
        mix_rates_for_token_budget(frames, {"web": 0.5, "code": 0.1}, 100, "n_tokens")


def test_order_salt_gives_deterministic_corpus_shuffle(spark):
    """order_salt = seeded training-order randomization: the shuffled
    stream is a permutation of the same doc set (no row gained/lost),
    reproducible under repartition, different salts give different
    orders, and BOTH packers agree on the per-shard stream order
    (pack_documents window vs the nostraddle kernel sort use the same
    JVM-side hash)."""
    from pyspark.sql import functions as F

    from alma_memory_spark.operators.packing import (
        pack_documents,
        pack_documents_nostraddle,
    )
    from alma_memory_spark.operators.sampling import hash_bucket
    from alma_memory_spark.session import tiny_df

    rows = [(i, 100 + (i % 7) * 10) for i in range(40)]
    df = tiny_df(spark, rows, "doc_id long, n_tokens long")

    def packmap(d, **kw):
        return {
            r["doc_id"]: (r["shard"], r["pack_id"], r["pack_offset"])
            for r in pack_documents(
                d, budget=512, token_col="n_tokens", key_col="doc_id",
                n_shards=2, **kw
            ).collect()
        }

    plain = packmap(df)
    sh_a = packmap(df, order_salt="epoch1")
    sh_b = packmap(df, order_salt="epoch2")
    assert set(plain) == set(sh_a) == set(sh_b)  # permutation, same docs
    assert sh_a != plain and sh_b != plain and sh_a != sh_b
    assert packmap(df.repartition(9), order_salt="epoch1") == sh_a
    # shard assignment is order-independent (same salt namespace)
    assert {k: v[0] for k, v in sh_a.items()} == {
        k: v[0] for k, v in plain.items()
    }
    # the shuffled stream order is (hash(key, order_salt), key): replay
    # it driver-side and check pack offsets are its running sums
    hashes = {
        r["doc_id"]: (r["shard"], r["h"])
        for r in df.select(
            "doc_id",
            F.pmod(hash_bucket("doc_id", "pack"), F.lit(2)).alias("shard"),
            hash_bucket("doc_id", "epoch1").alias("h"),
        ).collect()
    }
    toks = dict(rows)
    for shard in (0, 1):
        order = sorted(
            (k for k, (s, _h) in hashes.items() if s == shard),
            key=lambda k: (hashes[k][1], k),
        )
        cum = 0
        for k in order:
            assert sh_a[k] == (shard, cum // 512, cum % 512), k
            cum += toks[k]
    # the nostraddle kernel sorts by the same keys: its per-shard pack
    # sequence visits docs in that exact order
    ns = pack_documents_nostraddle(
        df, budget=512, token_col="n_tokens", key_col="doc_id",
        n_shards=2, order_salt="epoch1",
    ).collect()
    assert "_ord" not in ns[0].asDict()
    for shard in (0, 1):
        order = sorted(
            (k for k, (s, _h) in hashes.items() if s == shard),
            key=lambda k: (hashes[k][1], k),
        )
        got = [
            r["doc_id"]
            for r in sorted(
                (r for r in ns if r["shard"] == shard),
                key=lambda r: (r["pack_id"], r["pack_offset"], r["doc_id"]),
            )
        ]
        # visiting order reconstructed from (pack_id, offset) matches
        assert got == order


def test_split_corpus_partitions_deterministically(spark):
    """r10: split_corpus — every row in exactly one split, proportions
    near the weights, assignment stable under repartition and keyed on
    CONTENT (a duplicate key lands in the same split), salts
    independent, bad weights rejected."""
    import pytest

    from alma_memory_spark.operators.sampling import split_corpus

    df = spark.range(0, 20000).select(F.col("id").alias("doc_id"))
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    got = split_corpus(df, w, key_col="doc_id")
    counts = {r["split"]: r["n"] for r in
              got.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 20000
    assert abs(counts["train"] / 20000 - 0.8) < 0.02
    assert abs(counts["val"] / 20000 - 0.1) < 0.01
    assert abs(counts["test"] / 20000 - 0.1) < 0.01
    a = {r["doc_id"]: r["split"] for r in got.collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in split_corpus(
            df.repartition(16), w, key_col="doc_id"
        ).collect()
    }
    assert a == b
    # duplicate keys co-locate: no val/train leak through a second copy
    dup = split_corpus(
        df.unionByName(df.limit(500)), w, key_col="doc_id"
    )
    assert (
        dup.groupBy("doc_id")
        .agg(F.count_distinct("split").alias("k"))
        .filter("k > 1")
        .count()
        == 0
    )
    # a different salt reshuffles assignments
    c = {r["doc_id"]: r["split"]
         for r in split_corpus(df, w, key_col="doc_id", salt="v2").collect()}
    assert c != a
    with pytest.raises(ValueError, match="sum to 1"):
        split_corpus(df, {"train": 0.5, "val": 0.1}, key_col="doc_id")
    with pytest.raises(ValueError, match="at least one"):
        split_corpus(df, {}, key_col="doc_id")
