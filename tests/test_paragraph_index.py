"""Persisted incremental paragraph dedup: arrival-order == batch-global
contract under ascending ids, replay output-idempotence, pruned owner
reads, lifecycle."""

import os

import pytest

from pyspark.sql import functions as F

from alma_memory_spark.operators.paragraphs import (
    ParagraphDedupIndex,
    dedup_paragraphs,
)
from alma_memory_spark.session import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _pdocs(spark):
    """Multi-paragraph corpus: unique body + universal footer + a
    self-substring paragraph (cross-doc dup structure)."""
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    return docs.select(
        "doc_id",
        F.concat_ws(
            "\n\n",
            F.col("text"),
            F.lit("shared boilerplate footer for the index tests"),
            F.substring("text", 1, 30),
        ).alias("text"),
    )


def _rows(df):
    return {
        r["doc_id"]: (r["text_dedup"], r["n_paras"], r["n_kept"])
        for r in df.collect()
    }


def test_incremental_add_matches_batch_operator_under_ascending_ids(
    spark, tmp_path
):
    """build(ids < K) + add(ids >= K) must reproduce the one-shot batch
    operator's output for the added docs (arrival order == global
    (doc_id, idx) order when batches ascend), and the owner set must
    equal the batch operator's keep set."""
    pdocs = _pdocs(spark)
    a = pdocs.filter("doc_id < 300")
    b = pdocs.filter("doc_id >= 300")
    idx = ParagraphDedupIndex.build(
        spark, a, str(tmp_path / "pi"), n_buckets=8
    )
    out_b = _rows(idx.add(b))
    full = _rows(dedup_paragraphs(pdocs))
    want_b = {k: v for k, v in full.items() if k >= 300}
    assert out_b == want_b and out_b
    # owners cover every distinct paragraph fingerprint exactly once
    own = idx.owners().collect()
    assert len(own) == len({r["fp"] for r in own})
    # reload serves the same state
    again = ParagraphDedupIndex.load(spark, str(tmp_path / "pi"))
    assert again.n_docs == idx.n_docs
    assert {r["fp"] for r in again.owners().collect()} == {
        r["fp"] for r in own
    }


def test_replayed_add_is_output_idempotent(spark, tmp_path):
    """A crash-redelivered batch returns the byte-identical deduped
    output and appends zero owner rows — the ownership property a bare
    seen-set design lacks."""
    pdocs = _pdocs(spark)
    idx = ParagraphDedupIndex.build(
        spark, pdocs.filter("doc_id < 300"), str(tmp_path / "rp"),
        n_buckets=8,
    )
    batch = pdocs.filter("doc_id >= 300")
    first = _rows(idx.add(batch))
    n_owners = idx.owners().count()
    replay = _rows(idx.add(batch))
    assert replay == first
    assert idx.owners().count() == n_owners  # zero owner appends
    # every replayed doc keeps its own paragraphs (not deduped empty)
    assert all(v[2] > 0 for v in replay.values())


def test_owner_reads_are_bucket_pruned(spark, tmp_path):
    """The add-path owner read prunes to the batch fingerprints'
    fbucket partitions and broadcast-semi-joins the batch fp set —
    O(batch-adjacent state), never a full-state shuffle."""
    pdocs = _pdocs(spark)
    idx = ParagraphDedupIndex.build(
        spark, pdocs, str(tmp_path / "pr"), n_buckets=8
    )
    owners_root = os.path.join(idx.vroot, "owners")
    parts = [d for d in os.listdir(owners_root) if d.startswith("fbucket=")]
    assert len(parts) > 1
    one_fp = idx.owners().limit(1).select("fp")
    scan = (
        spark.read.schema(idx._owners_schema())
        .parquet(owners_root)
        .filter(
            F.col("fbucket").isin(
                [0]
            )
        )
    )
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "fbucket" in plan.split(
        "PartitionFilters"
    )[1][:160], plan
    assert one_fp.count() == 1


def test_superseded_handle_refuses_writes(spark, tmp_path):
    pdocs = _pdocs(spark)
    v1 = ParagraphDedupIndex.build(
        spark, pdocs.filter("doc_id < 100"), str(tmp_path / "vg"),
        n_buckets=8,
    )
    ParagraphDedupIndex.build(spark, pdocs, str(tmp_path / "vg"), n_buckets=8)
    with pytest.raises(RuntimeError, match="reload"):
        v1.add(pdocs.filter("doc_id >= 100"))


def test_streaming_paragraph_maintenance(spark, tmp_path):
    """stream_documents_into_indexes(paragraph_index=...): after the
    second half of the corpus replays through the file stream, every
    distinct paragraph fingerprint of the full corpus has exactly ONE
    owner (micro-batch split order may differ from global doc-id
    order, so ownership identity follows the documented arrival-order
    semantics — the fp SET and uniqueness are order-free)."""
    from alma_memory_spark.operators.paragraphs import explode_paragraphs
    from alma_memory_spark.streaming.ingest import (
        stream_documents_into_indexes,
    )

    pdocs = _pdocs(spark)
    half_a = pdocs.filter(F.col("doc_id") % 2 == 0)
    half_b = pdocs.filter(F.col("doc_id") % 2 == 1)
    idx = ParagraphDedupIndex.build(
        spark, half_a, str(tmp_path / "pidx"), n_buckets=8
    )
    inbox = str(tmp_path / "inbox")
    half_b.repartition(4).write.parquet(inbox)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 2)
        .parquet(inbox)
    )
    batches = []
    q = stream_documents_into_indexes(
        stream, paragraph_index=idx,
        checkpoint=str(tmp_path / "ckpt"), id_col="doc_id",
        on_batch=batches.append,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert len(batches) >= 2
    own = idx.owners().collect()
    want_fps = {
        r["fp"] for r in explode_paragraphs(pdocs).select("fp").collect()
    }
    assert {r["fp"] for r in own} == want_fps
    assert len(own) == len(want_fps)  # exactly one owner per fp
    assert idx.n_docs == pdocs.count()


def test_compact_folds_files_preserves_owners_and_output(spark, tmp_path):
    """r9 (VERDICT r8 #2): compact() folds per-add owner-file
    accumulation to ONE file per fbucket partition; owner content and
    subsequent add() output are identical to an uncompacted twin; the
    superseded handle fails loudly."""
    pdocs = _pdocs(spark)
    splits = [
        pdocs.filter("doc_id < 200"),
        pdocs.filter("doc_id >= 200 and doc_id < 300"),
        pdocs.filter("doc_id >= 300 and doc_id < 400"),
        pdocs.filter("doc_id >= 400"),
    ]
    idx = ParagraphDedupIndex.build(
        spark, splits[0], str(tmp_path / "pc"), n_buckets=8
    )
    twin = ParagraphDedupIndex.build(
        spark, splits[0], str(tmp_path / "pt"), n_buckets=8
    )
    for s in splits[1:3]:
        idx.add(s)
        twin.add(s)

    def ownerset(i):
        return {
            (r["fp"], r["doc_id"], r["idx"]) for r in i.owners().collect()
        }

    def max_files_per_part(root):
        worst = 0
        for d in os.listdir(root):
            full = os.path.join(root, d)
            if os.path.isdir(full) and d.startswith("fbucket="):
                worst = max(
                    worst,
                    sum(1 for f in os.listdir(full) if f.endswith(".parquet")),
                )
        return worst

    before = ownerset(idx)
    n_before = idx.n_docs
    assert max_files_per_part(os.path.join(idx.vroot, "owners")) > 1

    out = idx.compact()
    assert ownerset(out) == before == ownerset(twin)
    assert out.n_docs == n_before
    assert max_files_per_part(os.path.join(out.vroot, "owners")) == 1
    with pytest.raises(RuntimeError, match="reload"):
        idx.add(splits[3])
    # byte-identical dedup output vs the uncompacted twin
    assert _rows(out.add(splits[3])) == _rows(twin.add(splits[3]))
    assert ownerset(out) == ownerset(twin)


def test_sentence_unit_index_matches_batch_operator(spark, tmp_path):
    """r9: sentence-granularity persisted index — build + ascending-id
    adds reproduce dedup_sentences exactly; replay is output-idempotent;
    load() restores the unit; the granularity is frozen at build."""
    from alma_memory_spark.operators.paragraphs import dedup_sentences

    boiler = "Subscribe to our newsletter today."
    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id",
        F.concat(
            F.substring("text", 1, 50), F.lit(". "), F.lit(boiler),
            F.lit(" "), F.substring("text", 10, 30), F.lit("!"),
        ).alias("text"),
    )
    a = docs.filter("doc_id < 300")
    b = docs.filter("doc_id >= 300")
    idx = ParagraphDedupIndex.build(
        spark, a, str(tmp_path / "si"), n_buckets=8, unit="sentence"
    )
    out_b = _rows(idx.add(b))
    full = _rows(dedup_sentences(docs))
    assert out_b == {k: v for k, v in full.items() if k >= 300} and out_b
    # replay: byte-identical output, zero new owner rows
    n_own = idx.owners().count()
    assert _rows(idx.add(b)) == out_b
    assert idx.owners().count() == n_own
    loaded = ParagraphDedupIndex.load(spark, str(tmp_path / "si"))
    assert loaded.unit == "sentence"
    assert _rows(loaded.add(b)) == out_b


def test_streaming_sentence_unit_maintenance(spark, tmp_path):
    """r9: a sentence-unit index rides the same streaming maintainer —
    after the stream drains, every distinct SENTENCE fingerprint of the
    full corpus has exactly one owner."""
    from alma_memory_spark.operators.paragraphs import explode_sentences
    from alma_memory_spark.streaming.ingest import (
        stream_documents_into_indexes,
    )

    boiler = "Subscribe to our newsletter today."
    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id",
        F.concat(
            F.substring("text", 1, 50), F.lit(". "), F.lit(boiler),
            F.lit(" "), F.substring("text", 10, 30), F.lit("!"),
        ).alias("text"),
    )
    half_a = docs.filter(F.col("doc_id") % 2 == 0)
    half_b = docs.filter(F.col("doc_id") % 2 == 1)
    idx = ParagraphDedupIndex.build(
        spark, half_a, str(tmp_path / "sidx"), n_buckets=8, unit="sentence"
    )
    inbox = str(tmp_path / "inbox")
    half_b.repartition(4).write.parquet(inbox)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 2)
        .parquet(inbox)
    )
    q = stream_documents_into_indexes(
        stream, paragraph_index=idx,
        checkpoint=str(tmp_path / "ckpt"), id_col="doc_id",
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    own = idx.owners().collect()
    want_fps = {
        r["fp"] for r in explode_sentences(docs).select("fp").collect()
    }
    assert {r["fp"] for r in own} == want_fps
    assert len(own) == len(want_fps)


def test_streaming_maintenance_with_in_stream_compaction(spark, tmp_path):
    """r9: compact_every folds index file debris mid-stream — the sink
    re-binds to the fresh version and keeps adding; final owner content
    equals the uncompacted run; the folded owners dir has one file per
    fbucket partition (plus at most the post-compaction adds)."""
    import os as _os

    from alma_memory_spark.operators.paragraphs import explode_paragraphs
    from alma_memory_spark.streaming.ingest import (
        stream_documents_into_indexes,
    )

    pdocs = _pdocs(spark)
    half_a = pdocs.filter(F.col("doc_id") % 2 == 0)
    half_b = pdocs.filter(F.col("doc_id") % 2 == 1)
    idx = ParagraphDedupIndex.build(
        spark, half_a, str(tmp_path / "pcidx"), n_buckets=8
    )
    inbox = str(tmp_path / "inbox")
    half_b.repartition(6).write.parquet(inbox)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(inbox)
    )
    q = stream_documents_into_indexes(
        stream, paragraph_index=idx,
        checkpoint=str(tmp_path / "ckpt"), id_col="doc_id",
        compact_every=2,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # the caller's handle is superseded by the in-stream compaction;
    # reload serves the current version
    cur = ParagraphDedupIndex.load(spark, str(tmp_path / "pcidx"))
    own = cur.owners().collect()
    want_fps = {
        r["fp"] for r in explode_paragraphs(pdocs).select("fp").collect()
    }
    assert {r["fp"] for r in own} == want_fps
    assert len(own) == len(want_fps)
    # ~6 micro-batches with compact_every=2 -> the last fold left at
    # most (1 compacted + batches-since-fold) files per partition;
    # without compaction this corpus accumulates 6+ appends per bucket
    owners_root = _os.path.join(cur.vroot, "owners")
    worst = 0
    for d in _os.listdir(owners_root):
        full = _os.path.join(owners_root, d)
        if _os.path.isdir(full) and d.startswith("fbucket="):
            worst = max(
                worst,
                sum(1 for f in _os.listdir(full) if f.endswith(".parquet")),
            )
    assert worst <= 3
    # superseded original handle refuses writes; fresh one accepts
    with pytest.raises(RuntimeError, match="reload"):
        idx.add(half_b.limit(1))
    cur.add(
        spark.createDataFrame(
            [(990001, "totally new paragraph body\n\nanother unit")],
            "doc_id long, text string",
        )
    )


# ---------------------------------------------------------------------------
# token-window (substring) index — r10
# ---------------------------------------------------------------------------


def _wdocs(spark):
    """Corpus with a mid-text >= w-token boilerplate span and a
    self-substring tail (cross-doc window-dup structure, no sentence
    boundaries)."""
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    return docs.select(
        "doc_id",
        F.concat_ws(
            " ",
            F.substring("text", 1, 40),
            F.lit("shared window boilerplate span for the index tests"),
            F.substring("text", 5, 30),
        ).alias("text"),
    )


def _wrows(df):
    return {
        r["doc_id"]: (r["text_dedup"], r["n_units"], r["n_kept"])
        for r in df.collect()
    }


def test_window_index_add_matches_batch_operator(spark, tmp_path):
    """Ascending-id incremental adds equal the one-shot batch operator
    restricted to the added docs — the 'subidx' gate contract."""
    from alma_memory_spark.operators.substring import (
        TokenWindowDedupIndex,
        dedup_token_windows,
    )

    docs = _wdocs(spark)
    want = _wrows(
        dedup_token_windows(docs, w=5).filter(F.col("doc_id") >= 200)
    )
    idx = TokenWindowDedupIndex.build(
        spark, docs.filter(F.col("doc_id") < 200), str(tmp_path / "w"),
        w=5, n_buckets=8,
    )
    got = _wrows(idx.add(docs.filter(F.col("doc_id") >= 200)))
    assert got == want
    # load() roundtrip preserves params
    loaded = TokenWindowDedupIndex.load(spark, str(tmp_path / "w"))
    assert (loaded.w, loaded.n_buckets, loaded.id_col) == (5, 8, "doc_id")
    assert loaded.n_docs == idx.n_docs


def test_window_index_replay_is_output_idempotent(spark, tmp_path):
    """A crash-redelivered batch returns the byte-identical excised
    output and appends ZERO owner rows."""
    from alma_memory_spark.operators.substring import TokenWindowDedupIndex

    docs = _wdocs(spark)
    idx = TokenWindowDedupIndex.build(
        spark, docs.filter(F.col("doc_id") < 200), str(tmp_path / "w"),
        w=5, n_buckets=8,
    )
    batch = docs.filter(
        (F.col("doc_id") >= 200) & (F.col("doc_id") < 260)
    )
    first = _wrows(idx.add(batch))
    owners_after_first = idx.owners().count()
    replay = _wrows(idx.add(batch))  # redelivery
    assert replay == first
    assert idx.owners().count() == owners_after_first


def test_window_index_compact_preserves_owners_and_output(spark, tmp_path):
    """compact() folds micro-add file debris without changing the
    owner SET or subsequent add outputs."""
    from alma_memory_spark.operators.substring import TokenWindowDedupIndex

    docs = _wdocs(spark)
    idx = TokenWindowDedupIndex.build(
        spark, docs.filter(F.col("doc_id") < 100), str(tmp_path / "w"),
        w=5, n_buckets=4,
    )
    for lo in (100, 140, 180, 220):
        idx.add(
            docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < lo + 40))
        )
    before = sorted(
        (r["fp"], r["doc_id"], r["start"]) for r in idx.owners().collect()
    )

    def _nfiles(root):
        n = 0
        for _d, _s, files in os.walk(root):
            n += sum(1 for f in files if f.endswith(".parquet"))
        return n

    files_before = _nfiles(idx.vroot)
    out = idx.compact()
    after = sorted(
        (r["fp"], r["doc_id"], r["start"]) for r in out.owners().collect()
    )
    assert after == before
    assert _nfiles(out.vroot) < files_before
    # the superseded handle refuses writes; the fresh one accepts
    with pytest.raises(RuntimeError, match="superseded|current version"):
        idx.add(docs.filter(F.col("doc_id") >= 260))
    nxt = _wrows(out.add(
        docs.filter((F.col("doc_id") >= 260) & (F.col("doc_id") < 300))
    ))
    assert nxt  # excision still runs against the folded owner set


def test_streaming_window_index_maintenance(spark, tmp_path):
    """The maintainer feeds the token-window index per micro-batch:
    after the stream drains, every distinct window fingerprint of the
    full corpus has exactly ONE owner (micro-batch file order may
    differ from doc-id order, so ownership identity follows the
    documented arrival-order semantics — the fp SET and uniqueness
    are order-free)."""
    from alma_memory_spark.operators.substring import (
        TokenWindowDedupIndex,
        explode_token_windows,
    )
    from alma_memory_spark.streaming.ingest import (
        stream_documents_into_indexes,
    )

    docs = _wdocs(spark).filter(F.col("doc_id") < 120).localCheckpoint()
    idx = TokenWindowDedupIndex.build(
        spark, docs.filter(F.col("doc_id") < 40), str(tmp_path / "w"),
        w=5, n_buckets=4,
    )
    src = str(tmp_path / "src")
    docs.filter(F.col("doc_id") >= 40).repartition(4).write.parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    batches = []
    q = stream_documents_into_indexes(
        stream,
        window_index=idx,
        checkpoint=str(tmp_path / "ck"),
        id_col="doc_id",
        on_batch=batches.append,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert len(batches) >= 2
    own = idx.owners().collect()
    want_fps = {
        r["fp"]
        for r in explode_token_windows(docs, 5).select("fp").collect()
    }
    assert {r["fp"] for r in own} == want_fps
    assert len(own) == len(want_fps)  # exactly one owner per fp
    assert idx.n_docs == docs.count()


def test_window_index_xxhash64_build_matches_md5(spark, tmp_path):
    """r13 (VERDICT r12 #6): an index built with fp_hash='xxhash64'
    (8-byte bigint owners) produces byte-identical excised output to
    the md5 default across build + add + compact + load, and the hash
    choice round-trips through stats."""
    from alma_memory_spark.operators.substring import TokenWindowDedupIndex

    docs = _wdocs(spark)
    seed = docs.filter(F.col("doc_id") < 200)
    batch = docs.filter(F.col("doc_id") >= 200)

    a = TokenWindowDedupIndex.build(
        spark, seed, str(tmp_path / "md5"), w=5, n_buckets=8
    )
    b = TokenWindowDedupIndex.build(
        spark, seed, str(tmp_path / "xx"), w=5, n_buckets=8,
        fp_hash="xxhash64",
    )
    assert _wrows(a.add(batch)) == _wrows(b.add(batch))
    assert b.owners().schema["fp"].dataType.simpleString() == "bigint"

    b2 = b.compact()
    loaded = TokenWindowDedupIndex.load(spark, str(tmp_path / "xx"))
    assert loaded.fp_hash == "xxhash64"
    assert b2.owners().count() == loaded.owners().count()
    # replay on the loaded xxhash64 handle stays output-idempotent
    assert _wrows(loaded.add(batch)) == _wrows(a.add(batch))
