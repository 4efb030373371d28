"""BPE merge-loop token counting: reference-loop parity, determinism,
and the packing-budget integration (VERDICT r7 #6)."""

import os
import re

from pyspark.sql import functions as F

from alma_memory_spark.functions.bpe import (
    DEFAULT_MERGES,
    bpe_encode,
    load_merge_ranks,
    with_bpe_token_count,
)
from alma_memory_spark.functions.text import BPE_TOKEN_RE
from alma_memory_spark.session import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _slow_count(text: str, ranks: dict) -> int:
    return sum(
        len(bpe_encode(pt, ranks)) for pt in re.findall(BPE_TOKEN_RE, text)
    )


def test_merge_table_is_regenerable_and_loads():
    ranks = load_merge_ranks(DEFAULT_MERGES)
    assert len(ranks) > 100
    # ranks are 0..n-1 in file order
    assert sorted(ranks.values()) == list(range(len(ranks)))
    # the space symbol round-trips through the Ġ file encoding
    assert any(a.startswith(" ") for a, _b in ranks)


def test_encode_merges_trained_words_and_falls_back_on_unseen():
    ranks = load_merge_ranks(DEFAULT_MERGES)
    # ' the' is the highest-frequency word in the seed corpus: one token
    assert bpe_encode(" the", ranks) == [" the"]
    # concatenating encoded symbols always reproduces the pre-token
    for pt in (" the", " interesting", " zzqqxx", "42", " !?"):
        assert "".join(bpe_encode(pt, ranks)) == pt
    # an unseen alphabet stays near character-level (no false merges)
    assert len(bpe_encode(" zzqqxx", ranks)) >= 5
    # trained morphology compresses: fewer symbols than characters
    assert len(bpe_encode(" interesting", ranks)) < len(" interesting")


def test_udf_count_matches_reference_loop(spark):
    ranks = load_merge_ranks(DEFAULT_MERGES)
    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "text"
    ).limit(60)
    got = {
        r["doc_id"]: r["n_bpe"]
        for r in with_bpe_token_count(docs).collect()
    }
    want = {
        r["doc_id"]: _slow_count(r["text"], ranks) for r in docs.collect()
    }
    assert got == want and len(got) == 60
    assert all(v > 0 for v in got.values())


def test_bpe_counts_drive_packing_budget(spark):
    """with_bpe_token_count is a drop-in token_col source for the
    no-straddle packer: every pack's summed BPE tokens fit the budget."""
    from alma_memory_spark.operators.packing import pack_documents_nostraddle

    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "text"
    ).limit(80)
    counted = with_bpe_token_count(docs)
    packed = pack_documents_nostraddle(
        counted.select("doc_id", "n_bpe"), budget=512, token_col="n_bpe",
        key_col="doc_id", n_shards=2, salt="bpetest",
    )
    fills = (
        packed.join(
            counted.select("doc_id", F.col("n_bpe").alias("cnt")), "doc_id"
        )
        .groupBy("shard", "pack_id")
        .agg(F.sum("cnt").alias("fill"), F.count("*").alias("n"))
        .collect()
    )
    assert fills
    # no-straddle contract: a pack never exceeds the budget unless it
    # holds a single oversize doc
    for r in fills:
        assert r["fill"] <= 512 or r["n"] == 1


def test_merges_parsing_keeps_hash_pairs(tmp_path):
    """Pinned (ADVICE r8 #4): only the '#version' header (and
    structurally invalid lines) are skipped — a GPT-2-format merge
    pair whose first symbol is '#' is legitimate and must load."""
    p = tmp_path / "merges.txt"
    p.write_text(
        "#version: 0.2\n"
        "h e\n"
        "# #\n"          # '#' merge pair — must be KEPT
        "## sym\n"       # another legit pair starting with '#'
        "not a merge pair line\n"  # 4 fields -> structural, skipped
        "\n"
        "a b\n"
    )
    ranks = load_merge_ranks(str(p))
    assert ("#", "#") in ranks and ("##", "sym") in ranks
    assert list(ranks) == [("h", "e"), ("#", "#"), ("##", "sym"), ("a", "b")]


def test_token_ids_consistent_with_counts_and_vocab(spark):
    """r10: with_bpe_token_ids — len(ids) == the count kernel's count
    on real data, ids replay the reference loop through the derived
    vocab, unseen chars map to <unk>=0, and the vocab is the
    deterministic GPT-2 construction (base alphabet, then merges in
    rank order)."""
    from alma_memory_spark.functions.bpe import (
        load_vocab,
        with_bpe_token_ids,
    )

    ranks = load_merge_ranks(DEFAULT_MERGES)
    vocab = load_vocab(DEFAULT_MERGES)
    # construction: contiguous ids, 0 is <unk>, merges follow base
    assert vocab["<unk>"] == 0
    assert sorted(vocab.values()) == list(range(len(vocab)))
    n_base = len({s for p in ranks for s in p if len(s) == 1})
    first_merge = min(ranks, key=ranks.get)
    assert vocab[first_merge[0] + first_merge[1]] >= n_base + 1

    docs = load_table(spark, SF_DIR, "documents").limit(50)
    got = (
        with_bpe_token_ids(with_bpe_token_count(docs), "text")
        .select("doc_id", "text", "n_bpe", "input_ids")
        .collect()
    )
    assert len(got) == 50
    for r in got:
        assert len(r["input_ids"]) == r["n_bpe"]
        # replay the reference loop through the vocab
        exp = []
        for pt in re.findall(BPE_TOKEN_RE, r["text"]):
            exp.extend(vocab.get(s, 0) for s in bpe_encode(pt, ranks))
        assert r["input_ids"] == exp
    # unseen alphabet -> <unk>, never a crash; empty/None -> []
    odd = spark.createDataFrame(
        [(1, "éé café"), (2, ""), (3, None)],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["input_ids"]
        for r in with_bpe_token_ids(odd).collect()
    }
    assert 0 in out[1]       # é is outside the derived alphabet
    assert out[2] == [] and out[3] == []


def test_id_shards_end_to_end(spark, tmp_path):
    """r10: the full pretraining-output path — tokenizer-faithful ids,
    no-straddle packing on the SAME counts, one ordered file per
    shard; re-reading the shards reproduces every document's id
    stream exactly and no block exceeds its budget."""
    from alma_memory_spark import pipeline as P

    docs = load_table(spark, SF_DIR, "documents").limit(40)
    ready = P.with_bpe_token_ids(P.with_bpe_token_count(docs), "text")
    packed = P.pack_documents_nostraddle(
        ready, budget=256, token_col="n_bpe", key_col="doc_id",
        n_shards=4,
    )
    out = str(tmp_path / "shards")
    P.write_training_shards(packed, out)
    back = spark.read.parquet(out)
    got = {r["doc_id"]: r for r in back.collect()}
    want = {r["doc_id"]: r for r in ready.collect()}
    assert set(got) == set(want)
    for k in got:
        assert got[k]["input_ids"] == want[k]["input_ids"]
    # no block over budget (oversize docs get their own block)
    over = (
        back.groupBy("shard", "pack_id")
        .agg(F.sum("n_bpe").alias("s"), F.count("*").alias("c"))
        .filter((F.col("s") > 256) & (F.col("c") > 1))
        .count()
    )
    assert over == 0


def test_shard_manifest_and_verify(spark, tmp_path):
    """r10: the shard manifest cross-checks — verify_shards passes on
    a fresh write (with n_tokens), and raises on a tampered manifest
    and on a violated one-file-per-shard layout."""
    import pytest

    from alma_memory_spark import pipeline as P

    docs = load_table(spark, SF_DIR, "documents").limit(30)
    ready = P.with_bpe_token_count(docs)
    packed = P.pack_documents_nostraddle(
        ready, budget=256, token_col="n_bpe", key_col="doc_id",
        n_shards=3,
    )
    out = str(tmp_path / "shards")
    P.write_training_shards(packed, out, token_col="n_bpe")
    P.verify_shards(spark, out, token_col="n_bpe")  # clean pass
    # manifest visible only via its own path, not the data read
    assert "n_blocks" not in spark.read.parquet(out).columns
    # tamper: rewrite the manifest with a wrong count (materialize
    # before overwriting the path being read)
    mdf = spark.read.parquet(out + "/_manifest")
    rows = [r.asDict() for r in mdf.collect()]
    for r in rows:
        r["n_docs"] += 1
    spark.createDataFrame(rows, mdf.schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(out + "/_manifest")
    with pytest.raises(ValueError, match="n_docs"):
        P.verify_shards(spark, out, token_col="n_bpe")


def test_unk_rate_surfaced(spark):
    """r11 (ADVICE): out-of-alphabet characters collapse to <unk>=0 —
    the default n_unk column surfaces the rate so heavily-<unk> corpora
    are detectable before shard emission."""
    from pyspark.sql import functions as F

    from alma_memory_spark.functions.bpe import with_bpe_token_ids

    docs = spark.createDataFrame(
        [(1, "plain ascii text"), (2, "ééé çà café"), (3, ""), (4, None)],
        "doc_id long, text string",
    )
    out = with_bpe_token_ids(docs)
    rows = {r["doc_id"]: r for r in out.collect()}
    # per-document: n_unk counts exactly the 0 ids
    for r in rows.values():
        assert r["n_unk"] == sum(1 for i in r["input_ids"] if i == 0)
    # doc 2's accented chars are guaranteed outside the derived alphabet
    assert rows[2]["n_unk"] > 0
    assert rows[3]["n_unk"] == 0 and rows[4]["n_unk"] == 0
    # corpus-level rate: the documented alerting aggregate
    agg = out.agg(
        (F.sum("n_unk") / F.sum(F.size("input_ids"))).alias("unk_rate")
    ).collect()[0]
    assert 0.0 < agg["unk_rate"] < 1.0
    # opt-out keeps the r10 schema
    assert "n_unk" not in with_bpe_token_ids(docs, unk_col=None).columns


def test_verify_shards_column_set_and_hadoop_listing(spark, tmp_path):
    """r11 (ADVICE): (1) a token_col requested against a manifest
    written without one — and the reverse — raises a dedicated error
    naming the column instead of silently skipping or a confusing
    value mismatch; (2) the layout listing goes through the Hadoop
    FileSystem API, so an explicit file:// URI (the minimal non-local
    scheme probe os.listdir cannot take) verifies clean."""
    import pytest

    from alma_memory_spark import pipeline as P

    docs = load_table(spark, SF_DIR, "documents").limit(20)
    ready = P.with_bpe_token_count(docs)
    packed = P.pack_documents_nostraddle(
        ready, budget=256, token_col="n_bpe", key_col="doc_id", n_shards=2,
    )
    # manifest WITHOUT token sums
    out1 = str(tmp_path / "no_tokens")
    P.write_training_shards(packed, out1)
    P.verify_shards(spark, out1)  # matching request passes
    with pytest.raises(ValueError, match="missing from manifest=\\['n_tokens'\\]"):
        P.verify_shards(spark, out1, token_col="n_bpe")
    # manifest WITH token sums, verification without
    out2 = str(tmp_path / "with_tokens")
    P.write_training_shards(packed, out2, token_col="n_bpe")
    with pytest.raises(ValueError, match="not requested=\\['n_tokens'\\]"):
        P.verify_shards(spark, out2)
    # scheme-qualified URI through the Hadoop FS listing
    P.verify_shards(spark, "file://" + out2, token_col="n_bpe")


def test_distributed_trainer_reproduces_committed_table(spark, tmp_path):
    """r11: train_bpe_merges — the distributed two-phase trainer (one
    Spark pre-token count shuffle + the deterministic driver merge
    loop) reproduces the committed resource EXACTLY when fed the same
    seed corpus as a DataFrame, round-trips through write_merges /
    load_merge_ranks, and the caps (min_count / top_words) bound the
    driver table deterministically."""
    import importlib.util
    import os as _os

    from alma_memory_spark.functions.bpe import (
        learn_merges,
        load_merge_ranks,
        train_bpe_merges,
        write_merges,
    )

    spec = importlib.util.spec_from_file_location(
        "make_bpe_vocab",
        _os.path.join(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
                      "scripts", "make_bpe_vocab.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    lines = [ln for ln in mod.SEED_CORPUS.split("\n") if ln.strip()]
    docs = spark.createDataFrame([(i, ln) for i, ln in enumerate(lines)],
                                 "doc_id long, text string")
    merges = train_bpe_merges(docs, n_merges=mod.N_MERGES)
    committed = list(load_merge_ranks(DEFAULT_MERGES))
    assert merges == committed, (merges[:5], committed[:5])

    # file round-trip loads back with identical ranks
    out = str(tmp_path / "merges.txt")
    write_merges(out, merges)
    assert list(load_merge_ranks(out)) == merges

    # caps: min_count drops singleton pre-tokens before the loop;
    # top_words keeps a deterministic frequency-ranked prefix
    capped = train_bpe_merges(docs, n_merges=50, top_words=40)
    assert len(capped) <= 50
    again = train_bpe_merges(docs, n_merges=50, top_words=40)
    assert capped == again
    # learn_merges stops when no pair repeats
    assert learn_merges({"ab": 1}, 10) == []
