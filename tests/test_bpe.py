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
