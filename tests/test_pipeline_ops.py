"""PII redaction, benchmark decontamination, repetition signals."""

import pytest

from pyspark.sql import functions as F

from alma_memory_spark.functions.pii import pii_count, redact_pii
from alma_memory_spark.functions.text import dup_ngram_fraction
from alma_memory_spark.operators.decontam import (
    contamination_report,
    decontaminate,
)


def test_pii_counts_and_redaction(spark):
    rows = [
        (0, "reach me at jo.doe+x@mail.example.org or 415-555-0123"),
        (1, "server 192.168.1.77 and ssn 123-45-6789 leaked"),
        (2, "no pii here at all"),
        (3, "two mails: a@b.co c@d.io and ip 10.0.0.1"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {
        r["id"]: r
        for r in df.select(
            "id",
            pii_count("text", "email").alias("email"),
            pii_count("text", "phone").alias("phone"),
            pii_count("text", "ipv4").alias("ipv4"),
            pii_count("text", "ssn").alias("ssn"),
            redact_pii("text").alias("red"),
        ).collect()
    }
    assert (got[0]["email"], got[0]["phone"]) == (1, 1)
    assert (got[1]["ipv4"], got[1]["ssn"]) == (1, 1)
    assert all(got[2][k] == 0 for k in ("email", "phone", "ipv4", "ssn"))
    assert (got[3]["email"], got[3]["ipv4"]) == (2, 1)
    assert got[0]["red"] == "reach me at <EMAIL> or <PHONE>"
    assert got[1]["red"] == "server <IPV4> and ssn <SSN> leaked"
    assert got[3]["red"] == "two mails: <EMAIL> <EMAIL> and ip <IPV4>"
    # redaction is idempotent: placeholders contain no PII shapes
    again = (
        df.select(redact_pii(redact_pii("text")).alias("r2")).collect()
    )
    assert [r["r2"] for r in again] == [got[i]["red"] for i in range(4)]


def test_phone_formats_match_oracle_engine(spark):
    """Pinned (ADVICE r7 #3): the broadened phone pattern covers the
    common NANP renderings — parenthesized area code, space separators,
    +1 prefix — and Spark (Java regex) agrees byte-for-byte with the
    DuckDB (RE2) oracle on counts AND redacted text."""
    import duckdb

    from alma_memory_spark.functions.pii import sql_pii_count, sql_redact_pii

    rows = [
        (0, "call 415-555-1234 now"),
        (1, "call (415) 555-1234"),
        (2, "call (415)555-1234"),
        (3, "+1 415 555 1234"),
        (4, "+1-415-555-1234"),
        (5, "dotted 415.555.1234"),
        (6, "ssn-shaped 123-45-6789 stays"),
        (7, "ip-shaped 10.137.0.59 stays"),
        (8, "bare run +14155551234 out of scope"),
        (9, "years 2019 100 2000 stay"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {
        r["id"]: (r["n"], r["red"])
        for r in df.select(
            "id",
            pii_count("text", "phone").alias("n"),
            redact_pii("text").alias("red"),
        ).collect()
    }
    con = duckdb.connect()
    for i, text in rows:
        n, red = con.execute(
            f"SELECT {sql_pii_count('t', 'phone')}, {sql_redact_pii('t')} "
            "FROM (SELECT ? AS t)",
            [text],
        ).fetchone()
        assert got[i] == (n, red), (i, got[i], (n, red))
    assert all(got[i][0] == 1 for i in range(6))  # the 6 accepted forms
    assert all(got[i][0] == 0 for i in range(6, 10))  # documented misses


def test_gopher_quality_rules_hand_cases(spark):
    """Each published rule trips on its own pathology and a clean doc
    passes all seven (order: words, mean-len, symbols, bullets,
    ellipsis, alpha, stopwords)."""
    from alma_memory_spark.functions.text import (
        gopher_pass_bits,
        gopher_quality_pass,
    )

    clean = (
        "the quick brown fox jumps over that lazy dog and it will have "
        "kept running with steady calm pace for hours today"
    )
    rows = [
        (0, clean),
        (1, "too few words"),  # word count below min
        (2, "the of " + "# " * 30 + "and that have with words here now "
            "keep going along fine today"),  # symbol ratio > 0.1
        (3, "\n".join("- bullet %d of the set and that have with" % i
                      for i in range(10))),  # bullet fraction > 0.9
        (4, "the of and " + "12345 9876 " * 12 + "that have with"),  # alpha < 0.8
        (5, "zz qq xx " * 8),  # no required stopwords
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {
        r["id"]: (r["bits"], r["keep"])
        for r in df.select(
            "id",
            gopher_pass_bits("text", min_words=10).alias("bits"),
            gopher_quality_pass("text", min_words=10).alias("keep"),
        ).collect()
    }
    assert got[0] == ("1111111", True)
    assert got[1][0][0] == "0" and not got[1][1]  # word-count bit
    assert got[2][0][2] == "0" and not got[2][1]  # symbol bit
    assert got[3][0][3] == "0" and not got[3][1]  # bullet bit
    assert got[4][0][5] == "0" and not got[4][1]  # alpha bit
    assert got[5][0][6] == "0" and not got[5][1]  # stopword bit


def test_paragraph_dedup_keeps_global_first_occurrence(spark):
    """Hand-computed paragraph dedup: the globally FIRST (doc_id, idx)
    occurrence of each paragraph fingerprint survives; docs reassemble
    in original order; a fully-duplicated doc comes back empty instead
    of vanishing."""
    from alma_memory_spark.operators.paragraphs import dedup_paragraphs

    rows = [
        (1, "alpha one\n\nshared footer\n\nbeta two"),
        (2, "gamma three\n\nshared footer\n\nalpha one"),
        (3, "shared footer"),  # every paragraph already seen
        (4, "  \n\n Shared   FOOTER \n\ndelta four"),  # normalized dup
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in dedup_paragraphs(df).collect()}
    assert got[1]["text_dedup"] == "alpha one\n\nshared footer\n\nbeta two"
    assert (got[1]["n_paras"], got[1]["n_kept"]) == (3, 3)
    # 'alpha one' and 'shared footer' first appeared in doc 1
    assert got[2]["text_dedup"] == "gamma three"
    assert (got[2]["n_paras"], got[2]["n_kept"]) == (3, 1)
    assert got[3]["text_dedup"] == "" and got[3]["n_kept"] == 0
    # fingerprint normalizes case + whitespace: ' Shared   FOOTER ' dups
    assert got[4]["text_dedup"] == "delta four"
    assert (got[4]["n_paras"], got[4]["n_kept"]) == (2, 1)
    assert set(got) == {1, 2, 3, 4}


def test_decontamination_flags_and_drops_shared_ngrams(spark):
    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu"
    train = spark.createDataFrame(
        [
            (1, "intro words then " + shared + " trailing text"),
            (2, "completely unrelated content with its own tokens here and more of them now"),
            (3, shared),  # verbatim benchmark copy
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "prefix " + shared + " suffix")], "doc_id long, text string"
    )
    rep = {
        r["doc_id"]: r["n_shared"]
        for r in contamination_report(train, bench, n=13).collect()
    }
    assert set(rep) == {1, 3} and rep[1] >= 1 and rep[3] >= 1
    kept = decontaminate(train, bench, n=13)
    assert [r["doc_id"] for r in kept.collect()] == [2]
    # a clean corpus reports nothing and survives intact
    assert contamination_report(train.filter("doc_id = 2"), bench, n=13).count() == 0


def test_dup_ngram_fraction_boilerplate_signal(spark):
    df = spark.createDataFrame(
        [(0, "buy now " * 30), (1, "a varied sentence with unique words only")],
        "id long, text string",
    )
    got = {
        r["id"]: r["f"]
        for r in df.select("id", F.round(dup_ngram_fraction("text", 2), 6).alias("f")).collect()
    }
    assert got[0] > 0.9  # looping boilerplate
    assert got[1] == 0.0


def test_write_training_shards_one_ordered_file_per_shard(spark, tmp_path):
    import os

    from alma_memory_spark.operators.packing import pack_documents_nostraddle
    from alma_memory_spark.pipeline import write_training_shards
    from alma_memory_spark.session import load_table

    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    docs = load_table(spark, sf, "documents").select(
        "doc_id", F.length("text").alias("n_tokens")
    )
    packed = pack_documents_nostraddle(
        docs, budget=1000, token_col="n_tokens", key_col="doc_id", n_shards=4
    )
    out = str(tmp_path / "shards")
    write_training_shards(packed, out)
    # one data file per shard dir
    for d in sorted(os.listdir(out)):
        if not d.startswith("shard="):
            continue
        files = [f for f in os.listdir(os.path.join(out, d)) if f.endswith(".parquet")]
        assert len(files) == 1, (d, files)
    # rows within each shard stream blocks in order
    back = spark.read.parquet(out)
    import pyarrow.parquet as pq

    for d in sorted(os.listdir(out)):
        if not d.startswith("shard="):
            continue
        fdir = os.path.join(out, d)
        f = [x for x in os.listdir(fdir) if x.endswith(".parquet")][0]
        t = pq.read_table(os.path.join(fdir, f)).to_pandas()
        key = list(zip(t["pack_id"], t["pack_offset"]))
        assert key == sorted(key)
    assert back.count() == packed.count()


def test_sentence_dedup_is_byte_faithful_and_keeps_first(spark):
    """r9 (VERDICT r8 #5): the separator-preserving sentence split —
    (a) on a corpus with NO cross-doc duplicates, reassembly is
    byte-identical to the input (the property the r8 regex split could
    not give); (b) a boilerplate sentence inside otherwise-unique
    paragraphs dedups at global first occurrence, which paragraph mode
    misses entirely."""
    from alma_memory_spark.operators.paragraphs import (
        dedup_paragraphs,
        dedup_sentences,
    )

    nodup = [
        (1, "First sentence here. Second one!  Third?\nNew line start."),
        (2, "Single sentence without terminal"),
        (3, "Tabs after.\tThen more text. Trailing boundary. "),
        (4, "No punctuation at all just words"),
    ]
    df = spark.createDataFrame(nodup, "doc_id long, text string")
    got = {r["doc_id"]: r for r in dedup_sentences(df).collect()}
    for did, text in nodup:
        assert got[did]["text_dedup"] == text, did
        assert got[did]["n_kept"] == got[did]["n_paras"]

    boiler = "Subscribe to our newsletter today."
    rows = [
        (1, f"Unique intro one. {boiler} Unique tail one."),
        (2, f"Unique intro two! {boiler} Unique tail two."),
        (3, f"{boiler}"),
    ]
    df2 = spark.createDataFrame(rows, "doc_id long, text string")
    sgot = {r["doc_id"]: r for r in dedup_sentences(df2).collect()}
    assert sgot[1]["text_dedup"] == rows[0][1]
    assert sgot[2]["text_dedup"] == "Unique intro two! Unique tail two."
    assert (sgot[2]["n_paras"], sgot[2]["n_kept"]) == (3, 2)
    assert sgot[3]["text_dedup"] == "" and sgot[3]["n_kept"] == 0
    # paragraph mode (blank-line separator) sees one unit per doc and
    # misses the embedded boilerplate sentence — the gap this closes
    pgot = {r["doc_id"]: r for r in dedup_paragraphs(df2).collect()}
    assert pgot[2]["text_dedup"] == rows[1][1]


def test_url_signals_and_pass_bits(spark):
    """r9 (VERDICT r8 #6): URL quality rules — host/domain extraction,
    registrable-domain blocklist, scheme/depth/tracker bits, and the
    canonical dedup key (scheme-, www-, trailing-slash- and
    query-insensitive)."""
    from alma_memory_spark.functions.text import url_pass_bits, url_signals

    rows = [
        (1, "https://www.example.com/docs/page-1"),
        (2, "http://example.com/docs/page-1/"),          # canon-dup of 1
        (3, "https://blog.example.com/docs/page-1"),     # different host
        (4, "https://spam.example/x"),                   # blocklisted
        (5, "https://news.test/a/b/c/d/e/f/g/h"),        # too deep
        (6, "https://news.test/a?utm_source=feed"),      # tracker
        (7, "not a url at all"),
    ]
    df = spark.createDataFrame(rows, "id long, url string")
    s = url_signals(F.col("url"))
    got = {
        r["id"]: r
        for r in df.select(
            "id", s["host"].alias("h"), s["domain"].alias("d"),
            s["blocked"].alias("b"), s["canonical"].alias("c"),
            url_pass_bits("url").alias("bits"),
        ).collect()
    }
    assert got[1]["h"] == "www.example.com" and got[1]["d"] == "example.com"
    # canonical key unifies scheme/www/trailing-slash variants
    assert got[1]["c"] == got[2]["c"] == "example.com/docs/page-1"
    assert got[3]["c"] == "blog.example.com/docs/page-1" != got[1]["c"]
    assert got[4]["b"] and not got[1]["b"]
    assert got[1]["bits"] == "11111"
    assert got[2]["bits"] == "11011"   # http scheme fails bit 3
    assert got[4]["bits"] == "10111"   # blocklist bit
    assert got[5]["bits"] == "11101"   # depth bit
    assert got[6]["bits"] == "11110"   # tracker bit
    assert got[7]["bits"][0] == "0"    # unparseable host


def test_lm_quality_scores_hand_computed(spark):
    """r9: CCNet-shape unigram LM quality — hand-computed smoothed
    log-probs on a tiny corpus, self-train vs reference-corpus scoring
    with the OOV floor, and partition-invariance of the DECIMAL mean."""
    import math

    from alma_memory_spark.operators.lm_quality import (
        lm_quality_scores,
        unigram_lm,
    )

    rows = [(1, "aa aa bb"), (2, "aa cc")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # counts: aa=3 bb=1 cc=1; total=5 vocab=3 -> denom 8
    lp = {t: round(math.log((c + 1) / 8), 10) for t, c in
          {"aa": 3, "bb": 1, "cc": 1}.items()}
    got = {r["doc_id"]: r for r in lm_quality_scores(df).collect()}
    want1 = round((2 * lp["aa"] + lp["bb"]) / 3, 6)
    want2 = round((lp["aa"] + lp["cc"]) / 2, 6)
    assert (got[1]["n_tokens"], got[1]["score"]) == (3, want1)
    assert (got[2]["n_tokens"], got[2]["score"]) == (2, want2)
    # reference-corpus scoring: unseen token takes the floor ln(1/8)
    lm, stats = unigram_lm(df)
    new = spark.createDataFrame([(9, "aa zz")], "doc_id long, text string")
    out = lm_quality_scores(new, lm=lm, stats=stats).collect()[0]
    floor = round(math.log(1 / 8), 10)
    assert out["score"] == round((lp["aa"] + floor) / 2, 6)
    # partition-invariant mean (DECIMAL sum): 1 vs 8 partitions agree
    import os as _os

    from alma_memory_spark.session import load_table

    sf_dir = _os.environ.get(
        "SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001"
    )
    docs = load_table(spark, sf_dir, "documents")
    a = {r["doc_id"]: r["score"]
         for r in lm_quality_scores(docs.coalesce(1)).collect()}
    b = {r["doc_id"]: r["score"]
         for r in lm_quality_scores(docs.repartition(8)).collect()}
    assert a == b


def test_lm_tail_ids_bottom_decile_with_ties(spark):
    """r9: the CCNet tail bucket — bottom-k cutoff via TakeOrdered (no
    global window), boundary ties included deterministically."""
    from alma_memory_spark.operators.lm_quality import lm_tail_ids

    rows = [(i, float(-i)) for i in range(1, 21)]  # scores -1..-20
    df = spark.createDataFrame(rows, "doc_id long, score double")
    # k = 2 -> cutoff = -19; ids 19, 20
    got = {r["doc_id"] for r in lm_tail_ids(df, frac=0.1).collect()}
    assert got == {19, 20}
    # ties at the cutoff all included
    tied = spark.createDataFrame(
        [(1, -5.0), (2, -5.0), (3, -5.0), (4, -1.0), (5, -1.0),
         (6, -1.0), (7, -1.0), (8, -1.0), (9, -1.0), (10, -1.0)],
        "doc_id long, score double",
    )
    got2 = {r["doc_id"] for r in lm_tail_ids(tied, frac=0.1).collect()}
    assert got2 == {1, 2, 3}
    # frac too small for one row -> empty, not error
    assert lm_tail_ids(df, frac=0.01).count() == 0
